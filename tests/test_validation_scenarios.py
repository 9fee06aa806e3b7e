"""Port of the reference's validation-operator test tier
(ValidationProcessFunctionTest.scala) onto ``validate_records``: routing
precedence, exact error strings, header/key/value preservation, UTF-8.
"""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from hri_flink_pipeline_core_spark.operators.validation import (
    json_validator,
    validate_records,
)
from hri_flink_pipeline_core_spark.schemas import (
    BATCH_NOTIFICATION_SCHEMA,
    ERR_BATCH_COMPLETED,
    ERR_MISSING_BATCH_ID,
    ERR_UNKNOWN_BATCH_ID,
    HRI_RECORD_SCHEMA,
    Status,
)

TOPIC = "ingest.t1.di.in"


def hri_row(value=b'{"ok":1}', batch_id="b1", headers=..., key=b"k", offset=0):
    if headers is ...:
        headers = (
            [Row(key="batchId", value=batch_id.encode())] if batch_id else None
        )
    return Row(
        key=key, value=value, headers=headers,
        topic=TOPIC, partition=0, offset=offset,
    )


def notif_row(batch_id="b1", status=Status.STARTED):
    return Row(
        id=batch_id, name="n", topic=TOPIC, dataType="claims", status=status,
        startDate=None, endDate=None, expectedRecordCount=10,
        actualRecordCount=None, invalidRecordCount=None, invalidThreshold=5,
        failureMessage=None, metadata=None,
    )


def run(spark, records, notifications):
    rec_df = spark.createDataFrame(records, HRI_RECORD_SCHEMA)
    notif_df = spark.createDataFrame(
        notifications, BATCH_NOTIFICATION_SCHEMA
    ).withColumn("offset", F.monotonically_increasing_id())
    return validate_records(rec_df, notif_df, json_validator())


def test_valid_json_routes_to_output_with_passthrough(spark):
    # ValidationProcessFunctionTest.scala:186-199 +
    # ValidationJobIntTest.scala:291-295 ("passThru" header preserved)
    rec = hri_row(
        headers=[
            Row(key="batchId", value=b"b1"),
            Row(key="passThru", value="中文-value".encode()),
        ]
    )
    out = run(spark, [rec], [notif_row()])
    valid = out.valid.collect()
    assert len(valid) == 1
    row = valid[0]
    assert row.value == b'{"ok":1}'
    assert row.key == b"k"
    hdr = {h.key: bytes(h.value) for h in row.headers}
    assert hdr["passThru"].decode() == "中文-value"
    counts = out.counts.collect()
    assert [(c.batchId, c.isValid) for c in counts] == [("b1", True)]


def test_missing_header_routes_invalid_no_count(spark):
    # rule 1 (ValidationProcessFunction.scala:84-96): invalid with null
    # batchId, NO count event
    out = run(spark, [hri_row(headers=None)], [notif_row()])
    inv = out.invalid.collect()
    assert len(inv) == 1
    assert inv[0].failure == ERR_MISSING_BATCH_ID
    assert inv[0].batchId is None
    assert inv[0].topic == TOPIC
    assert out.counts.count() == 0
    assert out.valid.count() == 0


def test_headers_without_batch_id_routes_invalid(spark):
    out = run(
        spark,
        [hri_row(headers=[Row(key="other", value=b"x")])],
        [notif_row()],
    )
    inv = out.invalid.collect()
    assert len(inv) == 1 and inv[0].failure == ERR_MISSING_BATCH_ID


def test_unknown_batch_id_routes_invalid_no_count(spark):
    # rule 2 (:99-112)
    out = run(spark, [hri_row(batch_id="nope")], [notif_row(batch_id="b1")])
    inv = out.invalid.collect()
    assert len(inv) == 1
    assert inv[0].failure == ERR_UNKNOWN_BATCH_ID
    assert inv[0].batchId == "nope"
    assert out.counts.count() == 0


@pytest.mark.parametrize("status", [Status.TERMINATED, Status.FAILED])
def test_terminated_failed_batch_drops_silently(spark, status):
    # rule 3 (:115-118): no output anywhere, no count
    out = run(spark, [hri_row()], [notif_row(status=status)])
    assert out.valid.count() == 0
    assert out.invalid.count() == 0
    assert out.counts.count() == 0


def test_completed_batch_routes_invalid_no_count(spark):
    # rule 4 (:121-131)
    out = run(spark, [hri_row()], [notif_row(status=Status.COMPLETED)])
    inv = out.invalid.collect()
    assert len(inv) == 1
    assert inv[0].failure == ERR_BATCH_COMPLETED
    assert out.counts.count() == 0


def test_bad_json_routes_invalid_with_count(spark):
    # rule 5 invalid path (ValidationProcessFunctionTest.scala:221-239)
    out = run(spark, [hri_row(value=b"{not json")], [notif_row()])
    inv = out.invalid.collect()
    assert len(inv) == 1
    assert inv[0].failure.startswith("Invalid JSON")
    counts = out.counts.collect()
    assert [(c.batchId, c.isValid) for c in counts] == [("b1", False)]


def test_null_value_routes_invalid(spark):
    out = run(spark, [hri_row(value=None)], [notif_row()])
    assert out.invalid.count() == 1
    assert out.counts.collect()[0].isValid is False


def test_last_write_wins_notification_state(spark):
    # broadcast map-state put() is last-write-wins
    # (ValidationProcessFunction.scala:215-224): the later TERMINATED
    # status must shadow the earlier STARTED one.
    out = run(
        spark,
        [hri_row()],
        [notif_row(status=Status.STARTED), notif_row(status=Status.TERMINATED)],
    )
    assert out.valid.count() == 0
    assert out.invalid.count() == 0


def test_utf8_batch_id_and_payload(spark):
    # UTF-8 end-to-end (HriRecordDeserializerTest "UTF8 Characters should
    # be preserved")
    bid = "批次-1"
    rec = hri_row(
        value='{"名字":"值"}'.encode(), batch_id=bid,
        headers=[Row(key="batchId", value=bid.encode())],
    )
    out = run(spark, [rec], [notif_row(batch_id=bid)])
    valid = out.valid.collect()
    assert len(valid) == 1
    assert bytes(valid[0].value).decode() == '{"名字":"值"}'
    assert out.counts.collect()[0].batchId == bid


def test_mixed_batch_routes_all_rules_at_once(spark):
    # one DataFrame exercising every routing rule simultaneously — the
    # side-output fan-out semantics (three disjoint projections)
    records = [
        hri_row(batch_id="b1", offset=0),                       # valid
        hri_row(batch_id="b1", value=b"xx", offset=1),          # invalid json
        hri_row(headers=None, offset=2),                        # missing header
        hri_row(batch_id="ghost", offset=3),                    # unknown
        hri_row(batch_id="term", offset=4),                     # dropped
        hri_row(batch_id="done", offset=5),                     # completed
    ]
    notifs = [
        notif_row("b1"),
        notif_row("term", Status.TERMINATED),
        notif_row("done", Status.COMPLETED),
    ]
    out = run(spark, records, notifs)
    assert out.valid.count() == 1
    inv = {r.failure for r in out.invalid.collect()}
    assert inv == {
        "Invalid JSON: unable to parse record value: xx",
        ERR_MISSING_BATCH_ID,
        ERR_UNKNOWN_BATCH_ID,
        ERR_BATCH_COMPLETED,
    }
    counts = out.counts.collect()
    assert len(counts) == 2  # only b1's two records emit count events
    total = out.valid.count() + out.invalid.count()
    assert total == 5  # six records minus the silent drop
