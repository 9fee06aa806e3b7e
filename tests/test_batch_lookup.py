"""Port of the validator's Mgmt-API fallback tests
(ValidationProcessFunctionTest.scala:61-185): lookup on unknown batchId,
retry on transient failure, 404 -> record stays invalid, other 4xx ->
abort, retry-deadline abort.
"""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from hri_flink_pipeline_core_spark.operators.batch_lookup import (
    lookup_unknown_batches,
)
from hri_flink_pipeline_core_spark.operators.validation import validate_records
from hri_flink_pipeline_core_spark.schemas import (
    BATCH_NOTIFICATION_SCHEMA,
    ERR_UNKNOWN_BATCH_ID,
    HRI_RECORD_SCHEMA,
    Status,
)
from hri_flink_pipeline_core_spark.sinks.mgmt_api import (
    FatalSinkError,
    RequestException,
)

TOPIC = "ingest.t1.di.in"


class FakeLookup:
    """Scripted BatchLookup: batch_id -> list of outcomes, popped per call
    (an Exception instance raises; a dict/None returns)."""

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []

    def get_batch_id(self, tenant_id, batch_id):
        self.calls.append((tenant_id, batch_id))
        outcome = self.script[batch_id].pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        return outcome


def rec(batch_id, offset=0):
    return Row(
        key=b"k", value=b'{"ok":1}',
        headers=[Row(key="batchId", value=batch_id.encode())],
        topic=TOPIC, partition=0, offset=offset,
    )


def notif_dict(batch_id, status=Status.STARTED):
    return {
        "id": batch_id, "name": "n", "topic": TOPIC, "dataType": "claims",
        "status": status, "startDate": "2024-01-01T00:00:00Z",
        "expectedRecordCount": 10, "invalidThreshold": 5,
    }


def dim_df(spark, *batch_ids):
    rows = [
        Row(
            id=b, name="n", topic=TOPIC, dataType="claims",
            status=Status.STARTED, startDate=None, endDate=None,
            expectedRecordCount=10, actualRecordCount=None,
            invalidRecordCount=None, invalidThreshold=5,
            failureMessage=None, metadata=None,
        )
        for b in batch_ids
    ]
    return spark.createDataFrame(rows, BATCH_NOTIFICATION_SCHEMA).withColumn(
        "offset", F.lit(0).cast("long")
    )


def test_lookup_found_batch_becomes_known(spark):
    # ValidationProcessFunctionTest.scala:61-97 — getBatch returns the
    # notification after transient failures; record then validates
    records = spark.createDataFrame([rec("late-b")], HRI_RECORD_SCHEMA)
    lookup = FakeLookup(
        {"late-b": [RequestException("503: busy", 503), notif_dict("late-b")]}
    )
    dim = lookup_unknown_batches(
        records, dim_df(spark), "t1", lookup, sleep=lambda s: None
    )
    assert lookup.calls == [("t1", "late-b"), ("t1", "late-b")]  # retried
    out = validate_records(records, dim, notification_seq_col="offset")
    assert out.valid.count() == 1
    assert out.counts.collect()[0].batchId == "late-b"


def test_lookup_404_record_routes_invalid(spark):
    # :129-158 — 'Not Found' -> invalid output with Unknown batchId error
    records = spark.createDataFrame([rec("ghost")], HRI_RECORD_SCHEMA)
    lookup = FakeLookup({"ghost": [RequestException("404: no batch", 404)]})
    dim = lookup_unknown_batches(
        records, dim_df(spark), "t1", lookup, sleep=lambda s: None
    )
    assert dim.count() == 0  # nothing added
    out = validate_records(records, dim, notification_seq_col="offset")
    inv = out.invalid.collect()
    assert len(inv) == 1
    assert inv[0].failure == ERR_UNKNOWN_BATCH_ID
    assert out.counts.count() == 0


def test_lookup_4xx_aborts(spark):
    # :160-184 — unexpected 4xx error propagates
    records = spark.createDataFrame([rec("bad")], HRI_RECORD_SCHEMA)
    lookup = FakeLookup({"bad": [RequestException("401: denied", 401)]})
    with pytest.raises(FatalSinkError):
        lookup_unknown_batches(
            records, dim_df(spark), "t1", lookup, sleep=lambda s: None
        )


def test_lookup_deadline_aborts(spark):
    # :99-127 — retry timeout reached
    records = spark.createDataFrame([rec("slow")], HRI_RECORD_SCHEMA)
    lookup = FakeLookup({"slow": [RequestException("500: err", 500)] * 100})

    clock = {"now": 0.0}

    def sleep(s):
        clock["now"] += s * 3600

    with pytest.raises(FatalSinkError, match="Reached max"):
        lookup_unknown_batches(
            records, dim_df(spark), "t1", lookup,
            sleep=sleep, clock=lambda: clock["now"],
        )


def test_known_batches_skip_lookup(spark):
    records = spark.createDataFrame(
        [rec("known-b"), rec("new-b", offset=1)], HRI_RECORD_SCHEMA
    )
    lookup = FakeLookup({"new-b": [notif_dict("new-b")]})
    dim = lookup_unknown_batches(
        records, dim_df(spark, "known-b"), "t1", lookup, sleep=lambda s: None
    )
    # only the unknown id was queried; both batches now resolve
    assert lookup.calls == [("t1", "new-b")]
    out = validate_records(records, dim, notification_seq_col="offset")
    assert out.valid.count() == 2


def test_looked_up_notification_yields_to_real_one(spark):
    # seq -1 on fetched rows: a real notification arriving later (higher
    # offset) must win last-write-wins
    records = spark.createDataFrame([rec("b1")], HRI_RECORD_SCHEMA)
    lookup = FakeLookup({"b1": [notif_dict("b1", status=Status.STARTED)]})
    dim = lookup_unknown_batches(
        records, dim_df(spark), "t1", lookup, sleep=lambda s: None
    )
    real = dim_df(spark, "b1").withColumn("offset", F.lit(7).cast("long")).withColumn(
        "status", F.lit(Status.TERMINATED)
    )
    merged = dim.unionByName(real)
    out = validate_records(records, merged, notification_seq_col="offset")
    # TERMINATED (the real, later notification) wins -> silent drop
    assert out.valid.count() == 0
    assert out.invalid.count() == 0
