"""Port of the serialization round-trip tier (HriRecordSerializerTest,
InvalidRecordSerializerTest, NotificationSerializerTest,
BaseValidationJobPropertiesTest): Kafka sink row shapes, null/UTF-8
preservation, topic derivation, client options.
"""

import json

import pytest

from pyspark.sql import Row

from hri_flink_pipeline_core_spark.schemas import (
    HRI_RECORD_SCHEMA,
    INVALID_RECORD_SCHEMA,
)
from hri_flink_pipeline_core_spark.sinks import kafka as ksink
from hri_flink_pipeline_core_spark.sources import kafka as ksource
from hri_flink_pipeline_core_spark.topics import TopicNamingException, derive_topics


# --- topic derivation (BaseValidationJobPropertiesTest.scala:32-111) -------

def test_topic_derivation_four_segments():
    t = derive_topics("ingest.tenant1.dataint1.in")
    assert t.output_topic == "ingest.tenant1.dataint1.out"
    assert t.invalid_topic == "ingest.tenant1.dataint1.invalid"
    assert t.notification_topic == "ingest.tenant1.dataint1.notification"
    assert t.tenant_id == "tenant1"


def test_topic_derivation_with_qualifier():
    t = derive_topics("ingest.tenant1.dataint1.qual.in")
    assert t.output_topic == "ingest.tenant1.dataint1.qual.out"
    assert t.notification_topic == "ingest.tenant1.dataint1.qual.notification"
    assert t.tenant_id == "tenant1"


@pytest.mark.parametrize(
    "bad",
    [
        "ingest.tenant1.dataint1",        # no .in
        "bad.tenant1.dataint1.in",        # wrong prefix
        "ingest.tenant1.in",              # too few segments
        "ingest..dataint1.in",            # empty segment
    ],
)
def test_topic_derivation_rejects(bad):
    with pytest.raises(TopicNamingException):
        derive_topics(bad)


def test_group_id_and_client_options():
    # BaseValidationJob.scala:313-350
    assert (
        ksource.group_id("ingest.t.d.in", "ingest.t.d.out")
        == "hri-validation-ingest.t.d.in-ingest.t.d.out"
    )
    opts = ksource.kafka_client_options(["b1:9092", "b2:9092"], "pw")
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert 'password="pw"' in opts["kafka.sasl.jaas.config"]
    prod = ksource.producer_options()
    assert prod["kafka.compression.type"] == "zstd"
    assert prod["kafka.max.request.size"] == "10485760"
    assert prod["kafka.batch.size"] == "16384"
    assert prod["kafka.transaction.timeout.ms"] == "900000"


# --- HriRecord pass-through sink (HriRecordSerializerTest) -----------------

def test_hri_record_sink_passthrough_and_nulls(spark):
    rows = [
        Row(key=b"k1", value='{"中":"文"}'.encode(),
            headers=[Row(key="passThru", value="值".encode())],
            topic="ingest.t.d.in", partition=0, offset=1),
        Row(key=None, value=None, headers=None,
            topic="ingest.t.d.in", partition=0, offset=2),
    ]
    df = spark.createDataFrame(rows, HRI_RECORD_SCHEMA)
    out = ksink.hri_record_sink(df, "ingest.t.d.out").collect()
    assert [r.topic for r in out] == ["ingest.t.d.out"] * 2
    by_key = {bytes(r.key) if r.key is not None else None: r for r in out}
    assert bytes(by_key[b"k1"].value).decode() == '{"中":"文"}'
    assert {h.key: bytes(h.value).decode() for h in by_key[b"k1"].headers} == {
        "passThru": "值"
    }
    # null key/value/headers preserved (HriRecordDeserializerTest "Null
    # key/body should be preserved")
    assert by_key[None].value is None
    assert by_key[None].headers is None


# --- InvalidRecord sink (InvalidRecordSerializerTest) ----------------------

def test_invalid_record_sink_shape(spark):
    rows = [
        Row(failure="Invalid JSON", topic="ingest.t.d.in", partition=3,
            offset=42, batchId="b-中文"),
        Row(failure="Bad Message - No header or batchId node",
            topic="ingest.t.d.in", partition=1, offset=7, batchId=None),
    ]
    df = spark.createDataFrame(rows, INVALID_RECORD_SCHEMA)
    out = ksink.invalid_record_sink(df, "ingest.t.d.invalid").collect()
    by_off = {json.loads(bytes(r.value))["offset"]: r for r in out}

    r42 = by_off[42]
    assert r42.key is None  # null key (InvalidRecordSerializer.scala:33)
    payload = json.loads(bytes(r42.value).decode())
    # value is the InvalidRecord JSON with SOURCE topic/partition/offset
    assert payload == {
        "failure": "Invalid JSON", "topic": "ingest.t.d.in",
        "partition": 3, "offset": 42, "batchId": "b-中文",
    }
    # batchId header added, UTF-8 (InvalidRecordSerializer.scala:34-38)
    assert {h.key: bytes(h.value).decode() for h in r42.headers} == {
        "batchId": "b-中文"
    }
    assert r42.topic == "ingest.t.d.invalid"

    # no batchId -> no header (Option guard :35-37)
    assert list(by_off[7].headers) == []


# --- Notification sink + lenient parse (NotificationSerializerTest,
#     NotificationDeserializerTest) ----------------------------------------

def test_notification_sink_and_reparse_roundtrip(spark):
    from hri_flink_pipeline_core_spark.schemas import BATCH_NOTIFICATION_SCHEMA
    from pyspark.sql import functions as F

    n = Row(
        id="b1", name="名字", topic="ingest.t.d.in", dataType="claims",
        status="completed", startDate=None, endDate=None,
        expectedRecordCount=5, actualRecordCount=5, invalidRecordCount=0,
        invalidThreshold=-1, failureMessage=None, metadata={"k": "中"},
    )
    df = spark.createDataFrame([n], BATCH_NOTIFICATION_SCHEMA).withColumn(
        "offset", F.lit(0).cast("long")
    )
    sunk = ksink.notification_sink(df, "ingest.t.d.notification").collect()[0]
    assert bytes(sunk.key).decode() == "b1"
    assert sunk.topic == "ingest.t.d.notification"

    # feed the serialized bytes back through the source-side parser
    raw = spark.createDataFrame(
        [Row(value=bytes(sunk.value), offset=9)], "value binary, offset long"
    )
    parsed = ksource.parse_notifications(raw).collect()[0]
    assert parsed.id == "b1"
    assert parsed.name == "名字"
    assert parsed.status == "completed"
    assert parsed.expectedRecordCount == 5
    assert parsed.metadata == {"k": "中"}
    assert parsed.offset == 9


def test_parse_notifications_lenient_and_null_safe(spark):
    from pyspark.sql import Row as R

    rows = [
        R(value=json.dumps(
            {"id": "b1", "status": "started", "unknownField": {"x": 1}}
        ).encode(), offset=0),       # unknown fields ignored (lenient)
        R(value=None, offset=1),     # null value dropped
        R(value=b"not json at all", offset=2),  # unparseable dropped
        R(value=b"{}", offset=3),    # parseable but no id -> dropped
    ]
    df = spark.createDataFrame(rows, "value binary, offset long")
    out = ksource.parse_notifications(df).collect()
    assert len(out) == 1
    assert out[0].id == "b1"
    assert out[0].status == "started"
