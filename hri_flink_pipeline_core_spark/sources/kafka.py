"""Kafka sources (data records + notifications).

Reference: BaseValidationJob.scala:222-236 (two FlinkKafkaConsumers) with
deserializers HriRecordDeserializer.scala:21-27 (pass-through bytes) and
NotificationDeserializer.scala:33-37 (lenient JSON -> BatchNotification).

Spark-first: ``spark.readStream.format("kafka")`` with
``includeHeaders=true`` already produces *exactly* the HriRecord shape
(key/value/topic/partition/offset/headers — SURVEY.md §1.1), so the data
source needs zero reshaping; the notification source is the same reader
plus a ``from_json`` projection. The reference's source-ordering hints
(150 ms fetch wait / parallelism 1 so metadata beats data,
BaseValidationJob.scala:79-81,170) are unnecessary under micro-batching:
each trigger joins records against *all* notifications seen so far.

Scale notes: one Kafka partition maps to one Spark input partition; set
``minPartitions`` to oversplit when #cores >> #partitions. maxOffsetsPerTrigger
bounds micro-batch size so a backlogged topic can't produce an
executor-OOM-sized batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BATCH_NOTIFICATION_SCHEMA

# Kafka client options mirroring createKafkaProperties
# (BaseValidationJob.scala:313-350). Spark's Kafka source/sink takes them
# with the "kafka." prefix.
def kafka_client_options(
    brokers: list[str],
    password: Optional[str] = None,
    group_id: Optional[str] = None,
) -> dict[str, str]:
    opts = {"kafka.bootstrap.servers": ",".join(brokers)}
    if password is not None:
        opts.update(
            {
                "kafka.sasl.jaas.config": (
                    "org.apache.kafka.common.security.plain.PlainLoginModule "
                    f'required username="token" password="{password}";'
                ),
                "kafka.security.protocol": "SASL_SSL",
                "kafka.sasl.mechanism": "PLAIN",
                "kafka.ssl.protocol": "TLSv1.2",
                "kafka.ssl.enabled.protocols": "TLSv1.2",
                "kafka.ssl.endpoint.identification.algorithm": "HTTPS",
            }
        )
    if group_id is not None:
        opts["kafka.group.id"] = group_id
    return opts


def producer_options() -> dict[str, str]:
    """Producer-side limits (BaseValidationJob.scala:330-347): zstd
    compression, 16 KB soft batch, 10 MB hard request cap (Event-Streams
    1 MB message-limit workaround), 15 min transaction timeout."""
    return {
        "kafka.compression.type": "zstd",
        "kafka.transaction.timeout.ms": "900000",
        "kafka.batch.size": "16384",
        "kafka.max.request.size": "10485760",
    }


def read_hri_records_stream(
    spark: SparkSession,
    topic: str,
    client_opts: dict[str, str],
    starting_offsets: str = "latest",
    max_offsets_per_trigger: Optional[int] = None,
    min_partitions: Optional[int] = None,
) -> DataFrame:
    """Data-record source (#1). The returned schema IS HriRecord:
    key BINARY, value BINARY, topic STRING, partition INT, offset LONG,
    headers ARRAY<STRUCT<key STRING, value BINARY>> (+ timestamp cols)."""
    reader = (
        spark.readStream.format("kafka")
        .options(**client_opts)
        .option("subscribe", topic)
        .option("includeHeaders", "true")
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load().select(
        "key", "value", "headers", "topic", "partition", "offset"
    )


def parse_notifications(raw: DataFrame) -> DataFrame:
    """Kafka rows -> BatchNotification columns + arrival seq.

    Lenient parse parity (NotificationDeserializer.scala:26-37): unknown
    JSON fields are ignored by from_json's schema projection; a null /
    unparseable value yields a null struct, which is dropped the way the
    reference's deserializer returns a null-value record that downstream
    ignores. ``offset`` is kept as the last-write-wins sequence column."""
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            BATCH_NOTIFICATION_SCHEMA,
            {"mode": "PERMISSIVE"},
        ).alias("n"),
        F.col("offset"),
    )
    return parsed.filter(F.col("n").isNotNull() & F.col("n.id").isNotNull()).select(
        "n.*", "offset"
    )


def read_notifications_stream(
    spark: SparkSession,
    topic: str,
    client_opts: dict[str, str],
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Notification source (#2). Reads the *full* notification topic by
    default (startingOffsets=earliest): the notification volume is tiny
    (one row per batch status change) and replaying it rebuilds the
    batch-metadata dim without external state."""
    raw = (
        spark.readStream.format("kafka")
        .options(**client_opts)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    return parse_notifications(raw)


def group_id(input_topic: str, output_topic: str) -> str:
    # BaseValidationJob.scala:327
    return f"hri-validation-{input_topic}-{output_topic}"
