"""Kafka sink record shapes (the three serializers).

Reference:
- HriRecordSerializer.scala:24-26 — pass-through key/value, headers
  preserved end-to-end.
- InvalidRecordSerializer.scala:25-42 — InvalidRecord JSON value, null
  key, ONE header (batchId, when present), and a **null partition** (the
  source partition is not the sink topic's partition).
- NotificationSerializer.scala:35-38 — BatchNotification JSON value.

These are pure column projections: given the DataFrames produced by
``validate_records`` / the tracker, they emit exactly the columns Spark's
Kafka sink consumes (key BINARY, value BINARY, headers ARRAY<STRUCT>,
topic STRING). Writing is at-least-once in Spark; effective exactly-once
comes from record identity — every valid record carries its source
(topic, partition, offset) so downstream consumers can idempotently
dedupe on it, and the batch tracker's terminal notification is
at-most-once by state flag (Tracker.scala:187-194). See
streaming/pipeline.py for the checkpointing discipline.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hri_record_sink(valid: DataFrame, topic: str) -> DataFrame:
    """Valid-record (*.out) sink rows: pass-through bytes + headers
    (HriRecordSerializer.scala:24-26). The source key is preserved so the
    output topic partitions by the same key distribution."""
    return valid.select(
        "key", "value", "headers", F.lit(topic).alias("topic")
    )


def invalid_record_sink(invalid: DataFrame, topic: str) -> DataFrame:
    """Invalid-record (*.invalid) sink rows
    (InvalidRecordSerializer.scala:25-42): JSON InvalidRecord value, null
    key, batchId header when present, partition left to the producer."""
    value = F.encode(
        F.to_json(
            F.struct(
                F.col("failure"),
                F.col("topic"),
                F.col("partition"),
                F.col("offset"),
                F.col("batchId"),
            )
        ),
        "UTF-8",
    )
    headers = F.when(
        F.col("batchId").isNotNull(),
        F.array(
            F.struct(
                F.lit("batchId").alias("key"),
                F.encode(F.col("batchId"), "UTF-8").alias("value"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<key:string,value:binary>>"))
    return invalid.select(
        F.lit(None).cast("binary").alias("key"),
        value.alias("value"),
        headers.alias("headers"),
        F.lit(topic).alias("topic"),
    )


def notification_sink(notifications: DataFrame, topic: str) -> DataFrame:
    """Notification loopback sink rows (NotificationSerializer.scala:35-38,
    BaseValidationJob.scala:273-286): BatchNotification JSON value, keyed
    by batch id so the topic stays ordered per batch."""
    id_col = "batchId" if "batchId" in notifications.columns else "id"
    if "notification" in notifications.columns:
        # tracker terminal output: the merged BatchNotification is already
        # JSON (streaming/tracker_stream.py) — emit it verbatim so the
        # loopback feeds a parseable notification back to the topic
        value = F.encode(F.col("notification"), "UTF-8")
    else:
        cols = [c for c in notifications.columns if c != "offset"]
        value = F.encode(F.to_json(F.struct(*cols)), "UTF-8")
    return notifications.select(
        F.encode(F.col(id_col).cast("string"), "UTF-8").alias("key"),
        value.alias("value"),
        F.lit(topic).alias("topic"),
    )


def write_kafka_batch(
    df: DataFrame, bootstrap_servers: str, extra_options: Optional[dict] = None
) -> None:
    """Batch write of pre-shaped sink rows (used inside foreachBatch).
    Headers are passed through when the DataFrame has them."""
    writer = (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("includeHeaders", "true")
    )
    for k, v in (extra_options or {}).items():
        writer = writer.option(k, v)
    writer.save()
