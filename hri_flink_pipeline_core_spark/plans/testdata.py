"""Adapters turning the driver testdata (TESTDATA.md / FIXTURES.md §6) into
the reference's record shapes, in BOTH Spark and equivalent ANSI SQL, so
validation/tracker semantics are oracle-checkable end-to-end.

The `events` table plays hri_records:
  batch_id  := 'batch-' || user_id % 50      (headers: [('batchId', bytes)])
  payload   := props (JSON string) as bytes; every 7th event corrupted
  topic/partition/offset := literal topic / user_id % 8 / event_id

A 50-row notification dim is derived deterministically from the batch id:
  status cycles started/sendCompleted/completed/failed/terminated by
  batch_num % 5, so every routing rule fires; batches 40+ get NO
  notification row (unknown-batchId path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import Status
from ..session import read_table, spread

N_BATCHES = 50
KNOWN_BATCHES = 40  # batches >= this have no notification (unknown batchId)
TOPIC = "ingest.t1.data-int1.in"

_STATUS_CYCLE = (
    Status.STARTED,
    Status.SEND_COMPLETED,
    Status.COMPLETED,
    Status.FAILED,
    Status.TERMINATED,
)


def hri_records_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> HRI_RECORD_SCHEMA-shaped DataFrame (pure expressions)."""
    ev = spread(read_table(spark, sf_dir, "events"))
    batch_num = F.col("user_id") % N_BATCHES
    batch_id = F.concat(F.lit("batch-"), batch_num.cast("string"))
    payload = F.when(F.col("event_id") % 7 == 0, F.lit("not-json")).otherwise(
        F.col("props")
    )
    missing_header = F.col("event_id") % 101 == 0  # exercise rule 1
    headers = F.when(missing_header, F.lit(None)).otherwise(
        F.array(
            F.struct(
                F.lit("batchId").alias("key"),
                F.encode(batch_id, "UTF-8").alias("value"),
            )
        )
    )
    return ev.select(
        F.encode(F.col("event_id").cast("string"), "UTF-8").alias("key"),
        F.encode(payload, "UTF-8").alias("value"),
        headers.alias("headers"),
        F.lit(TOPIC).alias("topic"),
        (F.col("user_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
    )


def notifications_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 40-row BatchNotification dim (batches 0..39)."""
    status = F.element_at(
        F.array(*[F.lit(s) for s in _STATUS_CYCLE]),
        (F.col("batch_num") % 5 + 1).cast("int"),
    )
    return (
        spark.range(KNOWN_BATCHES)
        .withColumnRenamed("id", "batch_num")
        .select(
            F.concat(F.lit("batch-"), F.col("batch_num").cast("string")).alias("id"),
            F.concat(F.lit("batch "), F.col("batch_num").cast("string")).alias("name"),
            F.lit(TOPIC).alias("topic"),
            F.lit("claims").alias("dataType"),
            status.alias("status"),
            F.lit(None).cast("timestamp").alias("startDate"),
            F.lit(None).cast("timestamp").alias("endDate"),
            (F.col("batch_num") * 10).cast("int").alias("expectedRecordCount"),
            F.lit(None).cast("int").alias("actualRecordCount"),
            F.lit(None).cast("int").alias("invalidRecordCount"),
            F.when(F.col("batch_num") % 3 == 0, F.lit(5))
            .otherwise(F.lit(-1))
            .cast("int")
            .alias("invalidThreshold"),
            F.lit(None).cast("string").alias("failureMessage"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.col("batch_num").cast("long").alias("offset"),
        )
        .drop("batch_num")
    )


# The same derivation in ANSI SQL (DuckDB), used inside oracle queries.
# status cycle by batch_num % 5; batches >= KNOWN_BATCHES are unknown.
SQL_ANNOTATED_EVENTS = f"""
  SELECT
    e.event_id,
    CASE WHEN e.event_id % 101 = 0 THEN NULL
         ELSE 'batch-' || CAST(e.user_id % {N_BATCHES} AS VARCHAR) END AS batch_id,
    CASE WHEN e.event_id % 101 = 0 THEN NULL
         WHEN e.user_id % {N_BATCHES} >= {KNOWN_BATCHES} THEN NULL
         ELSE CASE CAST(e.user_id % {N_BATCHES} AS INTEGER) % 5
                WHEN 0 THEN '{Status.STARTED}'
                WHEN 1 THEN '{Status.SEND_COMPLETED}'
                WHEN 2 THEN '{Status.COMPLETED}'
                WHEN 3 THEN '{Status.FAILED}'
                WHEN 4 THEN '{Status.TERMINATED}'
              END END AS status,
    CASE WHEN e.event_id % 7 = 0 THEN 'not-json' ELSE e.props END AS payload
  FROM events e
"""

SQL_ROUTED_EVENTS = f"""
  SELECT *,
    CASE
      WHEN batch_id IS NULL THEN 'invalid'
      WHEN status IS NULL THEN 'invalid'
      WHEN status IN ('{Status.TERMINATED}', '{Status.FAILED}') THEN 'drop'
      WHEN status = '{Status.COMPLETED}' THEN 'invalid'
      WHEN json_valid(payload) THEN 'valid'
      ELSE 'invalid'
    END AS route,
    (batch_id IS NOT NULL AND status IS NOT NULL
     AND status NOT IN ('{Status.TERMINATED}', '{Status.FAILED}', '{Status.COMPLETED}'))
      AS emit_count
  FROM ({SQL_ANNOTATED_EVENTS})
"""
