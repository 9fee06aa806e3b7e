"""Event-time windowed aggregation (north-star streaming extras).

The same DataFrame code runs in batch and Structured Streaming (with
``withWatermark`` bounding state in the streaming case — see
streaming/validation_job.py). Batch mode is what the DuckDB oracle
checks; the reference itself has NO event-time windows (SURVEY §2,
explicit non-feature), so these generalize it.

Scale: tumbling/sliding windows are plain groupBy shuffles on
(window, key) — partial aggregation applies, so the shuffle is
O(#windows x #keys x #tasks). Session windows shuffle on the key then
merge sessions within the partition (Spark's session_window does the
merge natively)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsum(col: Column) -> Column:
    """Decimal-exact double sum (order-independent, cross-engine)."""
    return F.sum(col.cast("decimal(18,4)")).cast("double")


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    win = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col(value_col)).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    win = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col(value_col)).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Session windows: merge events within ``gap`` of each other per key;
    session end = last event + gap (Spark session_window semantics)."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col(value_col)).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_us: int = 600_000_000,
) -> DataFrame:
    """Batch sessionization with explicit session ids: gap-boundary flag
    (lag over the key partition) -> running-sum session id -> per-session
    aggregate. All three windows and the final groupBy share the key
    partitioning, so the whole chain is a single hash Exchange. The gap
    test compares integer microseconds (exact cross-engine); the value
    sum accumulates in DECIMAL (order-independent).

    Batch twin of the streaming session_window aggregation (reference
    has no event-time sessions at all — Tracker is processing-time only,
    Tracker.scala:58,118; this is north-star surface)."""
    from pyspark.sql import Window as SW

    w = SW.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    # unix_micros requires TIMESTAMP (with zone); parquet written without a
    # zone reads back as TIMESTAMP_NTZ and would raise DATATYPE_MISMATCH.
    # The session pins UTC, so NTZ -> LTZ cast is value-preserving.
    is_new = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_us
        ),
        1,
    ).otherwise(0)
    flagged = df.select(
        key_col, id_col, ts_col, value_col, is_new.alias("is_new")
    )
    sess = F.sum("is_new").over(
        SW.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(SW.unboundedPreceding, SW.currentRow)
    )
    with_id = flagged.withColumn("session_id", sess)
    return with_id.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )
