"""As-of (temporal) join: for each left row, the latest right row with
the same key and right_time <= left_time.

Beyond the reference surface (SURVEY.md §2 explicitly lists as-of joins
as a non-feature of the reference); added for the training-data pipeline
surface. Oracle: DuckDB ``ASOF JOIN``.

Scale design — the naive form joins every left row to ALL earlier right
rows for its key and keeps the max (pair blow-up O(L x R/key)). The
union-window form used here never materializes pairs:

1. tag and union the two inputs on (key, time) — one dataset,
2. per key ordered by (time, right-first tiebreak), carry the most
   recent right row forward with ``last(ignore nulls)`` — ONE shuffle +
   sort per key, O(1) state per row,
3. keep the left rows.

This is the same shape Structured Streaming uses for stream-stream
interval joins and scales to arbitrarily dense right sides. Ties
(right_time == left_time) match, the same as DuckDB ASOF (>=).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _null_struct(fields: list[T.StructField]):
    """A typed NULL struct literal (so both union branches agree)."""
    dt = T.StructType(fields).simpleString()
    return F.lit(None).cast(dt)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join. Result: all left columns + the chosen right
    columns from the latest right row at-or-before the left row's time
    (nulls when no such row exists). ``right_tiebreak``: column that
    deterministically orders right rows sharing the same timestamp
    (highest wins) — without it, timestamp ties are arbitrary."""
    keys = list(keys)
    right_cols = list(
        right_cols
        or [c for c in right.columns if c not in keys and c != right_time]
    )

    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        _null_struct(right.select(*right_cols).schema.fields).alias("_r"),
    )
    tie = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak
        else F.lit(None).cast("long")
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(-1).alias("_side"),
        tie.alias("_tie"),
        _null_struct(left.schema.fields).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (_side=-1) sort before left rows at the same timestamp,
    # so a tie is visible to the left row (ASOF >= semantics); among
    # right rows at one timestamp the highest _tie is carried
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_r_latest", F.last("_r", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 0)
    return carried.select(
        F.col("_l.*"),
        *[F.col("_r_latest")[c].alias(c) for c in right_cols],
    )
