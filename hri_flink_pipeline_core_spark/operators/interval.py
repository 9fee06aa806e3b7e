"""Interval (range) join: match point-in-time left rows to right rows
whose [start, end] interval contains them, per key.

Beyond the reference surface (SURVEY.md §2 lists interval joins as a
non-feature of the reference); standard training-data-pipeline operator
(e.g. attribute events to sessions/campaign windows). Oracle: plain
inequality join in DuckDB.

Scale design — Spark executes a raw inequality join as
BroadcastNestedLoopJoin (O(L×R) comparisons). The bucketized form turns
it into an equi-join:

1. pick a bucket width >= the longest interval,
2. each interval explodes into the (few) buckets it overlaps,
3. equi-join on (key, bucket) — a plain shuffled hash join with AQE
   skew handling,
4. exact containment filter on the survivors.

With bucket >= max interval length each interval covers <= 2 buckets, so
the explode factor is bounded by 2 and the join is shuffle-sized by the
true match density, not |L|x|R|.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 24 * 3600,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` joined to every ``right`` interval containing
    their ``time_col`` (inclusive bounds), equi-keyed on ``keys``.
    ``bucket_seconds`` must be >= the longest interval length."""
    keys = list(keys)

    def bucket_of(c):
        # cast first: TIMESTAMP_NTZ (zone-less parquet) is not a valid
        # unix_timestamp input; the UTC session makes the cast lossless.
        return F.floor(F.unix_timestamp(c.cast("timestamp")) / F.lit(bucket_seconds))

    l_b = left.withColumn("_bucket", bucket_of(F.col(time_col)))
    r_b = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(bucket_of(F.col(start_col)), bucket_of(F.col(end_col)))
        ),
    )
    joined = l_b.join(r_b, keys + ["_bucket"], how)
    return joined.filter(
        (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) <= F.col(end_col))
    ).drop("_bucket")
