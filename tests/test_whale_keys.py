"""Whale-key (hot-key) bounded-state guards.

VERDICT.md r7 "What's wrong #4": the round-7 funnel/retention rewrites
collected every event of a user into one agg-buffer array, so a whale
key (bot traffic) at 100x scale OOMs one executor with no diagnostic.
Round 8 replaced the funnel's collect_list with running-min window
aggregates (O(1) per-user state, spillable sort — __spark_entry__.
_funnel_user_steps); retention's collect_set is intrinsically bounded
by the number of distinct calendar weeks in the data's time range.

The funnel guard here runs 1 user x 4M events through the REAL
implementation inside a separate 512 MB-driver Spark JVM. The size is
DISCRIMINATING, not symbolic (round-8 review finding): at 4M events /
512 MB the round-7 collect_list shape dies with java.lang.
OutOfMemoryError (Java heap space) while the running-min shape
completes in ~15 s — measured both ways before pinning these numbers;
200k events passed under BOTH shapes and guarded nothing. Rows are
generated JVM-side (spark.range) so the test measures the agg path,
not createDataFrame serialization.
"""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F

# repo root from __file__, not a hardcoded path, so the subprocess
# imports THIS checkout's code in CI/worktrees too (ADVICE r8)
_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parents[1])

_WHALE_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import __spark_entry__ as entrymod

spark = (
    SparkSession.builder.master("local[2]")
    .appName("whale-funnel")
    .config("spark.driver.memory", "512m")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# 4M events: the size at which the former per-user collect_list shape
# OOMs this 512 MB JVM (measured) — a smaller whale passes both shapes
# and guards nothing
n = 4_000_000
# one whale user; event i at time i us, types cycling view/click/purchase
ev = spark.range(n).select(
    F.lit(1).alias("user_id"),
    F.element_at(
        F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    ).alias("event_type"),
    F.col("id").alias("tus"),
)
row = entrymod._funnel_user_steps(ev).collect()
assert len(row) == 1, row
r = row[0]
# t_view = 0 (id 0 is a view); earliest click after 0 is id 1;
# earliest purchase after 1 is id 2
assert (r.t_view, r.t_click, r.t_purchase) == (0, 1, 2), r
print("WHALE_OK")
spark.stop()
"""


def test_funnel_whale_user_completes_in_bounded_memory():
    out = subprocess.run(
        [sys.executable, "-c", _WHALE_SCRIPT % {"repo": _REPO_ROOT}],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WHALE_OK" in out.stdout


def test_funnel_whale_user_correct_in_session(spark):
    """Same whale through the shared session, stricter value check:
    interleave non-qualifying early clicks/purchases before the first
    view so the strictly-after logic is exercised at volume."""
    import __spark_entry__ as entrymod

    n = 200_000
    ev = spark.range(n).select(
        F.lit(7).alias("user_id"),
        # ids 0..9: purchases (never qualify — before any click);
        # id 10: the only view; ids 11+: clicks then purchases cycling
        F.when(F.col("id") < 10, F.lit("purchase"))
        .when(F.col("id") == 10, F.lit("view"))
        .when(F.pmod(F.col("id"), F.lit(2)) == 1, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        F.col("id").alias("tus"),
    )
    r = entrymod._funnel_user_steps(ev).collect()[0]
    # first view at 10; first click after 10 is the first odd id > 10 = 11;
    # first purchase after 11 is the first even id > 11 = 12
    assert (r.t_view, r.t_click, r.t_purchase) == (10, 11, 12), r
