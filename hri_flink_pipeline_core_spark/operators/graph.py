"""Iterative graph operators (north star: corpus-level link analysis —
domain authority weighting for training-data curation).

PageRank here follows the same cross-engine float discipline as the rest
of the oracle surface (BASELINE.md): every division/multiplication is a
pointwise IEEE-double op (deterministic and identical in Spark and
DuckDB), every aggregation is an order-independent integer sum of
explicitly quantized contributions — never a raw double sum, which is
partition-order dependent.

No reference counterpart (the reference has no graph ops); declared in
SURVEY §2.16.1 as an engine extension alongside connected components
(operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import checkpoint_small


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    base: float = 0.15,
    quantum: float = 1e12,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge set ``(src, dst)``
    -> ``(node, pagerank)``. Unnormalized start (pr0 = 1.0 per node);
    dangling mass is NOT redistributed (documented simplification — it
    rescales, not reorders, ranks on most graphs).

    Per iteration: one join edges⋈rank on src (edges pre-joined with
    out-degree once and persisted — the per-iteration join is against
    the small rank table), one partial-aggregating groupBy on dst, one
    left join back to the node list. Rank tables are persisted per
    iteration: each re-enters the next iteration's plan twice (contrib
    join + node join), and without the persist the lineage re-evaluates
    2^iterations times (see BASELINE.md persist rule).

    Determinism: the contribution pr/outdeg is quantized to an integer
    ``floor(x * quantum + 0.5)`` BEFORE summation, so the aggregate is
    an exact BIGINT sum in any partition order and any engine; the
    damped update then runs pointwise in double. Overflow bound:
    in-degree × quantum ≪ 2^63 for graphs up to ~10^6 in-degree at the
    default quantum.

    At 100 TB: edges bucket/persist partitioned by src so the
    per-iteration shuffle moves only the O(nodes) rank table; the
    groupBy(dst) partial-aggregates map-side. The data-dependent-
    convergence alternative (iterate until delta < eps) is the same
    loop with a driver-side stopping check on an aggregated delta.
    """
    # localCheckpoint (not persist) for every loop-referenced table:
    # persist caches execution but Catalyst still re-walks the full
    # edge-construction tree at each iteration's joins; flat LogicalRDD
    # leaves keep per-round analysis O(round) instead of O(history)
    # (round-5 CC rationale; reliable checkpoint() is the
    # executor-loss-resilient swap-in at cluster scale).
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    ed = edges.join(outdeg, "src")
    # Checkpoint the loop-invariant tables only when the loop is long
    # enough for repeated-subtree analysis to matter: at <=2 iterations
    # ReuseExchange dedups the repeated node/edge exchanges inside ONE
    # job, and the two checkpoint materialization job-sets are pure
    # overhead (measured 0.86 s -> 0.71 s end-to-end at sf0.1). Longer
    # loops re-reference both tables every round — there the flat leaf
    # keeps per-round analysis O(round) (round-5 CC rationale).
    if iterations > 2:
        nodes = nodes.transform(checkpoint_small)
        ed = ed.transform(checkpoint_small)

    rank = nodes.withColumn("pr", F.lit(1.0))
    for _i in range(iterations):
        contrib = ed.join(
            rank.select(F.col("node").alias("src"), "pr"), "src"
        ).select(
            "dst",
            F.floor(F.col("pr") / F.col("_d") * F.lit(quantum) + F.lit(0.5))
            .cast("long")
            .alias("_q"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("_q").alias("_sq"))
        rank = (
            nodes.join(sums.select(F.col("dst").alias("node"), "_sq"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_sq"), F.lit(0)) / F.lit(quantum))
                ).alias("pr"),
            )
        )
        # Checkpoint cadence (round 6): every 2nd intermediate round,
        # never the final one. Each rank is referenced twice by the
        # next round (contrib join + node join), so an uncheckpointed
        # round doubles the plan — bounded at 2x between checkpoints —
        # while each checkpoint costs a materialization job-set on a
        # kilobyte table (the BPE merge loop uses the same cadence,
        # measured round 5). For the fixed-2-iteration default this
        # removes ALL rank materializations: the whole refinement runs
        # as one job over the checkpointed nodes/ed leaves.
        if _i < iterations - 1 and (_i + 1) % 2 == 0:
            rank = rank.transform(checkpoint_small)
    return rank.select("node", F.col("pr").alias("pagerank"))
