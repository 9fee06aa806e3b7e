"""Relational operator surface (SURVEY.md §2.16).

Each operator is a thin, named composition of DataFrame primitives so the
logical plan stays fully declarative — Catalyst gets predicate pushdown,
column pruning, join selection, and whole-stage codegen for free. The
value of naming them is (a) parity bookkeeping against the reference's
operator inventory and (b) a stable seam where scale policy lives
(broadcast vs shuffle, salting, partial aggregation).

Reference derivations are cited per function.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --- projection / filtering (reference #4 record reshaping, #5 routing) -----

def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """`project` — column pruning reaches the scan (check ReadSchema)."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """`filter` — predicate pushdown reaches the scan (check PushedFilters)."""
    return df.filter(predicate)


def route(df: DataFrame, routes: dict[str, Column]) -> dict[str, DataFrame]:
    """`route` — multi-way split: N filtered projections of ONE annotated
    DataFrame (Flink side-output parity, ValidationProcessFunction.scala
    output tags). Caller persists `df` before fan-out when each branch is
    written separately (see streaming.validation_job)."""
    return {name: df.filter(pred) for name, pred in routes.items()}


# --- joins (reference #3 broadcast state; generalized per §2.16) ------------

def join_broadcast(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """`join.broadcast` — replicate the small side to every task; no
    shuffle of the fact stream (BroadcastHashJoinExec). The Spark analogue
    of the reference's broadcast map-state (BaseValidationJob.scala:171)."""
    return fact.join(F.broadcast(dim), on, how)


def join_shuffle(
    left: DataFrame, right: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """`join.shuffle` — both sides hash-partition on the key (sort-merge or
    shuffled-hash chosen by Catalyst/AQE; AQE converts to broadcast at
    runtime if a side turns out small, and splits skewed partitions)."""
    return left.join(right, on, how)


def join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """`join.salted` — explicit skew mitigation for a hot key when AQE's
    runtime skew-join isn't available (e.g. inside foreachBatch on older
    configs): salt the big side, explode the small side.

    ``force_shuffle`` pins a shuffle-hash join (hint on the exploded
    side); without it Catalyst may broadcast a small dim, which is the
    right plan but leaves the salting path unexercised."""
    salted_left = left.withColumn(
        "_salt", (F.pmod(F.hash(F.monotonically_increasing_id()), salt_buckets))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    if force_shuffle:
        salted_right = salted_right.hint("shuffle_hash")
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


# --- aggregation (reference #9 Tracker counters) -----------------------------

def count_by_key(
    df: DataFrame, keys: Sequence[str], invalid_cond: Optional[Column] = None
) -> DataFrame:
    """`agg.count_by_key` — per-key totals with an optional flagged-subset
    count; partial (map-side) aggregation shrinks the shuffle to
    O(keys × tasks) (Tracker.scala:48-69 counters, distributed)."""
    aggs = [F.count(F.lit(1)).alias("record_count")]
    if invalid_cond is not None:
        aggs.append(F.sum(F.when(invalid_cond, 1).otherwise(0)).alias("invalid_count"))
    return df.groupBy(*keys).agg(*aggs)


def threshold_trigger(
    counted: DataFrame, count_col: str, threshold: Column | int
) -> DataFrame:
    """`agg.threshold_trigger` — HAVING-style post-agg filter
    (Tracker.scala:153-162 fail-at-threshold, relational form)."""
    thr = F.lit(threshold) if isinstance(threshold, int) else threshold
    return counted.filter(F.col(count_col) >= thr)


# --- per-key ordering (reference broadcast-state last-write-wins) ------------

def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str, desc: bool = True
) -> DataFrame:
    """`latest_per_key` — last-write-wins per key
    (ValidationProcessFunction.scala:223 map-state put). max_by aggregation
    (single partial-aggregating shuffle, no sort) rather than a
    row_number window (which would sort every partition)."""
    order = F.col(order_col) if desc else -F.col(order_col)
    others = [c for c in df.columns if c not in keys]
    return df.groupBy(*keys).agg(*[F.max_by(c, order).alias(c) for c in others])


def top_k_per_key(
    df: DataFrame, keys: Sequence[str], order_col: Column | str, k: int
) -> DataFrame:
    """`topk_per_key` — rank-limited window; AQE + partial top-k pushdown
    (Spark inserts a per-partition Limit before the shuffle for
    row_number+filter plans)."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*keys).orderBy(order.desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def dedup_exact(df: DataFrame, keys: Optional[Sequence[str]] = None) -> DataFrame:
    """`dedup` (exact) — hash-aggregate on the key columns (or all
    columns). dropDuplicates = groupBy+first, partial-agg friendly."""
    return df.dropDuplicates(list(keys) if keys else None)


# --- table maintenance (north star: incremental corpus refresh) --------------

def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """`merge.upsert` — MERGE INTO semantics without a table format:
    rows from ``updates`` win on key collision; unmatched ``base`` rows
    pass through. Generalizes the reference's last-write-wins broadcast
    state (ValidationProcessFunction.scala:215-224) from a keyed map to a
    whole table refresh.

    Plan: one anti-join (base ⟕̸ updates on keys) + union. Both sides
    hash-partition on the keys — at 100 TB, bucket both tables on the
    merge keys so the anti-join is co-located and Exchange-free; the
    union is partition-local either way. AQE broadcasts `updates`
    when the delta is small (the common incremental-refresh case)."""
    survivors = base.join(updates.select(*keys), list(keys), "left_anti")
    return survivors.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """`cdc.snapshot_diff` — change-data-capture between two snapshots:
    full-outer join on the keys, classify each key as insert / delete /
    update (any compare column differs) / unchanged, and emit the
    changed rows with old/new values side by side.

    Scale: one full-outer shuffle join on the keys (or zero Exchanges if
    both snapshots are bucketed on them); null-safe equality (`eqNullSafe`)
    so NULL→value transitions register as updates."""
    keys = list(keys)
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    for c in keys + list(compare_cols):
        o = o.withColumnRenamed(c, f"_o_{c}")
        n = n.withColumnRenamed(c, f"_n_{c}")
    cond = None
    for k in keys:
        e = o[f"_o_{k}"] == n[f"_n_{k}"]
        cond = e if cond is None else (cond & e)
    j = o.join(n, cond, "full_outer")
    old_present = F.coalesce(*[j[f"_o_{k}"].isNotNull() for k in keys], F.lit(False))
    new_present = F.coalesce(*[j[f"_n_{k}"].isNotNull() for k in keys], F.lit(False))
    changed = None
    for c in compare_cols:
        d = ~j[f"_o_{c}"].eqNullSafe(j[f"_n_{c}"])
        changed = d if changed is None else (changed | d)
    change = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("change_type", change).filter(F.col("change_type") != "unchanged")
    sel = [F.coalesce(out[f"_o_{k}"], out[f"_n_{k}"]).alias(k) for k in keys]
    sel.append(F.col("change_type"))
    for c in compare_cols:
        sel.append(out[f"_o_{c}"].alias(f"old_{c}"))
        sel.append(out[f"_n_{c}"].alias(f"new_{c}"))
    return out.select(*sel)


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    id_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """2-D Pareto frontier (skyline): rows p for which no q has
    q.min <= p.min AND q.max >= p.max with at least one strict; exact
    (min, max) duplicates keep the minimum id only.

    Two-pass distributed shape: pass 1 computes each hash-partition's
    local frontier (partitioned sort + exclusive running max of the
    maximize column); because any globally non-dominated row is locally
    non-dominated and dominance is transitive, the survivors contain
    the global frontier. Pass 2 applies the same rule globally over the
    tiny survivor set — the only single-task window never sees the full
    input. Equivalent to the direct global rule: in sort order
    (min asc, max desc, id asc), a row's exclusive running max of the
    maximize column is >= its own value iff some earlier row weakly
    dominates it."""
    order = [
        F.col(minimize_col).asc(),
        F.col(maximize_col).desc(),
        F.col(id_col).asc(),
    ]

    def keep(d: DataFrame, w) -> DataFrame:
        best_prev = F.max(maximize_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            d.withColumn("_bp", best_prev)
            .filter(F.col("_bp").isNull() | (F.col(maximize_col) > F.col("_bp")))
            .drop("_bp")
        )

    salted = df.withColumn("_salt", F.pmod(F.col(id_col), F.lit(n_salt)))
    local = keep(salted, Window.partitionBy("_salt").orderBy(*order)).drop("_salt")
    return keep(local, Window.orderBy(*order))
