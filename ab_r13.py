"""Round-13 generic A/B evidence harness: shipped query vs variant(s),
identical-output asserted, interleaved min-of-N cold-cache timings
(same methodology as ab_r12.py).

Usage: python ab_r13.py <variant_name> <sf_dir> [rounds]
Variants live in VARIANTS below: name -> (query_key, variant_fn).
NOTE: for *_old variants the VARIANT is the pre-r13 shape and the
"shipped" leg is the new one — read the labels accordingly.
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as m
from hri_flink_pipeline_core_spark.operators import dedup as D
from hri_flink_pipeline_core_spark.operators import text as TX
from hri_flink_pipeline_core_spark.operators.cache import (
    release_persisted_intermediates,
)
from hri_flink_pipeline_core_spark.session import get_spark


def keep_best_agg_new(spark, sf_dir):
    """dedup_keep_best with the argmax as a max(struct) hash aggregate
    (the pq_encode/prefix_filter conversion). Output-identical; measured
    SLOWER than the shipped window form at sf0.1 (3.00 vs 2.88 s) and
    sf~1 (4.25 vs 4.10 s) — cluster partitions are tiny, the removed
    sort is cheaper than the struct build + double negation per member
    row. NOT shipped (round-13 negative result)."""
    docs = m._tp(spark, sf_dir, "documents")
    clusters = D.connected_components(D.minhash_lsh_candidates(docs))
    quality = docs.select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    j = clusters.join(quality, "doc_id")
    agg = j.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("quality").alias("q"),
                (-F.col("doc_id")).alias("nid"),
            )
        ).alias("_best"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return agg.select(
        "cluster_id",
        (-F.col("_best.nid")).alias("kept_doc_id"),
        F.col("_best.q").alias("kept_quality"),
        "n_members",
    )


VARIANTS = {
    "keep_best_agg_new": ("dedup_keep_best", keep_best_agg_new),
}


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    key, cand = VARIANTS[name]
    spark = get_spark(f"ab-{name}")
    qs = m.queries()

    old = qs[key](spark, sf_dir).toPandas()
    release_persisted_intermediates()
    spark.catalog.clearCache()
    new = cand(spark, sf_dir).toPandas()
    release_persisted_intermediates()
    spark.catalog.clearCache()
    cols = sorted(old.columns)
    assert list(old.columns) == list(new.columns), (old.columns, new.columns)
    assert old[cols].sort_values(by=cols, ignore_index=True).equals(
        new[cols].sort_values(by=cols, ignore_index=True)
    ), (old, new)
    print("MATCH")

    res = {"shipped": 9e9, "variant": 9e9}
    for _ in range(rounds):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).toPandas()
        res["shipped"] = min(res["shipped"], time.perf_counter() - t0)
        release_persisted_intermediates()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cand(spark, sf_dir).toPandas()
        res["variant"] = min(res["variant"], time.perf_counter() - t0)
        release_persisted_intermediates()
    print("RESULT", name, sf_dir, {k: round(v, 3) for k, v in res.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
