#!/usr/bin/env python
"""Paired A/B: literal-centroid vs broadcast-join Lloyd rounds as a
function of k (VERDICT r9 #3 — calibrate LITERAL_MODEL_MAX_CELLS on
measured crossover, not cell count alone).

Each (mode, k) runs in its own subprocess (fresh JVM) via ab_common;
k is synthesized by relabeling embeddings label := vec_id % k, seeds
are the quantized label means (the q_kmeans_refine shape). 'join'
forces the fallback path by patching collect_model_rows to refuse.

Usage: python ab_kmeans.py [rounds] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
KS = [10, 16, 32, 64, 100]
MODES = ["literal", "join"]

_CHILD = """
import sys, time, json
sys.path.insert(0, %(repo)r)
mode, sf_dir = sys.argv[1], sys.argv[2]
from hri_flink_pipeline_core_spark.session import get_spark
from hri_flink_pipeline_core_spark.operators import similarity as S
from hri_flink_pipeline_core_spark.session import read_table
from pyspark.sql import functions as F
if mode == "join":
    S.collect_model_rows = lambda *a, **k: None
spark = get_spark("ab-kmeans-" + mode)
emb0 = read_table(spark, sf_dir, "embeddings")
def run(k):
    emb = emb0.select("vec_id", "embedding", (F.col("vec_id") %% k).alias("label"))
    cent0 = S._centroid_means(
        emb.select("label", "embedding"), ["label"], "embedding",
        S.quantized_mean_sql())
    assigned = S.kmeans_lloyd(emb, cent0, iters=2)
    out = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vec_id").alias("s"))
    return out.toPandas()
timings, sums = {}, {}
for k in %(ks)r:
    run(k)  # warm (JIT/codegen) per k
for p in range(2):
    for k in %(ks)r:
        t0 = time.perf_counter()
        df = run(k)
        t = time.perf_counter() - t0
        key = "k%%03d" %% k
        timings[key] = min(timings.get(key, t), t)
        sums[key] = [int(df.n.sum()), int(df.s.sum())]
print("AB_RESULT " + json.dumps({"mode": mode, "timings": timings,
                                 "errors": {}, "sums": sums}))
"""


def main() -> int:
    import ab_common

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    child = _CHILD % {"repo": _REPO_ROOT, "ks": KS}
    acc: dict[str, dict[str, float]] = {m: {} for m in MODES}
    err_acc: dict[str, dict[str, str]] = {}
    checks: dict[str, dict] = {}
    for r in range(rounds):
        for mode in MODES:
            d = ab_common.run_child(child, [mode, sf_dir])
            ab_common.accumulate(acc, mode, d["timings"], d.get("errors"), err_acc)
            # pin the first NON-EMPTY sums payload; a timed-out round 0
            # has no 'sums', and pinning {} would make the parity check
            # below vacuous or spuriously warn (round-10 review).
            if d.get("sums"):
                checks.setdefault(mode, d["sums"])
            print(json.dumps({"round": r, "mode": mode,
                              "total": round(sum(d["timings"].values()), 2)}),
                  flush=True)
    # both modes must produce identical cluster aggregates
    if checks.get("literal") != checks.get("join"):
        print("WARNING: literal/join aggregates differ!", checks, file=sys.stderr)
    ab_common.summarize(acc, [f"k{k:03d}" for k in KS], err_acc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
