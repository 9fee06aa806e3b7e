"""Paired A/B for prefix_filter_pairs' verify leg (VERDICT r8 "Next
round" #5): the physical plan shows the candidate-doc shingle-set build
(rows ⋈ broadcast(cand_ids) semi-join -> collect_set aggregate) running
TWICE — once per side of the verification join (differing downstream
aliases defeat ReuseExchange; 4 ObjectHashAggregate pipelines, 0
ReusedExchange at sf0.01). Mode B checkpoints sets_df so the semi-join
+ aggregate materializes once and both verify sides read the cached
rows.

Mode A = current (sets_df re-derived per side). Mode B = sets_df
checkpointed. Fresh JVM per mode via bench._run_names; modes alternate
in one epoch. minhash_lsh_pairs rides as the code-identical anchor.

Usage: python ab_prefix.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NAMES = ["prefix_filter_pairs", "minhash_lsh_pairs"]

_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parent)

_CHILD = r'''
import json, sys
sys.path.insert(0, %(repo)r)
mode = sys.argv[1]
from hri_flink_pipeline_core_spark.session import get_spark
spark = get_spark("ab-prefix")

if mode == "B":
    from pyspark.sql import functions as F
    from hri_flink_pipeline_core_spark.operators import dedup as D
    from hri_flink_pipeline_core_spark.operators.cache import checkpoint_small
    from hri_flink_pipeline_core_spark.operators.text import shingle_str_rows

    def prefix_filter_pairs_b(df, text_col="text", id_col="doc_id",
                              k=5, threshold=0.5):
        assert 0.0 < threshold <= 1.0
        rows = (
            shingle_str_rows(df, text_col, id_col, k)
            .select("doc_id", "shingle")
            .distinct()
            .transform(checkpoint_small)
        )
        dfreq = rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        ranked = rows.join(dfreq, "shingle")
        num, den = threshold.as_integer_ratio()
        per_doc = ranked.groupBy("doc_id").agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("_ss")
        )
        plen = F.expr(
            f"size(_ss) - ((CAST(size(_ss) AS DECIMAL(38,0)) * {num}"
            f" + {den - 1}) div {den}) + 1"
        ).cast("int")
        prefix = (
            per_doc.withColumn("_plen", plen)
            .select(
                "doc_id",
                F.explode(
                    F.expr("transform(slice(_ss, 1, _plen), x -> x.shingle)")
                ).alias("shingle"),
            )
            .transform(checkpoint_small)
        )
        cand = (
            prefix.alias("a")
            .join(prefix.alias("b"), "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        ).transform(checkpoint_small)
        cand_ids = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sets_df = (
            rows.join(F.broadcast(cand_ids), "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("sh"))
            .transform(checkpoint_small)  # <-- the one change vs mode A
        )
        left = sets_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        right = sets_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        joined = cand.join(left, "doc_a").join(right, "doc_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        jac = inter / F.greatest(union, F.lit(1))
        return joined.select(
            "doc_a", "doc_b", jac.alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)

    D.prefix_filter_pairs = prefix_filter_pairs_b

import bench
timings, errors = bench._run_names(%(names)r)
print("AB_RESULT " + json.dumps({"mode": mode, "timings": timings, "errors": errors}))
'''


def run_mode(mode: str) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "-c",
         _CHILD % {"names": NAMES, "repo": _REPO_ROOT}, mode],
        capture_output=True,
        text=True,
        timeout=1800,
        env=os.environ,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            d = json.loads(line[len("AB_RESULT "):])
            if d["errors"]:
                print("ERRORS", d["errors"], file=sys.stderr)
            return d["timings"]
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"mode {mode} produced no AB_RESULT")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    acc: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in NAMES
    }
    for r in range(rounds):
        for mode in ("A", "B"):
            t = run_mode(mode)
            for n, v in t.items():
                acc[n][mode].append(v)
            print(json.dumps({"round": r, "mode": mode, "timings": t}))
    summary = {
        n: {
            "A_min": min(v["A"]), "B_min": min(v["B"]),
            "A": [round(x, 3) for x in v["A"]],
            "B": [round(x, 3) for x in v["B"]],
        }
        for n, v in acc.items()
    }
    print("AB_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
