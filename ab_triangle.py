"""Paired A/B for the r7->r8 triangle_count_oriented regression
(VERDICT r8 "Next round" #3): +11% (1.75 -> 1.94 s in the driver
artifact) with nothing in the r8 diff naming it. Suspect: commit
11d3b03 stringified bucket_pairs' side selects (selectExpr strings
instead of per-Column py4j construction) — identical logical plans by
design, but this call site (the oriented triangle census's candidate
graph) never got its own paired measurement.

Mode A = current code. Mode B = bucket_pairs with the r7 Column-form
side selects (reconstructed verbatim from 11d3b03's "-" hunk),
monkeypatched into the dedup module so minhash_lsh_candidates picks it
up. Each mode runs in a fresh JVM via bench._run_names (warm-up + 2
timed cold-cache passes, per-query MIN); modes alternate A,B,A,B in
one wall-clock epoch so VM weather hits both sides. triangle_count
rides along as the unchanged-anchor control.

Usage: python ab_triangle.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NAMES = ["triangle_count_oriented", "triangle_count"]

_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parent)

_CHILD = r'''
import json, sys
sys.path.insert(0, %(repo)r)
mode = sys.argv[1]
from hri_flink_pipeline_core_spark.session import get_spark
spark = get_spark("ab-triangle")

if mode == "B":
    # r7 bucket_pairs: identical up to the side selects, which are
    # per-Column py4j construction (11d3b03's "-" side) instead of
    # selectExpr strings
    from pyspark.sql import functions as F
    from hri_flink_pipeline_core_spark.operators import dedup as D
    from hri_flink_pipeline_core_spark.operators.cache import checkpoint_small

    def bucket_pairs_r7(exploded, keys, fields, small_cap=128,
                        max_bucket=None, member_ckpt=True):
        n_col = F.count(F.lit(1)).alias("_n")
        action_at = small_cap if max_bucket is None else min(small_cap, max_bucket)
        counts = (
            exploded.groupBy(*keys).agg(n_col).filter(F.col("_n") > action_at)
        )
        annotated = exploded.join(F.broadcast(counts), keys, "left")
        if max_bucket is not None:
            annotated = annotated.filter(
                F.col("_n").isNull() | (F.col("_n") <= max_bucket)
            )
        member = annotated.withColumn(
            "_g",
            F.coalesce(
                F.ceil(F.col("_n") / F.lit(small_cap)).cast("int"), F.lit(1)
            ),
        ).drop("_n")
        if member_ckpt:
            member = member.transform(checkpoint_small)
        first = fields[0]
        cell = F.pmod(F.xxhash64(F.col(first)), F.col("_g")).cast("int")
        gb_range = F.explode(F.sequence(F.lit(0), F.col("_g") - 1))
        side_a = member.select(
            *keys,
            cell.alias("_ga"),
            gb_range.alias("_gb"),
            *[F.col(f).alias(f + "_a") for f in fields],
        )
        side_b = member.select(
            *keys,
            gb_range.alias("_ga"),
            cell.alias("_gb"),
            *[F.col(f).alias(f + "_b") for f in fields],
        )
        pair_cols = [f + "_a" for f in fields] + [f + "_b" for f in fields]
        return (
            side_a.join(side_b, [*keys, "_ga", "_gb"])
            .filter(F.col(first + "_a") < F.col(first + "_b"))
            .select(*pair_cols)
        )

    D.bucket_pairs = bucket_pairs_r7

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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
