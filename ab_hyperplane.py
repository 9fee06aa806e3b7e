"""Paired A/B for the round-9 hyperplane-signature rewrite: in-row
codegen bucket projection (current) vs the former posexplode ->
groupBy(id) 8-sum -> id-join signature build. The former shape paid a
64x row blow-up, an id-keyed aggregate shuffle and an id join PER
CONSUMER (cosine_neardup_lsh recomputes the signature on both pair-join
sides); the new one is a 512-flop scan-side projection.

Mode A = current (in-row). Mode B = the old explode->agg form
(reconstructed verbatim, monkeypatched). Fresh JVM per mode via
bench._run_names; modes alternate in one epoch.

Usage: python ab_hyperplane.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NAMES = ["cosine_neardup_lsh", "lsh_bucket_counts"]

_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parent)

_CHILD = r'''
import json, sys
sys.path.insert(0, %(repo)r)
mode = sys.argv[1]
from hri_flink_pipeline_core_spark.session import get_spark
spark = get_spark("ab-hyperplane")

if mode == "B":
    from pyspark.sql import functions as F
    from hri_flink_pipeline_core_spark.operators import similarity as S

    def hyperplane_signatures_old(df, vec_col="embedding", id_col="vec_id",
                                  planes=None):
        planes = planes or S.HYPERPLANES
        ex = df.select(
            F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("i", "x")
        )
        plane_lits = [F.array(*[F.lit(w) for w in plane]) for plane in planes]
        dots = [
            F.sum(F.col("x").cast("double") * F.get(pa, F.col("i"))).alias(f"_d{j}")
            for j, pa in enumerate(plane_lits)
        ]
        agged = ex.groupBy("id").agg(*dots)
        bucket = None
        for j in range(len(planes)):
            term = F.when(F.col(f"_d{j}") > 0, F.lit(2**j).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            bucket = term if bucket is None else bucket + term
        return agged.select("id", bucket.alias("bucket"))

    def cosine_neardup_lsh_old(df, threshold=0.9, id_col="vec_id",
                               vec_col="embedding"):
        sigs = hyperplane_signatures_old(df, vec_col, id_col).withColumnRenamed(
            "id", id_col
        )
        with_bucket = df.join(sigs, id_col)
        return S.cosine_neardup_pairs(
            with_bucket, threshold=threshold, id_col=id_col, vec_col=vec_col,
            block_col="bucket",
        )

    S.hyperplane_signatures = hyperplane_signatures_old
    S.cosine_neardup_lsh = cosine_neardup_lsh_old

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
