"""Paired A/B for dedup_clusters_star's convergence-check cadence
(VERDICT r8 "Next round" #5): the query's remaining cost is jobs per
round; checking convergence every 3rd round instead of every 2nd trades
up to two redundant (no-op, tiny) star rounds for 1/3 as many driver
check actions. Same no-op-star argument as cadence 2 — stars past
convergence are identity ops — so correctness is cadence-invariant;
only the job count moves.

Mode A = check_cadence 2 (current). Mode B = check_cadence 3. Fresh JVM
per mode via bench._run_names (warm-up + 2 cold-cache passes, min);
modes alternate A,B in one epoch. dedup_clusters (fixed-iteration CC,
cadence-free) rides as the anchor.

Usage: python ab_starcc.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NAMES = ["dedup_clusters_star", "dedup_clusters"]

_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parent)

_CHILD = r'''
import json, sys, functools
sys.path.insert(0, %(repo)r)
mode = sys.argv[1]
from hri_flink_pipeline_core_spark.session import get_spark
spark = get_spark("ab-starcc")

if mode == "B":
    from hri_flink_pipeline_core_spark.operators import dedup as D
    _orig = D.connected_components_star
    D.connected_components_star = functools.partial(_orig, check_cadence=3)

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
