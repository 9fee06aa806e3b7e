"""Paired A/B for the five unexplained r6->r7 regressions (VERDICT r7
What's wrong #3): rolling_zscore, topk_per_key, asof_latest_order,
dedup_exact_text, threshold_trigger.

Mode A = current session config (parallelismFirst=false, 2 MB advisory).
Mode B = the r6-era coalesce behavior (parallelismFirst=true).

Each mode runs in its own JVM via bench._run_names (warm-up + 2 timed
cold-cache passes + slow-tail rescue, per-query MIN); modes alternate
A,B,A,B in one wall-clock epoch so VM weather hits both sides. Prints
one JSON line per (round, mode) and a final per-query summary.

Usage: python ab_regressions.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NAMES = [
    "rolling_zscore",
    "topk_per_key",
    "asof_latest_order",
    "dedup_exact_text",
    "threshold_trigger",
]

# repo root from __file__, not a hardcoded path (ADVICE r8)
_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parent)

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
mode = sys.argv[1]
from hri_flink_pipeline_core_spark.session import get_spark
spark = get_spark("ab-regr")
if mode == "B":
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
    )
import bench
timings, errors = bench._run_names(%(names)r)
print("AB_RESULT " + json.dumps({"mode": mode, "timings": timings, "errors": errors}))
"""


def run_mode(mode: str) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"names": NAMES, "repo": _REPO_ROOT}, mode],
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
    print(out.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"mode {mode} produced no result")


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    acc: dict[str, dict[str, list[float]]] = {n: {"A": [], "B": []} for n in NAMES}
    for r in range(rounds):
        for mode in ("A", "B"):
            t = run_mode(mode)
            print(json.dumps({"round": r, "mode": mode, "timings": t}), flush=True)
            for n, v in t.items():
                acc[n][mode].append(v)
    summary = {
        n: {
            "A_min": min(v["A"]),
            "B_min": min(v["B"]),
            "delta_pct": round(100 * (min(v["A"]) - min(v["B"])) / min(v["B"]), 1),
        }
        for n, v in acc.items()
        if v["A"] and v["B"]
    }
    print("SUMMARY " + json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
