"""Paired A/B for JVM-level variants on the heavy data-path subset.

Round-9 context: all five round-9 epochs (including one on a
freshly-rebooted idle host) run the suite ~30-40% slower than every
round-8 epoch, with DuckDB numbers UNCHANGED-to-faster on the same
pairs and the committed code proven parity (BASELINE.md round-9
epoch-pair section). The raw per-job floor is unchanged (0.32 s
shuffle-job min, matching the round-3 measurement), so the inflation
lives in the parallel data path inside the JVM. This harness asks
whether a JVM-level knob (GC algorithm, heap size) recovers any of it.

Modes (each its own fresh JVM via a child process; configs that must
precede JVM launch are passed as builder extra_conf before
bench._run_names reuses the session):

  A = -XX:+UseG1GC, 8g driver heap (the JDK-17 default collector and
      the config shipped before this A/B; pinned explicitly because
      session.py now defaults to ParallelGC)
  B = -XX:+UseParallelGC (throughput GC: shuffle-churn allocation
      patterns often favor it over G1's pause-target heuristics)
  C = 16g driver heap (G1): tests whether 32 task threads' shuffle
      buffers pressure the 8g old gen
  D = ParallelGC + 16g

Modes alternate A,B,C,D per round in one wall-clock epoch so host
weather hits all sides. Usage: python ab_gc.py [rounds]
"""

from __future__ import annotations

import json
import sys

NAMES = [
    "incremental_neardup",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "dedup_clusters_star",
    "prefix_filter_pairs",
    "semdedup_prune",
    "triangle_count",
    "kmv_set_ops",
    "ann_pq_recall",
    "bm25_topk",
]

_REPO_ROOT = str(__import__("pathlib").Path(__file__).resolve().parent)

# G1 is pinned EXPLICITLY: after this A/B landed, session.py's default
# became ParallelGC, so a bare {} would now launch ParallelGC too and
# the harness would compare identical JVMs (round-9 review finding).
MODES = {
    "A": {"spark.driver.extraJavaOptions": "-XX:+UseG1GC"},
    "B": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    "C": {
        "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
        "spark.driver.memory": "16g",
    },
    "D": {
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        "spark.driver.memory": "16g",
    },
}

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
mode = sys.argv[1]
extra = %(modes)r[mode]
from hri_flink_pipeline_core_spark.session import get_spark
# create the session FIRST with the mode's launch-time configs;
# bench._run_names's get_spark() then reuses it (getOrCreate)
spark = get_spark("ab-gc", extra_conf=extra)
import bench
timings, errors = bench._run_names(%(names)r)
print("AB_RESULT " + json.dumps({"mode": mode, "timings": timings, "errors": errors}))
"""


def main() -> int:
    import ab_common

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    child = _CHILD % {"names": NAMES, "repo": _REPO_ROOT, "modes": MODES}
    acc: dict[str, dict[str, float]] = {m: {} for m in MODES}
    err_acc: dict[str, dict[str, str]] = {}
    for r in range(rounds):
        for mode in MODES:
            d = ab_common.run_child(child, [mode])
            t = d["timings"]
            ab_common.accumulate(acc, mode, t, d.get("errors"), err_acc)
            print(
                json.dumps(
                    {"round": r, "mode": mode, "total": round(sum(t.values()), 2)}
                ),
                flush=True,
            )
    ab_common.summarize(acc, NAMES, err_acc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
