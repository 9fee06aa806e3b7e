#!/usr/bin/env python
"""Paired A/B: pagerank exchange-reduction shapes (VERDICT r10 #4).

Modes select via $SPARK_GRAFT_PAGERANK_SHAPE:
  legacy — pre-r11 lineage-re-walked shape (~5 redundant edge-scale
           evaluations at 2 iterations);
  flat   — deduped per-edge table checkpointed once, everything derives
           from the flat leaf;
  adj    — groupBy(src).collect_set(dst) fuses dedupe + out-degree into
           ONE edge-scale exchange with node-scale output.

All three are oracle-hash-identical (verified at sf0.01 before this
harness existed). Fresh JVM per (mode, round) via ab_common.

Usage: python ab_pagerank.py [rounds] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
MODES = ["legacy", "flat", "adj"]
NAMES = ["pagerank_domains"]

_CHILD = """
import sys, os, time, json
sys.path.insert(0, %(repo)r)
mode, sf_dir = sys.argv[1], sys.argv[2]
os.environ["SPARK_GRAFT_PAGERANK_SHAPE"] = mode
from hri_flink_pipeline_core_spark.session import get_spark
from hri_flink_pipeline_core_spark.operators.cache import (
    release_persisted_intermediates,
)
import __spark_entry__ as entry
spark = get_spark("ab-pagerank-" + mode)
qs = entry.queries()
names = %(names)r
timings, errors = {}, {}
for n in names:
    try:
        qs[n](spark, sf_dir).toPandas()
    except Exception as exc:  # noqa: BLE001 — recorded, not swallowed
        errors[n] = repr(exc)[:500]
    release_persisted_intermediates()
for p in range(3):
    for n in names:
        if n in errors:
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            qs[n](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            errors[n] = repr(exc)[:500]
            timings.pop(n, None)
            release_persisted_intermediates()
            continue
        t = time.perf_counter() - t0
        release_persisted_intermediates()
        timings[n] = min(timings.get(n, t), t)
print("AB_RESULT " + json.dumps({"mode": mode, "timings": timings,
                                 "errors": errors}))
"""


def main() -> int:
    import ab_common

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    child = _CHILD % {"repo": _REPO_ROOT, "names": NAMES}
    acc: dict[str, dict[str, float]] = {m: {} for m in MODES}
    err_acc: dict[str, dict[str, str]] = {}
    for r in range(rounds):
        for mode in MODES:
            d = ab_common.run_child(child, [mode, sf_dir])
            ab_common.accumulate(acc, mode, d["timings"], d.get("errors"), err_acc)
            print(json.dumps({"round": r, "mode": mode,
                              "total": round(sum(d["timings"].values()), 2)}),
                  flush=True)
    ab_common.summarize(acc, NAMES, err_acc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
