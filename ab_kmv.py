#!/usr/bin/env python
"""Paired A/B: kmv_set_ops literal-sketch vs all-DataFrame shape
(VERDICT r9 #4). Fresh JVM per (mode, round) via ab_common; modes
select via $SPARK_GRAFT_KMV_SHAPE. kmv_distinct rides along as a
no-change control.

Usage: python ab_kmv.py [rounds] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
MODES = ["literal", "agg"]
NAMES = ["kmv_set_ops", "kmv_distinct"]

_CHILD = """
import sys, os, time, json
sys.path.insert(0, %(repo)r)
mode, sf_dir = sys.argv[1], sys.argv[2]
os.environ["SPARK_GRAFT_KMV_SHAPE"] = mode
from hri_flink_pipeline_core_spark.session import get_spark
from hri_flink_pipeline_core_spark.operators.cache import (
    release_persisted_intermediates,
)
import __spark_entry__ as entry
spark = get_spark("ab-kmv-" + mode)
qs = entry.queries()
names = %(names)r
timings, errors = {}, {}
for n in names:
    # per-query try/except so one failing query records an error and the
    # AB_RESULT payload (with every other query's timings) still reaches
    # the parent accumulator (round-10 review: ab_common only handled the
    # timeout path; an in-child exception lost all accumulated rounds).
    try:
        qs[n](spark, sf_dir).toPandas()
    except Exception as exc:  # noqa: BLE001 — recorded, not swallowed
        errors[n] = repr(exc)[:500]
    release_persisted_intermediates()
for p in range(2):
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
