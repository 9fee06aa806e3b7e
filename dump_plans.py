#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries into plans/<round>/.

Usage: python dump_plans.py <suffix> [query,query,...]
  suffix: "before" or "after" -> plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt
  round dir: $SPARK_GRAFT_PLAN_ROUND (default r13)
  default query list: all of __spark_entry__.queries().

Building a DataFrame may itself run bounded driver jobs (budget-gated
model collects, persisted intermediates); that is part of the plan
shape being documented. The explain text is captured via the JVM
explain API without executing the query.
"""

from __future__ import annotations

import os
import pathlib
import sys


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from hri_flink_pipeline_core_spark.session import get_spark

    spark = get_spark("plan-dump")
    out_dir = (
        pathlib.Path(__file__).resolve().parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    qs = entry.queries()
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(qs)
    n_ok = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out_dir / f"{name}_{suffix}.txt").write_text(txt)
            n_ok += 1
            print(f"# {name}: ok", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 - per-query isolation
            print(f"# {name}: ERR {type(exc).__name__}: {exc}", file=sys.stderr)
    print(f"wrote {n_ok}/{len(names)} plans to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
