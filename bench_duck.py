#!/usr/bin/env python
"""DuckDB baseline runner — the paired half of bench.py.

Runs every oracle_sql() statement against the same parquet tables at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line shaped like bench.py's compact line. The ratio
bench.py/bench_duck.py measured BACK-TO-BACK in one session is the only
stable cross-round performance metric on this host (BASELINE.md §(c):
intra-day VM speed drifts 10-15%, so raw seconds are not comparable
across epochs).

Methodology mirrors bench.py exactly (ADVICE r5: the two runners must
apply equal policies or the paired ratio is biased):
- warm-up pass first (DuckDB has no JIT to amortize, but the OS page
  cache state should match the Spark runner's, which also warms first);
- two timed passes, per-query min;
- the SAME outlier-rescue policy: queries slower than 2 s after
  min-of-two get one extra timed pass (bench.py:131 rationale — a VM
  stall spanning both passes records the stall, not the query).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    # warm-up
    for name, sql in oracles.items():
        try:
            con.execute(sql).fetchall()
        except Exception:
            pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for pass_i in range(2):
        for name, sql in oracles.items():
            try:
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                t = round(time.perf_counter() - t0, 4)
                timings[name] = min(timings.get(name, t), t)
                errors.pop(name, None)
            except Exception as exc:  # noqa: BLE001 - per-query isolation
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(
                f"# p{pass_i} {name}: {timings.get(name, -1):.3f}s",
                file=sys.stderr,
            )

    # outlier rescue, same policy as bench.py
    for name in [n for n, t in timings.items() if t > 2.0]:
        try:
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            t = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings[name], t)
            print(f"# rescue {name}: {t:.3f}s", file=sys.stderr)
        except Exception:  # noqa: BLE001 - rescue is best-effort
            pass

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    out = {
        "metric": "oracle_suite_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
