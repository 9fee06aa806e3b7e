#!/usr/bin/env python
"""Split-leg sf~10 measurement for keys the interleaved harness cannot pair (round 12).

Two keys have sf~10 oracle legs the interleaved harness
(`bench_sfscale.py`) cannot complete on this host:

- `span_cut_text`: the DuckDB leg hard-OOMs even with
  `memory_limit='96GB'` + a temp spill directory (the reconstruction
  is an ordered `string_agg(token ORDER BY tpos)` over the full
  exploded token table — DuckDB materializes ordered aggregates and
  cannot spill them).
- `dedup_clusters_star`: the DuckDB recursive-CTE connected-components
  leg ran 55+ minutes at 93 GB RSS without completing (each recursive
  iteration materializes the full frontier) and had to be killed.

So this harness runs the two legs in SEPARATE processes:

- spark leg: same methodology as bench_sfscale (warm-up + 2 timed
  passes, min), in-process.
- duck leg: attempted ONCE in a fresh process with the same 96GB
  budget and nothing else running, so the OOM (or a number, if the VM
  weather allows) is recorded from the best possible position.

Usage: python ab_splitleg_sf10.py <sf_dir> <query> [spark|duck]
"""

from __future__ import annotations

import json
import sys
import time

def spark_leg(sf_dir: str, name: str) -> float:
    import __spark_entry__ as entry
    from hri_flink_pipeline_core_spark.operators.cache import (
        release_persisted_intermediates,
    )
    from hri_flink_pipeline_core_spark.session import get_spark

    spark = get_spark("splitleg-sf10")
    fn = entry.queries()[name]
    best = None
    for i in range(3):  # pass 0 is warm-up, min of passes 1-2
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        release_persisted_intermediates()
        print(f"# spark p{i}: {dt:.2f}s", file=sys.stderr)
        if i > 0:
            best = dt if best is None else min(best, dt)
    return best


def duck_leg(sf_dir: str, name: str) -> float:
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='96GB'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = entry.oracle_sql()[name]
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    leg = sys.argv[3] if len(sys.argv) > 3 else "spark"
    if leg == "spark":
        dt = spark_leg(sf_dir, name)
    else:
        dt = duck_leg(sf_dir, name)
    print(json.dumps({"sf_dir": sf_dir, "query": name, "leg": leg, "sec": round(dt, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
