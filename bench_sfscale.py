#!/usr/bin/env python
"""Warm-marginal Spark-vs-DuckDB ratio at an arbitrary sf_dir — the
measurement behind BASELINE.md's SF-scaling tables (round 8: sf0.01 ->
sf0.1; round 9: the synthetic sf~1 decade from gen_sfscale.py).

Methodology (identical to the round-8 table so rows are comparable):
ONE shared warm JVM / DuckDB connection; per query, Spark and DuckDB
run back-to-back (interleaved, so VM weather hits both engines
equally); a warm-up pass first, then two timed passes, per-query min.
This measures the MARGINAL per-run cost — the regime that matters for
the floor-amortization argument; the committed cold-cache pairs measure
the conservative cold cost.

Usage:
  python bench_sfscale.py <sf_dir> [query,query,...]
(defaults: the weak five from VERDICT r8)
"""

from __future__ import annotations

import json
import sys
import time

WEAK_FIVE = [
    "span_cut_text",
    "prefix_filter_pairs",
    "triangle_count_oriented",
    "dedup_clusters_star",
    "minhash_lsh_pairs",
]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from hri_flink_pipeline_core_spark.operators.cache import (
        release_persisted_intermediates,
    )
    from hri_flink_pipeline_core_spark.session import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else WEAK_FIVE

    spark = get_spark("sfscale")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    # Round 12: an in-memory DuckDB connection has disk spilling
    # DISABLED, so the sf~10 sweeps died with a hard allocator OOM
    # (the Spark JVM shares the host's 125 GB). Give the oracle leg a
    # temp directory and an explicit budget so it spills like any
    # engine at scale instead of crashing — this can only HELP the
    # oracle leg (rows before/after are comparable: a run that needed
    # the spill path would previously have produced no row at all).
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # round 12 opt: 48GB still hard-OOM'd on the span_cut_text oracle at
    # sf~10 (some DuckDB operators — list aggs — cannot spill); the host
    # has ~124GB free and the Spark side of these sweeps stays under a
    # few GB, so give the oracle most of the box.
    con.execute("SET memory_limit='96GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def run_spark(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        # queries persist/checkpoint intermediates; release between runs
        release_persisted_intermediates()
        return dt

    def run_duck(name: str) -> float:
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        return time.perf_counter() - t0

    # warm-up (pays session/JIT/page-cache, outside every timed window)
    for n in names:
        run_spark(n)
        run_duck(n)

    result: dict[str, dict[str, float]] = {}
    for pass_i in range(2):
        for n in names:
            s = run_spark(n)
            d = run_duck(n)
            r = result.setdefault(n, {"spark": s, "duck": d})
            r["spark"] = min(r["spark"], s)
            r["duck"] = min(r["duck"], d)
            print(
                f"# p{pass_i} {n}: spark {s:.2f}s duck {d:.2f}s",
                file=sys.stderr,
            )
    for n, r in result.items():
        r["spark"] = round(r["spark"], 3)
        r["duck"] = round(r["duck"], 3)
        r["ratio"] = round(r["spark"] / r["duck"], 2) if r["duck"] else None
    print(json.dumps({"sf_dir": sf_dir, "queries": result}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
