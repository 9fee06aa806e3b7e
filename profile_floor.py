#!/usr/bin/env python
"""Profile floor-bound queries: job/stage counts + timing under config
variants. Diagnostic tool only (not part of the shipped engine).

Usage: python profile_floor.py [variant] [query ...]
  variant: base | coalesce | lowshuffle | both | noaqe | noaqe16
"""
from __future__ import annotations

import sys
import time

SF_DIR = "/root/testdata/sf0.1"

VARIANTS = {
    "base": {},
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
    },
    "lowshuffle": {
        "spark.sql.shuffle.partitions": "8",
    },
    "p16": {
        "spark.sql.shuffle.partitions": "16",
    },
    "p4": {
        "spark.sql.shuffle.partitions": "4",
    },
    "p16a32": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
        "spark.sql.shuffle.partitions": "16",
    },
    "p8a8": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.shuffle.partitions": "8",
    },
    "both": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
        "spark.sql.shuffle.partitions": "8",
    },
    "noaqe": {
        "spark.sql.adaptive.enabled": "false",
    },
    "noaqe16": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "16",
    },
}

DEFAULT_QUERIES = [
    "winsorized_stats", "centroid_distances", "ivf_centroids",
    "stats_moments", "route_counts", "tracker_terminal",
    "sink_table_roundtrip", "lsh_bucket_counts", "pagerank_domains",
    "kmeans_refine", "retention_cohorts", "window_sliding",
    "kmv_set_ops", "vocab_coverage", "semdedup_prune",
    "ann_pq_recall", "dedup_clusters_star", "simhash_pairs",
    "prefix_filter_pairs", "incremental_neardup",
]


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    names = sys.argv[2:] or DEFAULT_QUERIES
    conf = VARIANTS[variant]

    from hri_flink_pipeline_core_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(f"profile-{variant}", extra_conf=conf)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    queries = entry.queries()

    # warm-up
    for n in names:
        try:
            queries[n](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"warm {n}: ERR {e}", file=sys.stderr)
    spark.catalog.clearCache()

    import gc
    from hri_flink_pipeline_core_spark.operators.cache import (
        release_persisted_intermediates,
    )

    results = {}
    for pass_i in range(2):
        for n in names:
            release_persisted_intermediates()
            spark.catalog.clearCache()
            gc.collect()
            try:
                sc._jvm.System.gc()
            except Exception:
                pass
            time.sleep(0.1)
            sc.setJobGroup(f"prof-{n}", n)
            t0 = time.perf_counter()
            df = queries[n](spark, SF_DIR)
            rows = df.toPandas().shape[0]
            t = time.perf_counter() - t0
            job_ids = tracker.getJobIdsForGroup(f"prof-{n}")
            njobs = len(job_ids)
            nstages = 0
            ntasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji:
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si and si.numCompletedTasks > 0:
                            nstages += 1
                            ntasks += si.numCompletedTasks
            sc.setJobGroup(None, None)
            prev = results.get(n)
            if prev is None or t < prev[0]:
                results[n] = (t, njobs, nstages, ntasks, rows)
            del df

    print(f"== variant={variant} ==")
    print(f"{'query':32s} {'sec':>7} {'jobs':>5} {'stages':>7} {'tasks':>6} {'rows':>7}")
    tot = 0.0
    for n in names:
        if n in results:
            t, j, st, tk, r = results[n]
            tot += t
            print(f"{n:32s} {t:7.3f} {j:5d} {st:7d} {tk:6d} {r:7d}")
    print(f"{'TOTAL':32s} {tot:7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
