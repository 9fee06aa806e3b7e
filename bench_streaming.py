#!/usr/bin/env python
"""Streaming throughput micro-bench (VERDICT r4 "Next round" #7).

Replays the sf0.1 events table (100k rows at the default SF) through the
full streaming chain — notification-dim compaction, per-micro-batch
validation fan-out (valid/invalid/counts parquet sinks), and the keyed
tracker to terminal notifications — and reports rows/s plus per-micro-
batch latency percentiles against the reference's 1 s checkpoint-cadence
target (BaseValidationJob.scala:364-370: a micro-batch must clear well
under the 1 s trigger for the pipeline to keep up).

Setup (UNTIMED): events rows become HRI records (key = event_id, value =
a ~100-byte JSON payload, batchId header = batch-<user_id % 50>) written
as a 16-file parquet dir; 50 sendCompleted notifications carry the exact
per-batch expected counts. maxFilesPerTrigger=2 paces the replay into 8
validation micro-batches (availableNow), approximating a steady Kafka
feed; the tracker then replays the emitted counts the same way.

Output: ONE JSON line,
  {"metric": "streaming_pipeline", "validation_rows_per_sec": N,
   "tracker_rows_per_sec": N, "batch_ms": {...}, "n_records": N,
   "n_terminal": N, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BATCHES = 50
N_FILES = 16
FILES_PER_TRIGGER = 2


def main() -> int:
    from pyspark.sql import functions as F

    from hri_flink_pipeline_core_spark.operators.validation import (
        json_validator,
    )
    from hri_flink_pipeline_core_spark.schemas import (
        BATCH_NOTIFICATION_SCHEMA,
        COUNT_EVENT_SCHEMA,
        HRI_RECORD_SCHEMA,
        Status,
    )
    from hri_flink_pipeline_core_spark.session import get_spark, read_table
    from hri_flink_pipeline_core_spark.sources.files import read_table_stream
    from hri_flink_pipeline_core_spark.streaming.pipeline import (
        ValidationPipeline,
        parquet_dir_sink,
    )

    spark = get_spark("hri-stream-bench", cpus=CPUS)
    work = tempfile.mkdtemp(prefix="hri-stream-bench-")
    rec_dir = os.path.join(work, "records")
    notif_dir = os.path.join(work, "notifications")
    valid_dir = os.path.join(work, "valid")
    invalid_dir = os.path.join(work, "invalid")
    counts_dir = os.path.join(work, "counts")
    counts_flat = os.path.join(work, "counts_flat")

    # ---- untimed setup ----------------------------------------------------
    ev = read_table(spark, SF_DIR, "events")
    topic = "ingest.bench.di.in"
    batch_id = F.concat(F.lit("batch-"), (F.col("user_id") % N_BATCHES))
    records = ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value", "props")
        ).cast("binary").alias("value"),
        F.array(
            F.struct(
                F.lit("batchId").alias("key"),
                batch_id.cast("binary").alias("value"),
            )
        ).alias("headers"),
        F.lit(topic).alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
    )
    records.repartition(N_FILES).write.mode("overwrite").parquet(rec_dir)
    n_records = spark.read.parquet(rec_dir).count()

    expected = (
        spark.read.parquet(rec_dir)
        .select(
            F.expr("filter(headers, h -> h.key = 'batchId')[0].value")
            .cast("string")
            .alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("expectedRecordCount"))
    )
    notif = expected.select(
        "id",
        F.col("id").alias("name"),
        F.lit(topic).alias("topic"),
        F.lit("claims").alias("dataType"),
        F.lit(Status.SEND_COMPLETED).alias("status"),
        F.lit(None).cast("timestamp").alias("startDate"),
        F.lit(None).cast("timestamp").alias("endDate"),
        F.col("expectedRecordCount").cast("int"),
        F.lit(None).cast("int").alias("actualRecordCount"),
        F.lit(None).cast("int").alias("invalidRecordCount"),
        F.lit(1000000).alias("invalidThreshold"),
        F.lit(None).cast("string").alias("failureMessage"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.monotonically_increasing_id().alias("offset"),
    )
    notif.coalesce(1).write.mode("overwrite").parquet(notif_dir)
    notif_schema = spark.read.parquet(notif_dir).schema

    pipe = ValidationPipeline(
        spark,
        validator=json_validator(),
        records_stream=read_table_stream(
            spark, rec_dir, HRI_RECORD_SCHEMA,
            max_files_per_trigger=FILES_PER_TRIGGER,
        ),
        notifications_stream=read_table_stream(spark, notif_dir, notif_schema),
        valid_sink=parquet_dir_sink(valid_dir),
        invalid_sink=parquet_dir_sink(invalid_dir),
        counts_sink=parquet_dir_sink(counts_dir),
        workdir=os.path.join(work, "pipe"),
        batch_completion_delay_ms=2000,
    )

    out: dict = {"metric": "streaming_pipeline", "n_records": n_records}
    try:
        # ---- stage 1 (untimed): compact the notification dim ------------
        # start_notification_dim registers its query as the LAST entry in
        # pipe.queries; keep the explicit handle (ADVICE r5: indexing
        # pipe.queries[-1] later is fragile if more queries start).
        dim = pipe.start_notification_dim(trigger={"availableNow": True})
        dim_query = pipe.queries[-1]
        if not dim_query.awaitTermination(300):
            # timed out: recentProgress would describe a still-running
            # query; rows/s computed from it would be bogus (ADVICE r5)
            print(
                json.dumps(
                    {**out, "error": "notification-dim compaction timed out"}
                )
            )
            return 1

        # ---- stage 2 (TIMED): validation fan-out -------------------------
        t0 = time.perf_counter()
        vq = pipe.start_validation(dim, trigger={"availableNow": True})
        if not vq.awaitTermination(600):
            print(json.dumps({**out, "error": "validation fan-out timed out"}))
            return 1
        t_valid = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in vq.recentProgress]
        batch_ms = sorted(
            p["durationMs"]["triggerExecution"]
            for p in prog
            if p.get("numInputRows", 0) > 0
        )
        out["validation_sec"] = round(t_valid, 2)
        out["validation_rows_per_sec"] = round(n_records / t_valid)
        out["n_micro_batches"] = len(batch_ms)
        if batch_ms:
            out["batch_ms"] = {
                "p50": batch_ms[len(batch_ms) // 2],
                "max": batch_ms[-1],
            }

        # ---- stage 3 (TIMED): tracker to terminal notifications ----------
        # flatten the per-micro-batch counts dirs (untimed prep)
        spark.read.parquet(counts_dir).repartition(N_FILES).write.mode(
            "overwrite"
        ).parquet(counts_flat)
        terminal: list = []
        pipe.notification_out_sink = (
            lambda df, _b: terminal.extend(df.collect())
        )
        t0 = time.perf_counter()
        tq = pipe.start_tracker(
            read_table_stream(
                spark, counts_flat, COUNT_EVENT_SCHEMA,
                max_files_per_trigger=FILES_PER_TRIGGER,
            ),
            read_table_stream(spark, notif_dir, notif_schema),
            trigger={"processingTime": "200 milliseconds"},
        )
        deadline = time.time() + 600
        while len(terminal) < N_BATCHES and time.time() < deadline:
            time.sleep(0.2)
        t_track = time.perf_counter() - t0
        tq.stop()
        out["tracker_sec"] = round(t_track, 2)
        out["tracker_rows_per_sec"] = round(n_records / t_track)
        out["n_terminal"] = len(terminal)
        out["n_completed"] = sum(
            1 for t in terminal if t.status == Status.COMPLETED
        )
    finally:
        pipe.stop()
        shutil.rmtree(work, ignore_errors=True)

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    out["sf"] = sf
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
