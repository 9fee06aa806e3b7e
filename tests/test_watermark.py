"""Watermark + event-time window semantics (SURVEY §2.16 streaming
extras): late data beyond the watermark is dropped; windows finalize in
append mode once the watermark passes.

The reference handles lateness by business logic only (records after
batch completion -> invalid topic, README.md:24); event-time watermarks
are the engine's generalization.
"""

import os
from datetime import datetime

from pyspark.sql import functions as F


def ts(s):
    return datetime.fromisoformat(s)


def test_watermark_drops_late_events(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    schema = "user string, t timestamp, v long"
    # file 1: two events in the 10:00 window, one at 12:00 (advances the
    # watermark to 11:00 with a 1 hour delay)
    spark.createDataFrame(
        [
            ("u", ts("2024-01-01T10:00:10"), 1),
            ("u", ts("2024-01-01T10:00:20"), 1),
            ("u", ts("2024-01-01T12:00:00"), 1),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("t", "1 hour")
        .groupBy(F.window("t", "10 minutes").alias("w"), "user")
        .agg(F.sum("v").alias("total"))
        .select(F.col("w.start").alias("start"), "user", "total")
    )
    collected = []
    q = (
        agg.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # file 2: a LATE event for the (closed) 10:00 window and one fresh
    spark.createDataFrame(
        [
            ("u", ts("2024-01-01T10:05:00"), 100),  # beyond watermark: dropped
            ("u", ts("2024-01-01T13:00:00"), 1),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)

    q2 = (
        agg.writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    by_window = {(r.start, r.user): r.total for r in collected}
    # the 10:00 window finalized WITHOUT the late +100
    assert by_window[(ts("2024-01-01T10:00:00"), "u")] == 2
    # nothing ever re-emitted that window with the late value
    totals = [r.total for r in collected if r.start == ts("2024-01-01T10:00:00")]
    assert totals == [2]
