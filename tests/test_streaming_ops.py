"""Watermark-bounded streaming operators (streaming/ops.py): exact
dedup with dropDuplicatesWithinWatermark and stream-stream interval
join. Each is checked against its batch-mode equivalent on the same
data — the unified-API property the engine leans on everywhere.
"""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from hri_flink_pipeline_core_spark.streaming.ops import (
    stream_stream_interval_join,
    streaming_dedup,
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Kafka-redelivery shape: the same (topic, partition, offset)
    identity delivered twice within the horizon -> exactly one
    survivor per identity."""
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        Row(topic="t", partition=0, offset=i % 3, ts=ts(i)) for i in range(6)
    ]  # offsets 0,1,2 each delivered twice
    spark.createDataFrame(
        rows, "topic string, partition int, offset long, ts timestamp"
    ).write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(
        "topic string, partition int, offset long, ts timestamp"
    ).parquet(in_dir)
    deduped = streaming_dedup(
        stream, ["topic", "partition", "offset"], "ts", delay="30 minutes"
    )
    out = []
    q = (
        deduped.writeStream.foreachBatch(lambda df, _b: out.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert sorted((r.topic, r.partition, r.offset) for r in out) == [
        ("t", 0, 0),
        ("t", 0, 1),
        ("t", 0, 2),
    ]

    # batch path through the same operator gives the same identity set
    batch = streaming_dedup(
        spark.read.parquet(in_dir), ["topic", "partition", "offset"], "ts"
    )
    assert batch.count() == 3


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Anchors x events within [anchor_ts, anchor_ts + 30 min] per user:
    the streaming join (watermarks on both sides) must produce exactly
    the rows the batch join produces."""
    ev_dir = str(tmp_path / "events")
    an_dir = str(tmp_path / "anchors")
    ckpt = str(tmp_path / "ckpt")

    events = [
        Row(user_id=u, event_id=u * 100 + i, ev_ts=ts(i * 7))
        for u in (1, 2)
        for i in range(10)
    ]
    anchors = [Row(user_id=u, anchor_id=u, an_ts=ts(10)) for u in (1, 2)]
    ev_schema = "user_id int, event_id int, ev_ts timestamp"
    an_schema = "user_id int, anchor_id int, an_ts timestamp"
    spark.createDataFrame(events, ev_schema).write.mode("overwrite").parquet(ev_dir)
    spark.createDataFrame(anchors, an_schema).write.mode("overwrite").parquet(an_dir)

    def run(left, right):
        return stream_stream_interval_join(
            left,
            right,
            keys=["user_id"],
            left_time="an_ts",
            right_time="ev_ts",
            lower="0 seconds",
            upper="30 minutes",
            delay="2 hours",
        ).select("anchor_id", "event_id")

    expected = sorted(
        (r.anchor_id, r.event_id)
        for r in run(
            spark.read.parquet(an_dir), spark.read.parquet(ev_dir)
        ).collect()
    )
    # sanity: the interval actually selects a strict subset
    assert 0 < len(expected) < len(events) * len(anchors)

    out = []
    q = (
        run(
            spark.readStream.schema(an_schema).parquet(an_dir),
            spark.readStream.schema(ev_schema).parquet(ev_dir),
        )
        .writeStream.foreachBatch(lambda df, _b: out.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert sorted((r.anchor_id, r.event_id) for r in out) == expected


def test_streaming_session_agg_matches_batch(spark, tmp_path):
    """Gap-merged sessions computed by the streaming path (file source,
    availableNow, append mode) must equal the batch path over the same
    data for every session the watermark has closed; with a final
    sentinel event far in the future, that is ALL real sessions."""
    from hri_flink_pipeline_core_spark.streaming.ops import streaming_session_agg

    in_dir = str(tmp_path / "sess-in")
    ckpt = str(tmp_path / "sess-ckpt")
    rows = []
    for u in (1, 2):
        # two bursts per user separated by > gap -> 2 sessions each
        rows += [Row(user_id=u, ts=ts(i), value=float(i)) for i in (0, 5, 10)]
        rows += [Row(user_id=u, ts=ts(120 + i), value=float(i)) for i in (0, 3)]
    # watermark-flush sentinel: one distant event per user closes all
    # real sessions under append mode
    rows += [Row(user_id=9, ts=ts(10_000), value=0.0)]
    schema = "user_id int, ts timestamp, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(in_dir)

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.session_sum)
        for r in streaming_session_agg(spark.read.parquet(in_dir)).collect()
        if r.user_id != 9
    }
    assert len(batch) == 4  # 2 users x 2 sessions

    out = []
    q = (
        streaming_session_agg(spark.readStream.schema(schema).parquet(in_dir))
        .writeStream.foreachBatch(lambda df, _b: out.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.session_sum)
        for r in out
        if r.user_id != 9
    }
    assert got == batch


def test_streaming_admission_gate_matches_batch(spark, tmp_path):
    """Stream-static incremental dedup: verdicts collected through the
    streaming gate (availableNow micro-batches) must equal the batch
    crosscorpus_verdicts on the same new/reference split."""
    from hri_flink_pipeline_core_spark.operators.dedup import crosscorpus_verdicts
    from hri_flink_pipeline_core_spark.session import read_table
    from hri_flink_pipeline_core_spark.streaming.ops import StreamingAdmissionGate

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents")
    new_df = docs.filter(F.col("source").isin("src0", "src1"))
    ref_df = docs.filter(~F.col("source").isin("src0", "src1"))

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    new_df.select("doc_id", "text").write.mode("overwrite").parquet(in_dir)

    gate = StreamingAdmissionGate(ref_df, threshold=0.5)
    try:
        out = []
        stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(
                gate.foreach_batch(lambda vdf, _b: out.extend(vdf.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "availableNow query timed out"

        expected = {
            (r.doc_id, r.n_ref_dups, round(r.best_jaccard, 12), r.is_dup)
            for r in crosscorpus_verdicts(new_df, ref_df, threshold=0.5).collect()
        }
        got = {
            (r.doc_id, r.n_ref_dups, round(r.best_jaccard, 12), r.is_dup)
            for r in out
        }
        assert got == expected

        # the cached-ref-shingle-sets variant (scan-free triggers) must
        # produce identical verdicts
        gate2 = StreamingAdmissionGate(ref_df, threshold=0.5, cache_ref_sets=True)
        try:
            got2 = {
                (r.doc_id, r.n_ref_dups, round(r.best_jaccard, 12), r.is_dup)
                for r in gate2.verdicts(new_df.select("doc_id", "text")).collect()
            }
            assert got2 == expected
        finally:
            gate2.close()
    finally:
        gate.close()
