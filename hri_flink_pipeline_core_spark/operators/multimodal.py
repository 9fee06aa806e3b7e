"""Multimodal (image/audio/video) column handling.

Policy (north star): media payloads are opaque ``binary`` columns with a
typed metadata struct alongside — exactly the reference's opaque-payload
discipline (HriRecordDeserializer.scala:14-18) applied to media. The
Spark-side plumbing (schema, Arrow batch shape, partition sizing) is real
and tested; the actual codec work is stubbed behind clearly-marked seams
because no image/audio libraries ship in this container.

Scale notes: media rows are WIDE (MBs per value). The operators here
(a) never shuffle the binary column — feature extraction projects it
away before any groupBy; (b) run decode via ``mapInPandas`` so one Arrow
batch holds a bounded number of rows (``spark.sql.execution.arrow
.maxRecordsPerBatch`` is the knob that prevents 2 GB Arrow buffers).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: document text bytes play the blob,
    metadata derived from doc fields. Shape-identical to a real media
    ingest (blob + typed meta)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def blob_stats(media: DataFrame) -> DataFrame:
    """Cheap per-blob metadata pass — pure expressions, no Python: the
    sanity/accounting stage every media pipeline runs first."""
    return media.select(
        "media_id",
        F.octet_length("content").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def media_exact_dedup(media: DataFrame) -> DataFrame:
    """Blob-level exact dedup + storage-savings report — the first
    dedup pass every image/audio corpus runs (byte-identical copies are
    the dominant duplicate class in crawled media): group on the blob's
    md5, keep the smallest id as canonical, report copy count and the
    bytes a dedup'd store saves.

    Scale shape: the blob never shuffles — md5 + octet_length are
    computed scan-side (codegen) and only the 16-byte key plus two ints
    move through the ONE hash-partition shuffle."""
    s = media.select(
        "media_id",
        F.md5(F.col("content")).alias("content_md5"),
        F.octet_length("content").alias("n_bytes"),
    )
    return s.groupBy("content_md5").agg(
        F.min("media_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.max("n_bytes").alias("blob_bytes"),
        ((F.count(F.lit(1)) - 1) * F.max("n_bytes")).cast("long").alias(
            "bytes_saved"
        ),
    )


DECODED_FEATURES_SCHEMA = (
    "media_id long, n_bytes int, head_byte int, byte_mean double, frame_count int"
)


def decode_features(media: DataFrame, frame_every_bytes: int = 64) -> DataFrame:
    """'Decode' stage over mapInPandas — Arrow-batched, binary column in,
    skinny feature rows out (the blob does NOT survive past this stage,
    so downstream shuffles move only features).

    The real codec call is stubbed (see _decode_real); the deterministic
    fake computes byte statistics + a frame count so the batch shape,
    schema, and partition behavior are fully exercised.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            contents = pdf["content"]
            n_bytes = contents.map(lambda b: len(b) if b is not None else 0)
            head = contents.map(lambda b: b[0] if b else 0)
            mean = contents.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if b else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "head_byte": head.astype("int32"),
                    "byte_mean": mean,
                    "frame_count": (n_bytes // frame_every_bytes + 1).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=DECODED_FEATURES_SCHEMA)


def _decode_real(content: bytes, mime: str):
    """Seam for the real codec (PIL / libav / soundfile). Not available in
    this container by policy — the pipeline plumbing around it is what
    this module tests."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "plug a decoder into decode_features(run=...) in production"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index —
    sequence+explode keeps it declarative; the (stubbed) per-frame decode
    then maps over bounded Arrow batches."""
    n_frames = (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx"
        ),
    )
