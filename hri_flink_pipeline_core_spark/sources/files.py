"""File (parquet/json) sources — batch and streaming.

The reference is Kafka-only; file sources are the engine's generalization
(SURVEY.md §2.16 ``source.table``) and double as the test harness: a
parquet directory played through ``readStream`` exercises the identical
DataFrame code the Kafka path runs, the way the reference's scripted
test sources do (jobtest/sources/HriTestRecsSourceFunction.scala).

Scale notes: ``maxFilesPerTrigger`` bounds micro-batch size;
``spark.sql.files.maxPartitionBytes`` (set in session.py) controls split
granularity so a 100 TB directory becomes ~800k balanced input splits.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_table_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming read of a parquet directory (file source requires an
    explicit schema)."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Batch parquet sink (``sink.table``)."""
    df.write.mode(mode).parquet(path)
