"""Kafka-header manipulation as pure Column expressions.

The reference extracts ``batchId`` from the Kafka headers multimap
imperatively per record (ValidationProcessFunction.scala:226-232). Here it
is a single Catalyst expression over the ``headers``
ARRAY<STRUCT<key STRING, value BINARY>> column — vectorized, codegen'd,
and null-safe (null headers / missing key -> NULL, matching the
reference's ``orNull``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BATCH_ID_HEADER = "batchId"


def header_value(headers: Column | str, key: str) -> Column:
    """First header value for ``key`` as a UTF-8 string (NULL if absent).

    Uses ``F.get`` (0-based, NULL on out-of-bounds) so it is safe under
    ANSI mode; ``filter`` preserves the first-match ordering of the
    reference's ``headers.find(_.key() == key)``.
    """
    col = F.col(headers) if isinstance(headers, str) else headers
    first = F.get(F.filter(col, lambda h: h["key"] == F.lit(key)), 0)
    return F.decode(first["value"], "UTF-8")


def batch_id(headers: Column | str = "headers") -> Column:
    """The reference's extractBatchId as an expression."""
    return header_value(headers, BATCH_ID_HEADER)


def with_header(headers: Column, key: str, value: Column) -> Column:
    """Append a (key, value-bytes) header, creating the array if NULL.

    Mirrors InvalidRecordSerializer.scala:33-37 (batchId injected into
    sink headers)."""
    entry = F.struct(
        F.lit(key).alias("key"), F.encode(value.cast("string"), "UTF-8").alias("value")
    )
    base = F.coalesce(headers, F.array().cast("array<struct<key:string,value:binary>>"))
    return F.concat(base, F.array(entry))
