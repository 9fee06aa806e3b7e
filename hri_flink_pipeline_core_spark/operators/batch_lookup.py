"""Unknown-batchId fallback lookup against the Management API.

Reference: ValidationProcessFunction.scala:160-212 — when a record's
batchId is not in broadcast state, the validator synchronously queries
the Mgmt API with retry (404 -> treat as unknown, i.e. route invalid;
other 4xx -> abort; 5xx/network -> exponential backoff, 24 h deadline).
This covers the metadata/data race where a record beats its notification.

Spark-first placement: per-record synchronous HTTP inside an executor
would serialize the whole pipeline (the reference blocks a task thread
the same way — a known cost it accepts). Under micro-batching the race
is already rare (each batch joins against ALL notifications so far), so
the lookup runs ONCE PER MICRO-BATCH on the driver over the *distinct*
unknown batchIds — a tiny collect (bounded by #batches, not #records) —
and the found notifications are unioned into the dim before routing.
Network cost: O(new unknown batches per trigger), not O(records).
"""

from __future__ import annotations

from typing import Callable, Optional, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.headers import batch_id as batch_id_expr
from ..schemas import BATCH_NOTIFICATION_SCHEMA
from ..sinks.mgmt_api import FatalSinkError, RequestException, retry_with_backoff


class BatchLookup(Protocol):
    """The injectable lookup seam (reference: BatchLookup.scala:11-13)."""

    def get_batch_id(self, tenant_id: str, batch_id: str) -> Optional[dict]: ...


def _coerce(value, data_type):
    """JSON scalar -> Spark row value (ISO-8601 strings to datetime for
    timestamp fields, matching the reference's OffsetDateTime parse)."""
    from datetime import datetime

    from pyspark.sql import types as T

    if value is not None and isinstance(data_type, T.TimestampType) and isinstance(value, str):
        return datetime.fromisoformat(value.replace("Z", "+00:00"))
    return value


def lookup_unknown_batches(
    records: DataFrame,
    dim: DataFrame,
    tenant_id: str,
    lookup: BatchLookup,
    sleep: Callable[[float], None] = None,
    clock: Callable[[], float] = None,
) -> DataFrame:
    """Return the dim augmented with notifications fetched for batchIds
    that appear in ``records`` but not in ``dim``.

    Retry parity (ValidationProcessFunction.scala:170-212): 404 returns
    null (the batch stays unknown -> record routes invalid), other 4xx
    aborts the job, everything else retries with backoff.
    """
    import time as _time

    sleep = sleep or _time.sleep
    clock = clock or _time.monotonic

    known = {r[0] for r in dim.select("id").distinct().collect()}
    seen = [
        r[0]
        for r in records.select(batch_id_expr("headers").alias("b"))
        .filter(F.col("b").isNotNull())
        .distinct()
        .collect()
    ]
    unknown = sorted(set(seen) - known)
    if not unknown:
        return dim

    fetched: list[dict] = []
    for bid in unknown:
        result: list = [None]

        def call():
            try:
                result[0] = lookup.get_batch_id(tenant_id, bid)
            except RequestException as ex:
                if ex.status_code == 404:
                    # batch/tenant not found: stays unknown, no retry
                    result[0] = None
                    return
                raise

        retry_with_backoff(call, sleep=sleep, clock=clock)
        if result[0] is not None:
            fetched.append(result[0])

    if not fetched:
        return dim

    spark = records.sparkSession
    rows = [
        tuple(
            _coerce(n.get(f.name), f.dataType) for f in BATCH_NOTIFICATION_SCHEMA.fields
        )
        for n in fetched
    ]
    extra = spark.createDataFrame(rows, BATCH_NOTIFICATION_SCHEMA)
    # looked-up notifications carry no Kafka offset; they are strictly
    # older than anything already in the dim, so seq -1 keeps
    # last-write-wins intact if the real notification arrives later
    extra = extra.withColumn("offset", F.lit(-1).cast("long"))
    dim_cols = dim.columns
    return dim.unionByName(extra.select(*dim_cols))
