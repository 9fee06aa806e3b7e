"""The validation operator — the heart of the reference pipeline.

Reference: ValidationProcessFunction.scala:76-159 (a Flink
BroadcastProcessFunction with two side outputs). Spark-first design: one
*annotated* DataFrame carries routing decisions as columns, and the three
outputs (valid / invalid / counts) are filtered projections of it —
Spark's DAG reuse (or an explicit ``.persist()`` in ``foreachBatch``)
replaces Flink side outputs. The broadcast map-state lookup becomes a
broadcast hash join against the latest-per-batchId notification dim.

Routing rules with the reference's exact precedence and error strings
(ValidationProcessFunction.scala:84-158):

1. missing batchId header  -> invalid (ERR_MISSING_BATCH_ID, batchId NULL),
                              NO count event (early return at :95)
2. unknown batchId         -> invalid (ERR_UNKNOWN_BATCH_ID), NO count event
                              (early return at :112)
3. status TERMINATED/FAILED-> silently dropped, NO count event (:115-118)
4. status COMPLETED        -> invalid (ERR_BATCH_COMPLETED), NO count event
                              (early return at :131)
5. else run the pluggable validator -> valid stream or invalid stream with
   the validator's error; a {batchId, isValid} count event is emitted for
   exactly these records (:135-158).

Scale notes: the notification dim is tiny (one row per batch) -> always
broadcast; the fact stream never shuffles in this operator — routing is
pure per-row expression work inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.headers import batch_id as batch_id_expr
from ..schemas import (
    ERR_BATCH_COMPLETED,
    ERR_MISSING_BATCH_ID,
    ERR_UNKNOWN_BATCH_ID,
    Status,
)

# A Validator takes the annotated record DataFrame and returns it with two
# added columns: ``is_valid`` BOOLEAN and ``error_message`` STRING.
# Column-expression validators stay fully JVM-side (no serialization tax);
# Python logic plugs in through pandas_udf_validator below.
# (Reference seam: Validator.scala:13-15.)
Validator = Callable[[DataFrame], DataFrame]

ROUTE_VALID = "valid"
ROUTE_INVALID = "invalid"
ROUTE_DROP = "drop"


def column_validator(is_valid: Column, error_message: Column) -> Validator:
    """Build a Validator from pure Column expressions (the fast path)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn("is_valid", is_valid).withColumn(
            "error_message", error_message
        )

    return apply


def json_validator(value_col: str = "value") -> Validator:
    """JSON well-formedness via the JVM parser (Spark 4 ``try_parse_json``
    -> NULL on malformed input). Parity with the reference test validator's
    Jackson ``readTree`` check (jobtest/JsonValidationJob.scala:76-94) with
    no Python in the loop."""
    text = F.decode(F.col(value_col), "UTF-8")
    parsed_ok = F.try_parse_json(text).isNotNull()
    return column_validator(
        is_valid=F.coalesce(parsed_ok, F.lit(False)),
        error_message=F.when(
            F.coalesce(parsed_ok, F.lit(False)), F.lit(None).cast("string")
        ).otherwise(
            F.concat(
                F.lit("Invalid JSON: unable to parse record value: "),
                F.coalesce(F.substring(text, 1, 120), F.lit("<null>")),
            )
        ),
    )


def pandas_udf_validator(fn, err_fn=None) -> Validator:
    """Adapt a vectorized python predicate over the payload bytes into a
    Validator. ``fn``: pd.Series[bytes] -> pd.Series[bool];
    ``err_fn``: pd.Series[bytes] -> pd.Series[str|None].
    Arrow-batched — use only when Column expressions can't express the
    check."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    valid_udf = F.pandas_udf(fn, T.BooleanType())
    if err_fn is None:
        err = F.when(F.col("is_valid"), F.lit(None).cast("string")).otherwise(
            F.lit("Validation failed")
        )

        def apply(df: DataFrame) -> DataFrame:
            return df.withColumn("is_valid", valid_udf(F.col("value"))).withColumn(
                "error_message", err
            )

    else:
        err_udf = F.pandas_udf(err_fn, T.StringType())

        def apply(df: DataFrame) -> DataFrame:
            return df.withColumn("is_valid", valid_udf(F.col("value"))).withColumn(
                "error_message",
                F.when(F.col("is_valid"), F.lit(None).cast("string")).otherwise(
                    err_udf(F.col("value"))
                ),
            )

    return apply


def latest_notifications(notifications: DataFrame, seq_col: str = "offset") -> DataFrame:
    """Last-write-wins per batchId, matching broadcast map-state put()
    semantics (ValidationProcessFunction.scala:215-224). ``seq_col`` is the
    arrival order (Kafka offset in production; any monotone column in
    tests).

    Implemented as max_by over a groupBy rather than a window: one
    partial-aggregating shuffle on a tiny dim, no sort."""
    others = [c for c in notifications.columns if c != "id"]
    return notifications.groupBy("id").agg(
        *[F.max_by(c, F.col(seq_col)).alias(c) for c in others]
    )


@dataclass
class ValidationOutputs:
    """The three projections of one annotated DataFrame (side-output
    parity). ``annotated`` is exposed so foreachBatch can persist it once
    before fanning out."""

    annotated: DataFrame

    @property
    def valid(self) -> DataFrame:
        """Pass-through records for the *.out sink (HriRecord shape,
        headers/key/value/topic/partition/offset preserved)."""
        return self.annotated.filter(F.col("route") == ROUTE_VALID).select(
            "key", "value", "headers", "topic", "partition", "offset"
        )

    @property
    def invalid(self) -> DataFrame:
        """InvalidRecord envelopes for the *.invalid sink
        (ValidationProcessFunction.scala:88-92,104-109,123-128,141-146)."""
        return self.annotated.filter(F.col("route") == ROUTE_INVALID).select(
            F.col("failure"),
            F.col("topic"),
            F.col("partition"),
            F.col("offset").cast("int").alias("offset"),
            F.col("batch_id").alias("batchId"),
        )

    @property
    def counts(self) -> DataFrame:
        """{batchId, isValid} control events for the Tracker
        (ValidationProcessFunction.scala:152-158) — only records that ran
        the validator."""
        return self.annotated.filter(F.col("emit_count")).select(
            F.col("batch_id").alias("batchId"), F.col("is_valid").alias("isValid")
        )


def validate_records(
    records: DataFrame,
    notifications: DataFrame,
    validator: Optional[Validator] = None,
    notification_seq_col: str = "offset",
    notifications_pre_deduped: bool = False,
) -> ValidationOutputs:
    """Annotate a record stream with routing decisions.

    ``records`` must have the HriRecord shape (schemas.HRI_RECORD_SCHEMA);
    ``notifications`` the BatchNotification shape plus ``seq_col``.
    Works identically on batch DataFrames and inside foreachBatch.
    """
    validator = validator or json_validator()

    dim = (
        notifications
        if notifications_pre_deduped
        else latest_notifications(notifications, notification_seq_col)
    )
    dim = dim.select(
        F.col("id").alias("_notif_id"), F.col("status").alias("_notif_status")
    )

    annotated = records.withColumn("batch_id", batch_id_expr("headers"))
    # Broadcast hash join == the reference's broadcast state replication
    # (BaseValidationJob.scala:171): every task sees every notification.
    annotated = annotated.join(
        F.broadcast(dim), annotated["batch_id"] == dim["_notif_id"], "left"
    ).drop("_notif_id")

    annotated = validator(annotated)

    status = F.col("_notif_status")
    gate_pass = (
        F.col("batch_id").isNotNull()
        & status.isNotNull()
        & ~status.isin(Status.TERMINATED, Status.FAILED, Status.COMPLETED)
    )
    annotated = (
        annotated.withColumn(
            "route",
            F.when(F.col("batch_id").isNull(), F.lit(ROUTE_INVALID))
            .when(status.isNull(), F.lit(ROUTE_INVALID))
            .when(status.isin(Status.TERMINATED, Status.FAILED), F.lit(ROUTE_DROP))
            .when(status == Status.COMPLETED, F.lit(ROUTE_INVALID))
            .when(F.col("is_valid"), F.lit(ROUTE_VALID))
            .otherwise(F.lit(ROUTE_INVALID)),
        )
        .withColumn(
            "failure",
            F.when(F.col("batch_id").isNull(), F.lit(ERR_MISSING_BATCH_ID))
            .when(status.isNull(), F.lit(ERR_UNKNOWN_BATCH_ID))
            .when(status == Status.COMPLETED, F.lit(ERR_BATCH_COMPLETED))
            .when(~F.col("is_valid") & gate_pass, F.col("error_message")),
        )
        .withColumn("emit_count", gate_pass)
    )
    return ValidationOutputs(annotated=annotated)
