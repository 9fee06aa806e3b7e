"""Record envelope schemas.

The reference's data model (SURVEY.md §1.1) has exactly four record
types; each maps to a fixed Spark StructType. Payloads stay opaque
``BinaryType`` by design — the engine never parses ``value`` unless a
validator asks to (reference: serialization/HriRecordDeserializer.scala:14-18).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- HriRecord (reference: serialization/HriRecord.scala:11-18) -------------
# Identical to the schema spark.readStream.format("kafka") with
# includeHeaders=true produces, so Kafka sources need no reshaping.
HEADER_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.BinaryType(), True),
        ]
    )
)

HRI_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("headers", HEADER_TYPE, True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
    ]
)

# --- BatchNotification (reference: hri-api-batch-notification dep; field
# surface per jobtest/sources/TestBatchNotification.scala:35-47) -------------
BATCH_NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("dataType", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("startDate", T.TimestampType(), True),
        T.StructField("endDate", T.TimestampType(), True),
        T.StructField("expectedRecordCount", T.IntegerType(), True),
        T.StructField("actualRecordCount", T.IntegerType(), True),
        T.StructField("invalidRecordCount", T.IntegerType(), True),
        T.StructField("invalidThreshold", T.IntegerType(), True),
        T.StructField("failureMessage", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


class Status:
    """BatchNotification.Status enum values (reference usage:
    ValidationProcessFunction.scala:115-119, Tracker.scala:132-156).

    JSON wire values are camelCase (e.g. ``sendCompleted``)."""

    STARTED = "started"
    SEND_COMPLETED = "sendCompleted"
    COMPLETED = "completed"
    FAILED = "failed"
    TERMINATED = "terminated"

    ALL = (STARTED, SEND_COMPLETED, COMPLETED, FAILED, TERMINATED)
    TERMINAL = (COMPLETED, FAILED, TERMINATED)


# --- InvalidRecord (reference: ValidationProcessFunction.scala:88-92,
# 104-109,123-128,141-146; a *pointer* to the bad record, not the record) ----
INVALID_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("failure", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.IntegerType(), True),  # int-cast per reference :92
        T.StructField("batchId", T.StringType(), True),
    ]
)

# --- Count event (reference: ValidationProcessFunction.scala:152-158) -------
COUNT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("batchId", T.StringType(), False),
        T.StructField("isValid", T.BooleanType(), False),
    ]
)

# Exact error strings (reference: ValidationProcessFunction.scala:42-45).
ERR_MISSING_BATCH_ID = "Bad Message - No header or batchId node"
ERR_UNKNOWN_BATCH_ID = "Bad Message - Unknown batchId"
ERR_BATCH_COMPLETED = "Bad Message - batchId is already completed"
