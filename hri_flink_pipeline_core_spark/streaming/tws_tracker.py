"""Batch tracker on Spark 4's ``transformWithStateInPandas`` —
the successor API to ``applyInPandasWithState`` (tracker_stream.py).

Why both exist: ``transformWithState`` is the first Spark API whose
state primitives map 1:1 onto the reference's Flink operator
(Tracker.scala:30-45):

| reference (Flink)                              | transformWithState          |
|---|---|
| ``ValueState[BatchState]``  (Tracker.scala:30) | ``handle.getValueState``    |
| state TTL 7 d OnCreateAndWrite (BaseValidationJob.scala:352-359) | native ``ttlDurationMs`` on the state handle |
| per-element re-armed processing-time timer (Tracker.scala:116-120) | ``registerTimer``/``deleteTimer``/``listTimers`` |
| ``onTimer`` re-verify + emit (Tracker.scala:93-103) | ``handleExpiredTimer``  |

``applyInPandasWithState`` approximates the timer with a single state
timeout and does TTL eviction by hand; this processor does neither —
the runtime owns both.

Runtime requirement: the TWS Python runner speaks protobuf to the JVM
state server and requires RocksDB state stores
(``spark.sql.streaming.stateStore.providerClass =
...RocksDBStateStoreProvider``). In environments without the
``google.protobuf`` package the module still imports (the processor is
plain Python over the abstract base) but queries cannot start;
``TWS_RUNTIME_AVAILABLE`` reports which world you are in, and
``streaming_tracker`` (tracker_stream.py) is the drop-in fallback with
identical semantics — both fold through ``BatchTrackerState``;
``streaming_tracker_auto`` dispatches to the best available runtime.

Exact missing piece in a bare container (verified): pyspark 4.1.2's
``pyspark/sql/streaming/proto/StateMessage_pb2.py`` (protoc 6.33.0
gencode) imports ``google.protobuf.descriptor/descriptor_pool/
runtime_version/symbol_database`` — i.e. the ``protobuf>=6.33`` runtime
wheel, which pyspark declares only as an optional extra. Everything else
TWS needs (the StatefulProcessor ABC, the RocksDB provider class in the
bundled JVM jars) ships with pyspark itself. ``pip install protobuf``
is the complete fix on a real cluster.

Transition logic is shared with the batch / simulator / AIPWS paths
(operators/tracker.py); this module adds only the state-plumbing shell.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..operators.tracker import DEFAULT_TIMEOUT_MS, STATE_TTL_MS, BatchTrackerState
from ..schemas import Status
from .tracker_stream import (
    KIND_NOTIFICATION,
    STATE_SCHEMA,
    TRACKER_OUTPUT_SCHEMA,
    _outputs_to_pdf,
)

try:  # the ABC itself imports cleanly; the *runtime* additionally needs protobuf
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAVE_ABC = True
except ImportError:  # pragma: no cover - pyspark < 4
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    _HAVE_ABC = False

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues


def tws_runtime_available() -> bool:
    """True when the TWS Python runner's wire dependency (protobuf) is
    importable — the cheapest faithful proxy for 'a
    transformWithStateInPandas query can start here'."""
    if not _HAVE_ABC:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_RUNTIME_AVAILABLE = tws_runtime_available()

# RocksDB is mandatory for transformWithState state stores.
ROCKSDB_PROVIDER_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)

_STATE_NAME = "batchState"


class BatchTrackerProcessor(StatefulProcessor):
    """StatefulProcessor port of the reference Tracker.

    Input rows: the tagged union produced by ``tag_counts`` /
    ``tag_notifications`` (tracker_stream.TRACKER_INPUT_SCHEMA), grouped
    by batchId. Output rows: TRACKER_OUTPUT_SCHEMA terminal
    notifications, at most one per batch.
    """

    def __init__(
        self,
        timeout_ms: int = DEFAULT_TIMEOUT_MS,
        ttl_ms: int = STATE_TTL_MS,
    ) -> None:
        self.timeout_ms = timeout_ms
        self.ttl_ms = ttl_ms

    # -- lifecycle -----------------------------------------------------------
    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.handle = handle
        # native TTL: the runtime evicts state idle past ttl_ms — the
        # reference's 7-day OnCreateAndWrite TTL without manual sweeps
        self.state = handle.getValueState(
            _STATE_NAME, STATE_SCHEMA, ttlDurationMs=self.ttl_ms
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass

    # -- state (de)hydration -------------------------------------------------
    def _load(self) -> BatchTrackerState:
        st = BatchTrackerState(timeout_ms=self.timeout_ms)
        if self.state.exists():
            valid, invalid, is_finished, last_modified, notif_json = self.state.get()
            st.valid = int(valid or 0)
            st.invalid = int(invalid or 0)
            st.is_finished = bool(is_finished)
            st.last_modified = int(last_modified or 0)
            st.notification = json.loads(notif_json) if notif_json else None
        return st

    def _store(self, st: BatchTrackerState) -> None:
        self.state.update(
            (
                st.valid,
                st.invalid,
                st.is_finished,
                st.last_modified,
                json.dumps(st.notification) if st.notification else None,
            )
        )

    def _rearm_timer(self, st: BatchTrackerState, now_ms: int) -> None:
        """The reference registers a fresh completion timer from
        lastModified on every complete-check (Tracker.scala:116-120);
        Flink dedupes identical timestamps, so 'latest wins'. With real
        timer primitives we express that directly: drop stale timers,
        arm one at lastModified + delay iff currently complete."""
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        if st._is_complete():
            self.handle.registerTimer(max(st.last_modified + self.timeout_ms, now_ms))

    # -- runtime hooks -------------------------------------------------------
    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        st = self._load()

        for pdf in rows:
            pdf = pdf.sort_values("seq", kind="stable")
            kinds = pdf["kind"].to_numpy()
            start = 0
            n = len(pdf)
            while start < n:
                end = start
                is_notif = kinds[start] == KIND_NOTIFICATION
                while end < n and (kinds[end] == KIND_NOTIFICATION) == is_notif:
                    end += 1
                chunk = pdf.iloc[start:end]
                if is_notif:
                    for nj in chunk["notification"]:
                        st.on_notification(json.loads(nj), now_ms)
                else:
                    st.feed_counts_vectorized(
                        chunk["isValid"].to_numpy(dtype=bool), now_ms
                    )
                start = end

        self._store(st)
        self._rearm_timer(st, now_ms)
        if st.outputs:
            yield _outputs_to_pdf(st.outputs)

    def handleExpiredTimer(
        self, key, timerValues: "TimerValues", expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # onTimer (Tracker.scala:93-103): re-verify completeness against
        # the *current* counters, emit at most once.
        st = self._load()
        if st._is_complete():
            st._emit(Status.COMPLETED, None)
            self._store(st)
        if st.outputs:
            yield _outputs_to_pdf(st.outputs)


def streaming_tracker_tws(
    tagged: DataFrame,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    ttl_ms: int = STATE_TTL_MS,
) -> DataFrame:
    """transformWithStateInPandas tracker over the tagged union stream.

    Requires the TWS runtime (``TWS_RUNTIME_AVAILABLE``) and the RocksDB
    state-store provider (``ROCKSDB_PROVIDER_CONF``) on the session.
    """
    return tagged.groupBy("batchId").transformWithStateInPandas(
        BatchTrackerProcessor(timeout_ms=timeout_ms, ttl_ms=ttl_ms),
        outputStructType=TRACKER_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def streaming_tracker_auto(
    tagged: DataFrame,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    ttl_ms: int = STATE_TTL_MS,
) -> DataFrame:
    """Best-available tracker runtime: transformWithStateInPandas (native
    TTL + real timers) where its protobuf wire dependency exists, else
    the applyInPandasWithState fallback (tracker_stream.streaming_tracker
    — identical semantics via the shared BatchTrackerState transitions,
    TTL approximated by state timeout). Callers get reference behavior
    either way; which runtime served is observable via
    TWS_RUNTIME_AVAILABLE."""
    if TWS_RUNTIME_AVAILABLE:
        spark = tagged.sparkSession
        spark.conf.set(*ROCKSDB_PROVIDER_CONF)
        return streaming_tracker_tws(tagged, timeout_ms=timeout_ms, ttl_ms=ttl_ms)
    from .tracker_stream import streaming_tracker

    return streaming_tracker(tagged, timeout_ms=timeout_ms)
