"""Port of the reference's Tracker operator-harness tier
(TrackerTest.scala, 18 scenarios) onto TrackerSimulator — same events,
same manual processing-time advance, same expected outputs.

Default fixture parity: invalidThreshold=5
(TrackerTest.scala:createTestBatchNotificationObject), timeout 300 000 ms.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hri_flink_pipeline_core_spark.operators.tracker import (
    BatchTrackerState,
    TrackerSimulator,
)
from hri_flink_pipeline_core_spark.schemas import Status

BATCH = "batch-42"
TIMEOUT = 300_000


def notif(
    batch_id=BATCH,
    expected=100,
    status=Status.SEND_COMPLETED,
    threshold=5,
    **extra,
):
    n = {
        "id": batch_id,
        "name": "batch-name",
        "topic": "ingest.t.di.in",
        "dataType": "claims",
        "status": status,
        "expectedRecordCount": expected,
        "invalidThreshold": threshold,
    }
    n.update(extra)
    return n


@pytest.fixture
def sim():
    return TrackerSimulator(timeout_ms=TIMEOUT)


def counts(sim, batch_id=BATCH):
    st_ = sim.states[batch_id]
    return st_.valid, st_.invalid


# --- counter updates (TrackerTest.scala:41-102) ----------------------------

def test_valid_counts(sim):
    for _ in range(3):
        sim.send_count(BATCH, True)
    assert counts(sim) == (3, 0)
    assert sim.outputs() == []


def test_invalid_counts(sim):
    for _ in range(2):
        sim.send_count(BATCH, False)
    assert counts(sim) == (0, 2)


def test_mixed_counts(sim):
    for v in [True, False, True, False, False, False]:
        sim.send_count(BATCH, v)
    assert counts(sim) == (2, 4)
    assert sim.outputs() == []


# --- invalid threshold (TrackerTest.scala:104-169) -------------------------

def test_threshold_eq_sends_failed(sim):
    sim.send_notification(notif(expected=100))
    for _ in range(5):
        sim.send_count(BATCH, False)
    assert counts(sim) == (0, 5)
    out = sim.outputs()
    assert len(out) == 1
    o = out[0]
    assert o["status"] == Status.FAILED
    assert o["expectedRecordCount"] == 100
    assert o["actualRecordCount"] == 5
    assert o["invalidRecordCount"] == 5
    assert o["failureMessage"] == (
        f"Failing Batch: {BATCH}, too many invalid records invalidCount: "
        "5 == invalidThreshold: 5"
    )


def test_threshold_exceeded_sends_only_one_failed(sim):
    sim.send_notification(notif(expected=10))
    for _ in range(10):
        sim.send_count(BATCH, False)
    assert counts(sim) == (0, 10)
    out = sim.outputs()
    assert len(out) == 1
    # counter snapshot at fire time (TrackerTest.scala:164-167)
    assert out[0]["actualRecordCount"] == 5
    assert out[0]["invalidRecordCount"] == 5
    assert sim.states[BATCH].is_finished


# --- completion via timer (TrackerTest.scala:171-243,436-473,548-585) ------

def test_complete_after_timer_counts_after_notification(sim):
    sim.send_notification(notif(expected=12))
    for _ in range(8):
        sim.send_count(BATCH, True)
    for _ in range(3):
        sim.send_count(BATCH, False)
    sim.send_count(BATCH, True)
    assert sim.outputs() == []  # not before the timer
    sim.set_processing_time(TIMEOUT + 500)
    out = sim.outputs()
    assert len(out) == 1
    o = out[0]
    assert o["status"] == Status.COMPLETED
    assert o["actualRecordCount"] == 12
    assert o["invalidRecordCount"] == 3
    assert o.get("failureMessage") is None
    assert o["dataType"] == "claims"
    assert o["name"] == "batch-name"


def test_complete_after_timer_notification_after_counts(sim):
    for _ in range(6):
        sim.send_count(BATCH, True)
    sim.send_count(BATCH, False)
    sim.send_count(BATCH, False)
    sim.send_notification(notif(expected=8))
    assert sim.outputs() == []
    sim.set_processing_time(TIMEOUT + 500)
    out = sim.outputs()
    assert len(out) == 1
    assert out[0]["status"] == Status.COMPLETED
    assert out[0]["actualRecordCount"] == 8
    assert out[0]["invalidRecordCount"] == 2


def test_undercount_never_completes(sim):
    sim.send_notification(notif(expected=100))
    for v in [True, True, True, True, True, False]:
        sim.send_count(BATCH, v)
    sim.set_processing_time(TIMEOUT + 500)
    assert sim.outputs() == []


def test_send_completed_before_any_counts_no_output(sim):
    # TrackerTest.scala:376-393 — STARTED then SEND_COMPLETED with no
    # counts yet: no output, no crash
    sim.send_notification(notif(expected=2, status=Status.STARTED))
    sim.send_notification(notif(expected=2, status=Status.SEND_COMPLETED))
    assert sim.outputs() == []


def test_sparse_notification_no_crash(sim):
    # beyond reference: a notification missing optional fields must not
    # crash the fold (lenient-JSON parity, NotificationDeserializer.scala:26-29)
    sim.send_notification({"id": BATCH, "status": Status.SEND_COMPLETED})
    sim.send_count(BATCH, True)
    assert len(sim.outputs()) == 1  # overflow: 1 > default expected 0


# --- overflow (TrackerTest.scala:314-374,474-546,586-658) ------------------

def test_overflow_within_timeout_fails_immediately(sim):
    sim.send_notification(notif(expected=100))
    for _ in range(100):
        sim.send_count(BATCH, True)
    assert sim.outputs() == []
    sim.send_count(BATCH, False)  # 101st, before the timer
    out = sim.outputs()
    assert len(out) == 1
    o = out[0]
    assert o["status"] == Status.FAILED
    assert o["actualRecordCount"] == 101
    assert o["invalidRecordCount"] == 1
    assert o["failureMessage"] == (
        f"Failing batch: {BATCH}, received too many records, "
        "actualRecordCount: 101 > expectedRecordCount: 100"
    )
    # stale timer fires later: still exactly one output
    sim.set_processing_time(TIMEOUT + 500)
    assert len(sim.outputs()) == 1


def test_overflow_via_notification_arrival(sim):
    for _ in range(9):
        sim.send_count(BATCH, True)
    sim.send_count(BATCH, False)
    sim.send_notification(notif(expected=8))
    out = sim.outputs()
    assert len(out) == 1
    assert out[0]["status"] == Status.FAILED
    assert out[0]["actualRecordCount"] == 10


def test_late_record_after_completion_is_ignored(sim):
    sim.send_notification(notif(expected=100))
    for _ in range(100):
        sim.send_count(BATCH, True)
    sim.set_processing_time(TIMEOUT + 500)
    out = sim.outputs()
    assert len(out) == 1
    assert out[0]["status"] == Status.COMPLETED
    assert out[0]["invalidRecordCount"] == 0
    sim.send_count(BATCH, False)  # late arrival, batch finished
    assert len(sim.outputs()) == 1


# --- batch isolation (TrackerTest.scala:395-434) ---------------------------

def test_two_batches_are_isolated(sim):
    other = "batch-other"
    sim.send_notification(notif(expected=2))
    sim.send_notification(notif(batch_id=other, expected=50))
    sim.send_count(BATCH, True)
    sim.send_count(BATCH, True)
    sim.send_count(other, True)
    sim.set_processing_time(TIMEOUT + 500)
    assert len(sim.outputs(BATCH)) == 1
    assert sim.outputs(BATCH)[0]["status"] == Status.COMPLETED
    assert sim.outputs(other) == []


# --- notification merge keeps counters (Tracker.scala:72-90) ---------------

def test_notification_update_preserves_counters(sim):
    sim.send_count(BATCH, True)
    sim.send_count(BATCH, False)
    sim.send_notification(notif(status=Status.STARTED, expected=10))
    assert counts(sim) == (1, 1)
    sim.send_notification(notif(status=Status.SEND_COMPLETED, expected=2))
    # counts survived both updates; second notification completes the batch
    sim.set_processing_time(TIMEOUT + 500)
    assert sim.outputs()[0]["status"] == Status.COMPLETED


def test_terminated_batch_never_threshold_fails(sim):
    # _too_many_invalid excludes TERMINATED (Tracker.scala:153-162)
    sim.send_notification(notif(status=Status.TERMINATED))
    for _ in range(7):
        sim.send_count(BATCH, False)
    assert sim.outputs() == []


def test_threshold_minus_one_disables_check(sim):
    sim.send_notification(notif(threshold=-1, expected=1000))
    for _ in range(50):
        sim.send_count(BATCH, False)
    assert sim.outputs() == []


def test_timer_rearmed_from_last_modified(sim):
    # Tracker.scala:118 — the timer is lastModified + delay; activity at
    # t=0 completes the batch, a stale-timer fire before a new arm must
    # re-check against current counters.
    sim.send_notification(notif(expected=2))
    sim.send_count(BATCH, True)
    sim.send_count(BATCH, True)  # complete at t=0, timer armed for t=300000
    sim.send_count(BATCH, False)  # overflow -> FAILED immediately
    out = sim.outputs()
    assert len(out) == 1 and out[0]["status"] == Status.FAILED
    sim.set_processing_time(TIMEOUT + 500)  # stale timer: no second output
    assert len(sim.outputs()) == 1


# --- vectorized fold == per-event fold (property) --------------------------

@settings(max_examples=200, deadline=None)
@given(
    flags=st.lists(st.booleans(), min_size=0, max_size=60),
    expected=st.integers(min_value=0, max_value=40),
    threshold=st.integers(min_value=-1, max_value=10),
    status=st.sampled_from(
        [Status.STARTED, Status.SEND_COMPLETED, Status.TERMINATED]
    ),
    notif_first=st.booleans(),
)
def test_vectorized_fold_matches_sequential(
    flags, expected, threshold, status, notif_first
):
    n = notif(expected=expected, threshold=threshold, status=status)

    seq = BatchTrackerState(timeout_ms=TIMEOUT)
    vec = BatchTrackerState(timeout_ms=TIMEOUT)
    if notif_first:
        seq.on_notification(n, 0)
        vec.on_notification(n, 0)
    for flag in flags:
        seq.on_count(flag, 0)
    vec.feed_counts_vectorized(np.array(flags, dtype=bool), 0)
    if not notif_first:
        seq.on_notification(n, 0)
        vec.on_notification(n, 0)

    assert (seq.valid, seq.invalid, seq.is_finished) == (
        vec.valid,
        vec.invalid,
        vec.is_finished,
    )
    assert seq.outputs == vec.outputs
