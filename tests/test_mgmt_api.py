"""Port of MgmtApiSinkTest.scala (9 tests: retry, 409 skip, 4xx abort,
max-retry timeout, bad-status error) and MgmtClientTest.scala (request
shapes: exact URLs, OAuth headers/body, UTF-8) using a fake transport.
"""

import base64
import json
import urllib.parse

import pytest

from hri_flink_pipeline_core_spark.schemas import Status
from hri_flink_pipeline_core_spark.sinks.mgmt_api import (
    FatalSinkError,
    MgmtApiSink,
    MgmtClient,
    RequestException,
    retry_with_backoff,
)

TOKEN_RESP = json.dumps({"access_token": "tok-123"}).encode()


class FakeTransport:
    """Scripted transport: token requests always succeed; action requests
    pop responses off a list."""

    def __init__(self, action_responses):
        self.action_responses = list(action_responses)
        self.requests = []

    def __call__(self, method, url, headers, body):
        self.requests.append((method, url, headers, body))
        if url.endswith("/token"):
            return 200, TOKEN_RESP
        if not self.action_responses:
            raise AssertionError("unexpected extra request")
        return self.action_responses.pop(0)


def make_client(responses):
    t = FakeTransport(responses)
    return MgmtClient(
        "https://mgmt.example/hri", "cid", "csecret", "aud", "https://oauth.example",
        transport=t,
    ), t


class FakeClock:
    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


# --- client request shapes (MgmtClientTest.scala) --------------------------

def test_processing_complete_request_shape():
    client, t = make_client([(200, b"")])
    client.processing_complete("t1", "b1", 10, 2)
    (m_tok, u_tok, h_tok, b_tok), (m, u, h, b) = t.requests
    # OAuth request (MgmtClient.scala:102-128)
    assert u_tok == "https://oauth.example/token"
    creds = base64.b64encode(b"cid:csecret").decode()
    assert h_tok["Authorization"] == f"Basic {creds}"
    form = urllib.parse.parse_qs(b_tok.decode())
    assert form["grant_type"] == ["client_credentials"]
    assert form["scope"] == ["hri_internal hri_consumer tenant_t1"]
    assert form["audience"] == ["aud"]
    # action request (MgmtClient.scala:52-64)
    assert m == "PUT"
    assert u == "https://mgmt.example/hri/tenants/t1/batches/b1/action/processingComplete"
    assert h["Authorization"] == "Bearer tok-123"
    assert json.loads(b) == {"actualRecordCount": 10, "invalidRecordCount": 2}


def test_fail_batch_request_shape_utf8():
    client, t = make_client([(200, b"")])
    client.fail_batch("t1", "b1", 5, 5, "太多无效记录 中文")
    _, (m, u, h, b) = t.requests
    assert u == "https://mgmt.example/hri/tenants/t1/batches/b1/action/fail"
    assert json.loads(b)["failureMessage"] == "太多无效记录 中文"


def test_get_batch_id():
    payload = json.dumps({"id": "b1", "status": "started", "extraField": 1}).encode()
    client, t = make_client([(200, payload)])
    batch = client.get_batch_id("t1", "b1")
    assert batch["id"] == "b1"
    _, (m, u, h, b) = t.requests
    assert m == "GET"
    assert u == "https://mgmt.example/hri/tenants/t1/batches/b1"


def test_non_200_raises_request_exception():
    client, _ = make_client([(404, b"not found")])
    with pytest.raises(RequestException) as ei:
        client.get_batch_id("t1", "missing")
    assert ei.value.status_code == 404


# --- retry combinator (MgmtApiSink.scala:57-92) ----------------------------

def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RequestException("503: unavailable", 503)

    retry_with_backoff(flaky, sleep=sleeps.append, clock=FakeClock())
    assert calls["n"] == 4
    assert sleeps == [1.0, 2.0, 4.0]  # doubling from 1 s


def test_retry_backoff_caps_at_five_minutes():
    sleeps = []
    clock = FakeClock()
    calls = {"n": 0}

    def failing():
        calls["n"] += 1
        if calls["n"] <= 12:
            raise RequestException("500: boom", 500)

    retry_with_backoff(failing, sleep=sleeps.append, clock=clock)
    assert max(sleeps) == 300.0
    assert sleeps[:3] == [1.0, 2.0, 4.0]


def test_retry_409_skips_silently():
    def conflict():
        raise RequestException("409: already in desired state", 409)

    retry_with_backoff(conflict, sleep=lambda s: None, clock=FakeClock())


def test_retry_4xx_aborts_immediately():
    calls = {"n": 0}

    def bad_request():
        calls["n"] += 1
        raise RequestException("401: bad credentials", 401)

    with pytest.raises(FatalSinkError, match="Call to HRI Management API failed"):
        retry_with_backoff(bad_request, sleep=lambda s: None, clock=FakeClock())
    assert calls["n"] == 1


def test_retry_deadline_24h():
    clock = FakeClock()

    def failing():
        raise RequestException("500: boom", 500)

    def sleep(s):
        clock.now += s * 3600  # accelerate: every backoff second = 1 h

    with pytest.raises(FatalSinkError, match="Reached max HRI Management API retry timeout of 24 hours"):
        retry_with_backoff(failing, sleep=sleep, clock=clock)


def test_network_error_is_retried():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("connection refused")

    retry_with_backoff(flaky, sleep=lambda s: None, clock=FakeClock())
    assert calls["n"] == 2


# --- sink dispatch (MgmtApiSink.scala:43-54) -------------------------------

def _sink(responses):
    client, t = make_client(responses)
    return MgmtApiSink("t1", client, sleep=lambda s: None, clock=FakeClock()), t


def test_sink_completed_calls_processing_complete():
    sink, t = _sink([(200, b"")])
    sink.invoke(
        {"id": "b1", "status": Status.COMPLETED,
         "actualRecordCount": 7, "invalidRecordCount": 1}
    )
    assert t.requests[-1][1].endswith("/tenants/t1/batches/b1/action/processingComplete")


def test_sink_failed_calls_fail():
    sink, t = _sink([(200, b"")])
    sink.invoke(
        {"id": "b1", "status": Status.FAILED, "actualRecordCount": 5,
         "invalidRecordCount": 5, "failureMessage": "too many invalid"}
    )
    assert t.requests[-1][1].endswith("/tenants/t1/batches/b1/action/fail")
    assert json.loads(t.requests[-1][3])["failureMessage"] == "too many invalid"


def test_sink_unexpected_status_raises():
    sink, _ = _sink([])
    with pytest.raises(FatalSinkError, match="Received unexpected status"):
        sink.invoke({"id": "b1", "status": Status.STARTED})


def test_sink_retries_5xx_then_succeeds():
    sink, t = _sink([(500, b"boom"), (200, b"")])
    sink.invoke(
        {"id": "b1", "status": Status.COMPLETED,
         "actualRecordCount": 1, "invalidRecordCount": 0}
    )
    actions = [r for r in t.requests if "/action/" in r[1]]
    assert len(actions) == 2


# --- truststore env handling (MgmtClient.scala createHttpClient) -----------

def test_ssl_context_default_when_unset(monkeypatch):
    from hri_flink_pipeline_core_spark.sinks.mgmt_api import build_ssl_context

    monkeypatch.delenv("HRI_TRUSTSTORE", raising=False)
    ctx = build_ssl_context()
    assert ctx is not None


def test_ssl_context_missing_file_raises(monkeypatch):
    from hri_flink_pipeline_core_spark.sinks.mgmt_api import build_ssl_context

    monkeypatch.setenv("HRI_TRUSTSTORE", "/nonexistent/trust.pem")
    with pytest.raises(FileNotFoundError, match="Not found or not a file"):
        build_ssl_context()
