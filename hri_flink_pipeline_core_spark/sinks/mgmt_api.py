"""HTTP side-effect sink: the Management-API callback.

Reference: MgmtApiSink.scala:43-92 (per-terminal-notification PUT with
retry policy) and MgmtClient.scala:44-145 (OAuth client-credentials token
per call, processingComplete / fail / getBatchId requests).

Spark-first placement: terminal notifications are tiny (at most one per
batch), so the sink runs driver-side inside ``foreachBatch`` — a
``collect()`` of a handful of rows followed by synchronous HTTP, exactly
the volume profile the reference notes ("computation is very minimal",
README.md:28). No executor-side HTTP state, no connection pools to
serialize.

Retry policy parity (MgmtApiSink.scala:25-27,57-92):

- initial backoff 1 s, doubling, capped at 5 min
- overall deadline 24 h, then raise
- HTTP 409  -> warn + skip (batch already in desired state)
- other 4xx -> raise immediately (bad request/credentials; unrecoverable)
- anything else (5xx, network error) -> retry

Transport is an injectable callable so tests exercise the full policy
with a fake; the default uses urllib (stdlib, no extra dependency).
"""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..schemas import Status

INITIAL_BACKOFF_S = 1.0  # MgmtApiSink.scala:25
MAX_BACKOFF_S = 300.0  # MgmtApiSink.scala:26
MAX_RETRY_S = 24 * 3600.0  # MgmtApiSink.scala:27

# Transport: (method, url, headers, body_bytes) -> (status_code, body_bytes)
Transport = Callable[[str, str, dict, Optional[bytes]], tuple]


class RequestException(Exception):
    """Non-2xx HTTP response (reference: MgmtClient.scala RequestException)."""

    def __init__(self, msg: str, status_code: int):
        super().__init__(msg)
        self.status_code = status_code


class FatalSinkError(Exception):
    """Unrecoverable sink failure (reference raises FlinkException)."""


TRUSTSTORE_ENV = "HRI_TRUSTSTORE"  # MgmtClient.scala trustStoreEnv
TRUSTSTORE_PASSWORD_ENV = "HRI_TRUSTSTORE_PASSWORD"


def build_ssl_context():
    """TLS context honoring the reference's truststore env vars
    (MgmtClient.scala createHttpClient): unset -> default context;
    HRI_TRUSTSTORE set -> use it as the CA bundle (PEM here, where the
    JVM reference uses a JKS store — same contract, Python-native
    format); set-but-missing file -> FileNotFoundError. The JKS password
    has no PEM equivalent; if only the password is set the same
    both-or-neither rule applies."""
    import os
    import ssl

    path = os.environ.get(TRUSTSTORE_ENV)
    if not path:
        return ssl.create_default_context()
    if not os.path.isfile(path):
        raise FileNotFoundError(f"Not found or not a file: {path}")
    return ssl.create_default_context(cafile=path)


def _urllib_transport(method: str, url: str, headers: dict, body: Optional[bytes]):
    ctx = build_ssl_context() if url.startswith("https") else None
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, context=ctx) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()


@dataclass
class MgmtClient:
    """OAuth-authenticated Management-API client
    (reference: MgmtClient.scala:44-145).

    Every call fetches a fresh client-credentials token (the reference
    does the same — one token request per action call,
    MgmtClient.scala:55,77,93)."""

    base_uri: str
    client_id: str
    client_secret: str
    audience: str
    oauth_service_base_url: str
    transport: Transport = field(default=_urllib_transport)

    # --- OAuth (MgmtClient.scala:102-128) ----------------------------------
    def get_oauth_access_token(self, tenant_id: str) -> str:
        credentials = base64.b64encode(
            f"{self.client_id}:{self.client_secret}".encode()
        ).decode()
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "scope": f"hri_internal hri_consumer tenant_{tenant_id}",
                "audience": self.audience,
            }
        ).encode()
        status, resp = self.transport(
            "POST",
            f"{self.oauth_service_base_url}/token",
            {
                "Authorization": f"Basic {credentials}",
                "Content-Type": "application/x-www-form-urlencoded",
            },
            body,
        )
        if status != 200:
            raise RequestException(f"{status}: {resp.decode(errors='replace')}", status)
        return json.loads(resp)["access_token"]

    # --- actions (MgmtClient.scala:45-100) ---------------------------------
    def _put_action(self, tenant_id: str, batch_id: str, action: str, body: dict):
        token = self.get_oauth_access_token(tenant_id)
        url = f"{self.base_uri}/tenants/{tenant_id}/batches/{batch_id}/action/{action}"
        status, resp = self.transport(
            "PUT",
            url,
            {
                "Authorization": f"Bearer {token}",
                "Content-Type": "application/json",
            },
            json.dumps(body, ensure_ascii=False).encode(),
        )
        if status != 200:
            raise RequestException(f"{status}: {resp.decode(errors='replace')}", status)

    def processing_complete(
        self, tenant_id: str, batch_id: str, actual_count: int, invalid_count: int
    ) -> None:
        self._put_action(
            tenant_id,
            batch_id,
            "processingComplete",
            {"actualRecordCount": actual_count, "invalidRecordCount": invalid_count},
        )

    def fail_batch(
        self,
        tenant_id: str,
        batch_id: str,
        actual_count: int,
        invalid_count: int,
        failure_message: str,
    ) -> None:
        self._put_action(
            tenant_id,
            batch_id,
            "fail",
            {
                "actualRecordCount": actual_count,
                "invalidRecordCount": invalid_count,
                "failureMessage": failure_message,
            },
        )

    def get_batch_id(self, tenant_id: str, batch_id: str) -> Optional[dict]:
        """Synchronous batch lookup (BatchLookup.scala:11-13). Returns the
        parsed BatchNotification dict, or raises RequestException."""
        token = self.get_oauth_access_token(tenant_id)
        url = f"{self.base_uri}/tenants/{tenant_id}/batches/{batch_id}"
        status, resp = self.transport(
            "GET", url, {"Authorization": f"Bearer {token}"}, None
        )
        if status != 200:
            raise RequestException(f"{status}: {resp.decode(errors='replace')}", status)
        return json.loads(resp)


def retry_with_backoff(
    fn: Callable[[], None],
    initial_backoff_s: float = INITIAL_BACKOFF_S,
    max_backoff_s: float = MAX_BACKOFF_S,
    max_retry_s: float = MAX_RETRY_S,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> None:
    """The reference's retry combinator (MgmtApiSink.scala:57-92):
    exponential backoff with 409-skip and 4xx-abort. ``sleep``/``clock``
    injectable for deterministic tests."""
    backoff = initial_backoff_s
    start = clock()
    while True:
        try:
            fn()
            return
        except RequestException as ex:
            code = ex.status_code
            if code == 409:
                # already in the desired state; nothing to do
                return
            if 400 <= code < 500:
                raise FatalSinkError(
                    f"Call to HRI Management API failed: {ex}."
                ) from ex
            # else retry
        except FatalSinkError:
            raise
        except Exception:
            pass  # network/transport error -> retry
        if clock() - start > max_retry_s:
            raise FatalSinkError(
                f"Reached max HRI Management API retry timeout of "
                f"{int(max_retry_s / 3600)} hours"
            )
        sleep(backoff)
        backoff = min(max_backoff_s, backoff * 2)


@dataclass
class MgmtApiSink:
    """Dispatch terminal notifications to the Management API
    (MgmtApiSink.scala:43-54): COMPLETED -> processingComplete,
    FAILED -> fail, anything else -> unrecoverable error."""

    tenant_id: str
    client: MgmtClient
    sleep: Callable[[float], None] = field(default=time.sleep)
    clock: Callable[[], float] = field(default=time.monotonic)

    def invoke(self, notification: dict) -> None:
        status = notification.get("status")
        batch_id = notification.get("id") or notification.get("batchId")
        actual = int(notification.get("actualRecordCount") or 0)
        invalid = int(notification.get("invalidRecordCount") or 0)
        if status == Status.COMPLETED:
            call = lambda: self.client.processing_complete(  # noqa: E731
                self.tenant_id, batch_id, actual, invalid
            )
        elif status == Status.FAILED:
            call = lambda: self.client.fail_batch(  # noqa: E731
                self.tenant_id,
                batch_id,
                actual,
                invalid,
                notification.get("failureMessage"),
            )
        else:
            raise FatalSinkError(
                f"Received unexpected status: '{status}' for batch: '{batch_id}'"
            )
        retry_with_backoff(call, sleep=self.sleep, clock=self.clock)

    def foreach_batch_writer(self):
        """Adapter for ``writeStream.foreachBatch``: collects the (tiny)
        terminal-notification micro-batch on the driver and invokes the
        HTTP calls sequentially."""

        def write(batch_df, _batch_id: int) -> None:
            for row in batch_df.collect():
                self.invoke(row.asDict(recursive=True))

        return write
