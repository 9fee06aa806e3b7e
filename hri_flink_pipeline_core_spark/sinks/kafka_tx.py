"""Transactional (exactly-once) Kafka producer discipline for foreachBatch.

Reference parity: the Flink job writes valid records with a transactional
producer under Semantic.EXACTLY_ONCE, committing on every checkpoint
(BaseValidationJob.scala:252-259) with ``transaction.timeout.ms=900000``
(BaseValidationJob.scala:331-334). Spark's built-in Kafka sink is
at-least-once, so exactly-once must be layered on in ``foreachBatch``:

- ONE Kafka transaction per micro-batch: begin -> send every row ->
  commit. A failure anywhere aborts the transaction, so read_committed
  consumers never observe a partial batch.
- A durable commit log (one line per committed epoch) makes replays
  idempotent: when Spark re-runs a micro-batch after recovery, the
  already-committed epoch id is recognized and the batch is skipped —
  this is the Spark-idiomatic replacement for Flink's checkpoint-
  coordinated two-phase commit (the micro-batch id IS the epoch).
- ``transactional.id`` is stable per query so a restarted driver fences
  any zombie producer from the previous incarnation (Kafka bumps the
  producer epoch on init_transactions).

Scale note (100 TB honesty): the driver-side single-transaction mode
streams rows through the driver (``toLocalIterator`` — bounded memory,
but driver-bandwidth bound). That is the right trade for control-plane
topics (notifications: ~1 row per batch) and moderate *.out volumes.
For bulk data topics the scale path remains the built-in executor-
parallel Kafka sink plus the offset-identity idempotence contract
(records carry source topic/partition/offset — sinks/kafka.py), because
a single cross-executor Kafka transaction per micro-batch has no
coordinator in Spark. Both options are exposed; the pipeline picks per
topic class.

The producer is injected (``producer_factory``) so tests — and
environments without a broker, like this one — drive the exact same
transaction state machine with a fake. A real deployment passes e.g.
``lambda conf: confluent_kafka.Producer(conf)``.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

# Flink parity defaults (BaseValidationJob.scala:313-350): Event Streams
# message-size workaround and the 15-minute transaction timeout.
TRANSACTION_TIMEOUT_MS = 900_000
DEFAULT_PRODUCER_CONF = {
    "transaction.timeout.ms": str(TRANSACTION_TIMEOUT_MS),
    "compression.type": "zstd",
    "batch.size": "16384",
    "max.request.size": "10485760",
    "enable.idempotence": "true",
    "acks": "all",
}


class KafkaTransactionalWriter:
    """Exactly-once micro-batch writer: one transaction per epoch,
    epoch-id commit log for replay idempotence, stable transactional.id
    for zombie fencing.

    Use as the ``foreachBatch`` callback::

        writer = KafkaTransactionalWriter("brokers:9093", "hri-valid-out",
                                          producer_factory=make_producer,
                                          commit_log=ckpt + "/tx-commits")
        (shaped_df.writeStream.foreachBatch(writer).start())

    The DataFrame must carry the Kafka sink shape produced by
    sinks/kafka.py: ``topic STRING, key BINARY, value BINARY`` and
    optionally ``headers ARRAY<STRUCT<key STRING, value BINARY>>``.
    """

    def __init__(
        self,
        bootstrap_servers: str,
        transactional_id: str,
        producer_factory: Callable[[dict], object],
        commit_log: Optional[str] = None,
        producer_conf: Optional[dict] = None,
    ) -> None:
        self.bootstrap_servers = bootstrap_servers
        self.transactional_id = transactional_id
        self._factory = producer_factory
        self._commit_log = commit_log
        self._producer = None
        self._committed: set[int] = set()
        conf = dict(DEFAULT_PRODUCER_CONF)
        conf.update(producer_conf or {})
        conf["bootstrap.servers"] = bootstrap_servers
        conf["transactional.id"] = transactional_id
        self.producer_conf = conf
        if commit_log and os.path.exists(commit_log):
            with open(commit_log, "r", encoding="utf-8") as fh:
                self._committed = {int(line) for line in fh if line.strip()}

    # -- transaction state machine -------------------------------------
    def _get_producer(self):
        if self._producer is None:
            self._producer = self._factory(dict(self.producer_conf))
            # Fences any zombie with the same transactional.id and
            # aborts its in-flight transaction (Kafka epoch bump).
            self._producer.init_transactions()
        return self._producer

    def _record_commit(self, batch_id: int) -> None:
        self._committed.add(batch_id)
        if self._commit_log:
            os.makedirs(os.path.dirname(self._commit_log) or ".", exist_ok=True)
            with open(self._commit_log, "a", encoding="utf-8") as fh:
                fh.write(f"{batch_id}\n")
                fh.flush()
                os.fsync(fh.fileno())

    def already_committed(self, batch_id: int) -> bool:
        return batch_id in self._committed

    # -- foreachBatch entry point --------------------------------------
    def __call__(self, batch_df, batch_id: int) -> None:
        """Write one micro-batch in one transaction. Replayed epochs
        (same batch_id after recovery) are skipped — their data is
        already committed, so re-sending would duplicate."""
        if self.already_committed(batch_id):
            return
        producer = self._get_producer()
        producer.begin_transaction()
        try:
            # toLocalIterator: rows stream to the driver one partition
            # at a time — bounded memory, no full collect.
            self.send_rows(producer, batch_df.toLocalIterator())
            producer.commit_transaction()
        except Exception:
            producer.abort_transaction()
            raise
        self._record_commit(batch_id)

    @staticmethod
    def send_rows(producer, rows: Iterable) -> None:
        for row in rows:
            headers = None
            if "headers" in row.__fields__ and row["headers"] is not None:
                headers = [
                    (h["key"], bytes(h["value"]) if h["value"] is not None else None)
                    for h in row["headers"]
                ]
            producer.send(
                topic=row["topic"],
                key=bytes(row["key"]) if row["key"] is not None else None,
                value=bytes(row["value"]) if row["value"] is not None else None,
                headers=headers,
            )

    def close(self) -> None:
        if self._producer is not None and hasattr(self._producer, "close"):
            self._producer.close()
        self._producer = None


def confluent_producer_factory(conf: dict):
    """Real-broker producer factory: adapts confluent-kafka's Producer to
    the send/transaction protocol this writer drives. Gated behind an
    import-try — the library is not bundled; install ``confluent-kafka``
    on a real deployment (the tests use a fake with the same protocol)."""
    try:
        from confluent_kafka import Producer  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - not in this container
        raise RuntimeError(
            "exactly-once Kafka mode needs the confluent-kafka package "
            "(pip install confluent-kafka); the at-least-once built-in "
            "Spark sink needs nothing extra"
        ) from exc

    class _Adapter:  # pragma: no cover - requires a broker
        def __init__(self, c):
            self._p = Producer(c)

        def init_transactions(self):
            self._p.init_transactions()

        def begin_transaction(self):
            self._p.begin_transaction()

        def send(self, topic, key, value, headers=None):
            self._p.produce(topic, key=key, value=value, headers=headers)

        def commit_transaction(self):
            self._p.flush()
            self._p.commit_transaction()

        def abort_transaction(self):
            self._p.abort_transaction()

        def close(self):
            self._p.flush()

    return _Adapter(conf)
