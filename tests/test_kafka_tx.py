"""Transactional exactly-once Kafka writer (sinks/kafka_tx.py).

Reference parity targets: transactional producer + commit-per-checkpoint
(BaseValidationJob.scala:252-259), transaction.timeout.ms=900000
(BaseValidationJob.scala:331-334). The fake producer records the exact
call sequence so the transaction state machine is asserted, not mocked
away.
"""

import pytest

from hri_flink_pipeline_core_spark.sinks.kafka_tx import (
    DEFAULT_PRODUCER_CONF,
    KafkaTransactionalWriter,
    TRANSACTION_TIMEOUT_MS,
)
from hri_flink_pipeline_core_spark.sinks import kafka as ksink


class FakeProducer:
    def __init__(self, conf):
        self.conf = conf
        self.calls = []
        self.sent = []
        self.fail_on_send = False

    def init_transactions(self):
        self.calls.append("init_transactions")

    def begin_transaction(self):
        self.calls.append("begin_transaction")

    def send(self, topic, key, value, headers=None):
        if self.fail_on_send:
            raise RuntimeError("broker gone")
        self.calls.append("send")
        self.sent.append((topic, key, value, headers))

    def commit_transaction(self):
        self.calls.append("commit_transaction")

    def abort_transaction(self):
        self.calls.append("abort_transaction")

    def close(self):
        self.calls.append("close")


@pytest.fixture
def writer_and_producer(tmp_path):
    produced = []

    def factory(conf):
        p = FakeProducer(conf)
        produced.append(p)
        return p

    w = KafkaTransactionalWriter(
        "broker:9093",
        "hri-validation-tx-1",
        producer_factory=factory,
        commit_log=str(tmp_path / "tx-commits"),
    )
    return w, produced


def _shaped(spark):
    """Kafka-sink-shaped rows via the real serializer projection."""
    df = spark.createDataFrame(
        [("k1", b"v1"), ("k2", b"v2"), (None, None)],
        "key string, value binary",
    )
    from pyspark.sql import functions as F

    return df.select(
        F.encode("key", "UTF-8").alias("key"),
        "value",
        F.array(
            F.struct(
                F.lit("passThru").alias("key"),
                F.encode(F.lit("h中文"), "UTF-8").alias("value"),
            )
        ).alias("headers"),
        F.lit("ingest.t.d.out").alias("topic"),
    )


def test_one_transaction_per_batch_commit(spark, writer_and_producer):
    w, produced = writer_and_producer
    df = _shaped(spark)
    w(df, 0)
    w(df, 1)
    p = produced[0]
    assert len(produced) == 1, "one producer reused across batches"
    # init once, then begin/sends/commit per micro-batch
    assert p.calls[0] == "init_transactions"
    assert p.calls.count("begin_transaction") == 2
    assert p.calls.count("commit_transaction") == 2
    assert p.calls.count("abort_transaction") == 0
    assert (
        p.calls.index("commit_transaction")
        > p.calls.index("begin_transaction")
    )
    assert len(p.sent) == 6  # 3 rows x 2 batches


def test_abort_on_failure_then_no_commit_record(spark, writer_and_producer):
    w, produced = writer_and_producer
    df = _shaped(spark)
    w(df, 0)
    produced[0].fail_on_send = True
    with pytest.raises(RuntimeError, match="broker gone"):
        w(df, 1)
    p = produced[0]
    assert p.calls.count("abort_transaction") == 1
    assert p.calls.count("commit_transaction") == 1  # only batch 0
    assert not w.already_committed(1)
    # retry after recovery succeeds and commits
    p.fail_on_send = False
    w(df, 1)
    assert p.calls.count("commit_transaction") == 2
    assert w.already_committed(1)


def test_replayed_batch_is_skipped(spark, writer_and_producer):
    w, produced = writer_and_producer
    df = _shaped(spark)
    w(df, 7)
    n_sent = len(produced[0].sent)
    w(df, 7)  # micro-batch replay after recovery
    assert len(produced[0].sent) == n_sent, "replay must not re-send"
    assert produced[0].calls.count("begin_transaction") == 1


def test_commit_log_survives_restart(spark, tmp_path):
    log = str(tmp_path / "tx-commits")
    produced = []

    def factory(conf):
        p = FakeProducer(conf)
        produced.append(p)
        return p

    w1 = KafkaTransactionalWriter(
        "b:9093", "tid", producer_factory=factory, commit_log=log
    )
    df = _shaped(spark)
    w1(df, 0)
    w1(df, 1)
    # driver restart: fresh writer instance, same commit log
    w2 = KafkaTransactionalWriter(
        "b:9093", "tid", producer_factory=factory, commit_log=log
    )
    w2(df, 1)  # replayed epoch — must skip
    w2(df, 2)  # new epoch — must write
    assert len(produced) == 2
    assert produced[1].calls.count("begin_transaction") == 1
    assert produced[1].sent and produced[1].sent[0][0] == "ingest.t.d.out"


def test_producer_conf_flink_parity(writer_and_producer, spark):
    w, produced = writer_and_producer
    w(_shaped(spark), 0)
    conf = produced[0].conf
    # BaseValidationJob.scala:331-334 / :330,336-347
    assert conf["transaction.timeout.ms"] == str(TRANSACTION_TIMEOUT_MS)
    assert conf["max.request.size"] == "10485760"
    assert conf["batch.size"] == "16384"
    assert conf["compression.type"] == "zstd"
    assert conf["enable.idempotence"] == "true"
    assert conf["transactional.id"] == "hri-validation-tx-1"
    assert conf["bootstrap.servers"] == "broker:9093"
    assert DEFAULT_PRODUCER_CONF["transaction.timeout.ms"] == "900000"


def test_headers_and_nulls_preserved(spark, writer_and_producer):
    w, produced = writer_and_producer
    w(_shaped(spark), 0)
    sent = produced[0].sent
    # UTF-8 header bytes round-trip; null key/value preserved
    assert all(h == [("passThru", "h中文".encode())] for _, _, _, h in sent)
    null_rows = [s for s in sent if s[1] is None]
    assert len(null_rows) == 1 and null_rows[0][2] is None
    keys = {s[1] for s in sent if s[1] is not None}
    assert keys == {b"k1", b"k2"}


def test_valid_sink_shape_feeds_tx_writer(spark, writer_and_producer):
    """End-to-end: hri_record_sink projection -> transactional writer."""
    from pyspark.sql import functions as F

    w, produced = writer_and_producer
    valid = spark.createDataFrame(
        [(b"k", b"payload")], "key binary, value binary"
    ).withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit("batchId").alias("key"),
                F.lit(b"b1").alias("value"),
            )
        ),
    )
    shaped = ksink.hri_record_sink(valid, "ingest.t.d.out")
    w(shaped, 0)
    assert produced[0].sent == [
        ("ingest.t.d.out", b"k", b"payload", [("batchId", b"b1")])
    ]


def test_confluent_factory_gate_names_the_missing_dep():
    """Without confluent-kafka the factory must fail loudly at writer
    construction time with an actionable message, never silently degrade
    to at-least-once."""
    try:
        import confluent_kafka  # noqa: F401

        pytest.skip("confluent-kafka present — gate not exercisable")
    except ImportError:
        pass
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import (
        confluent_producer_factory,
    )

    with pytest.raises(RuntimeError, match="confluent-kafka"):
        confluent_producer_factory({"bootstrap.servers": "b:9093"})


def test_cli_exactly_once_flag_parses():
    from hri_flink_pipeline_core_spark.cli import build_parser

    a = build_parser().parse_args(
        ["--brokers", "b:9092", "--input", "ingest.t.d.in", "--exactly-once"]
    )
    assert a.exactly_once is True
    a2 = build_parser().parse_args(["--brokers", "b:9092", "--input", "ingest.t.d.in"])
    assert a2.exactly_once is False
