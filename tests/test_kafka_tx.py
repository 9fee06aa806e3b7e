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


# ---------------------------------------------------------------------------
# Executor-parallel exactly-once (KafkaPartitionedTransactionalWriter):
# one transactional producer per partition on the executors, per-partition
# epoch logs. Parity target: the reference's parallel EXACTLY_ONCE
# producers, one per task slot (BaseValidationJob.scala:252-259).
#
# The fake producer is file-backed: foreachPartition closures run in
# separate Python worker processes, so committed messages and crash flags
# travel through the filesystem (single O_APPEND write per commit —
# atomic at these sizes). The class is defined inside the factory-builder
# so cloudpickle ships it by value to the workers.
# ---------------------------------------------------------------------------

def _file_fake_factory(broker_file: str, fail_flag: str | None = None):
    """Build a picklable producer factory writing commits to broker_file.

    If ``fail_flag`` is set and exists at commit time for the partition
    id embedded in the flag's content, the commit raises once (the flag
    is consumed) — simulating a mid-batch partition failure."""

    class _FileFake:
        def __init__(self, conf):
            self.conf = conf
            self.tid = conf["transactional.id"]
            self._buf = []
            self._in_tx = False

        def init_transactions(self):
            pass

        def begin_transaction(self):
            self._in_tx = True
            self._buf = []

        def send(self, topic, key, value, headers=None):
            assert self._in_tx, "send outside transaction"
            k = key.decode() if key is not None else ""
            v = value.decode() if value is not None else ""
            self._buf.append(f"{self.tid}\t{topic}\t{k}\t{v}\n")

        def commit_transaction(self):
            import os as _os

            if fail_flag is not None and _os.path.exists(fail_flag):
                with open(fail_flag) as fh:
                    target = fh.read().strip()
                if self.tid.endswith(target):
                    _os.unlink(fail_flag)  # fail once, then recover
                    raise RuntimeError(f"injected commit failure on {self.tid}")
            data = "".join(self._buf).encode()
            fd = _os.open(broker_file, _os.O_WRONLY | _os.O_APPEND | _os.O_CREAT, 0o644)
            try:
                _os.write(fd, data)
            finally:
                _os.close(fd)
            self._in_tx = False
            self._buf = []

        def abort_transaction(self):
            self._in_tx = False
            self._buf = []

    return lambda conf: _FileFake(conf)


def _bulk_df(spark, n=40, parts=4):
    """Kafka-shaped rows with DETERMINISTIC partitioning (hash on key) —
    the replay contract the parallel writer documents."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.encode(F.concat(F.lit("k"), F.col("id")), "UTF-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id")), "UTF-8").alias("value"),
        F.lit("ingest.t.d.out").alias("topic"),
    )
    return df.repartition(parts, "key")


def _broker_lines(broker_file):
    import os as _os

    if not _os.path.exists(broker_file):
        return []
    with open(broker_file) as fh:
        return [l for l in fh.read().splitlines() if l]


def test_partitioned_writer_all_rows_once(spark, tmp_path):
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import (
        KafkaPartitionedTransactionalWriter,
    )

    broker = str(tmp_path / "broker.log")
    w = KafkaPartitionedTransactionalWriter(
        "b:9093",
        f"ptx-{tmp_path.name}",
        producer_factory=_file_fake_factory(broker),
        commit_log_dir=str(tmp_path / "logs"),
    )
    w(_bulk_df(spark), 0)
    lines = _broker_lines(broker)
    keys = sorted(l.split("\t")[2] for l in lines)
    assert keys == sorted(f"k{i}" for i in range(40))
    # per-partition transactional ids and per-partition logs
    tids = {l.split("\t")[0] for l in lines}
    assert all(t.startswith(f"ptx-{tmp_path.name}-p") for t in tids)
    assert len(tids) > 1, "work must spread across partition producers"
    import os as _os

    logs = sorted(_os.listdir(tmp_path / "logs"))
    assert all(l.startswith("p") and l.endswith(".log") for l in logs)
    assert len(logs) == 4


def test_partitioned_writer_replay_skips_committed_epoch(spark, tmp_path):
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import (
        KafkaPartitionedTransactionalWriter,
    )

    broker = str(tmp_path / "broker.log")
    w = KafkaPartitionedTransactionalWriter(
        "b:9093",
        f"ptx-{tmp_path.name}",
        producer_factory=_file_fake_factory(broker),
        commit_log_dir=str(tmp_path / "logs"),
    )
    df = _bulk_df(spark)
    w(df, 0)
    n = len(_broker_lines(broker))
    w(df, 0)  # full-batch replay after recovery
    assert len(_broker_lines(broker)) == n, "replayed epoch must not re-send"


def test_partitioned_restart_no_duplicates(spark, tmp_path):
    """The round-2 verdict's named deliverable: a mid-batch failure on
    ONE partition (its transaction aborts after others committed),
    followed by a driver restart and full-batch replay, must complete
    the epoch with every row delivered EXACTLY once — committed
    partitions skip via their own epoch logs, only the failed partition
    re-sends."""
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import (
        KafkaPartitionedTransactionalWriter,
    )

    broker = str(tmp_path / "broker.log")
    flag = str(tmp_path / "fail_flag")
    with open(flag, "w") as fh:
        fh.write("-p2")  # partition 2's first commit attempt fails
    factory = _file_fake_factory(broker, fail_flag=flag)
    prefix = f"ptx-{tmp_path.name}"
    w1 = KafkaPartitionedTransactionalWriter(
        "b:9093", prefix, producer_factory=factory,
        commit_log_dir=str(tmp_path / "logs"),
    )
    df = _bulk_df(spark)
    with pytest.raises(Exception, match="injected commit failure"):
        w1(df, 0)
    partial = _broker_lines(broker)
    assert 0 < len(partial) < 40, "other partitions committed, p2 aborted"
    assert not any(l.split("\t")[0].endswith("-p2") for l in partial)

    # driver restart: fresh writer, same logs — Spark replays batch 0
    w2 = KafkaPartitionedTransactionalWriter(
        "b:9093", prefix, producer_factory=factory,
        commit_log_dir=str(tmp_path / "logs"),
    )
    w2(df, 0)
    lines = _broker_lines(broker)
    keys = sorted(l.split("\t")[2] for l in lines)
    assert keys == sorted(f"k{i}" for i in range(40)), "exactly once, no dups"
    w2(df, 1)  # next epoch flows normally
    assert len(_broker_lines(broker)) == 80


def test_epoch_log_intent_commit_protocol(tmp_path):
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import EpochLog

    path = str(tmp_path / "log")
    log = EpochLog(path)
    log.record_intent(3)
    assert log.doubtful() == {3}
    log.record_commit(3)
    assert log.doubtful() == set() and 3 in log.committed
    # survives restart; legacy bare-int lines parse as commits
    with open(path, "a") as fh:
        fh.write("7\nI 9\n")
    log2 = EpochLog(path)
    assert log2.committed == {3, 7}
    assert log2.doubtful() == {9}


def test_doubtful_epoch_policies(spark, tmp_path):
    """A crash between Kafka commit and the commit-log append leaves the
    epoch 'doubtful' (intent without commit). resend re-sends (downstream
    offset-identity dedup absorbs a possible duplicate), skip records the
    commit without sending, fail halts with an actionable message."""
    produced = []

    def factory(conf):
        p = FakeProducer(conf)
        produced.append(p)
        return p

    df = _shaped(spark)
    for policy, n_begin, n_after in (("resend", 1, None), ("skip", 0, None)):
        log = str(tmp_path / f"log-{policy}")
        with open(log, "w") as fh:
            fh.write("I 5\n")  # crashed in the commit window
        produced.clear()
        w = KafkaTransactionalWriter(
            "b:9093", "tid", producer_factory=factory, commit_log=log,
            doubtful_epoch_policy=policy,
        )
        w(df, 5)
        begins = sum(p.calls.count("begin_transaction") for p in produced)
        assert begins == n_begin, policy
        assert w.already_committed(5), policy
    log = str(tmp_path / "log-fail")
    with open(log, "w") as fh:
        fh.write("I 5\n")
    w = KafkaTransactionalWriter(
        "b:9093", "tid", producer_factory=factory, commit_log=log,
        doubtful_epoch_policy="fail",
    )
    with pytest.raises(RuntimeError, match="intent but no commit"):
        w(df, 5)


# ---------------------------------------------------------------------------
# Crash-point sweep: inject a failure at EVERY protocol step and check the
# delivered-message multiset after recovery + replay. Exactly-once must
# hold strictly for every crash BEFORE the broker commit takes effect;
# for the two crash points where the broker may have committed but the
# log record didn't land (commit-call-raises-after-effect, crash before
# record_commit), the writer cannot know — policy governs: resend ->
# at-least-once (documented: offset-identity dedup downstream), skip ->
# at-most-once.
# ---------------------------------------------------------------------------

class _Broker:
    """Message store with transactional visibility."""

    def __init__(self):
        self.committed = []


class _CrashingProducer:
    """Drives the real protocol against _Broker; raises at a chosen
    crash point. 'commit_effect_then_raise' commits to the broker AND
    raises — the ambiguous window the intent record exists for."""

    def __init__(self, broker, crash_at=None):
        self.broker = broker
        self.crash_at = crash_at
        self._buf = []
        self._n_send = 0
        self._committed_this_txn = False

    def init_transactions(self):
        pass

    def begin_transaction(self):
        self._committed_this_txn = False
        if self.crash_at == "begin":
            self.crash_at = None
            raise RuntimeError("crash@begin")
        self._buf = []
        self._n_send = 0

    def send(self, topic, key, value, headers=None):
        self._n_send += 1
        if self.crash_at == f"send{self._n_send}":
            self.crash_at = None
            raise RuntimeError("crash@send")
        self._buf.append((topic, key, value))

    def commit_transaction(self):
        if self.crash_at == "commit_before_effect":
            self.crash_at = None
            raise RuntimeError("crash@commit-before")
        self.broker.committed.extend(self._buf)
        self._buf = []
        self._committed_this_txn = True
        if self.crash_at == "commit_effect_then_raise":
            self.crash_at = None
            raise RuntimeError("crash@commit-after-effect")

    def abort_transaction(self):
        # Kafka-client reality: once the commit took effect, abort is
        # illegal and raises — the writer must not get a false
        # "definitively uncommitted" signal for a committed txn.
        if self._committed_this_txn:
            raise RuntimeError("abort after effectful commit")
        self._buf = []


@pytest.mark.parametrize(
    "crash_at,expect_after_recovery",
    [
        ("begin", "exactly_once"),
        ("send1", "exactly_once"),
        ("send3", "exactly_once"),
        ("commit_before_effect", "exactly_once"),
        # broker committed, writer saw an error -> doubtful epoch
        ("commit_effect_then_raise", "policy"),
    ],
)
def test_crash_point_sweep_driver_writer(spark, tmp_path, crash_at,
                                         expect_after_recovery):
    df = _shaped(spark)  # 3 rows
    for policy in (["resend", "skip"] if expect_after_recovery == "policy"
                   else ["resend"]):
        broker = _Broker()
        log = str(tmp_path / f"log-{crash_at}-{policy}")
        producer = _CrashingProducer(broker, crash_at=crash_at)
        w1 = KafkaTransactionalWriter(
            "b:9093", "tid", producer_factory=lambda conf: producer,
            commit_log=log, doubtful_epoch_policy=policy,
        )
        with pytest.raises(RuntimeError, match="crash@"):
            w1(df, 0)
        # recovery: fresh writer instance, same durable log, same broker
        w2 = KafkaTransactionalWriter(
            "b:9093", "tid",
            producer_factory=lambda conf: _CrashingProducer(broker),
            commit_log=log, doubtful_epoch_policy=policy,
        )
        w2(df, 0)  # Spark replays the failed micro-batch
        n = len(broker.committed)
        if expect_after_recovery == "exactly_once":
            assert n == 3, f"{crash_at}: every row exactly once"
        elif policy == "resend":
            assert n == 6, "doubtful+resend: at-least-once, dedupable"
        else:
            assert n == 3, "doubtful+skip: at-most-once, no resend"
        assert w2.already_committed(0)
        w2(df, 0)  # further replays are no-ops either way
        assert len(broker.committed) == n


def test_crash_before_commit_record_is_doubtful(spark, tmp_path):
    """Crash AFTER a successful broker commit but BEFORE record_commit
    (process death in the log-append window): replay must treat the
    epoch as doubtful, not silently resend without signal."""
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import EpochLog

    df = _shaped(spark)
    broker = _Broker()
    log = str(tmp_path / "log")

    class _DiesBeforeRecord(KafkaTransactionalWriter):
        def __call__(self, batch_df, batch_id):
            orig = self._log.record_commit
            self._log.record_commit = lambda e: (_ for _ in ()).throw(
                OSError("process died before log append")
            )
            try:
                super().__call__(batch_df, batch_id)
            finally:
                self._log.record_commit = orig

    w1 = _DiesBeforeRecord(
        "b:9093", "tid", producer_factory=lambda c: _CrashingProducer(broker),
        commit_log=log,
    )
    with pytest.raises(OSError):
        w1(df, 0)
    assert len(broker.committed) == 3  # broker commit landed
    assert EpochLog(log).doubtful() == {0}
    # skip policy: recovery does not duplicate
    w2 = KafkaTransactionalWriter(
        "b:9093", "tid", producer_factory=lambda c: _CrashingProducer(broker),
        commit_log=log, doubtful_epoch_policy="skip",
    )
    w2(df, 0)
    assert len(broker.committed) == 3


def test_fenced_producer_replaced_after_failed_abort(spark, tmp_path):
    """A producer that cannot even abort is fenced/dead (a newer
    incarnation bumped the Kafka epoch). The writer must evict it so the
    next epoch re-inits a fresh producer — otherwise a long-lived driver
    fails every subsequent batch through the dead handle. After a
    SUCCESSFUL abort the producer is kept (Kafka contract: reusable)."""
    produced = []

    def factory(conf):
        p = FakeProducer(conf)
        produced.append(p)
        return p

    w = KafkaTransactionalWriter(
        "b:9093", "tid", producer_factory=factory,
        commit_log=str(tmp_path / "log"),
    )
    df = _shaped(spark)
    w(df, 0)
    p = produced[0]
    # transient failure, abort succeeds -> same producer kept
    p.fail_on_send = True
    with pytest.raises(RuntimeError, match="broker gone"):
        w(df, 1)
    p.fail_on_send = False
    w(df, 1)
    assert len(produced) == 1
    # fenced: send fails AND abort throws -> producer evicted
    p.fail_on_send = True
    p.abort_transaction = lambda: (_ for _ in ()).throw(
        RuntimeError("ProducerFencedException")
    )
    with pytest.raises(RuntimeError, match="broker gone"):
        w(df, 2)
    w(df, 2)  # recovery: a FRESH producer (init_transactions re-fences)
    assert len(produced) == 2
    assert produced[1].calls[0] == "init_transactions"
    assert w.already_committed(2)


def test_aborted_intent_is_not_doubtful(spark, tmp_path):
    """Regression (round-3 review): a commit_transaction failure whose
    abort SUCCEEDS means the broker definitively has no data — the
    epoch must NOT be classified doubtful, or policy 'skip' would
    silently drop the batch on replay. The abort record clears the
    intent; the replay is a plain re-send under EVERY policy."""
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import EpochLog

    df = _shaped(spark)  # 3 rows
    for policy in ("resend", "skip", "fail"):
        broker = _Broker()
        log = str(tmp_path / f"log-{policy}")
        producer = _CrashingProducer(broker, crash_at="commit_before_effect")
        w1 = KafkaTransactionalWriter(
            "b:9093", "tid", producer_factory=lambda conf: producer,
            commit_log=log, doubtful_epoch_policy=policy,
        )
        with pytest.raises(RuntimeError, match="crash@commit-before"):
            w1(df, 0)
        assert EpochLog(log).doubtful() == set(), policy
        w2 = KafkaTransactionalWriter(
            "b:9093", "tid",
            producer_factory=lambda conf: _CrashingProducer(broker),
            commit_log=log, doubtful_epoch_policy=policy,
        )
        w2(df, 0)  # replay: plain re-send, no policy involvement
        assert len(broker.committed) == 3, policy
        assert w2.already_committed(0)


def test_epoch_log_rearmed_intent_after_abort(tmp_path):
    """I -> A -> I must parse as doubtful (the re-attempt's outcome is
    unknown), while I -> A alone is not — last record per epoch wins."""
    from hri_flink_pipeline_core_spark.sinks.kafka_tx import EpochLog

    path = str(tmp_path / "log")
    with open(path, "w") as fh:
        fh.write("I 1\nA 1\nI 2\nA 2\nI 2\n")
    log = EpochLog(path)
    assert log.doubtful() == {2}
    log2 = EpochLog(path)
    log2.record_abort(2)
    assert log2.doubtful() == set()
    log2.record_intent(2)
    assert log2.doubtful() == {2}
