"""As-of join unit scenarios (operators/asof.py): before/at/after
semantics, tie-breaking, missing matches, multiple keys interleaved.
"""

from datetime import datetime

from hri_flink_pipeline_core_spark.operators.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


def make_dfs(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "id long, k string, t timestamp")
    right = spark.createDataFrame(right_rows, "k string, rt timestamp, rv long")
    return left, right


def run(spark, left_rows, right_rows):
    left, right = make_dfs(spark, left_rows, right_rows)
    out = asof_join(
        left, right, keys=["k"], left_time="t", right_time="rt",
        right_cols=["rv"], right_tiebreak="rv",
    )
    return {r.id: r.rv for r in out.collect()}


def test_asof_basic_before_at_after(spark):
    got = run(
        spark,
        [
            (1, "a", ts("2024-01-01T00:00:00")),  # before any right -> null
            (2, "a", ts("2024-01-02T00:00:00")),  # exactly at r1 -> r1 (ties match)
            (3, "a", ts("2024-01-02T12:00:00")),  # between r1 and r2 -> r1
            (4, "a", ts("2024-01-05T00:00:00")),  # after all -> r2
        ],
        [
            ("a", ts("2024-01-02T00:00:00"), 10),
            ("a", ts("2024-01-03T00:00:00"), 20),
        ],
    )
    assert got == {1: None, 2: 10, 3: 10, 4: 20}


def test_asof_tiebreak_highest_wins(spark):
    got = run(
        spark,
        [(1, "a", ts("2024-01-02T00:00:00"))],
        [
            ("a", ts("2024-01-01T00:00:00"), 7),
            ("a", ts("2024-01-01T00:00:00"), 9),  # same rt: higher rv wins
            ("a", ts("2024-01-01T00:00:00"), 8),
        ],
    )
    assert got == {1: 9}


def test_asof_keys_are_isolated(spark):
    got = run(
        spark,
        [
            (1, "a", ts("2024-01-02T00:00:00")),
            (2, "b", ts("2024-01-02T00:00:00")),
            (3, "c", ts("2024-01-02T00:00:00")),  # key with no right rows
        ],
        [
            ("a", ts("2024-01-01T00:00:00"), 1),
            ("b", ts("2024-01-01T00:00:00"), 2),
        ],
    )
    assert got == {1: 1, 2: 2, 3: None}


def test_asof_preserves_all_left_columns(spark):
    left, right = make_dfs(
        spark,
        [(1, "a", ts("2024-01-02T00:00:00"))],
        [("a", ts("2024-01-01T00:00:00"), 5)],
    )
    out = asof_join(
        left, right, keys=["k"], left_time="t", right_time="rt",
        right_cols=["rv"],
    )
    row = out.collect()[0]
    assert (row.id, row.k, row.t, row.rv) == (1, "a", ts("2024-01-02T00:00:00"), 5)
    assert set(out.columns) == {"id", "k", "t", "rv"}
