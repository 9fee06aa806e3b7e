"""merge_upsert / snapshot_diff semantics on tiny hand-built frames:
key-collision precedence, insert-only keys, null-safe update detection
(NULL -> value and value -> NULL must both classify as update)."""

from pyspark.sql import functions as F

from hri_flink_pipeline_core_spark.operators import relational as R


def test_merge_upsert_update_wins_and_inserts(spark):
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k long, v double, s string",
    )
    upd = spark.createDataFrame(
        [(2, 99.0, "U"), (4, 40.0, "U")], "k long, v double, s string"
    )
    out = {r["k"]: (r["v"], r["s"]) for r in R.merge_upsert(base, upd, ["k"]).collect()}
    assert out == {1: (10.0, "a"), 2: (99.0, "U"), 3: (30.0, "c"), 4: (40.0, "U")}


def test_merge_upsert_multi_key(spark):
    base = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], "k long, t string, v double")
    upd = spark.createDataFrame([(1, "y", 9.0)], "k long, t string, v double")
    out = {(r["k"], r["t"]): r["v"] for r in R.merge_upsert(base, upd, ["k", "t"]).collect()}
    assert out == {(1, "x"): 1.0, (1, "y"): 9.0}


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    new = spark.createDataFrame([(2, 20.0), (3, 99.0), (4, 40.0)], "k long, v double")
    rows = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in R.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # key 2 is unchanged -> filtered out
    assert rows == {
        1: ("delete", 10.0, None),
        3: ("update", 30.0, 99.0),
        4: ("insert", None, 40.0),
    }


def test_snapshot_diff_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, 2.0), (3, None)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0), (2, None), (3, None)], "k long, v double")
    rows = {
        r["k"]: r["change_type"]
        for r in R.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # NULL->value and value->NULL are updates; NULL->NULL is unchanged
    assert rows == {1: "update", 2: "update"}
