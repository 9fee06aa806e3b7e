"""Physical-plan assertions: the optimizations the engine's design
depends on must actually appear in the executed plan — broadcast hash
join for the notification dim, predicate pushdown and column pruning
reaching the parquet scan, no nested-loop join in the bucketized
interval join, partial aggregation for count_by_key.
"""

import contextlib
import io

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_validation_uses_broadcast_hash_join(spark, sf001):
    out = entry._validation_outputs(spark, sf001)
    plan = plan_of(out.annotated)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the dim must never shuffle the facts


def test_filter_pushdown_reaches_scan(spark, sf001):
    df = entry.q_filter_orders(spark, sf001)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan


def test_column_pruning_reaches_scan(spark, sf001):
    df = entry.q_project_net_price(spark, sf001)
    plan = plan_of(df)
    # only the three needed columns are read, not the full lineitem row
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read and "l_extendedprice" in read
    assert "l_shipdate" not in read and "l_comment" not in read


def test_interval_join_is_not_nested_loop(spark, sf001):
    df = entry.q_interval_join_anchor_windows(spark, sf001)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_count_by_key_has_partial_aggregation(spark, sf001):
    df = entry.q_count_by_key(spark, sf001)
    plan = plan_of(df, mode="simple")
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_semi_and_anti_joins_planned_as_joins(spark, sf001):
    semi = plan_of(entry.q_semi_join_customers_with_orders(spark, sf001))
    anti = plan_of(entry.q_anti_join_customers_without_orders(spark, sf001))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_minhash_pipeline_shuffles_are_aggregates_not_sorts(spark, sf001):
    from hri_flink_pipeline_core_spark.operators.dedup import minhash_lsh_candidates
    from hri_flink_pipeline_core_spark.session import read_table

    df = minhash_lsh_candidates(read_table(spark, sf001, "documents"))
    plan = plan_of(df, mode="simple")
    # the skew guard must be a broadcast anti-join, not a window sort
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
