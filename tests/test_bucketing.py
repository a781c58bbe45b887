"""Bucketed-table co-located joins: the shuffle-free path for repeated
big-big joins (SURVEY §4 physical positions; pyspark guide 'Partitioning &
shuffle'). Writing both sides bucketed by the join key lets sort-merge join
skip BOTH exchanges."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import get_operator


def run(op, spark, inputs, **config):
    return get_operator(op)(spark, inputs, config, {})


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    run("sink.table", spark, [orders.withColumnRenamed("o_orderkey", "okey")],
        table="b_orders", mode="overwrite", buckets=8, bucket_by=["okey"])
    run("sink.table", spark,
        [lineitem.withColumnRenamed("l_orderkey", "okey")],
        table="b_lineitem", mode="overwrite", buckets=8, bucket_by=["okey"])
    yield "b_orders", "b_lineitem"
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    a = run("source.table", spark, [], table=t1)
    b = run("source.table", spark, [], table=t2)
    joined = run("join", spark, [a, b], how="inner", keys=["okey"],
                 select_left=["okey", "o_totalprice"],
                 select_right=["l_quantity"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: zero shuffles
    # and the same join over raw parquet DOES shuffle
    raw_a = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    raw_b = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    raw = raw_a.join(raw_b, raw_a.o_orderkey == raw_b.l_orderkey)
    assert "Exchange" in raw._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_correct(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    a = run("source.table", spark, [], table=t1)
    b = run("source.table", spark, [], table=t2)
    joined = run("join", spark, [a, b], how="inner", keys=["okey"],
                 select_left=["okey"], select_right=["l_quantity"])
    want = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == want
