"""Skew-mitigation equivalence: salted plans must return identical results
to unsalted ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import get_operator
from tests.conftest import rows


def run(op, spark, inputs, **config):
    return get_operator(op)(spark, inputs, config, {})


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the classic hot key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(0, "hot"), (11, "a"), (25, "b")], "k long, label string"
    )
    return left, right


def test_salted_join_equals_plain(spark, skewed):
    left, right = skewed
    plain = run("join", spark, [left, right], how="inner", keys=["k"],
                select_left=["k", "v"], select_right=["label"])
    salted = run("join", spark, [left, right], how="inner", keys=["k"],
                 skew_salt=8,
                 select_left=["k", "v"], select_right=["label"])
    assert rows(plain) == rows(salted)


def test_salted_left_join_equals_plain(spark, skewed):
    left, right = skewed
    plain = run("join", spark, [left, right], how="left", keys=["k"],
                select_left=["k", "v"], select_right=["label"])
    salted = run("join", spark, [left, right], how="left", keys=["k"],
                 skew_salt=4,
                 select_left=["k", "v"], select_right=["label"])
    assert rows(plain) == rows(salted)


def test_salted_join_rejects_full(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="skew_salt"):
        run("join", spark, [left, right], how="full", keys=["k"], skew_salt=4)


def test_salted_aggregate_equals_plain(spark, skewed):
    left, _ = skewed
    aggs = {
        "n": ("count", "*"),
        "total": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
        "mean": ("avg", "v"),
    }
    plain = run("aggregate", spark, [left], keys=["k"], aggs=aggs)
    salted = run("aggregate", spark, [left], keys=["k"], aggs=aggs, salt=8)
    assert rows(plain) == rows(salted)


def test_salted_aggregate_rejects_holistic(spark, skewed):
    left, _ = skewed
    with pytest.raises(ValueError, match="not salt-combinable"):
        run("aggregate", spark, [left], keys=["k"],
            aggs={"d": ("count_distinct", "v")}, salt=4)
