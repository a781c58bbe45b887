"""Aggregations (SURVEY §2.7).

SSIS Aggregate supports Group by / Sum / Avg / Count / Count distinct /
Min / Max (reference parse data_engineering_parser.py:1210-1213; codegen is
a TODO skeleton at enhanced_json_mapper.py:2004-2018 — this operator is the
real implementation the reference never finished).

Scale notes: groupBy is a partial (map-side) aggregation followed by one
shuffle on the keys — the right plan at 100 TB. ``count_distinct`` forces a
second shuffle (expand); `approx` trades it for a single-pass HLL sketch
(`approx_count_distinct`) — exposed per-agg for the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "count": F.count,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "min": F.min,
    "max": F.max,
    "first": F.first,
    "last": F.last,
    "stddev": F.stddev,
    "variance": F.variance,
    "collect_set": F.collect_set,
    "collect_list": F.collect_list,
    "median": F.median,
    "sum_distinct": F.sum_distinct,
}


def build_aggs(aggs: dict) -> list[Column]:
    """`aggs`: out_name -> (fn, col) | (fn, Column) | Column.

    'count' with col '*' -> count(1). Every output is aliased (the oracle
    hash compare is name-sensitive)."""
    out: list[Column] = []
    for name, spec in aggs.items():
        if isinstance(spec, Column):
            out.append(spec.alias(name))
            continue
        fn, colspec = spec[0], spec[1]
        extra = spec[2:] if len(spec) > 2 else ()
        if fn == "count" and colspec in ("*", 1):
            out.append(F.count(F.lit(1)).alias(name))
            continue
        col = colspec if isinstance(colspec, Column) else F.col(colspec)
        if fn == "percentile":
            out.append(F.percentile_approx(col, list(extra) or 0.5).alias(name))
            continue
        out.append(_AGG_FNS[fn](col, *extra).alias(name))
    return out


@operator("aggregate")
def aggregate(spark: SparkSession, inputs, config, context) -> DataFrame:
    """config:
      keys: group-by columns ([] = global aggregate)
      aggs: out_name -> (fn, col[, extra]) — see build_aggs
      mode: 'groupby' (default) | 'rollup' | 'cube' (SURVEY §2.7: not in the
            reference; exposed because Spark gives them free)
      grouping_sets: explicit sets (list of lists) via SQL GROUPING SETS
    """
    df: DataFrame = inputs[0]
    keys = config.get("keys", [])
    mode = config.get("mode", "groupby")
    if salt := config.get("salt"):
        return _salted_aggregate(df, keys, config["aggs"], salt,
                                 config.get("seed", 42))
    aggs = build_aggs(config["aggs"])
    if mode == "groupby":
        g = df.groupBy(*keys)
    elif mode == "rollup":
        g = df.rollup(*keys)
    elif mode == "cube":
        g = df.cube(*keys)
    elif mode == "grouping_sets":
        sets = [list(s) for s in config["grouping_sets"]]
        g = df.groupingSets(sets, *keys)
    else:
        raise ValueError(f"unknown aggregate mode {mode!r}")
    return g.agg(*aggs)


_SALT_COMBINE = {
    "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
    "collect_set": lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
}


def _salted_aggregate(df: DataFrame, keys, aggs: dict, salt: int, seed: int):
    """Two-phase aggregation for skewed group keys: phase 1 aggregates on
    (keys + random salt) so one hot key spreads over `salt` reducers;
    phase 2 combines the partials on the true keys.

    Spark's hash aggregate already does map-side partials, so this only
    pays off when a single key overflows a reducer even after that —
    restricted to algebraic functions (sum/count/min/max/avg); holistic
    ones (count_distinct, median) can't be combined from partials.
    """
    phase1: list[Column] = []
    combine: list[Column] = []
    for name, spec in aggs.items():
        if isinstance(spec, Column):
            raise ValueError("salted aggregate needs (fn, col) specs")
        fn, colspec = spec[0], spec[1]
        col = colspec if isinstance(colspec, Column) else (
            F.lit(1) if (fn == "count" and colspec in ("*", 1)) else F.col(colspec)
        )
        if fn == "count":
            phase1.append(F.count(col).alias(f"_p_{name}"))
            combine.append(F.sum(f"_p_{name}").alias(name))
        elif fn in ("avg", "mean"):
            phase1.append(F.sum(col).alias(f"_ps_{name}"))
            phase1.append(F.count(col).alias(f"_pc_{name}"))
            combine.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )
        elif fn in _SALT_COMBINE:
            phase1.append(_AGG_FNS[fn](col).alias(f"_p_{name}"))
            combine.append(_SALT_COMBINE[fn](F.col(f"_p_{name}")).alias(name))
        else:
            raise ValueError(f"aggregate fn {fn!r} is not salt-combinable")
    salted = df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*phase1)
    return partial.groupBy(*keys).agg(*combine)
