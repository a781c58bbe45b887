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
        if fn in ("percentile", "percentile_approx"):
            # exact percentile (sort-based; interpolating like SQL
            # percentile_cont); percentile_approx is the 100 TB
            # single-pass sketch path. One percentage -> scalar column,
            # several -> array column (Spark-native semantics; a single
            # extra may itself be a list for the array form). For
            # percentile_approx a trailing int > 1 is the ACCURACY
            # argument (percentages live in [0,1]), matching Spark's
            # (col, percentage, accuracy) signature.
            extras = list(extra)
            acc = None
            if (fn == "percentile_approx" and len(extras) >= 2
                    and isinstance(extras[-1], int) and extras[-1] > 1):
                acc = extras.pop()
            pcts = extras if len(extras) != 1 else extras[0]
            pf = F.percentile if fn == "percentile" else F.percentile_approx
            args = (pcts if extras else 0.5,) + ((acc,) if acc else ())
            out.append(pf(col, *args).alias(name))
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
    if gid := config.get("emit_grouping_id"):
        # expose which grouping set produced each row (leftmost key =
        # most significant bit, Spark's grouping_id contract) — lets a
        # caller derive rollup/grouping-sets rows from ONE cube pass
        # instead of re-aggregating per mode (r11, guide §2.4: share
        # one exchange)
        if mode == "groupby":
            raise ValueError("emit_grouping_id needs a multi-set mode")
        aggs = list(aggs) + [F.grouping_id().alias(gid)]
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


@operator("profile")
def profile(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Column profiler: ONE pass over the data, one output row per column
    with (column, dtype, n_rows, n_nonnull, n_distinct, min/max, mean).

    config:
      columns: subset to profile (default: all)
      exact_distinct: False (default) -> approx_count_distinct — the
        single-pass HLL sketch is the only sane shape at 100 TB; True ->
        exact countDistinct (adds the expand shuffle, oracle-able).

    Output typing: numeric min/max/mean surface as DOUBLE (min_num /
    max_num / mean); string and timestamp min/max surface as STRING
    (min_str / max_str; timestamps via CAST->string, identical
    'yyyy-MM-dd HH:mm:ss' rendering in Spark and DuckDB). The mean goes
    through exact DECIMAL(25,4) sums -> string -> double (engine-exact);
    min/max of doubles are original stored values, no arithmetic.

    All statistics compile into a single groupBy().agg() — Catalyst
    executes partial aggregation map-side, so the profile costs one scan
    + one 1-row shuffle regardless of column count; the per-column pivot
    to rows is a stack() over that single row (driver-free).
    """
    df: DataFrame = inputs[0]
    cols = config.get("columns") or df.columns
    exact = config.get("exact_distinct", False)
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double",
               "decimal"}

    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        is_num = dt.split("(")[0] in numeric
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_nn_{c}"))
        aggs.append(
            (F.count_distinct(col) if exact
             else F.approx_count_distinct(col)).alias(f"_nd_{c}")
        )
        if is_num:
            aggs.append(F.min(col).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"_max_{c}"))
            aggs.append(
                (F.sum(col.cast("decimal(25,4)")).cast("string")
                 .cast("double") / F.count(col)).alias(f"_mean_{c}")
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"_smin_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"_smax_{c}"))

    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    parts: list[Column] = []
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        is_num = dt.split("(")[0] in numeric
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt).alias("dtype"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nonnull"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"_max_{c}") if is_num else null_d).alias("max_num"),
                (F.col(f"_mean_{c}") if is_num else null_d).alias("mean"),
                (null_s if is_num else F.col(f"_smin_{c}")).alias("min_str"),
                (null_s if is_num else F.col(f"_smax_{c}")).alias("max_str"),
            )
        )
    return one.select(
        F.explode(F.array(*parts)).alias("_p")
    ).select("_p.*")
