"""Reshaping: Pivot / Unpivot (SURVEY §2.9).

The reference only *recognizes* these component types
(data_engineering_parser.py:1098-1099, 1220-1225) — no codegen. Real
implementations here.

Scale note: always pass explicit pivot values — without them Spark runs an
extra distinct job over 100 TB just to discover the columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ssis_to_pyspark_agent_spark.operators import operator
from ssis_to_pyspark_agent_spark.operators.agg import build_aggs


@operator("pivot")
def pivot(spark: SparkSession, inputs, config, context) -> DataFrame:
    """config: keys (set keys), pivot_col (PivotKeyValue source), values
    (explicit pivoted values — strongly recommended), aggs (as aggregate
    op; default first(value))."""
    df: DataFrame = inputs[0]
    g = df.groupBy(*config["keys"])
    p = g.pivot(config["pivot_col"], config.get("values"))
    aggs = config.get("aggs")
    if aggs:
        out = p.agg(*build_aggs(aggs))
    else:
        from pyspark.sql import functions as F

        out = p.agg(F.first(config["value_col"]))
    if (fv := config.get("fill_value")) is not None:
        value_cols = [c for c in out.columns if c not in config["keys"]]
        out = out.fillna(fv, subset=value_cols)
    return out


@operator("unpivot")
def unpivot(spark: SparkSession, inputs, config, context) -> DataFrame:
    """columns -> rows. config: ids, values (columns to melt),
    var_col (default 'key'), value_col (default 'value'),
    drop_nulls (SSIS unpivot skips nulls by default)."""
    df: DataFrame = inputs[0]
    out = df.unpivot(
        config["ids"],
        config["values"],
        config.get("var_col", "key"),
        config.get("value_col", "value"),
    )
    if config.get("drop_nulls", True):
        out = out.filter(out[config.get("value_col", "value")].isNotNull())
    return out
