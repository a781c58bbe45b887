"""Set operations (SURVEY §2.6).

Union All is by-name (``unionByName``), not positional — the reference's
``df1.union(df2)`` (enhanced_json_mapper.py:244-249) silently mismatches
columns when input orders differ; by-name is strictly safer and free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator


@operator("union_all")
def union_all(spark: SparkSession, inputs, config, context) -> DataFrame:
    """N-ary Union All (no dedup). `allow_missing` fills absent columns
    with null (SSIS maps unmatched columns explicitly; this is the
    equivalent default)."""
    allow = config.get("allow_missing", True)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow), inputs)


@operator("merge_sorted")
def merge_sorted(spark: SparkSession, inputs, config, context) -> DataFrame:
    """SSIS Merge: union of two sorted inputs preserving sort order — NOT a
    join (reference parser docstring data_engineering_parser.py:814-817; the
    mapper conflates it with MERGE_JOIN at enhanced_json_mapper.py:310-321,
    a bug). In Spark order is a property of the plan, so: union, then
    re-establish the order. `keys`: [(col, 'asc'|'desc'), ...] or [col,...].
    """
    df = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), inputs)
    return df.orderBy(*sort_cols(config["keys"]))


def sort_cols(keys) -> list:
    """[(col, 'asc'|'desc'), ...] or [col, ...] -> list of ordered Columns."""
    out = []
    for k in keys:
        name, direction = (k, "asc") if isinstance(k, str) else k
        c = F.col(name)
        out.append(c.asc() if direction.lower() == "asc" else c.desc())
    return out


@operator("intersect")
def intersect(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Not in the reference (SURVEY §2.6 notes set-op completeness);
    `all=True` -> intersectAll (bag semantics)."""
    a, b = inputs[0], inputs[1]
    return a.intersectAll(b) if config.get("all") else a.intersect(b)


@operator("except")
def except_op(spark: SparkSession, inputs, config, context) -> DataFrame:
    a, b = inputs[0], inputs[1]
    return a.exceptAll(b) if config.get("all") else a.subtract(b)
