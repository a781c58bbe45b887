"""Sorts / limits / top-k / window functions (SURVEY §2.8, §2.10).

SSIS Sort = multi-key sort with per-key direction + EliminateDuplicates
(reference parse data_engineering_parser.py:1215-1218; the mapper's
fallback sorts by ALL columns when keys are missing,
enhanced_json_mapper.py:1959 — a crutch we don't need).

Scale notes: a global sort is a range-partitioned shuffle (sampling pass +
exchange) — fine once at the end of a pipeline, wrong in the middle.
Top-k-per-group uses window row_number, which shuffles once on the
partition keys; global top-k uses orderBy+limit which Spark executes as
per-partition top-k + single merge (TakeOrderedAndProject) — no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator
from ssis_to_pyspark_agent_spark.operators.setops import sort_cols


@operator("sort")
def sort(spark: SparkSession, inputs, config, context) -> DataFrame:
    """`keys`: [(col, 'asc'|'desc'), ...]; `eliminate_duplicates` drops
    duplicate key rows BEFORE the sort (SSIS semantics: dedup on sort keys,
    keeping an arbitrary row — we keep a deterministic one when
    `deterministic=True` via the full row as tiebreak)."""
    df: DataFrame = inputs[0]
    keys = config["keys"]
    key_names = [k if isinstance(k, str) else k[0] for k in keys]
    if config.get("eliminate_duplicates"):
        df = df.dropDuplicates(key_names)
    return df.orderBy(*sort_cols(keys))


@operator("limit")
def limit(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Top-N; with `keys` this is ordered top-N (TakeOrderedAndProject —
    per-partition heap + driver merge, no global sort)."""
    df: DataFrame = inputs[0]
    if keys := config.get("keys"):
        df = df.orderBy(*sort_cols(keys))
    return df.limit(config["n"])


@operator("top_k")
def top_k(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Top-k per group: row_number over (partition_by, order_by) <= k.
    `dense=True` uses rank to keep ties."""
    df: DataFrame = inputs[0]
    w = Window.partitionBy(*config["partition_by"]).orderBy(
        *sort_cols(config["order_by"])
    )
    fn = F.rank if config.get("dense") else F.row_number
    out = config.get("rank_col", "_rank")
    res = df.withColumn(out, fn().over(w)).filter(F.col(out) <= config["k"])
    return res if config.get("keep_rank") else res.drop(out)


@operator("sessionize")
def sessionize(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Gap-based sessionization (batch): assign a per-key session index via
    lag + running sum of gap-breaks — one shuffle on the key. The batch
    twin of streaming ``session_window`` (same session boundaries).

    config: key (list), ts_col, gap_seconds, out (default 'session_id'),
    order_tiebreak (column for deterministic ordering of ts ties).
    """
    df: DataFrame = inputs[0]
    keys = config["key"]
    ts = config["ts_col"]
    gap = config["gap_seconds"]
    out = config.get("out", "session_id")
    order = [F.col(ts).asc()] + (
        [F.col(config["order_tiebreak"]).asc()] if config.get("order_tiebreak") else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    new_s = F.when(
        F.lag(ts).over(w).isNull()
        | (F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(w)) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        out,
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


@operator("window")
def window(spark: SparkSession, inputs, config, context) -> DataFrame:
    """First-class window operator (SURVEY §2.10: none in the reference —
    needed for dedup keep-first and SCD-2 anyway).

    config:
      partition_by: [cols]; order_by: [(col, dir)...]
      frame: None | ('rows'|'range', start, end) with
             'unbounded'/'current'/int offsets
      columns: out_name -> (fn, col?, extra...) where fn in
             row_number|rank|dense_rank|lag|lead|sum|avg|min|max|count|
             first|last|ntile|cume_dist|percent_rank
    """
    df: DataFrame = inputs[0]
    w = Window.partitionBy(*config.get("partition_by", []))
    if ob := config.get("order_by"):
        w = w.orderBy(*sort_cols(ob))
    if frame := config.get("frame"):
        kind, start, end = frame

        def bound(v):
            if v == "unbounded_preceding" or v == "unbounded":
                return Window.unboundedPreceding
            if v == "unbounded_following":
                return Window.unboundedFollowing
            if v == "current":
                return Window.currentRow
            return int(v)

        w = (
            w.rowsBetween(bound(start), bound(end))
            if kind == "rows"
            else w.rangeBetween(bound(start), bound(end))
        )

    no_arg = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "cume_dist": F.cume_dist,
        "percent_rank": F.percent_rank,
    }
    one_arg = {
        "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
        "count": F.count, "first": F.first, "last": F.last,
        "lag": F.lag, "lead": F.lead, "ntile": F.ntile,
    }
    out = {}
    for name, spec in config["columns"].items():
        fn = spec[0]
        if fn in no_arg:
            out[name] = no_arg[fn]().over(w)
        elif fn in ("lag", "lead"):
            col, off = spec[1], (spec[2] if len(spec) > 2 else 1)
            out[name] = one_arg[fn](col, off).over(w)
        elif fn == "ntile":
            out[name] = F.ntile(spec[1]).over(w)
        else:
            out[name] = one_arg[fn](spec[1]).over(w)
    return df.withColumns(out)
