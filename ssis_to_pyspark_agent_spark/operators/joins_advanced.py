"""As-of and range joins (SURVEY §2.5 note: "no theta/range/as-of/interval
joins in the reference's surface" — these are the engine extensions that
make time-series and banding workloads possible without a cross join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator


@operator("asof_join")
def asof_join(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Backward as-of join: for every left row, attach the LATEST right row
    with ``right.ts <= left.ts`` sharing the equi-keys.

    Spark-first plan (no native ASOF): tag + union both sides, ONE shuffle
    on (keys), window-sort by (ts, side) with right rows first on ties,
    then ``last(right value, ignoreNulls)`` carries the most recent right
    row forward onto each left row. Cost = one shuffle + one in-partition
    sort — no range cross-join, no per-group pandas.

    config:
      keys: equi keys (list)
      left_ts / right_ts: timestamp (or any orderable) columns
      copy: {out_name: right_col} columns carried from the matched right row
      tolerance: optional max seconds between left_ts and matched right_ts
                 (timestamps only); misses become null
    """
    left, right = inputs[0], inputs[1]
    keys = config["keys"]
    lts, rts = config["left_ts"], config["right_ts"]
    copy: dict[str, str] = config["copy"]

    rtag = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(o) for o, c in copy.items()]).alias("_payload"),
    )
    ltag = left.select(
        "*",
        F.col(lts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtag.schema["_payload"].dataType).alias("_payload"),
    )
    unioned = ltag.unionByName(rtag, allowMissingColumns=True)

    # right rows sort BEFORE left rows at equal ts => ties match (<=)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    ).withColumn("_match_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w))

    out = carried.filter(F.col("_side") == 1)
    if tol := config.get("tolerance"):
        within = (
            F.unix_timestamp(F.col("_ts")) - F.unix_timestamp(F.col("_match_ts"))
        ) <= tol
        out = out.withColumn(
            "_match", F.when(within, F.col("_match")).otherwise(F.lit(None))
        )
    for o in copy:
        out = out.withColumn(o, F.col("_match").getField(o))
    return out.select(*left.columns, *copy.keys())


@operator("range_join")
def range_join(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Interval join: match left rows to right intervals
    ``right.lo <= left.v < right.hi`` (bounds configurable).

    A naive BNLJ turns into |L|x|R| work. With `bucket_width`, both sides
    are bucketized — each interval explodes into the buckets it overlaps,
    each left value hashes to one bucket — so the join is an EQUI join on
    (keys, bucket) plus a residual range filter; shuffle volume scales with
    overlap, not the cross product. Small interval tables can skip all of
    it with broadcast=True (the BNLJ stays local).

    config:
      value: left value column
      lo / hi: right bound columns
      keys: optional extra equi keys
      bucket_width: numeric width for the bucketed path
      broadcast: True -> broadcast right, plain theta join
      inclusive: 'both' | 'left' (default: lo <= v < hi)
      select_left / select_right: output projection (lists)
    """
    left, right = inputs[0], inputs[1]
    v, lo, hi = config["value"], config["lo"], config["hi"]
    keys = config.get("keys", [])
    inclusive = config.get("inclusive", "left")

    def bound_cond(lcol: Column) -> Column:
        c = F.col(f"r.{lo}") <= lcol
        if inclusive == "both":
            return c & (lcol <= F.col(f"r.{hi}"))
        return c & (lcol < F.col(f"r.{hi}"))

    sel_l = config.get("select_left", left.columns)
    sel_r = config.get("select_right", [c for c in right.columns])
    out_cols = [F.col(f"l.{c}") for c in sel_l] + [F.col(f"r.{c}") for c in sel_r]

    if config.get("broadcast") or not config.get("bucket_width"):
        la, ra = left.alias("l"), F.broadcast(right).alias("r")
        cond = bound_cond(F.col(f"l.{v}"))
        for k in keys:
            cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
        return la.join(ra, cond, "inner").select(*out_cols)

    width = config["bucket_width"]
    lb = left.withColumn("_bucket", F.floor(F.col(v) / width))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / width), F.floor(F.col(hi) / width)
            )
        ),
    )
    la, ra = lb.alias("l"), rb.alias("r")
    cond = (F.col("l._bucket") == F.col("r._bucket")) & bound_cond(F.col(f"l.{v}"))
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return la.join(ra, cond, "inner").select(*out_cols)
