"""Query catalog: one entry per implemented operator family (SURVEY §2).

Every entry runs THROUGH the engine (Pipeline + operator registry), not raw
DataFrame calls — the correctness gate doubles as an engine test. Each has a
DuckDB-equivalent ANSI-SQL oracle unless the operation is not SQL-expressible
(LSH candidate generation, streaming state), in which case oracle=None and
the driver records a rows-only check.

Determinism rules used throughout (driver hash-compares values):
- SUM/AVG over doubles goes through DECIMAL(18,4) (exact arithmetic, same
  result bit-for-bit in any engine), then CAST to DOUBLE.
- every computed column is aliased identically in Spark and SQL.
- ties in rankings broken by a unique key.
- floats never feed GROUP BY keys.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.plans import Pipeline, run_pipeline

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _p(name: str, sf_dir: str, *tables: str) -> Pipeline:
    p = Pipeline(name)
    for t in tables:
        p.step(t, "source.parquet", path=f"{sf_dir}/{t}.parquet")
    return p


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


def _dsum(c: str | Column) -> Column:
    return F.sum(_dec(c)).cast("double")


# ---------------------------------------------------------------------------
# Aggregate / filter / derived column (SURVEY §2.3, §2.7) — TPC-H Q1 shape
# ---------------------------------------------------------------------------


@query(
    "q01_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    p = (
        _p("q01", sf_dir, "lineitem")
        .step(
            "flt", "filter", "lineitem",
            predicate="l_shipdate <= timestamp'1998-09-02 00:00:00'", sql=True,
        )
        .step(
            "agg", "aggregate", "flt",
            keys=["l_returnflag", "l_linestatus"],
            aggs={
                "sum_qty": _dsum("l_quantity"),
                "sum_base_price": _dsum("l_extendedprice"),
                "sum_disc_price": F.sum(disc_price).cast("double"),
                "avg_qty": _dsum("l_quantity") / F.count("l_quantity"),
                "count_order": F.count(F.lit(1)),
            },
        )
    )
    return run_pipeline(spark, p).df("agg")


# ---------------------------------------------------------------------------
# Derived Column / SSIS expression language (§2.3)
# ---------------------------------------------------------------------------


@query(
    "q02_derived_expressions",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice > 200000 AS INT)                        AS big_flag,
           CASE WHEN o_orderstatus = 'O' THEN 'OPEN' ELSE 'OTHER' END AS status_label,
           UPPER(SUBSTR(o_orderpriority, 1, 3))                      AS prio3,
           CAST(TRUNC(o_totalprice) AS INT)                          AS price_int,
           YEAR(o_orderdate)                                         AS order_year,
           o_orderpriority || '/' || o_orderstatus                   AS prio_status,
           LENGTH(TRIM(o_orderpriority))                             AS prio_len,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')           AS status_np
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q02", sf_dir, "orders")
        .step("flt", "filter", "orders", predicate="o_orderkey % 7 == 0")
        .step(
            "drv", "derived_column", "flt",
            columns={
                "big_flag": "[o_totalprice] > 200000 ? 1 : 0",
                "status_label": '[o_orderstatus] == "O" ? "OPEN" : "OTHER"',
                "prio3": "UPPER(SUBSTRING([o_orderpriority], 1, 3))",
                "price_int": "(DT_I4)[o_totalprice]",
                "order_year": "YEAR([o_orderdate])",
                "prio_status": '[o_orderpriority] + "/" + [o_orderstatus]',
                "prio_len": "LEN(TRIM([o_orderpriority]))",
                "status_np": '[o_orderstatus] == "P" ? "PENDING" : [o_orderstatus]',
            },
        )
        .step(
            "prj", "select", "drv",
            columns=[
                "o_orderkey", "big_flag", "status_label", "prio3", "price_int",
                "order_year", "prio_status", "prio_len", "status_np",
            ],
        )
    )
    return run_pipeline(spark, p).df("prj")


# ---------------------------------------------------------------------------
# Lookup (§2.5)
# ---------------------------------------------------------------------------


@query(
    "q03_lookup_chain",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal,
           n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q03", sf_dir, "customer", "nation", "region")
        .step(
            "ln", "lookup", ["customer", "nation"],
            keys={"c_nationkey": "n_nationkey"},
            copy={"nation_name": "n_name", "_rk": "n_regionkey"},
            no_match="fail",
        )
        .step(
            "lr", "lookup", ["ln", "region"],
            keys={"_rk": "r_regionkey"},
            copy={"region_name": "r_name"},
            no_match="fail",
        )
        .step(
            "prj", "select", "lr",
            columns=["c_custkey", "c_name", "c_acctbal", "nation_name", "region_name"],
        )
    )
    return run_pipeline(spark, p).df("prj")


@query(
    "q04_lookup_nomatch_split",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n
      ON c.c_nationkey = n.n_nationkey
    WHERE n.n_nationkey IS NULL
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q04", sf_dir, "customer", "nation")
        .step("small_n", "filter", "nation", predicate="[n_nationkey] < 10")
        .step(
            "lkp", "lookup", ["customer", "small_n"],
            keys={"c_nationkey": "n_nationkey"},
            copy={"nation_name": "n_name"},
            split_match=True,
        )
        .step(
            "prj", "select", "lkp.nomatch",
            columns=["c_custkey", "c_name", "c_nationkey"],
        )
    )
    return run_pipeline(spark, p).df("prj")


# ---------------------------------------------------------------------------
# Merge Join inner/left/full (§2.5), null-safe keys
# ---------------------------------------------------------------------------


@query(
    "q05_merge_join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nkey, COUNT(*) AS n_cust
               FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nkey, COUNT(*) AS n_supp
               FROM supplier WHERE s_acctbal > 2500 GROUP BY s_nationkey)
    SELECT COALESCE(c.nkey, s.nkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nkey = s.nkey
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q05", sf_dir, "customer", "supplier")
        .step("cf", "filter", "customer", predicate="[c_acctbal] > 0")
        .step("sf", "filter", "supplier", predicate="[s_acctbal] > 2500")
        .step("ca", "aggregate", "cf", keys=["c_nationkey"],
              aggs={"n_cust": ("count", "*")})
        .step("ca2", "select", "ca", columns={"ckey": "c_nationkey", "n_cust": "n_cust"})
        .step("sa", "aggregate", "sf", keys=["s_nationkey"],
              aggs={"n_supp": ("count", "*")})
        .step("sa2", "select", "sa", columns={"skey": "s_nationkey", "n_supp": "n_supp"})
        .step("j", "join", ["ca2", "sa2"], how="full", keys=[("ckey", "skey")],
              null_safe=True)
        .step("drv", "derived_column", "j", columns={
            "nationkey": "REPLACENULL([ckey], [skey])",
            "n_cust2": "REPLACENULL([n_cust], 0)",
            "n_supp2": "REPLACENULL([n_supp], 0)",
        })
        .step("prj", "select", "drv",
              columns={"nationkey": "nationkey", "n_cust": "n_cust2", "n_supp": "n_supp2"})
    )
    return run_pipeline(spark, p).df("prj")


@query(
    "q06_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q06", sf_dir, "customer", "orders")
        .step("big", "filter", "orders", predicate="[o_totalprice] > 300000")
        .step("j", "join", ["customer", "big"], how="left_semi",
              keys=[("c_custkey", "o_custkey")],
              select_left=["c_custkey", "c_name"])
    )
    return run_pipeline(spark, p).df("j")


@query(
    "q07_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q07", sf_dir, "customer", "orders")
        .step("j", "join", ["customer", "orders"], how="left_anti",
              keys=[("c_custkey", "o_custkey")],
              select_left=["c_custkey", "c_name"])
    )
    return run_pipeline(spark, p).df("j")


@query(
    "q08_join_theta_range",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45
    WHERE o.o_orderstatus = 'F'
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q08", sf_dir, "orders", "lineitem")
        .step("of", "filter", "orders", predicate='[o_orderstatus] == "F"')
        .step("j", "join", ["of", "lineitem"], how="inner",
              keys=[("o_orderkey", "l_orderkey")],
              condition="r.l_quantity > 45",
              select_left=["o_orderkey"],
              select_right=["l_linenumber", "l_quantity"])
    )
    return run_pipeline(spark, p).df("j")


# ---------------------------------------------------------------------------
# Conditional split (§2.4) — first-match-wins with overlapping predicates
# ---------------------------------------------------------------------------

_SPLIT_ORACLE_ROUTE = """
    CASE WHEN o_totalprice > 300000 THEN 'huge'
         WHEN o_orderstatus = 'O' OR o_totalprice > 200000 THEN 'open_or_big'
         WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
         ELSE 'default' END
"""


@query(
    "q09_conditional_split_route",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE {_SPLIT_ORACLE_ROUTE} = 'open_or_big'
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q09", sf_dir, "orders")
        .step("split", "conditional_split", "orders", outputs={
            "huge": "[o_totalprice] > 300000",
            "open_or_big": '[o_orderstatus] == "O" || [o_totalprice] > 200000',
            "urgent": '[o_orderpriority] == "1-URGENT"',
        })
        .step("prj", "select", "split.open_or_big",
              columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    )
    return run_pipeline(spark, p).df("prj")


@query(
    "q10_split_branch_counts",
    oracle=f"""
    SELECT {_SPLIT_ORACLE_ROUTE} AS route, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multicast + split + per-branch aggregate + union (the Medium-package
    row-count-per-branch pattern)."""
    p = _p("q10", sf_dir, "orders").step(
        "split", "conditional_split", "orders", outputs={
            "huge": "[o_totalprice] > 300000",
            "open_or_big": '[o_orderstatus] == "O" || [o_totalprice] > 200000',
            "urgent": '[o_orderpriority] == "1-URGENT"',
        },
    )
    for port in ("huge", "open_or_big", "urgent", "default"):
        p.step(f"agg_{port}", "aggregate", f"split.{port}", keys=[], aggs={
            "n": ("count", "*"),
            "total": F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"),
        })
        p.step(f"lab_{port}", "derived_column", f"agg_{port}",
               columns={"route": F.lit(port)})
    p.step("u", "union_all",
           ["lab_huge", "lab_open_or_big", "lab_urgent", "lab_default"])
    p.step("prj", "select", "u", columns=["route", "n", "total"])
    return run_pipeline(spark, p).df("prj")


# ---------------------------------------------------------------------------
# Set ops (§2.6)
# ---------------------------------------------------------------------------


@query(
    "q11_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q11", sf_dir, "customer", "supplier")
        .step("c", "select", "customer", columns={"nationkey": "c_nationkey"})
        .step("cl", "derived_column", "c", columns={"side": '"customer"'})
        .step("s", "select", "supplier", columns={"nationkey": "s_nationkey"})
        .step("sl", "derived_column", "s", columns={"side": '"supplier"'})
        .step("u", "union_all", ["cl", "sl"])
    )
    return run_pipeline(spark, p).df("u")


@query(
    "q12_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q12", sf_dir, "customer", "supplier")
        .step("c", "select", "customer", columns={"nationkey": "c_nationkey"})
        .step("s", "select", "supplier", columns={"nationkey": "s_nationkey"})
        .step("i", "intersect", ["c", "s"])
    )
    return run_pipeline(spark, p).df("i")


@query(
    "q13_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q13", sf_dir, "customer", "supplier")
        .step("c", "select", "customer", columns={"nationkey": "c_nationkey"})
        .step("s", "select", "supplier", columns={"nationkey": "s_nationkey"})
        .step("e", "except", ["c", "s"])
    )
    return run_pipeline(spark, p).df("e")


# ---------------------------------------------------------------------------
# Sort + EliminateDuplicates, top-k, window (§2.8, §2.10)
# ---------------------------------------------------------------------------


@query(
    "q14_sort_dedup",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem ORDER BY l_shipdate DESC, l_returnflag, l_linestatus
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q14", sf_dir, "lineitem")
        .step("prj", "select", "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_shipdate"])
        .step("srt", "sort", "prj",
              keys=[("l_shipdate", "desc"), ("l_returnflag", "asc"),
                    ("l_linestatus", "asc")],
              eliminate_duplicates=True)
    )
    return run_pipeline(spark, p).df("srt")


@query(
    "q15_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders) WHERE rank <= 3
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q15", sf_dir, "orders")
        .step("prj", "select", "orders",
              columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
        .step("tk", "top_k", "prj", partition_by=["o_orderpriority"],
              order_by=[("o_totalprice", "desc"), ("o_orderkey", "asc")],
              k=3, keep_rank=True, rank_col="rank")
    )
    df = run_pipeline(spark, p).df("tk")
    return df.withColumn("rank", F.col("rank").cast("long"))


@query(
    "q16_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_order,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS seq
    FROM orders WHERE o_custkey % 10 = 3
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q16", sf_dir, "orders")
        .step("flt", "filter", "orders", predicate="[o_custkey] % 10 == 3")
        .step("dec", "derived_column", "flt",
              columns={"price_dec": F.col("o_totalprice").cast("decimal(18,4)")})
        .step("w", "window", "dec",
              partition_by=["o_custkey"],
              order_by=[("o_orderdate", "asc"), ("o_orderkey", "asc")],
              frame=("rows", "unbounded_preceding", "current"),
              columns={"running_dec": ("sum", "price_dec")})
        .step("w2", "window", "w",
              partition_by=["o_custkey"],
              order_by=[("o_orderdate", "asc"), ("o_orderkey", "asc")],
              columns={"prev_order": ("lag", "o_orderkey", 1),
                       "seq": ("row_number",)})
        .step("drv", "derived_column", "w2",
              columns={"running_total": F.col("running_dec").cast("double"),
                       "seq2": F.col("seq").cast("long")})
        .step("prj", "select", "drv",
              columns={"o_custkey": "o_custkey", "o_orderkey": "o_orderkey",
                       "running_total": "running_total",
                       "prev_order": "prev_order", "seq": "seq2"})
    )
    return run_pipeline(spark, p).df("prj")


# ---------------------------------------------------------------------------
# Pivot / unpivot / rollup / cube (§2.7, §2.9)
# ---------------------------------------------------------------------------


@query(
    "q17_pivot",
    oracle="""
    SELECT YEAR(o_orderdate) AS order_year,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY 1
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q17", sf_dir, "orders")
        .step("drv", "derived_column", "orders",
              columns={"order_year": "YEAR([o_orderdate])"})
        .step("pv", "pivot", "drv", keys=["order_year"], pivot_col="o_orderstatus",
              values=["O", "F", "P"], aggs={"n": ("count", "*")}, fill_value=0)
    )
    return run_pipeline(spark, p).df("pv")


@query(
    "q18_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS value FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q18", sf_dir, "lineitem")
        .step("flt", "filter", "lineitem", predicate="[l_orderkey] % 50 == 0")
        .step("prj", "select", "flt",
              columns={"l_orderkey": "l_orderkey", "l_linenumber": "l_linenumber",
                       "quantity": "l_quantity", "discount": "l_discount",
                       "tax": "l_tax"})
        .step("up", "unpivot", "prj", ids=["l_orderkey", "l_linenumber"],
              values=["quantity", "discount", "tax"],
              var_col="measure", value_col="value")
    )
    return run_pipeline(spark, p).df("up")


@query(
    "q19_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _p("q19", sf_dir, "lineitem").step(
        "agg", "aggregate", "lineitem", keys=["l_returnflag", "l_linestatus"],
        mode="rollup",
        aggs={"n": ("count", "*"), "sum_qty": _dsum("l_quantity")},
    )
    return run_pipeline(spark, p).df("agg")


@query(
    "q20_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _p("q20", sf_dir, "orders").step(
        "agg", "aggregate", "orders", keys=["o_orderstatus", "o_orderpriority"],
        mode="cube", aggs={"n": ("count", "*")},
    )
    return run_pipeline(spark, p).df("agg")


# ---------------------------------------------------------------------------
# Checksum / data conversion / sample (§2.3, §2.4)
# ---------------------------------------------------------------------------


@query(
    "q21_checksum_md5",
    oracle="""
    SELECT c_custkey,
           MD5(CONCAT_WS(CHR(31), CAST(c_custkey AS VARCHAR), c_name,
                         c_mktsegment)) AS row_md5
    FROM customer
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q21", sf_dir, "customer")
        .step("ck", "checksum", "customer",
              columns=["c_custkey", "c_name", "c_mktsegment"],
              algorithm="md5", out="row_md5")
        .step("prj", "select", "ck", columns=["c_custkey", "row_md5"])
    )
    return run_pipeline(spark, p).df("prj")


@query(
    "q22_data_conversion",
    oracle="""
    SELECT l_orderkey, CAST(TRUNC(l_quantity) AS INT) AS qty_int,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS price_dec,
           CAST(l_linenumber AS SMALLINT) AS line_small,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem WHERE l_orderkey % 100 = 1
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q22", sf_dir, "lineitem")
        .step("flt", "filter", "lineitem", predicate="[l_orderkey] % 100 == 1")
        .step("dc", "data_conversion", "flt", casts={
            "qty_int": ("l_quantity", "DT_I4"),
            "price_dec": ("l_extendedprice", "decimal(12,2)"),
            "line_small": ("l_linenumber", "DT_I2"),
            "ship_date": ("l_shipdate", "DT_DBDATE"),
        })
        .step("prj", "select", "dc",
              columns=["l_orderkey", "qty_int", "price_dec", "line_small",
                       "ship_date"])
    )
    return run_pipeline(spark, p).df("prj")


@query(
    "q23_sample_mod",
    oracle="SELECT * FROM orders WHERE o_orderkey % 20 = 7",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _p("q23", sf_dir, "orders").step(
        "s", "sample", "orders", method="mod", key=["o_orderkey"], n=20, r=7
    )
    return run_pipeline(spark, p).df("s")


# ---------------------------------------------------------------------------
# Merge upsert / delete / SCD (§2.5 OLE DB Command, §2.9 SCD)
# ---------------------------------------------------------------------------


@query(
    "q24_merge_upsert",
    oracle="""
    WITH target AS (SELECT c_custkey, c_name, c_acctbal FROM customer
                    WHERE c_custkey % 3 = 0),
         updates AS (SELECT c_custkey, c_name,
                            CAST(c_acctbal + 1000 AS DOUBLE) AS c_acctbal
                     FROM customer WHERE c_custkey % 2 = 0)
    SELECT t.c_custkey, t.c_name, t.c_acctbal FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = t.c_custkey)
    UNION ALL
    SELECT * FROM updates
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q24", sf_dir, "customer")
        .step("t0", "filter", "customer", predicate="[c_custkey] % 3 == 0")
        .step("target", "select", "t0", columns=["c_custkey", "c_name", "c_acctbal"])
        .step("u0", "filter", "customer", predicate="[c_custkey] % 2 == 0")
        .step("u1", "derived_column", "u0", columns={"acct2": "[c_acctbal] + 1000"})
        .step("updates", "select", "u1",
              columns={"c_custkey": "c_custkey", "c_name": "c_name",
                       "c_acctbal": "acct2"})
        .step("m", "merge_upsert", ["target", "updates"], keys=["c_custkey"])
    )
    return run_pipeline(spark, p).df("m")


@query(
    "q25_merge_delete",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F' AND o_totalprice > 350000)
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q25", sf_dir, "customer", "orders")
        .step("t", "select", "customer", columns=["c_custkey", "c_name"])
        .step("d0", "filter", "orders",
              predicate='[o_orderstatus] == "F" && [o_totalprice] > 350000')
        .step("dels", "select", "d0", columns={"c_custkey": "o_custkey"})
        .step("m", "merge_delete", ["t", "dels"], keys=["c_custkey"])
    )
    return run_pipeline(spark, p).df("m")


@query(
    "q26_scd2",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '2020-01-01 00:00:00' AS effective_from,
             CAST(NULL AS TIMESTAMP) AS effective_to,
             TRUE AS is_current
      FROM customer
    ),
    upd AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED' ELSE c_mktsegment END
               AS c_mktsegment,
             c_acctbal
      FROM customer WHERE c_custkey % 2 = 0
    ),
    changed AS (
      SELECT d.c_custkey FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
      WHERE NOT (d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment)
         OR NOT (d.c_acctbal IS NOT DISTINCT FROM u.c_acctbal)
    )
    SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.effective_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN TIMESTAMP '2024-06-01 00:00:00' ELSE d.effective_to END
             AS effective_to,
           CASE WHEN ch.c_custkey IS NOT NULL THEN FALSE ELSE TRUE END
             AS is_current
    FROM dim d LEFT JOIN changed ch ON d.c_custkey = ch.c_custkey
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
           TIMESTAMP '2024-06-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
    FROM upd u JOIN changed ch ON u.c_custkey = ch.c_custkey
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _p("q26", sf_dir, "customer")
        .step("d0", "select", "customer",
              columns=["c_custkey", "c_mktsegment", "c_acctbal"])
        .step("dim", "derived_column", "d0", columns={
            "effective_from": F.to_timestamp(F.lit("2020-01-01 00:00:00")),
            "effective_to": F.lit(None).cast("timestamp"),
            "is_current": F.lit(True),
        })
        .step("u0", "filter", "customer", predicate="[c_custkey] % 2 == 0")
        .step("upd", "derived_column", "u0", columns={
            "c_mktsegment": '[c_custkey] % 5 == 0 ? "CHANGED" : [c_mktsegment]',
        })
        .step("upd2", "select", "upd",
              columns=["c_custkey", "c_mktsegment", "c_acctbal"])
        .step("scd", "scd2", ["dim", "upd2"], keys=["c_custkey"],
              tracked=["c_mktsegment", "c_acctbal"],
              as_of="2024-06-01 00:00:00")
    )
    return run_pipeline(spark, p).df("scd")
