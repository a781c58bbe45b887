"""Logical-name -> physical-dataset catalog mapping.

The reference's SchemaMapper rewrites SSIS connection/table names to
Databricks catalog names, including regex rewrites inside SQL text
(/root/reference/mapping/schema_mapper.py:79-131, 165-328, template
schema_mapping_template.json:2-27). Ours resolves at plan time — a logical
dataset name maps to a parquet path or catalog table, with
connection-level defaults and per-table overrides; no SQL-text regex.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Session-scoped parquet SCHEMA memo (r11, guide §6): every
# spark.read.parquet() without an explicit schema fires a 1-task
# footer-inference job — 1-3 jobs of pure scheduler overhead per query
# invocation, 10 for register_views. A real deployment gets schemas
# from a catalog/manifest (Hive metastore, Iceberg) exactly so that
# per-query inference never happens; this memo is that catalog layer.
# METADATA ONLY — no rows, no results are memoized; the key carries the
# file/dir (mtime_ns, size) signature, so a rewritten path re-infers.
_SCHEMA_MEMO: dict[tuple, object] = {}


def _path_sig(path: str):
    # For a parquet DIRECTORY the top-level stat is not enough: an
    # in-place rewrite of a part file changes neither the dir's mtime
    # nor its size (r11 verdict item 3) — include each direct child's
    # (name, mtime_ns, size) so any part-file change re-infers.
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        kids = []
        with os.scandir(path) as it:
            for e in it:
                s = e.stat()
                kids.append((e.name, s.st_mtime_ns, s.st_size))
        return (st.st_mtime_ns, st.st_size, tuple(sorted(kids)))
    except OSError:
        return None


def read_parquet(
    spark: SparkSession,
    path: str,
    options: dict | None = None,
    nanos_as_long: bool = False,
) -> DataFrame:
    """spark.read.parquet with the schema supplied from the session memo
    after the first read — skips the per-invocation footer-inference job
    (plan/pushdown/pruning unaffected; parquet readers take declared
    schemas without a second inference pass)."""
    key = (
        spark.sparkContext.applicationId,
        path,
        tuple(sorted((options or {}).items())),
        nanos_as_long,
        _path_sig(path),
    )
    r = spark.read
    for k, v in (options or {}).items():
        r = r.option(k, v)
    schema = _SCHEMA_MEMO.get(key)
    if schema is not None:
        return r.schema(schema).parquet(path)
    df = r.parquet(path)
    _SCHEMA_MEMO[key] = df.schema
    return df

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class CatalogMapper:
    """connection defaults + per-table overrides (mirrors
    schema_mapping_template.json's {connection -> {default_mapping,
    table_mappings}} shape, minus the SQL regex layer)."""

    base_path: str | None = None  # default: logical name -> {base}/{name}.parquet
    table_overrides: dict[str, str] = field(default_factory=dict)  # name -> path/table

    def resolve(self, spark: SparkSession, name: str) -> DataFrame:
        target = self.table_overrides.get(name)
        if target is None and self.base_path is not None:
            target = f"{self.base_path}/{name}.parquet"
        if target is None:
            return spark.table(name)
        if target.endswith(".parquet") or "/" in target:
            return read_parquet(spark, target)
        return spark.table(target)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's testdata tables (TESTDATA.md) as a dict.

    `events` carries TIMESTAMP(NANOS) parquet — routed through the
    nanos-aware source operator (long nanos -> micros)."""
    from ssis_to_pyspark_agent_spark.operators import get_operator

    m = CatalogMapper(base_path=sf_dir)
    out: dict[str, DataFrame] = {}
    for n in names:
        if n == "events":
            out[n] = get_operator("source.parquet")(
                spark, [],
                {"path": f"{sf_dir}/events.parquet", "nanos_ts_cols": ["ts"]},
                {},
            )
        else:
            out[n] = m.resolve(spark, n)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)
