"""Logical-name -> physical-dataset catalog mapping.

The reference's SchemaMapper rewrites SSIS connection/table names to
Databricks catalog names, including regex rewrites inside SQL text
(/root/reference/mapping/schema_mapper.py:79-131, 165-328, template
schema_mapping_template.json:2-27). Ours resolves at plan time — a logical
dataset name maps to a parquet path or catalog table, with
connection-level defaults and per-table overrides; no SQL-text regex.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

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
            return spark.read.parquet(target)
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
