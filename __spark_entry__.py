"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog from
:mod:`ssis_to_pyspark_agent_spark.queries` — every operator family from
SURVEY.md §2 plus the NEW scale operators. The catalog is EXACTLY 50
queries (round-6 consolidation folded q38 into q37, q82 into q80, q83
into q34 and the q81 funnel into q44, so every operator sits inside the
driver's 50-query correctness window); all 50 carry an exact DuckDB
oracle (approximate operators run in engine-neutral md5/quantized modes
so even LSH/IVF/simhash/sketch results are re-derivable in SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ssis_to_pyspark_agent_spark.queries import QUERIES
    from ssis_to_pyspark_agent_spark.session import tune_session

    tune_session(spark)
    return QUERIES["q50_medium_package_flow"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ssis_to_pyspark_agent_spark.queries import QUERIES
    from ssis_to_pyspark_agent_spark.session import tune_session

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ssis_to_pyspark_agent_spark.queries import ORACLES

    return dict(ORACLES)
