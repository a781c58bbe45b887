"""Source/sink connector surface.

The operator implementations live in
:mod:`ssis_to_pyspark_agent_spark.operators.sources_sinks` (registered in
the operator registry); this package re-exports helpers for direct API use.
"""

from ssis_to_pyspark_agent_spark.sources.catalog import CatalogMapper, load_tables

__all__ = ["CatalogMapper", "load_tables"]
