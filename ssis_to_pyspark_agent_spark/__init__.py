"""ssis_to_pyspark_agent_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference `gsmadan/ssis-to-pyspark-agent` (an SSIS -> PySpark source-to-source
conversion agent), re-expressed Spark-first:

- a declarative :class:`~ssis_to_pyspark_agent_spark.plans.spec.Pipeline`
  (sources -> steps -> sinks DAG) executed by a topo-sorted runner on one
  SparkSession (reference: control-flow / data-flow DAGs,
  parsing/data_engineering_parser.py:282-334, 1255-1299);
- an operator library where every SSIS dataflow component semantics
  (Derived Column, Lookup, Merge Join, Conditional Split, Aggregate, Sort,
  Union All, Multicast, Row Count, Pivot/Unpivot, SCD, ...) is a pure
  ``dict[str, DataFrame] -> dict[str, DataFrame]`` function over the
  DataFrame API — no codegen, no LLM in the execution path;
- an SSIS-expression-compatible compiler producing `pyspark.sql.Column`
  (reference: mapping/expression_translator.py);
- NEW 100 TB-scale operators: dedup (exact/MinHash-LSH/SimHash/ngram/
  embedding), similarity search, text analysis, multimodal columns,
  Structured Streaming.

Everything compiles to the public DataFrame/SQL API so Catalyst + AQE do the
physical planning (pushdown, pruning, broadcast, skew handling).
"""

__version__ = "0.1.0"
