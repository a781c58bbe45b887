"""DTSX package front end: parse SSIS .dtsx XML into runnable
TaskGraph / Pipeline objects (reference:
``parsing/data_engineering_parser.py:28-59`` parses the same XML into a
JSON IR that feeds codegen; here the parse target is the live operator
DSL instead of emitted source text)."""

from ssis_to_pyspark_agent_spark.parsing.dtsx import parse_package

__all__ = ["parse_package"]
