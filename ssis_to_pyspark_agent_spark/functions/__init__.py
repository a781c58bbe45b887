"""Scalar function surface: the SSIS expression compiler and helpers."""

from ssis_to_pyspark_agent_spark.functions.expr import (
    DT_TYPE_MAP,
    ExprError,
    ExpressionCompiler,
    compile_expression,
    schema_of,
)

__all__ = [
    "DT_TYPE_MAP",
    "ExprError",
    "ExpressionCompiler",
    "compile_expression",
    "schema_of",
]
