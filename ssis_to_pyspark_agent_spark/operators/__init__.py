"""Operator registry.

Every operator is a pure function
``(spark, inputs: list[DataFrame], config: dict, context: dict) ->
DataFrame | dict[str, DataFrame]`` registered under the names the pipeline
spec uses. Multi-output operators return a dict of named ports.

The inventory mirrors SURVEY.md §2 (the reference's SSIS component set) plus
the NEW scale operators (§2.12).
"""

from __future__ import annotations

from typing import Any, Callable, Union

from pyspark.sql import DataFrame, SparkSession

OpResult = Union[DataFrame, dict[str, DataFrame]]
OpFn = Callable[[SparkSession, list[DataFrame], dict[str, Any], dict[str, Any]], OpResult]

_REGISTRY: dict[str, OpFn] = {}


def operator(name: str) -> Callable[[OpFn], OpFn]:
    def deco(fn: OpFn) -> OpFn:
        if name in _REGISTRY:
            raise ValueError(f"operator {name!r} already registered")
        _REGISTRY[name] = fn
        return fn

    return deco


def get_operator(name: str) -> OpFn:
    if name not in _REGISTRY:
        raise KeyError(f"unknown operator {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_operators() -> list[str]:
    return sorted(_REGISTRY)


# Import all operator modules so their @operator registrations run.
from ssis_to_pyspark_agent_spark.operators import (  # noqa: E402,F401
    agg,
    clustering,
    dedup,
    joins,
    joins_advanced,
    maintenance,
    multimodal,
    reshape,
    routing,
    rowlevel,
    scd,
    script,
    setops,
    similarity,
    sort,
    sources_sinks,
    streaming_ops,
    text,
)
