"""Parser robustness (hypothesis): arbitrary input must either compile to a
Column or raise ExprError — never an unhandled exception. Compile-only (no
Spark jobs), but `F.lit` needs an active SparkContext, so the session
fixture is required."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ssis_to_pyspark_agent_spark.functions.expr import ExpressionCompiler, ExprError

COMP = ExpressionCompiler(
    schema={"a": "int", "b": "double", "s": "string"},
    variables={"V": 1},
)


@given(src=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_arbitrary_text_never_crashes(spark, src):
    try:
        COMP.compile(src)
    except ExprError:
        pass  # the contract: structured error, not a crash


@given(
    src=st.text(
        alphabet=list("[]()@:?+-*/%&|!<>=.,\"' abAB01_"), max_size=40
    )
)
@settings(max_examples=500, deadline=None)
def test_expression_shaped_garbage_never_crashes(spark, src):
    try:
        COMP.compile(src)
    except ExprError:
        pass
