"""Expression compiler unit tests: SSIS semantics cases from SURVEY §2.3.

The tricky ones the reference gets wrong or leaves TODO:
- ISNULL is a boolean predicate (reference maps it to coalesce — bug,
  expression_translator.py:47)
- string + is concatenation
- first-class variables (@[User::X]) bound as literals
- (DT_*) casts truncate like C, 1-based SUBSTRING
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.functions.expr import (
    ExpressionCompiler,
    ExprError,
    compile_expression,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "Alpha", 10.5, None, "X"),
            (2, "beta", -3.2, 7, "Y"),
            (3, None, 0.0, 2, "X"),
        ],
        "id int, name string, val double, opt int, cat string",
    )


def _eval(df, expr, schema=None, variables=None):
    comp = ExpressionCompiler(
        schema or {"id": "int", "name": "string", "val": "double",
                   "opt": "int", "cat": "string"},
        variables,
    )
    return [r.x for r in df.select(comp.compile(expr).alias("x")).collect()]


class TestLiteralsAndOperators:
    def test_arithmetic_precedence(self, df):
        assert _eval(df, "1 + 2 * 3")[0] == 7

    def test_parens(self, df):
        assert _eval(df, "(1 + 2) * 3")[0] == 9

    def test_ternary(self, df):
        assert _eval(df, "[id] == 1 ? 100 : 200") == [100, 200, 200]

    def test_nested_ternary(self, df):
        out = _eval(df, '[id] == 1 ? "a" : [id] == 2 ? "b" : "c"')
        assert out == ["a", "b", "c"]

    def test_boolean_ops(self, df):
        out = _eval(df, "[id] > 1 && [val] < 0 || [id] == 1")
        assert out == [True, True, False]

    def test_unary_not(self, df):
        assert _eval(df, "!([id] == 1)") == [False, True, True]

    def test_modulo(self, df):
        assert _eval(df, "[id] % 2") == [1, 0, 1]

    def test_string_concat_plus(self, df):
        out = _eval(df, '[name] + "-" + [cat]')
        assert out == ["Alpha-X", "beta-Y", None]

    def test_numeric_plus_stays_numeric(self, df):
        assert _eval(df, "[id] + 1") == [2, 3, 4]


class TestNullSemantics:
    def test_isnull_is_predicate(self, df):
        assert _eval(df, "ISNULL([opt])") == [True, False, False]

    def test_isnull_in_ternary(self, df):
        # the Medium-fixture pattern: ISNULL(c) == TRUE ? 0 : c
        assert _eval(df, "ISNULL([opt]) == TRUE ? 0 : [opt]") == [0, 7, 2]

    def test_replacenull(self, df):
        assert _eval(df, "REPLACENULL([opt], -1)") == [-1, 7, 2]

    def test_null_literal(self, df):
        assert _eval(df, "NULL") == [None, None, None]

    def test_typed_null(self, df):
        assert _eval(df, "NULL(DT_I4)") == [None, None, None]


class TestCasts:
    def test_dt_i4_truncates(self, df):
        assert _eval(df, "(DT_I4)[val]") == [10, -3, 0]

    def test_dt_str(self, df):
        assert _eval(df, "(DT_STR, 50, 1252)[id]") == ["1", "2", "3"]

    def test_dt_numeric_ps(self, df):
        from decimal import Decimal

        assert _eval(df, "(DT_NUMERIC, 10, 2)[val]") == [
            Decimal("10.50"), Decimal("-3.20"), Decimal("0.00"),
        ]


class TestFunctions:
    def test_substring_one_based(self, df):
        assert _eval(df, "SUBSTRING([name], 2, 3)") == ["lph", "eta", None]

    def test_upper_lower_len(self, df):
        assert _eval(df, "UPPER([name])") == ["ALPHA", "BETA", None]
        assert _eval(df, "LEN([name])") == [5, 4, None]

    def test_findstring(self, df):
        assert _eval(df, 'FINDSTRING([name], "a")') == [5, 4, None]

    def test_replace_is_literal_not_regex(self, spark):
        df2 = spark.createDataFrame([("a.b",)], "s string")
        comp = ExpressionCompiler({"s": "string"})
        out = df2.select(comp.compile('REPLACE([s], ".", "!")').alias("x")).collect()
        assert out[0].x == "a!b"  # regex semantics would give "!!!"

    def test_left_right(self, df):
        assert _eval(df, "LEFT([name], 2)") == ["Al", "be", None]
        assert _eval(df, "RIGHT([name], 2)") == ["ha", "ta", None]

    def test_token(self, spark):
        df2 = spark.createDataFrame([("a b  c",)], "s string")
        comp = ExpressionCompiler({"s": "string"})
        assert df2.select(comp.compile('TOKEN([s], " ", 3)').alias("x")).collect()[0].x == "c"
        assert df2.select(comp.compile('TOKENCOUNT([s], " ")').alias("x")).collect()[0].x == 3

    def test_math(self, df):
        assert _eval(df, "ABS([val])") == [10.5, 3.2, 0.0]
        assert _eval(df, "CEILING([val])") == [11, -3, 0]
        assert _eval(df, "FLOOR([val])") == [10, -4, 0]
        assert _eval(df, "SIGN([val])") == [1.0, -1.0, 0.0]

    def test_iif(self, df):
        assert _eval(df, "IIF([id] > 1, 1, 0)") == [0, 1, 1]


class TestVariables:
    def test_user_variable(self, df):
        out = _eval(df, "[id] > @[User::Min]", variables={"Min": 1})
        assert out == [False, True, True]

    def test_plain_variable(self, df):
        assert _eval(df, "@Thresh + 1", variables={"Thresh": 10})[0] == 11

    def test_unbound_variable_raises(self, df):
        with pytest.raises(ExprError, match="unbound variable"):
            _eval(df, "@[User::Nope]")


class TestErrors:
    def test_unknown_function(self):
        with pytest.raises(ExprError, match="unknown function"):
            compile_expression("NOPE(1)")

    def test_trailing_garbage(self):
        with pytest.raises(ExprError, match="trailing"):
            compile_expression("1 + 2 3")

    def test_unterminated(self):
        with pytest.raises(ExprError):
            compile_expression("(1 + 2")
