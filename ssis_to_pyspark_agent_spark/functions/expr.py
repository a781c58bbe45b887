"""SSIS-expression-language compiler -> ``pyspark.sql.Column``.

The reference translates SSIS expressions with regex substitution
(``/root/reference/mapping/expression_translator.py:70-107`` — functions ->
column refs -> literals -> ternary -> operators). That approach breaks on
nesting and precedence; this module is a real tokenizer + recursive-descent
parser over the documented SSIS expression grammar, compiling to Column
expressions evaluated JVM-side (whole-stage codegen, no Python UDFs).

Grammar coverage (superset of what the reference handles):
- literals: ints, floats, ``"strings"`` with escapes, TRUE/FALSE/NULL
- column refs: ``[Name]``, ``#{...Columns[Name]}``
  (reference ``expression_translator.py:109-126``), bare identifiers
- variables: ``@[User::X]`` / ``@[System::X]`` / ``@X`` bound at plan time
  from the pipeline context (the reference leaves these TODO,
  ``enhanced_json_mapper.py:2484-2487``)
- casts: ``(DT_I4)x``, ``(DT_STR, 50, 1252)x``, ``(DT_NUMERIC, p, s)x``
  (seen in fixture ``Sample_Medium_Package.dtsx:328``)
- ternary ``c ? a : b`` -> ``when(c, a).otherwise(b)``
- operators with C precedence: ``|| && | ^ & == != < <= > >= + - * / %``
  and unary ``! ~ -``
- the SSIS function library (GETDATE, DATEADD, DATEDIFF, SUBSTRING,
  FINDSTRING, REPLACENULL, IIF, ...). NOTE: SSIS ``ISNULL(x)`` is a boolean
  *predicate* -> ``x.isNull()``; the reference maps it to ``coalesce``
  (``expression_translator.py:47``) which is a bug we do not reproduce.

SSIS ``+`` on strings is concatenation; Spark ``+`` is numeric. The parser
does lightweight bottom-up type tagging (literal types, declared schema
types, cast targets, function return types) and emits ``F.concat`` when
either operand is string-typed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# DT_* -> Spark SQL type (SURVEY §1.2)
# ---------------------------------------------------------------------------

DT_TYPE_MAP: dict[str, str] = {
    "DT_I1": "tinyint",
    "DT_I2": "smallint",
    "DT_I4": "int",
    "DT_I8": "bigint",
    "DT_UI1": "smallint",
    "DT_UI2": "int",
    "DT_UI4": "bigint",
    "DT_UI8": "decimal(20,0)",
    "DT_R4": "float",
    "DT_R8": "double",
    "DT_BOOL": "boolean",
    "DT_STR": "string",
    "DT_WSTR": "string",
    "DT_TEXT": "string",
    "DT_NTEXT": "string",
    "DT_GUID": "string",
    "DT_BYTES": "binary",
    "DT_IMAGE": "binary",
    "DT_DATE": "timestamp",
    "DT_DBTIMESTAMP": "timestamp",
    "DT_DBTIMESTAMP2": "timestamp",
    "DT_FILETIME": "timestamp",
    "DT_DBDATE": "date",
    "DT_DBTIME": "string",
    "DT_NUMERIC": "decimal",  # params supply (p,s)
    "DT_DECIMAL": "decimal",
    "DT_CY": "decimal(19,4)",
}

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+L?)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<hashref>\#\{[^}]*\})
  | (?P<var>@\[(?:[^\]]*)\]|@\w+)
  | (?P<colref>\[[^\]]+\])
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|<<|>>|[-+*/%<>!~&|^?:(),])
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ExprError(f"unexpected character {src[i]!r} at {i} in {src!r}")
        kind = m.lastgroup or ""
        if kind != "ws":
            toks.append(Tok(kind, m.group(0), i))
        i = m.end()
    return toks


class ExprError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Typed compile result
# ---------------------------------------------------------------------------


@dataclass
class Typed:
    """A compiled Column plus a best-effort inferred Spark type name."""

    col: Column
    typ: str | None  # simple lowercase spark type name, or None = unknown

    @property
    def is_string(self) -> bool:
        return self.typ == "string"

    @property
    def is_numericish(self) -> bool:
        return self.typ is not None and self.typ.split("(")[0] in _NUMERIC


# ---------------------------------------------------------------------------
# Function library
# ---------------------------------------------------------------------------

_DATEPART_ALIASES = {
    "year": "year", "yyyy": "year", "yy": "year",
    "quarter": "quarter", "qq": "quarter", "q": "quarter",
    "month": "month", "mm": "month", "m": "month",
    "dayofyear": "dayofyear", "dy": "dayofyear", "y": "dayofyear",
    "day": "day", "dd": "day", "d": "day",
    "week": "week", "wk": "week", "ww": "week",
    "weekday": "weekday", "dw": "weekday", "w": "weekday",
    "hour": "hour", "hh": "hour",
    "minute": "minute", "mi": "minute", "n": "minute",
    "second": "second", "ss": "second", "s": "second",
}


def _datepart(arg: Typed) -> str:
    # datepart comes in as a string literal column; we need the raw text.
    # The parser special-cases literal strings and stores them on the Typed.
    raw = getattr(arg, "_literal", None)
    if raw is None:
        raise ExprError("datepart argument must be a string literal")
    p = raw.strip().strip('"').lower()
    if p not in _DATEPART_ALIASES:
        raise ExprError(f"unknown datepart {raw!r}")
    return _DATEPART_ALIASES[p]


def _fn_dateadd(args: list[Typed]) -> Typed:
    """DATEADD preserving time-of-day. NOTE: NOT ``F.add_months`` for the
    month/year paths — add_months returns a DATE, silently zeroing the time
    component (caught by the date round-trip fuzz); calendar-interval
    addition clamps month-ends the same way AND keeps the time."""
    part, n, d = _datepart(args[0]), args[1].col, args[2].col
    zero = F.lit(0)
    if part in ("year", "quarter", "month"):
        months = {"year": 12, "quarter": 3, "month": 1}[part]
        iv = F.make_interval(zero, (n * months).cast("int"), zero, zero, zero, zero)
        return Typed(d + iv, "timestamp")
    days = {"day": 1, "week": 7}
    if part in days:
        iv = F.make_interval(zero, zero, zero, (n * days[part]).cast("int"), zero, zero)
        return Typed(d + iv, "timestamp")
    secs = {"hour": 3600, "minute": 60, "second": 1}
    if part in secs:
        iv = F.make_interval(
            zero, zero, zero, zero, zero, zero, (n * secs[part]).cast("decimal(18,6)")
        )
        return Typed(d + iv, "timestamp")
    raise ExprError(f"DATEADD datepart {part} unsupported")


def _fn_datediff(args: list[Typed]) -> Typed:
    """DATEDIFF with T-SQL/SSIS semantics: the number of datepart BOUNDARIES
    crossed between a and b — not elapsed time divided down (10:59 -> 11:01
    is 1 hour). Implemented as exact arithmetic on truncated values.
    Divergence kept deliberate: 'week' uses ISO (Monday) boundaries, not
    T-SQL's Sunday."""
    part, a, b = _datepart(args[0]), args[1].col, args[2].col
    if part == "year":
        return Typed(F.year(b) - F.year(a), "int")
    if part == "quarter":
        return Typed(
            (F.year(b) * 4 + F.quarter(b)) - (F.year(a) * 4 + F.quarter(a)), "int"
        )
    if part == "month":
        return Typed(
            (F.year(b) * 12 + F.month(b)) - (F.year(a) * 12 + F.month(a)), "int"
        )
    if part == "day":
        return Typed(F.datediff(F.to_date(b), F.to_date(a)), "int")
    if part == "week":
        return Typed(
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", b)),
                    F.to_date(F.date_trunc("week", a)),
                )
                / 7
            ).cast("int"),
            "int",
        )
    secs = {"hour": 3600, "minute": 60, "second": 1}
    if part in secs:
        ta = F.unix_timestamp(F.date_trunc(part, a))
        tb = F.unix_timestamp(F.date_trunc(part, b))
        return Typed(((tb - ta) / secs[part]).cast("bigint"), "bigint")
    raise ExprError(f"DATEDIFF datepart {part} unsupported")


def _fn_datepart(args: list[Typed]) -> Typed:
    part, d = _datepart(args[0]), args[1].col
    m: dict[str, Callable[[Column], Column]] = {
        "year": F.year, "quarter": F.quarter, "month": F.month,
        "dayofyear": F.dayofyear, "day": F.dayofmonth, "week": F.weekofyear,
        "weekday": lambda c: F.dayofweek(c), "hour": F.hour,
        "minute": F.minute, "second": F.second,
    }
    return Typed(m[part](d), "int")


def _fn_round(args: list[Typed]) -> Typed:
    scale = 0
    if len(args) > 1:
        lit = getattr(args[1], "_literal", None)
        scale = int(lit) if lit is not None else 0
    return Typed(F.round(args[0].col, scale), args[0].typ or "double")


def _fn_findstring(args: list[Typed]) -> Typed:
    """FINDSTRING(string, substring[, occurrence]) — 1-based, 0 = no match.

    The reference notes SSIS's swapped param order vs ``locate``
    (expression_translator.py:40). Only occurrence=1 is supported (the only
    form seen in fixtures); ``instr`` is the JVM-side equivalent.
    """
    if len(args) > 2 and getattr(args[2], "_literal", "1") not in ("1", None):
        raise ExprError("FINDSTRING occurrence>1 not supported")
    return Typed(F.instr(args[0].col, args[1].col), "int")


def _fn_tokencount(args: list[Typed]) -> Typed:
    delim = getattr(args[1], "_literal", None)
    if delim is None:
        raise ExprError("TOKENCOUNT delimiter must be a string literal")
    return Typed(
        F.size(F.filter(F.split(args[0].col, re.escape(delim)), lambda x: x != "")),
        "int",
    )


def _fn_token(args: list[Typed]) -> Typed:
    delim = getattr(args[1], "_literal", None)
    if delim is None:
        raise ExprError("TOKEN delimiter must be a string literal")
    parts = F.filter(F.split(args[0].col, re.escape(delim)), lambda x: x != "")
    return Typed(F.element_at(parts, args[2].col.cast("int")), "string")


def _simple(fn: Callable[..., Column], typ: str | None, nargs: int | None = None):
    def h(args: list[Typed]) -> Typed:
        if nargs is not None and len(args) != nargs:
            raise ExprError(f"expected {nargs} args, got {len(args)}")
        return Typed(fn(*[a.col for a in args]), typ)
    return h


FUNCTIONS: dict[str, Callable[[list[Typed]], Typed]] = {
    "GETDATE": _simple(F.current_timestamp, "timestamp", 0),
    "GETUTCDATE": _simple(F.current_timestamp, "timestamp", 0),
    "DATEADD": _fn_dateadd,
    "DATEDIFF": _fn_datediff,
    "DATEPART": _fn_datepart,
    "YEAR": _simple(F.year, "int", 1),
    "MONTH": _simple(F.month, "int", 1),
    "DAY": _simple(F.dayofmonth, "int", 1),
    "LEN": _simple(lambda c: F.length(F.rtrim(c)), "int", 1),  # SSIS LEN ignores trailing spaces
    "CODEPOINT": _simple(lambda c: F.ascii(c), "int", 1),
    "SUBSTRING": _simple(lambda c, p, l: F.substring(c, p, l), "string"),
    "UPPER": _simple(F.upper, "string", 1),
    "LOWER": _simple(F.lower, "string", 1),
    "TRIM": _simple(F.trim, "string", 1),
    "LTRIM": _simple(F.ltrim, "string", 1),
    "RTRIM": _simple(F.rtrim, "string", 1),
    "REVERSE": _simple(F.reverse, "string", 1),
    "LEFT": _simple(lambda c, n: F.substring(c, 1, n), "string"),
    "RIGHT": _simple(lambda c, n: F.substring(c, -n, n), "string"),
    "REPLICATE": _simple(lambda c, n: F.repeat(c, n), "string"),
    # SSIS REPLACE is literal (not regex) — the reference's regexp_replace
    # mapping (expression_translator.py:39) corrupts patterns with metachars.
    "REPLACE": _simple(lambda c, a, b: F.replace(c, a, b), "string", 3),
    "FINDSTRING": _fn_findstring,
    "ISNULL": lambda args: Typed(args[0].col.isNull(), "boolean"),
    "REPLACENULL": lambda args: Typed(
        F.coalesce(*[a.col for a in args]), args[0].typ
    ),
    "COALESCE": lambda args: Typed(F.coalesce(*[a.col for a in args]), args[0].typ),
    "ABS": _simple(F.abs, None, 1),
    "CEILING": _simple(F.ceil, "bigint", 1),
    "FLOOR": _simple(F.floor, "bigint", 1),
    "ROUND": _fn_round,
    "SQRT": _simple(F.sqrt, "double", 1),
    "SQUARE": _simple(lambda c: c * c, None, 1),
    "POWER": _simple(F.pow, "double", 2),
    "EXP": _simple(F.exp, "double", 1),
    "LN": _simple(F.log, "double", 1),
    "LOG": _simple(F.log10, "double", 1),
    "SIGN": _simple(F.signum, "double", 1),
    "IIF": lambda args: Typed(
        F.when(args[0].col, args[1].col).otherwise(args[2].col),
        args[1].typ or args[2].typ,
    ),
    "TOKEN": _fn_token,
    "TOKENCOUNT": _fn_tokencount,
    "HEX": _simple(F.hex, "string", 1),
    "CONCAT": lambda args: Typed(F.concat(*[a.col for a in args]), "string"),
    "NULL": lambda args: Typed(F.lit(None), None),  # NULL(DT_X) handled in parser
}


# ---------------------------------------------------------------------------
# Parser / compiler
# ---------------------------------------------------------------------------


class ExpressionCompiler:
    """Compile one SSIS expression string to a Typed Column.

    ``schema``: optional mapping of input column name -> simple spark type
    name (drives string-``+``-as-concat inference).
    ``variables``: pipeline context scalars bound as literals at plan time.
    """

    def __init__(
        self,
        schema: dict[str, str] | None = None,
        variables: dict[str, Any] | None = None,
    ) -> None:
        self.schema = {k.lower(): v for k, v in (schema or {}).items()}
        self.variables = variables or {}

    # -- public API ---------------------------------------------------------

    def compile(self, src: str) -> Column:
        return self.compile_typed(src).col

    def compile_typed(self, src: str) -> Typed:
        self.toks = tokenize(src)
        self.i = 0
        out = self._ternary()
        if self.i != len(self.toks):
            t = self.toks[self.i]
            raise ExprError(f"trailing input at {t.pos}: {t.text!r}")
        return out

    # -- token helpers ------------------------------------------------------

    def _peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> Tok:
        if self.i >= len(self.toks):
            raise ExprError("unexpected end of expression")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _accept(self, text: str) -> bool:
        t = self._peek()
        if t and t.kind == "op" and t.text == text:
            self.i += 1
            return True
        return False

    def _expect(self, text: str) -> None:
        if not self._accept(text):
            t = self._peek()
            raise ExprError(f"expected {text!r}, got {t.text if t else 'EOF'!r}")

    # -- precedence climbing -------------------------------------------------

    def _ternary(self) -> Typed:
        cond = self._or()
        if self._accept("?"):
            a = self._ternary()
            self._expect(":")
            b = self._ternary()
            return Typed(
                F.when(cond.col, a.col).otherwise(b.col), a.typ or b.typ
            )
        return cond

    def _or(self) -> Typed:
        left = self._and()
        while self._accept("||"):
            right = self._and()
            left = Typed(left.col | right.col, "boolean")
        return left

    def _and(self) -> Typed:
        left = self._bitor()
        while self._accept("&&"):
            right = self._bitor()
            left = Typed(left.col & right.col, "boolean")
        return left

    def _bitor(self) -> Typed:
        left = self._bitxor()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text == "|":
                self.i += 1
                right = self._bitxor()
                left = Typed(left.col.bitwiseOR(right.col), left.typ)
            else:
                return left

    def _bitxor(self) -> Typed:
        left = self._bitand()
        while self._accept("^"):
            right = self._bitand()
            left = Typed(left.col.bitwiseXOR(right.col), left.typ)
        return left

    def _bitand(self) -> Typed:
        left = self._eq()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text == "&":
                self.i += 1
                right = self._eq()
                left = Typed(left.col.bitwiseAND(right.col), left.typ)
            else:
                return left

    def _eq(self) -> Typed:
        left = self._cmp()
        while True:
            if self._accept("=="):
                right = self._cmp()
                left = Typed(left.col == right.col, "boolean")
            elif self._accept("!="):
                right = self._cmp()
                left = Typed(left.col != right.col, "boolean")
            else:
                return left

    def _cmp(self) -> Typed:
        left = self._add()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text in ("<", ">", "<=", ">="):
                self.i += 1
                right = self._add()
                c = {
                    "<": left.col < right.col,
                    ">": left.col > right.col,
                    "<=": left.col <= right.col,
                    ">=": left.col >= right.col,
                }[t.text]
                left = Typed(c, "boolean")
            else:
                return left

    def _add(self) -> Typed:
        left = self._mul()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text in ("+", "-"):
                self.i += 1
                right = self._mul()
                if t.text == "+" and (left.is_string or right.is_string):
                    left = Typed(F.concat(left.col, right.col), "string")
                elif t.text == "+":
                    left = Typed(left.col + right.col, left.typ or right.typ)
                else:
                    left = Typed(left.col - right.col, left.typ or right.typ)
            else:
                return left

    def _mul(self) -> Typed:
        left = self._unary()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text in ("*", "/", "%"):
                self.i += 1
                right = self._unary()
                if t.text == "*":
                    left = Typed(left.col * right.col, left.typ or right.typ)
                elif t.text == "/":
                    left = Typed(left.col / right.col, "double")
                else:
                    left = Typed(left.col % right.col, left.typ or right.typ)
            else:
                return left

    def _unary(self) -> Typed:
        if self._accept("!"):
            v = self._unary()
            return Typed(~v.col, "boolean")
        if self._accept("~"):
            v = self._unary()
            return Typed(v.col.bitwiseXOR(F.lit(-1)), v.typ)
        if self._accept("-"):
            v = self._unary()
            return Typed(-v.col, v.typ)
        if self._accept("+"):
            return self._unary()
        # cast: '(' DT_NAME [, p[, s[, codepage]]] ')' expr
        t = self._peek()
        if t and t.kind == "op" and t.text == "(":
            save = self.i
            self.i += 1
            t2 = self._peek()
            if t2 and t2.kind == "name" and t2.text.upper() in DT_TYPE_MAP:
                self.i += 1
                params: list[str] = []
                while self._accept(","):
                    params.append(self._next().text)
                self._expect(")")
                target = self._cast_type(t2.text.upper(), params)
                v = self._unary()
                return Typed(v.col.cast(target), target.split("(")[0])
            self.i = save
        return self._primary()

    def _cast_type(self, dt: str, params: list[str]) -> str:
        base = DT_TYPE_MAP[dt]
        if base == "decimal":
            if len(params) >= 2:
                # (DT_NUMERIC, precision, scale)
                return f"decimal({params[0]},{params[1]})"
            if len(params) == 1:
                return f"decimal({params[0]},0)"
            return "decimal(38,10)"
        return base  # DT_STR length / codepage are validation-only

    def _primary(self) -> Typed:
        t = self._next()
        if t.kind == "op" and t.text == "(":
            v = self._ternary()
            self._expect(")")
            return v
        if t.kind == "int":
            text = t.text.rstrip("L")
            val = int(text)
            typ = "bigint" if (t.text.endswith("L") or abs(val) > 2**31 - 1) else "int"
            out = Typed(F.lit(val), typ)
            out._literal = text  # type: ignore[attr-defined]
            return out
        if t.kind == "float":
            out = Typed(F.lit(float(t.text)), "double")
            out._literal = t.text  # type: ignore[attr-defined]
            return out
        if t.kind == "string":
            raw = t.text[1:-1]
            raw = (
                raw.replace("\\\\", "\x00")
                .replace('\\"', '"')
                .replace("\\n", "\n")
                .replace("\\t", "\t")
                .replace("\\r", "\r")
                .replace("\x00", "\\")
            )
            out = Typed(F.lit(raw), "string")
            out._literal = raw  # type: ignore[attr-defined]
            return out
        if t.kind == "colref":
            name = t.text[1:-1]
            return self._column(name)
        if t.kind == "hashref":
            # #{Package\...Columns[Name]} — take the [Name] tail
            m = re.search(r"\[([^\]]+)\]\s*\}$", t.text)
            if not m:
                raise ExprError(f"bad column ref {t.text!r}")
            return self._column(m.group(1))
        if t.kind == "var":
            return self._variable(t.text)
        if t.kind == "name":
            up = t.text.upper()
            if up == "TRUE":
                return Typed(F.lit(True), "boolean")
            if up == "FALSE":
                return Typed(F.lit(False), "boolean")
            if up == "NULL":
                nxt = self._peek()
                if nxt and nxt.kind == "op" and nxt.text == "(":
                    # NULL(DT_I4) — typed null
                    self.i += 1
                    dt = self._next().text.upper()
                    params: list[str] = []
                    while self._accept(","):
                        params.append(self._next().text)
                    self._expect(")")
                    target = self._cast_type(dt, params)
                    return Typed(F.lit(None).cast(target), target.split("(")[0])
                return Typed(F.lit(None), None)
            nxt = self._peek()
            if nxt and nxt.kind == "op" and nxt.text == "(":
                return self._call(up)
            return self._column(t.text)
        raise ExprError(f"unexpected token {t.text!r} at {t.pos}")

    def _call(self, name: str) -> Typed:
        self._expect("(")
        args: list[Typed] = []
        if not self._accept(")"):
            args.append(self._ternary())
            while self._accept(","):
                args.append(self._ternary())
            self._expect(")")
        fn = FUNCTIONS.get(name)
        if fn is None:
            raise ExprError(f"unknown function {name}")
        return fn(args)

    def _column(self, name: str) -> Typed:
        return Typed(F.col(f"`{name}`"), self.schema.get(name.lower()))

    def _variable(self, text: str) -> Typed:
        m = re.match(r"@\[(?:(?:User|System)::)?([^\]]+)\]$", text) or re.match(
            r"@(\w+)$", text
        )
        if not m:
            raise ExprError(f"bad variable ref {text!r}")
        name = m.group(1)
        if name not in self.variables:
            raise ExprError(f"unbound variable {name!r}")
        v = self.variables[name]
        typ = {bool: "boolean", int: "bigint", float: "double", str: "string"}.get(
            type(v)
        )
        return Typed(F.lit(v), typ)


def compile_expression(
    src: str,
    schema: dict[str, str] | None = None,
    variables: dict[str, Any] | None = None,
) -> Column:
    """One-shot convenience wrapper."""
    return ExpressionCompiler(schema, variables).compile(src)


def schema_of(df) -> dict[str, str]:
    """Extract a name->simple-type mapping the compiler understands."""
    return {f.name: f.dataType.simpleString().split("(")[0] for f in df.schema.fields}
