"""Property-based round-trip of the expression compiler (SURVEY §5):
randomly generated SSIS expression trees are rendered twice — once in SSIS
syntax for our compiler, once in ANSI SQL for DuckDB — and evaluated over
the same rows. Every value must match exactly.

Batched: all N expressions evaluate in ONE Spark job and ONE DuckDB query,
so the fuzz pass stays in seconds. Seeded RNG keeps failures reproducible.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from ssis_to_pyspark_agent_spark.functions.expr import ExpressionCompiler

ROWS = [
    (1, 4, "alpha", None),
    (2, -7, "Beta Gamma", 5),
    (3, 0, "", 9),
    (4, 123, "x", None),
    (5, -1, "Mixed CASE here", 0),
]
SCHEMA = {"id": "int", "n": "int", "s": "string", "opt": "int"}


class Node:
    """An expression tree that renders to both SSIS and SQL."""

    def __init__(self, ssis: str, sql: str, typ: str):
        self.ssis, self.sql, self.typ = ssis, sql, typ


def gen(rng: random.Random, depth: int, want: str) -> Node:
    """Generate a node of type `want` in {'int','str','bool'}."""
    if depth <= 0:
        if want == "int":
            if rng.random() < 0.5:
                v = rng.randint(-20, 20)
                return Node(str(v) if v >= 0 else f"({v})", str(v), "int")
            return rng.choice(
                [Node("[id]", "id", "int"), Node("[n]", "n", "int")]
            )
        if want == "str":
            if rng.random() < 0.5:
                v = rng.choice(["abc", "X", "", "hello world"])
                return Node(f'"{v}"', f"'{v}'", "str")
            return Node("[s]", "s", "str")
        # bool leaf
        a, b = gen(rng, 0, "int"), gen(rng, 0, "int")
        op = rng.choice(["==", "!=", "<", ">", "<=", ">="])
        sqlop = "=" if op == "==" else op
        return Node(f"({a.ssis} {op} {b.ssis})", f"({a.sql} {sqlop} {b.sql})", "bool")

    r = rng.random()
    if want == "int":
        if r < 0.35:
            a, b = gen(rng, depth - 1, "int"), gen(rng, depth - 1, "int")
            op = rng.choice(["+", "-", "*"])
            # keep magnitudes tame: ANSI overflow aborts the whole batch
            return Node(
                f"({a.ssis} {op} {b.ssis})", f"({a.sql} {op} {b.sql})", "int"
            )
        if r < 0.55:
            c = gen(rng, depth - 1, "bool")
            a, b = gen(rng, depth - 1, "int"), gen(rng, depth - 1, "int")
            return Node(
                f"({c.ssis} ? {a.ssis} : {b.ssis})",
                f"(CASE WHEN {c.sql} THEN {a.sql} ELSE {b.sql} END)",
                "int",
            )
        if r < 0.7:
            return Node("REPLACENULL([opt], 0)", "COALESCE(opt, 0)", "int")
        if r < 0.85:
            s = gen(rng, depth - 1, "str")
            return Node(f"LEN({s.ssis})", f"LENGTH(RTRIM({s.sql}))", "int")
        a = gen(rng, depth - 1, "int")
        return Node(f"ABS({a.ssis})", f"ABS({a.sql})", "int")
    if want == "str":
        if r < 0.4:
            a, b = gen(rng, depth - 1, "str"), gen(rng, depth - 1, "str")
            return Node(f"({a.ssis} + {b.ssis})", f"({a.sql} || {b.sql})", "str")
        if r < 0.6:
            a = gen(rng, depth - 1, "str")
            fn = rng.choice(["UPPER", "LOWER", "TRIM", "REVERSE"])
            return Node(f"{fn}({a.ssis})", f"{fn}({a.sql})", "str")
        if r < 0.8:
            a = gen(rng, depth - 1, "str")
            p, l = rng.randint(1, 3), rng.randint(1, 4)
            return Node(
                f"SUBSTRING({a.ssis}, {p}, {l})", f"SUBSTR({a.sql}, {p}, {l})", "str"
            )
        c = gen(rng, depth - 1, "bool")
        a, b = gen(rng, depth - 1, "str"), gen(rng, depth - 1, "str")
        return Node(
            f"({c.ssis} ? {a.ssis} : {b.ssis})",
            f"(CASE WHEN {c.sql} THEN {a.sql} ELSE {b.sql} END)",
            "str",
        )
    # bool
    if r < 0.3:
        a, b = gen(rng, depth - 1, "bool"), gen(rng, depth - 1, "bool")
        op = rng.choice(["&&", "||"])
        sqlop = "AND" if op == "&&" else "OR"
        return Node(f"({a.ssis} {op} {b.ssis})", f"({a.sql} {sqlop} {b.sql})", "bool")
    if r < 0.45:
        a = gen(rng, depth - 1, "bool")
        return Node(f"!({a.ssis})", f"(NOT {a.sql})", "bool")
    if r < 0.6:
        return Node("ISNULL([opt])", "(opt IS NULL)", "bool")
    a, b = gen(rng, depth - 1, "int"), gen(rng, depth - 1, "int")
    op = rng.choice(["==", "!=", "<", ">", "<=", ">="])
    sqlop = "=" if op == "==" else op
    return Node(f"({a.ssis} {op} {b.ssis})", f"({a.sql} {sqlop} {b.sql})", "bool")


N_EXPRS = 200


@pytest.mark.parametrize("seed", [42, 1337])
def test_fuzz_round_trip(spark, seed):
    rng = random.Random(seed)
    nodes = [
        gen(rng, rng.randint(1, 3), rng.choice(["int", "str", "bool"]))
        for _ in range(N_EXPRS)
    ]

    pdf = pd.DataFrame(ROWS, columns=list(SCHEMA))
    sdf = spark.createDataFrame(
        ROWS, "id int, n int, s string, opt int"
    )
    comp = ExpressionCompiler(SCHEMA)
    cols = [comp.compile(nd.ssis).alias(f"e{i}") for i, nd in enumerate(nodes)]
    spark_out = sdf.select("id", *cols).orderBy("id").toPandas()

    con = duckdb.connect()
    con.register("t", pdf)
    sql = "SELECT id, " + ", ".join(
        f"{nd.sql} AS e{i}" for i, nd in enumerate(nodes)
    ) + " FROM t ORDER BY id"
    duck_out = con.execute(sql).df()

    mismatches = []
    for i, nd in enumerate(nodes):
        sv = spark_out[f"e{i}"].tolist()
        dv = duck_out[f"e{i}"].tolist()
        sv = [None if pd.isna(v) else v for v in sv]
        dv = [None if pd.isna(v) else v for v in dv]
        if nd.typ == "bool":
            sv = [None if v is None else bool(v) for v in sv]
            dv = [None if v is None else bool(v) for v in dv]
        if nd.typ == "int":
            sv = [None if v is None else int(v) for v in sv]
            dv = [None if v is None else int(v) for v in dv]
        if sv != dv:
            mismatches.append((nd.ssis, nd.sql, sv, dv))
    assert not mismatches, mismatches[:3]


# ---------------------------------------------------------------------------
# Date/time function round-trip: the SSIS datetime library vs DuckDB
# equivalents over a timestamp column (dateparts are the classic
# off-by-one/clamping minefield).
# ---------------------------------------------------------------------------

TS_ROWS = [
    (1, "2024-01-31 10:30:00"),
    (2, "2023-12-31 23:59:59"),
    (3, "2024-02-29 00:00:00"),  # leap day
    (4, "1999-06-15 06:00:01"),
    (5, "2024-03-01 12:00:00"),
]

DATE_CASES = [
    # (ssis expression, duckdb sql, result kind)
    ('YEAR([ts])', "YEAR(ts)", "int"),
    ('MONTH([ts])', "MONTH(ts)", "int"),
    ('DAY([ts])', "DAY(ts)", "int"),
    ('DATEPART("quarter", [ts])', "QUARTER(ts)", "int"),
    ('DATEPART("hour", [ts])', "HOUR(ts)", "int"),
    ('DATEPART("minute", [ts])', "MINUTE(ts)", "int"),
    ('DATEPART("second", [ts])', "CAST(date_part('second', ts) AS INT)", "int"),
    ('DATEPART("dayofyear", [ts])', "dayofyear(ts)", "int"),
    ('DATEPART("week", [ts])', "weekofyear(ts)", "int"),
    # add_months clamps month-end exactly like SQL interval month addition
    ('DATEADD("month", 1, [ts])', "ts + INTERVAL 1 MONTH", "ts"),
    ('DATEADD("month", -2, [ts])', "ts - INTERVAL 2 MONTH", "ts"),
    ('DATEADD("year", 1, [ts])', "ts + INTERVAL 1 YEAR", "ts"),
    ('DATEADD("day", 40, [ts])', "ts + INTERVAL 40 DAY", "ts"),
    ('DATEADD("hour", -25, [ts])', "ts - INTERVAL 25 HOUR", "ts"),
    ('DATEADD("minute", 90, [ts])', "ts + INTERVAL 90 MINUTE", "ts"),
    ('DATEDIFF("day", [ts], (DT_DBTIMESTAMP)"2025-01-01")',
     "date_diff('day', CAST(ts AS DATE), DATE '2025-01-01')", "int"),
    # boundary-crossing semantics: DuckDB date_diff counts boundaries too
    ('DATEDIFF("hour", [ts], (DT_DBTIMESTAMP)"2025-01-01")',
     "date_diff('hour', ts, TIMESTAMP '2025-01-01')", "int"),
    ('DATEDIFF("minute", [ts], (DT_DBTIMESTAMP)"2024-06-01 12:30:00")',
     "date_diff('minute', ts, TIMESTAMP '2024-06-01 12:30:00')", "int"),
    ('DATEDIFF("month", [ts], (DT_DBTIMESTAMP)"2025-06-15")',
     "(2025 - YEAR(ts)) * 12 + 6 - MONTH(ts)", "int"),
]


def test_datetime_function_round_trip(spark):
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(TS_ROWS, columns=["id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(
        TS_ROWS, "id int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    comp = ExpressionCompiler({"id": "int", "ts": "timestamp"})

    cols = [comp.compile(ssis).alias(f"e{i}") for i, (ssis, _, _) in enumerate(DATE_CASES)]
    spark_out = sdf.select("id", *cols).orderBy("id").toPandas()

    con = duckdb.connect()
    con.register("t", pdf)
    sql = "SELECT id, " + ", ".join(
        f"{d} AS e{i}" for i, (_, d, _) in enumerate(DATE_CASES)
    ) + " FROM t ORDER BY id"
    duck_out = con.execute(sql).df()

    bad = []
    for i, (ssis, d, kind) in enumerate(DATE_CASES):
        sv = spark_out[f"e{i}"].tolist()
        dv = duck_out[f"e{i}"].tolist()
        if kind == "int":
            sv = [None if pd.isna(v) else int(v) for v in sv]
            dv = [None if pd.isna(v) else int(v) for v in dv]
        else:
            sv = [pd.Timestamp(v) for v in sv]
            dv = [pd.Timestamp(v) for v in dv]
        if sv != dv:
            bad.append((ssis, d, sv, dv))
    assert not bad, bad[:2]


class TestOraclePrefixFilterEquivalence:
    """The q31/q32 DuckDB oracles generate candidate pairs with the
    AllPairs prefix bound (round-10) instead of brute-force all-pairs.
    The bound is recall-complete for exact Jaccard at the threshold, so
    the filtered and brute-force oracles must return IDENTICAL results
    on any corpus — pinned here on seeded random corpora (boilerplate
    clones + shuffles + noise) without Spark, so the oracle SQL itself
    is guarded, not just the engine-vs-oracle agreement."""

    NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    SHINGLE = """
      list_distinct(list_transform(
        range(1, greatest(len(words) - 2, 1) + 1),
        i -> array_to_string(words[i:i+2], ' ')))
    """

    def _corpus(self, seed, n=90):
        import random

        rng = random.Random(seed)
        vocab = [f"w{k}" for k in range(40)]
        rows = []
        for i in range(n):
            if i % 7 == 1:
                # near-clone of the previous doc: drop/append one word
                base = rows[-1][1].split()
                if rng.random() < 0.5 and len(base) > 4:
                    base = base[:-1]
                else:
                    base = base + [rng.choice(vocab)]
                rows.append((i, " ".join(base)))
            else:
                L = rng.randrange(4, 24)
                rows.append(
                    (i, " ".join(rng.choice(vocab) for _ in range(L))))
        return rows

    def _con(self, rows):
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        con.execute(
            "ALTER TABLE documents ADD COLUMN n_chars INT")
        con.execute("UPDATE documents SET n_chars = len(text)")
        return con

    def _common(self):
        return f"""
        WITH docs AS (SELECT doc_id, n_chars,
                             string_split({self.NORM}, ' ') AS words
                      FROM documents),
        sh AS (SELECT doc_id, n_chars, {self.SHINGLE} AS shingles
               FROM docs)
        """

    def _prefix_pairs(self, t):
        # the oracle's candidate CTEs, parameterized by threshold
        return f"""
        , tok AS (SELECT doc_id, n_chars, len(shingles) AS sz,
                         unnest(shingles) AS s FROM sh),
        dfreq AS (SELECT s, COUNT(*) AS df FROM tok GROUP BY s),
        pref AS (
          SELECT doc_id, n_chars, sz, s FROM (
            SELECT tk.doc_id, tk.n_chars, tk.s, tk.sz,
                   row_number() OVER (PARTITION BY tk.doc_id
                                      ORDER BY d.df, tk.s) AS rn
            FROM tok tk JOIN dfreq d USING (s))
          WHERE rn <= sz - ceil(sz * {t} - 1e-9) + 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM pref a JOIN pref b
            ON a.s = b.s AND a.doc_id < b.doc_id)
        SELECT c.a, c.b
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.a
        JOIN sh sb ON sb.doc_id = c.b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
              / (len(sa.shingles) + len(sb.shingles)
                 - len(list_intersect(sa.shingles, sb.shingles))) >= {t}
        ORDER BY a, b
        """

    def _brute_pairs(self, t):
        return f"""
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) >= {t}
        ORDER BY a, b
        """

    @pytest.mark.parametrize("seed", [3, 11, 42])
    @pytest.mark.parametrize("t", [0.5, 0.7, 0.9])
    def test_prefix_filter_recall_complete(self, seed, t):
        con = self._con(self._corpus(seed))
        brute = con.execute(self._common() + self._brute_pairs(t)).fetchall()
        pref = con.execute(
            self._common() + self._prefix_pairs(t)).fetchall()
        assert len(brute) > 0  # the clone rule guarantees true pairs
        assert pref == brute
