"""JDBC contract tests + an EXECUTED integration pass.

The image ships no EXTERNAL RDBMS driver jars (sqlserver/postgres/mysql/
oracle scans stay jar-gated), but pyspark bundles Apache Derby — a real
embedded RDBMS with a JDBC 4 driver — for its Hive metastore, so the
operators' full execution path (write modes, plain / bounds-partitioned /
predicate-list / query-mode reads) RUNS here against a real database
(TestJdbcExecutedDerby). The mock tests pin everything up to the JVM
call for the jar-gated flavors: URL building, SSIS connection-string
parsing, option assembly, partitioned-read range generation (both Spark
forms), write-mode mapping, and the raise path when a load fails for
lack of a driver.
"""

from __future__ import annotations

import pytest

from ssis_to_pyspark_agent_spark.operators import get_operator
from ssis_to_pyspark_agent_spark.sources.jdbc import (
    DRIVER_CLASSES,
    jdbc_read_options,
    jdbc_url,
    jdbc_write_plan,
    parse_ssis_connection_string,
    partition_predicates,
)


def run(op, spark, inputs, **config):
    return get_operator(op)(spark, inputs, config, {})


class TestUrlAndConnectionString:
    def test_urls_per_flavor(self):
        assert jdbc_url("postgresql", "h", 5433, "db") == \
            "jdbc:postgresql://h:5433/db"
        assert jdbc_url("mysql", "h", database="db") == \
            "jdbc:mysql://h:3306/db"
        assert jdbc_url("sqlserver", "h", database="db") == \
            "jdbc:sqlserver://h:1433;databaseName=db"
        assert jdbc_url("oracle", "h", 1522, "svc") == \
            "jdbc:oracle:thin:@//h:1522/svc"
        with pytest.raises(ValueError, match="unsupported"):
            jdbc_url("sybase", "h")

    def test_parse_ssis_connection_string(self):
        cs = ("Data Source=dbhost,1444;Initial Catalog=Finance;"
              "User ID=etl;Password=s3cret;Integrated Security=False")
        got = parse_ssis_connection_string(cs)
        assert got == {"host": "dbhost", "port": "1444",
                       "database": "Finance", "user": "etl",
                       "password": "s3cret"}
        # ADO.NET synonyms
        got2 = parse_ssis_connection_string(
            "Server=pg;Database=dw;Uid=u;Pwd=p")
        assert got2 == {"host": "pg", "database": "dw",
                        "user": "u", "password": "p"}


class TestPartitionPredicates:
    def test_matches_spark_column_partition_ranges(self):
        """Same ranges JDBCRelation.columnPartition emits: first range
        unbounded below (and NULL-inclusive), last unbounded above."""
        got = partition_predicates("id", 0, 100, 4)
        assert got == [
            "id < 25 OR id IS NULL",
            "id >= 25 AND id < 50",
            "id >= 50 AND id < 75",
            "id >= 75",
        ]

    def test_degenerate_cases(self):
        assert partition_predicates("id", 0, 100, 1) == ["1=1"]
        assert partition_predicates("id", 5, 5, 8) == ["1=1"]
        # clamped to ONE partition (upper-lower=1 < num_partitions): the
        # single predicate must cover everything, not just id < upper
        assert partition_predicates("id", 0, 1, 8) == ["1=1"]
        # more partitions than distinct values: clamp, never empty ranges
        got = partition_predicates("id", 0, 3, 10)
        assert len(got) == 3 and got[-1] == "id >= 2"

    def test_ranges_cover_everything(self):
        """Every integer (and NULL) lands in exactly one predicate — the
        partitioned read must be a partition of the table, not a sample."""
        preds = partition_predicates("x", 10, 1000, 7)

        def matches(v):
            hits = 0
            for p in preds:
                clauses = p.split(" AND ")
                ok = True
                for c in clauses:
                    c = c.replace(" OR x IS NULL", "")
                    op = ">=" if ">=" in c else "<"
                    bound = int(c.split()[-1])
                    ok &= (v >= bound) if op == ">=" else (v < bound)
                hits += ok
            return hits

        for v in (-5, 10, 11, 432, 999, 1000, 10**9):
            assert matches(v) == 1, v


class TestReadOptions:
    def test_table_mode_with_partitioning(self):
        opts = jdbc_read_options({
            "url": "jdbc:postgresql://h:5432/db", "table": "public.orders",
            "user": "u", "password": "p", "partition_column": "o_orderkey",
            "lower_bound": 1, "upper_bound": 6000000,
            "num_partitions": 16,
        })
        assert opts["dbtable"] == "public.orders"
        assert opts["partitionColumn"] == "o_orderkey"
        assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")
        assert opts["numPartitions"] == "16"
        assert opts["fetchsize"] == "10000"

    def test_query_mode_wraps_subquery(self):
        opts = jdbc_read_options({
            "url": "jdbc:mysql://h:3306/db",
            "query": "SELECT a, b FROM t WHERE a > 5",
        })
        assert opts["dbtable"] == "(SELECT a, b FROM t WHERE a > 5) q"

    def test_table_query_exclusivity(self):
        with pytest.raises(ValueError, match="exactly one"):
            jdbc_read_options({"url": "u", "table": "t", "query": "q"})
        with pytest.raises(ValueError, match="exactly one"):
            jdbc_read_options({"url": "u"})

    def test_connection_string_expands_to_url_and_driver(self):
        opts = jdbc_read_options({
            "connection_string": ("Data Source=dbhost;Initial Catalog=dw;"
                                  "User ID=etl;Password=x"),
            "kind": "sqlserver", "table": "dbo.fact",
        })
        assert opts["url"] == "jdbc:sqlserver://dbhost:1433;databaseName=dw"
        assert opts["driver"] == DRIVER_CLASSES["sqlserver"]
        assert (opts["user"], opts["password"]) == ("etl", "x")


class TestWritePlan:
    def test_ssis_access_modes_map_to_save_modes(self):
        base = {"url": "jdbc:postgresql://h/db", "table": "t"}
        assert jdbc_write_plan({**base, "mode": "fastLoad"})[0] == "append"
        assert jdbc_write_plan({**base, "mode": "overwrite"})[0] == "overwrite"
        assert jdbc_write_plan({**base, "mode": "fail"})[0] == "error"
        mode, opts = jdbc_write_plan({**base, "mode": "truncate"})
        assert mode == "overwrite" and opts["truncate"] == "true"
        assert jdbc_write_plan(base)[0] == "append"  # default
        with pytest.raises(ValueError, match="unknown jdbc write mode"):
            jdbc_write_plan({**base, "mode": "upsert"})

    def test_write_options(self):
        _, opts = jdbc_write_plan({
            "url": "u", "table": "t", "batchsize": 5000,
            "isolation_level": "READ_COMMITTED", "user": "a",
        })
        assert opts["batchsize"] == "5000"
        assert opts["isolationLevel"] == "READ_COMMITTED"
        assert opts["user"] == "a"


class _Recorder:
    """Mock DataFrameReader/Writer: records the fluent chain."""

    def __init__(self):
        self.calls = {}
        self.jdbc_call = None
        self.loaded = False

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def options(self, **kw):
        self.calls.setdefault("options", {}).update(kw)
        return self

    def mode(self, m):
        self.calls["mode"] = m
        return self

    def load(self):
        self.loaded = True
        return "LOADED"

    def save(self):
        self.loaded = True

    def jdbc(self, url, table, predicates=None, properties=None):
        self.jdbc_call = {"url": url, "table": table,
                          "predicates": predicates,
                          "properties": properties}
        return "LOADED"


class _FakeSparkRead:
    def __init__(self, rec):
        self.read = rec


class TestOperatorWiring:
    def test_source_wires_options_through_mock_reader(self):
        rec = _Recorder()
        out = run("source.jdbc", _FakeSparkRead(rec), [],
                  url="jdbc:postgresql://h/db", table="t", user="u",
                  partition_column="id", lower_bound=0, upper_bound=10,
                  num_partitions=2)
        assert out == "LOADED" and rec.loaded
        assert rec.calls["format"] == "jdbc"
        assert rec.calls["options"]["partitionColumn"] == "id"
        assert rec.calls["options"]["dbtable"] == "t"

    def test_source_predicates_use_reader_jdbc_api(self):
        rec = _Recorder()
        preds = partition_predicates("id", 0, 100, 4)
        out = run("source.jdbc", _FakeSparkRead(rec), [],
                  url="jdbc:postgresql://h/db", table="t", user="u",
                  password="p", predicates=preds)
        assert out == "LOADED"
        assert rec.jdbc_call["predicates"] == preds
        assert rec.jdbc_call["table"] == "t"
        # credentials travel in properties, not in the URL
        assert rec.jdbc_call["properties"]["user"] == "u"
        assert "url" not in rec.jdbc_call["properties"]

    def test_sink_wires_mode_and_options(self):
        rec = _Recorder()

        class _FakeDf:
            write = rec

        run("sink.jdbc", None, [_FakeDf()],
            url="u", table="t", mode="truncate")
        assert rec.loaded
        assert rec.calls["mode"] == "overwrite"
        assert rec.calls["options"]["truncate"] == "true"

    def test_missing_driver_raises_not_implemented(self, spark):
        """The real raise path: a genuine load attempt without the jar
        must surface the install hint, not a raw ClassNotFound."""
        with pytest.raises(NotImplementedError, match="driver jar"):
            run("source.jdbc", spark, [],
                url="jdbc:postgresql://nowhere:5432/db", table="t")


def test_partition_predicates_negative_bounds_match_spark_stride():
    # Spark's JDBCRelation.columnPartition: stride = upper/n - lower/n
    # with JVM truncation toward zero. lower=-7, upper=8, n=3 gives
    # stride 2-(-2)=4 and boundaries -3, 1 — Python floor division would
    # give stride 5 / boundaries -2, 3.
    from ssis_to_pyspark_agent_spark.sources.jdbc import partition_predicates

    preds = partition_predicates("k", -7, 8, 3)
    assert preds == [
        "k < -3 OR k IS NULL",
        "k >= -3 AND k < 1",
        "k >= 1",
    ]
    # full coverage is preserved: every int is matched by exactly one arm
    import re

    for v in range(-20, 21):
        hits = 0
        for p in preds:
            if "IS NULL" in p:
                hi = int(re.match(r"k < (-?\d+)", p).group(1))
                hits += v < hi
            elif "AND" in p:
                lo, hi = map(int, re.match(
                    r"k >= (-?\d+) AND k < (-?\d+)", p).groups())
                hits += lo <= v < hi
            else:
                lo = int(re.match(r"k >= (-?\d+)", p).group(1))
                hits += v >= lo
        assert hits == 1, (v, preds)


class TestJdbcExecutedDerby:
    """source.jdbc / sink.jdbc EXECUTED against Apache Derby embedded
    (bundled with pyspark for the Hive metastore — a real RDBMS, a real
    JDBC driver, no network). Every Spark JDBC read form and every write
    mode actually runs; identifier note — Spark's writer quotes column
    names, so raw-SQL predicates/queries against Spark-written tables
    quote them too."""

    @pytest.fixture()
    def url(self, tmp_path):
        return f"jdbc:derby:{tmp_path}/derbydb;create=true"

    def test_write_modes_and_reads(self, spark, url):
        df = spark.range(50).selectExpr("id as k", "concat('n', id) as src")
        run("sink.jdbc", spark, [df], url=url, table="t1", mode="overwrite")
        run("sink.jdbc", spark, [df], url=url, table="t1", mode="append")
        plain = run("source.jdbc", spark, [], url=url, table="t1")
        assert plain.count() == 100 and plain.columns == ["k", "src"]
        # bounds-partitioned parallel read: 4 real partitions
        part = run("source.jdbc", spark, [], url=url, table="t1",
                   partition_column="k", lower_bound=0, upper_bound=50,
                   num_partitions=4)
        assert part.rdd.getNumPartitions() == 4 and part.count() == 100
        # explicit predicate list: one partition per predicate
        pred = run("source.jdbc", spark, [], url=url, table="t1",
                   predicates=['"k" < 25', '"k" >= 25'])
        assert pred.rdd.getNumPartitions() == 2 and pred.count() == 100
        # query mode (dbtable subquery form)
        q = run("source.jdbc", spark, [], url=url,
                query='SELECT "k" FROM t1 WHERE "k" < 10')
        assert q.count() == 20  # both appended copies
        # truncate access mode = overwrite semantics
        run("sink.jdbc", spark, [df], url=url, table="t1", mode="truncate")
        assert run("source.jdbc", spark, [],
                   url=url, table="t1").count() == 50

    def test_values_round_trip_exact(self, spark, url):
        rows = [(1, "a", 2.5, True), (2, None, -0.0, False),
                (3, "ué", 1e18, None)]
        df = spark.createDataFrame(
            rows, "k long, s string, d double, b boolean")
        run("sink.jdbc", spark, [df], url=url, table="vals",
            mode="overwrite")
        back = run("source.jdbc", spark, [], url=url, table="vals")
        got = sorted(map(tuple, back.collect()))
        assert got == sorted(rows)
