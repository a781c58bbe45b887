"""JDBC contract: option assembly, URL building, partition predicates.

EXTERNAL RDBMS driver jars are not in this image, but pyspark bundles
Apache Derby (a real embedded RDBMS with a JDBC 4 driver) for its Hive
metastore — so ``source.jdbc``/``sink.jdbc`` EXECUTE here for real
(tests/test_jdbc_contract.py::TestJdbcExecutedDerby and q46's
round-trip leg); the jar-gated flavors' option assembly is pinned by
unit tests against mocked readers/writers. Mirrors what the
reference's codegen emits for ADO.NET/OLE DB connection managers
(reference mapping/control_flow_mapper.py:178-205 driver-class dispatch;
mapping/enhanced_json_mapper.py:1676-1713 read, 2103-2138 write), but
assembles real JDBC URLs instead of passing raw SSIS connection strings
through.

Scale notes: a single-stream JDBC scan caps ingest at one connection's
throughput — always partition production reads. Spark offers two forms:
bounds (partitionColumn/lowerBound/upperBound/numPartitions — ranges
computed by the engine) and an explicit predicate list (one partition per
predicate, for skewed or non-numeric keys). `partition_predicates` emits
the same ranges Spark's JDBCRelation.columnPartition would, so either
form produces identical partitioning; `fetchsize` defaults to 10k rows
(driver default is often 10-100 — pathological over a WAN).
"""

from __future__ import annotations

from typing import Any

# Driver classes per RDBMS flavor — same dispatch the reference performs
# on SSIS connection-manager types (control_flow_mapper.py:183-200).
DRIVER_CLASSES = {
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "oracle": "oracle.jdbc.OracleDriver",
}

_DEFAULT_PORTS = {
    "sqlserver": 1433,
    "postgresql": 5432,
    "mysql": 3306,
    "oracle": 1521,
}


def parse_ssis_connection_string(cs: str) -> dict[str, str]:
    """``Data Source=host,1433;Initial Catalog=db;User ID=u;Password=p``
    -> normalized dict. Keys are case/space-insensitive; OLE DB 'Provider'
    and ADO.NET 'Server'/'Database' synonyms are folded in."""
    out: dict[str, str] = {}
    for part in cs.split(";"):
        part = part.strip()
        if not part or "=" not in part:
            continue
        k, v = part.split("=", 1)
        out[k.strip().lower().replace(" ", "")] = v.strip()
    norm = {}
    if host := (out.get("datasource") or out.get("server")):
        norm["host"] = host
    if db := (out.get("initialcatalog") or out.get("database")):
        norm["database"] = db
    if user := (out.get("userid") or out.get("uid") or out.get("user")):
        norm["user"] = user
    if pw := (out.get("password") or out.get("pwd")):
        norm["password"] = pw
    if "," in norm.get("host", ""):  # SQL Server host,port form
        host, port = norm["host"].rsplit(",", 1)
        norm["host"], norm["port"] = host, port
    return norm


def jdbc_url(kind: str, host: str, port: int | str | None = None,
             database: str | None = None) -> str:
    """Canonical JDBC URL per flavor (flavor syntaxes are public JDBC
    driver documentation; Oracle uses the thin @//host:port/service
    form)."""
    kind = kind.lower()
    if kind not in DRIVER_CLASSES:
        raise ValueError(
            f"unsupported JDBC flavor {kind!r}; known: "
            f"{sorted(DRIVER_CLASSES)}"
        )
    port = port or _DEFAULT_PORTS[kind]
    if kind == "sqlserver":
        url = f"jdbc:sqlserver://{host}:{port}"
        if database:
            url += f";databaseName={database}"
        return url
    if kind == "oracle":
        return f"jdbc:oracle:thin:@//{host}:{port}/{database or ''}"
    return f"jdbc:{kind}://{host}:{port}/{database or ''}"


def partition_predicates(column: str, lower: int, upper: int,
                         num_partitions: int) -> list[str]:
    """The ranges Spark's JDBCRelation.columnPartition computes for
    (partitionColumn, bounds, numPartitions) — as an explicit predicate
    list: first range catches everything below (and NULLs via the
    'IS NULL' arm), last everything above, so rows outside the bounds are
    never dropped, only skewed into the edge partitions."""
    n = min(num_partitions, max(upper - lower, 0))
    if n <= 1:
        # one partition must cover EVERYTHING (clamping to a single range
        # with the first-range '< hi' arm would silently drop col >= hi)
        return ["1=1"]
    # Spark's JDBCRelation.columnPartition stride is
    # upperBound/n - lowerBound/n with JVM integer division (truncation
    # toward zero) — NOT (upper-lower)//n, which differs for negative
    # bounds (Python // floors). Matching it keeps the documented
    # "identical partitioning to the bounds form" guarantee.
    stride = int(upper / n) - int(lower / n)
    if stride <= 0:
        stride = 1
    preds, lo = [], lower
    for i in range(n):
        hi = lo + stride
        if i == 0:
            preds.append(f"{column} < {hi} OR {column} IS NULL")
        elif i == n - 1:
            preds.append(f"{column} >= {lo}")
        else:
            preds.append(f"{column} >= {lo} AND {column} < {hi}")
        lo = hi
    return preds


def _resolve_connection(cfg: dict[str, Any]) -> dict[str, Any]:
    """Expand an SSIS `connection_string` (+ `kind`) into url/user/
    password/driver defaults — shared by the read and write planners."""
    if cs := cfg.get("connection_string"):
        parsed = parse_ssis_connection_string(cs)
        cfg.setdefault("url", jdbc_url(
            cfg.get("kind", "sqlserver"), parsed["host"],
            parsed.get("port"), parsed.get("database"),
        ))
        for k in ("user", "password"):
            if k in parsed:
                cfg.setdefault(k, parsed[k])
        if kind := cfg.get("kind"):
            cfg.setdefault("driver", DRIVER_CLASSES[kind.lower()])
    return cfg


def jdbc_read_options(config: dict[str, Any]) -> dict[str, str]:
    """Everything handed to ``spark.read.format('jdbc')`` — pure,
    testable. `table` XOR `query` (query wrapped as a derived table, the
    documented dbtable subquery form). A `connection_string` (SSIS style)
    plus `kind` substitutes for url/user/password."""
    cfg = _resolve_connection(dict(config))
    if bool(cfg.get("table")) == bool(cfg.get("query")):
        raise ValueError("source.jdbc needs exactly one of table/query")
    opts = {
        "url": cfg["url"],
        "dbtable": cfg.get("table") or f"({cfg['query']}) q",
        "fetchsize": str(cfg.get("fetchsize", 10000)),
    }
    for k in ("user", "password", "driver"):
        if k in cfg:
            opts[k] = cfg[k]
    if pc := cfg.get("partition_column"):
        opts.update(
            partitionColumn=pc,
            numPartitions=str(cfg.get("num_partitions", 8)),
            lowerBound=str(cfg["lower_bound"]),
            upperBound=str(cfg["upper_bound"]),
        )
    return opts


# SSIS destination access modes -> Spark SaveMode. 'fastLoad' is the
# bulk-insert hint — same table-append semantics, batched. Spark's own
# SaveMode spellings pass through so specs written against
# DataFrameWriter.mode keep working.
_WRITE_MODES = {
    "append": "append", "fastload": "append", "overwrite": "overwrite",
    "truncate": "overwrite", "ignore": "ignore", "fail": "error",
    "error": "error", "errorifexists": "error",
}


def jdbc_write_plan(config: dict[str, Any]) -> tuple[str, dict[str, str]]:
    """(save_mode, options) for ``df.write.format('jdbc')``. `truncate`
    maps to overwrite + truncate=true (drop-and-recreate loses indexes/
    grants; TRUNCATE keeps the table definition — the SSIS fast-load
    default behavior)."""
    cfg = _resolve_connection(dict(config))
    mode_in = str(cfg.get("mode", "append")).lower()
    if mode_in not in _WRITE_MODES:
        raise ValueError(
            f"unknown jdbc write mode {mode_in!r}; known: "
            f"{sorted(_WRITE_MODES)}"
        )
    opts = {
        "url": cfg["url"],
        "dbtable": cfg["table"],
        "batchsize": str(cfg.get("batchsize", 10000)),
    }
    if mode_in == "truncate":
        opts["truncate"] = "true"
    if iso := cfg.get("isolation_level"):
        opts["isolationLevel"] = iso
    for k in ("user", "password", "driver"):
        if k in cfg:
            opts[k] = cfg[k]
    return _WRITE_MODES[mode_in], opts
