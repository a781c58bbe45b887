"""Source and sink operators (SURVEY §2.1 / §2.2).

The reference's sources are SSIS connection-manager reads emitted as
``spark.table`` / ``spark.sql`` / ``spark.read.{csv,json,excel}`` templates
(``/root/reference/mapping/enhanced_json_mapper.py:62-175, 1572-1713``);
destinations are Delta/JDBC/file writes (``:2066-2138, 441-492``). Here each
becomes a thin declarative wrapper over DataFrameReader/Writer so Catalyst
gets pushdown/pruning on scans and the writer controls layout (partitioning)
for downstream 100 TB reads.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator


def normalize_event_time(df: DataFrame, cols) -> DataFrame:
    """Normalize event-time columns to Spark TIMESTAMP regardless of how the
    parquet writer encoded them. The testdata has shipped both TIMESTAMP(NANOS)
    (readable only as long nanos via ``nanosAsLong``) and plain timestamp[us]
    (read as TIMESTAMP_NTZ); branch on the actual dtype instead of assuming:

    - ``bigint``        -> epoch nanos, truncate to micros (lossy <1us by design)
    - ``timestamp_ntz`` -> reinterpret as session-local TIMESTAMP
    - ``timestamp``     -> no-op
    """
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt == "bigint":
            df = df.withColumn(c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


@operator("source.parquet")
def parquet_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Parquet scan (reference OLE DB Source table mode ->
    ``spark.table``, enhanced_json_mapper.py:1601-1608). Columnar +
    predicate pushdown; `columns` prunes the read schema explicitly."""
    from ssis_to_pyspark_agent_spark.sources.catalog import read_parquet

    if nanos_cols := config.get("nanos_ts_cols"):
        # nanosAsLong is harmless when the file is already micros precision;
        # it only changes how TIMESTAMP(NANOS) columns are surfaced.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = read_parquet(spark, config["path"], nanos_as_long=True)
        df = normalize_event_time(df, nanos_cols)
    else:
        df = read_parquet(spark, config["path"],
                          options=config.get("options", {}))
    if cols := config.get("columns"):
        df = df.select(*cols)
    if pred := config.get("where"):
        df = df.filter(pred)  # SQL string — stays pushdown-eligible
    return df


@operator("source.table")
def table_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    df = spark.table(config["table"])
    if cols := config.get("columns"):
        df = df.select(*cols)
    return df


@operator("source.sql")
def sql_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """OLE DB Source query mode (AccessMode=2) -> ``spark.sql`` (reference
    enhanced_json_mapper.py:1572-1590)."""
    return spark.sql(config["query"])


@operator("source.csv")
def csv_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Flat File / Excel-as-tabular source (reference
    enhanced_json_mapper.py:71-79,166-175). Declared DDL schema preferred
    over inferSchema (which double-scans)."""
    r = spark.read.option("header", str(config.get("header", True)).lower()).option(
        "sep", config.get("sep", ",")
    )
    if schema := config.get("schema"):
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(config["path"])


@operator("source.json")
def json_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """JSON source (reference REST/JSON source,
    enhanced_json_mapper.py:134-152). `record_path` drills into a nested
    array (the reference's JSON-path Filter) via explode.

    `url` (http/https) fetches the document ON THE DRIVER — an API
    response is one bounded payload, not a distributed dataset; it lands
    in a single-JSON-document DataFrame and the heavy lifting (explode,
    downstream joins) is distributed. `headers`/`timeout` cover
    auth-token APIs. For unbounded/paged feeds, land pages to storage
    first and read them as files — a driver loop is not an ingestion
    plane at 100 TB."""
    if url := config.get("url"):
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            url, headers=config.get("headers", {"Accept": "application/json"})
        )
        with urllib.request.urlopen(
            req, timeout=config.get("timeout", 30)
        ) as resp:
            payload = _json.loads(resp.read().decode("utf-8"))
        df = spark.read.option("multiLine", "true").json(
            spark.sparkContext.parallelize([_json.dumps(payload)])
        )
        return _drill_record_path(df, config.get("record_path"))
    r = spark.read
    if schema := config.get("schema"):
        r = r.schema(schema)
    df = r.option("multiLine", str(config.get("multiline", False)).lower()).json(
        config["path"]
    )
    return _drill_record_path(df, config.get("record_path"))


def _drill_record_path(df: DataFrame, rp: str | None) -> DataFrame:
    if not rp:
        return df
    from pyspark.sql.types import ArrayType, StructType

    for part in rp.split("."):
        dtype = df.schema[part].dataType
        if isinstance(dtype, ArrayType):
            df = df.select(F.explode(part).alias("_rec"))
            inner = dtype.elementType
            if isinstance(inner, StructType):
                df = df.select("_rec.*")
        else:
            df = df.select(f"{part}.*")
    return df


@operator("source.excel")
def excel_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Excel Source (reference enhanced_json_mapper.py:62-69 emits the
    com.crealytics spark-excel reader). Here: a stdlib .xlsx parser
    (zip-of-XML subset: shared/inline strings, numbers, booleans) — real
    spreadsheets are bounded artifacts (format caps at ~1M rows), so a
    driver-side parse into a DataFrame is the honest scale story; .csv
    exports route through the CSV reader."""
    path = config["path"]
    if path.endswith(".csv"):
        return csv_source(spark, inputs, config, context)
    from ssis_to_pyspark_agent_spark.sources.xlsx import read_xlsx

    rows = read_xlsx(path, sheet=config.get("sheet"))
    header = config.get("header", True)
    if header and rows:
        names = [str(c) if c is not None else f"_c{i}"
                 for i, c in enumerate(rows[0])]
        rows = rows[1:]
    else:
        names = [f"_c{i}" for i in range(len(rows[0]) if rows else 0)]
    df = spark.createDataFrame(
        [tuple(r) for r in rows] or [tuple([None] * len(names))],
        schema=names,
    )
    if not rows:
        df = df.limit(0)
    if schema := config.get("schema"):
        # cast to a declared DDL schema (xlsx cells are untyped floats/strs)
        from pyspark.sql.types import StructType

        target = (
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        df = df.select(
            *[F.col(f.name).cast(f.dataType) for f in target.fields]
        )
    return df


@operator("source.binary")
def binary_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Multimodal file ingest: `binaryFile` gives (path, modificationTime,
    length, content) — the scale-path for image/audio blobs (SURVEY §2.12)."""
    r = spark.read.format("binaryFile")
    if glob := config.get("glob"):
        r = r.option("pathGlobFilter", glob)
    return r.load(config["path"])


@operator("source.dataframe")
def dataframe_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Inject a pre-built DataFrame (tests / Recordset round-trips)."""
    return config["df"]


@operator("sink.parquet")
def parquet_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """File destination (reference OLE DB Destination -> Delta append,
    enhanced_json_mapper.py:2066-2074; parquet variant :485-492).

    `partition_by` drives layout for downstream partition pruning;
    `buckets`+`bucket_by` writes a bucketed table for shuffle-free joins.
    `rebalance=True` inserts an AQE REBALANCE before the write so output
    files track spark.sql.adaptive.advisoryPartitionSizeInBytes instead
    of inheriting the upstream partition count (guide §6: a 32-way
    shuffle tail writing a few thousand rows produces 32 tiny files;
    at 100 TB the same hint yields advisory-sized files).
    """
    df: DataFrame = inputs[0]
    if config.get("rebalance"):
        cols = config.get("partition_by") or []
        df = df.hint("rebalance", *cols)
    w = df.write.mode(config.get("mode", "append"))
    for k, v in config.get("options", {}).items():
        w = w.option(k, v)  # e.g. compression=zstd, parquet.block.size
    if pb := config.get("partition_by"):
        w = w.partitionBy(*pb)
    w.parquet(config["path"])
    return df


@operator("sink.table")
def table_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    df: DataFrame = inputs[0]
    if config.get("align_columns"):
        # SSIS destination semantics: unmapped target columns get NULL.
        # Align the frame to the existing table's schema by name.
        tgt = spark.table(config["table"]).schema
        df = df.select(
            *[
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in tgt.fields
            ]
        )
    if config.get("rebalance") and not config.get("buckets"):
        # same file-sizing contract as sink.parquet; bucketed writes keep
        # their bucket-driven layout untouched
        df = df.hint("rebalance", *(config.get("partition_by") or []))
    w = df.write.mode(config.get("mode", "append"))
    if pb := config.get("partition_by"):
        w = w.partitionBy(*pb)
    if (n := config.get("buckets")) and (bc := config.get("bucket_by")):
        w = w.bucketBy(n, *bc).sortBy(*bc)
    w.saveAsTable(config["table"])
    return df


@operator("sink.excel")
def excel_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Excel destination: a real .xlsx via the stdlib writer
    (sources/xlsx.py:write_xlsx — inverse of source.excel's parser).

    Driver-side by design, like every spreadsheet writer: the format caps
    at ~1M rows, so the collect is bounded by the format itself — and we
    probe (limit(cap+1)) before collecting rather than trusting that."""
    df: DataFrame = inputs[0]
    cap = config.get("max_rows", 1_048_575)
    # one job, not probe-then-collect: the bounded collect IS the probe
    # (cap+1 rows max land on the driver either way)
    collected = df.limit(cap + 1).collect()
    if len(collected) > cap:
        raise ValueError(
            f"sink.excel is for bounded spreadsheet artifacts (<= {cap} "
            f"rows; the xlsx format caps at ~1M). Use sink.parquet/"
            f"sink.csv for data-plane output."
        )
    from ssis_to_pyspark_agent_spark.sources.xlsx import write_xlsx

    rows = [list(r) for r in collected]
    header = [list(df.columns)] if config.get("header", True) else []
    write_xlsx(config["path"], header + rows,
               sheet_name=config.get("sheet", "Sheet1"))
    return df


@operator("sink.csv")
def csv_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    df: DataFrame = inputs[0]
    (
        df.write.mode(config.get("mode", "overwrite"))
        .option("header", str(config.get("header", True)).lower())
        .csv(config["path"])
    )
    return df


@operator("sink.json")
def json_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Line-delimited JSON destination (pairs with source.json)."""
    df: DataFrame = inputs[0]
    w = df.write.mode(config.get("mode", "overwrite"))
    for k, v in config.get("options", {}).items():
        w = w.option(k, v)  # e.g. compression=gzip, timestampFormat
    w.json(config["path"])
    return df


@operator("sink.view")
def view_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Recordset Destination analogue: register a temp view instead of
    collecting to the driver (reference indicator parser :505). `view` is
    an alias for `name` (the builder's step() reserves `name`)."""
    inputs[0].createOrReplaceTempView(config.get("view") or config["name"])
    return inputs[0]


@operator("sink.trash")
def trash_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Trash Destination (reference enhanced_json_mapper.py:368-377):
    terminate a branch. Optionally record the row count into context —
    via count() only when asked, since it forces an action."""
    df = inputs[0]
    if var := config.get("count_into"):
        context[var] = df.count()
    return df


@operator("sql.task")
def sql_task(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Execute SQL Task (reference parsing :190-245, codegen :955-996):
    DDL/DML via ``spark.sql``; a single-row result binds into context
    variables (Sample_Medium_Package.dtsx:31-34)."""
    df = spark.sql(config["sql"])
    if bind := config.get("result_bindings"):
        row = df.first()
        for var, colname in bind.items():
            context[var] = row[colname] if row is not None else None
    return df


@operator("source.orc")
def orc_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """ORC scan — Spark-native columnar reader (same pushdown/pruning
    contract as source.parquet; ORC is the other first-class columnar
    format a Spark-first engine must read). `columns` prunes the read
    schema; `where` stays pushdown-eligible."""
    r = spark.read
    for k, v in config.get("options", {}).items():
        r = r.option(k, v)
    df = r.orc(config["path"])
    if cols := config.get("columns"):
        df = df.select(*cols)
    if pred := config.get("where"):
        df = df.filter(pred)
    return df


@operator("sink.orc")
def orc_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """ORC destination — mirrors sink.parquet (mode/options/partition_by)
    over Spark's native ORC writer."""
    df: DataFrame = inputs[0]
    w = df.write.mode(config.get("mode", "append"))
    for k, v in config.get("options", {}).items():
        w = w.option(k, v)
    if pb := config.get("partition_by"):
        w = w.partitionBy(*pb)
    w.orc(config["path"])
    return df
