"""Script Component + Export/Import Column (SURVEY §2.3, §2.10).

The reference maps SSIS Script Components (C#/VB with read-only/read-write
variables, parsing/data_engineering_parser.py:1242-1245) to "custom PySpark
UDF" (component_mapper.py:86-93). Ours is the vectorized version: a user
function over Arrow batches (mapInPandas) or per-group pandas frames
(applyInPandas) — never row-at-a-time Python.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator


@operator("script")
def script(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Script Component, batch flavor.

    config:
      fn: Callable[[pd.DataFrame], pd.DataFrame] — applied per Arrow batch
      schema: output schema (DDL string)
      variables: names of context variables exposed to fn via a second
                 positional arg (read-only snapshot, like SSIS ReadOnly
                 variables; pickled into the task closure)
    """
    fn = config["fn"]
    schema = config["schema"]
    if vars_wanted := config.get("variables"):
        snapshot = {v: context.get(v) for v in vars_wanted}

        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield fn(pdf, snapshot)

    else:

        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield fn(pdf)

    return inputs[0].mapInPandas(run, schema=schema)


@operator("script.grouped")
def script_grouped(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Script Component, grouped flavor (UDAF/UDTF-like shapes):
    applyInPandas over `keys`."""
    return (
        inputs[0]
        .groupBy(*config["keys"])
        .applyInPandas(config["fn"], schema=config["schema"])
    )


@operator("export_column")
def export_column(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Export Column (reference :1147): write a per-row blob to a file named
    by a path column. Executor-side via a pandas batch (distributed writes —
    target must be shared storage on a cluster). Adds `export_ok`."""
    df: DataFrame = inputs[0]
    data_col, path_col = config["data_col"], config["path_col"]
    base = config["base_dir"]

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["export_ok boolean"]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(base, exist_ok=True)
        for pdf in it:
            oks = []
            for payload, rel in zip(pdf[data_col], pdf[path_col]):
                target = os.path.join(base, str(rel))
                if os.path.realpath(target).startswith(os.path.realpath(base)):
                    with open(target, "wb") as fh:
                        fh.write(bytes(payload) if payload is not None else b"")
                    oks.append(True)
                else:  # path escape — refuse
                    oks.append(False)
            yield pdf.assign(export_ok=oks)

    return df.mapInPandas(run, schema=out_schema)


@operator("import_column")
def import_column(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Import Column (reference :1148): read file contents into a binary
    column per row. For directory-scale ingest prefer source.binary
    (spark's binaryFile source with partition planning); this is the
    row-driven variant."""
    df: DataFrame = inputs[0]
    path_col = config["path_col"]
    out = config.get("out", "content")
    base = config.get("base_dir", "")

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out} binary"]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for rel in pdf[path_col]:
                target = os.path.join(base, str(rel)) if base else str(rel)
                try:
                    with open(target, "rb") as fh:
                        blobs.append(fh.read())
                except OSError:
                    blobs.append(None)
            yield pdf.assign(**{out: blobs})

    return df.mapInPandas(run, schema=out_schema)


@operator("source.xml")
def xml_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """XML Source (reference models.py:32, component_mapper.py:352).

    Spark 4 ships native XML support (SPARK-44265) — fully distributed,
    rowTag-based record splitting, no jar needed. `attribute_prefix`
    defaults to '' so XML attributes land as plain columns (SSIS XML
    Source semantics); set '_' for the Spark default."""
    r = (
        spark.read.format("xml")
        .option("rowTag", config.get("row_tag", "row"))
        .option("attributePrefix", config.get("attribute_prefix", ""))
    )
    if schema := config.get("schema"):
        r = r.schema(schema)
    return r.load(config["path"])


@operator("sink.xml")
def xml_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """XML destination (pairs with source.xml; Spark 4 native writer —
    distributed, rowTag-framed records)."""
    df: DataFrame = inputs[0]
    (
        df.write.mode(config.get("mode", "overwrite"))
        .format("xml")
        .option("rowTag", config.get("row_tag", "row"))
        .save(config["path"])
    )
    return df


def _jdbc_missing_driver(exc: Exception) -> bool:
    """True only when the failure is a MISSING DRIVER (jar not on the
    classpath) — real SQL/connectivity errors must surface as
    themselves now that the JDBC path executes in-image (Derby)."""
    msg = str(exc)
    return ("ClassNotFoundException" in msg
            or "No suitable driver" in msg
            or "JDBC_NO_SUITABLE_DRIVER" in msg
            or "CANNOT_FIND_JDBC_DRIVER" in msg)


@operator("source.jdbc")
def jdbc_source(spark: SparkSession, inputs, config, context) -> DataFrame:
    """JDBC source family: ADO.NET/ODBC/Oracle/MySQL/PostgreSQL scans
    (reference models.py:25-28, conn URLs control_flow_mapper.py:183-200;
    codegen enhanced_json_mapper.py:1655-1713). Option assembly /
    connection-string parsing / partitioned-read ranges live in
    sources/jdbc.py. EXECUTED in-image against Apache Derby embedded
    (the RDBMS+JDBC driver pyspark bundles for its metastore): write
    modes and plain/partitioned/predicate/query reads run for real in
    tests AND in q46's oracle-load-bearing round-trip leg; external
    RDBMS flavors (sqlserver/postgres/mysql/oracle) remain jar-gated
    with the contract pinned against mocks. Partitioned parallel reads
    via either
    (partition_column, num_partitions, lower/upper bound) or an explicit
    `predicates` list (one partition per predicate — for skewed or
    non-numeric keys); single-stream without them, which caps ingest at
    one connection's throughput."""
    from ssis_to_pyspark_agent_spark.sources.jdbc import jdbc_read_options

    opts = jdbc_read_options(config)
    if preds := config.get("predicates"):
        props = {k: v for k, v in opts.items()
                 if k not in ("url", "dbtable")}
        try:
            return spark.read.jdbc(
                url=opts["url"], table=opts["dbtable"],
                predicates=list(preds), properties=props,
            )
        except Exception as exc:
            if _jdbc_missing_driver(exc):  # pragma: no cover — jar-gated
                raise NotImplementedError(
                    "source.jdbc requires the RDBMS driver jar on the "
                    "cluster") from exc
            raise
    r = spark.read.format("jdbc").options(**opts)
    try:
        return r.load()
    except Exception as exc:
        if _jdbc_missing_driver(exc):  # pragma: no cover — jar-gated
            raise NotImplementedError(
                "source.jdbc requires the RDBMS driver jar on the cluster"
            ) from exc
        raise


@operator("sink.jdbc")
def jdbc_sink(spark: SparkSession, inputs, config, context) -> DataFrame:
    """JDBC destination (reference enhanced_json_mapper.py:2103-2138).
    SSIS access modes (append/fastLoad/truncate/...) map to Spark
    SaveModes in sources/jdbc.py:jdbc_write_plan. EXECUTED in-image
    against Derby embedded (every mode, tests + q46's leg); external
    RDBMS jars remain env-gated."""
    from ssis_to_pyspark_agent_spark.sources.jdbc import jdbc_write_plan

    df: DataFrame = inputs[0]
    mode, opts = jdbc_write_plan(config)
    w = df.write.format("jdbc").mode(mode).options(**opts)
    try:
        w.save()
    except Exception as exc:
        if _jdbc_missing_driver(exc):  # pragma: no cover — jar-gated
            raise NotImplementedError(
                "sink.jdbc requires the RDBMS driver jar on the cluster"
            ) from exc
        raise
    return df
