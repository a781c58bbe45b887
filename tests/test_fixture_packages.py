"""Golden end-to-end tests shaped after the reference's two fixture
packages (SURVEY §5): the Simple package as a control-flow TaskGraph with
SQL tasks + dataflow + row-count guard, and the Medium package via the q50
catalog query (oracle-checked separately)."""

from __future__ import annotations

import shutil

import pytest

from ssis_to_pyspark_agent_spark.plans import Pipeline
from ssis_to_pyspark_agent_spark.plans.control import TaskGraph, run_task_graph


@pytest.fixture()
def warehouse_cleanup(spark):
    yield
    for t in ("dst_outputtable",):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_simple_package_shape(spark, sf_dir, warehouse_cleanup):
    """Sample_Simple_Package.dtsx:23-141 re-expressed: TRUNCATE target ->
    dataflow (source -> row count -> destination append) -> INSERT default
    rows, with the load guarded on SourceRowCount > 0."""
    dataflow = Pipeline("DFT_LoadData")
    dataflow.step("src", "source.sql",
                  query="SELECT c_custkey AS ID, c_name AS Name, "
                        "c_acctbal AS Value, c_mktsegment AS Status "
                        "FROM src_inputtable")
    dataflow.step("rc", "row_count", "src", into="SourceRowCount", eager=True)
    dataflow.step("dst", "sink.table", "rc", table="dst_outputtable",
                  mode="append")

    g = TaskGraph("Simple_Package")
    g.task("SQL_DropTable", "sql", "DROP TABLE IF EXISTS dst_outputtable")
    g.task("SQL_TruncateTable", "sql",
           "CREATE TABLE dst_outputtable "
           "(ID bigint, Name string, Value double, Status string)")
    g.edge("SQL_DropTable", "SQL_TruncateTable")
    g.task("DFT_LoadData", "pipeline", dataflow)
    g.task("SQL_InsertDefaults", "sql",
           "INSERT INTO dst_outputtable VALUES "
           "(-1, 'Unknown', 0.0, 'DEFAULT'), "
           "(-2, 'Not Applicable', 0.0, 'DEFAULT')")
    g.edge("SQL_TruncateTable", "DFT_LoadData")
    g.edge("DFT_LoadData", "SQL_InsertDefaults",
           condition="@[User::SourceRowCount] > 0")

    # register the source view (stands in for SRC_InputTable)
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "src_inputtable"
    )
    results, ctx = run_task_graph(spark, g)

    n_src = spark.table("src_inputtable").count()
    assert ctx["SourceRowCount"] == n_src
    final = spark.table("dst_outputtable")
    assert final.count() == n_src + 2  # loaded rows + the two defaults
    defaults = final.filter("ID < 0").collect()
    assert {r.Name for r in defaults} == {"Unknown", "Not Applicable"}
    assert results["SQL_InsertDefaults"].status == "success"


def test_simple_package_empty_source_skips_defaults(spark, sf_dir,
                                                    warehouse_cleanup):
    """The guard edge: an empty feed must not insert defaults (the 'did the
    load actually happen' pattern the fixture encodes)."""
    dataflow = Pipeline("DFT_LoadData")
    dataflow.step("src", "source.sql",
                  query="SELECT c_custkey AS ID FROM src_inputtable WHERE 1=0")
    dataflow.step("rc", "row_count", "src", into="SourceRowCount", eager=True)

    g = TaskGraph("Simple_Package_Empty")
    g.task("SQL_DropTable", "sql", "DROP TABLE IF EXISTS dst_outputtable")
    g.task("SQL_TruncateTable", "sql",
           "CREATE TABLE dst_outputtable (ID bigint)")
    g.edge("SQL_DropTable", "SQL_TruncateTable")
    g.task("DFT_LoadData", "pipeline", dataflow)
    g.task("SQL_InsertDefaults", "sql",
           "INSERT INTO dst_outputtable VALUES (-1), (-2)")
    g.edge("SQL_TruncateTable", "DFT_LoadData")
    g.edge("DFT_LoadData", "SQL_InsertDefaults",
           condition="@[User::SourceRowCount] > 0")

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "src_inputtable"
    )
    results, ctx = run_task_graph(spark, g)
    assert ctx["SourceRowCount"] == 0
    assert results["SQL_InsertDefaults"].status == "skipped"
    assert spark.table("dst_outputtable").count() == 0
