"""DTSX front-end round-trip: parse the reference's two fixture packages
from raw XML into TaskGraph/Pipeline and EXECUTE them (the reference stops
at codegen — ``parsing/data_engineering_parser.py:28-59`` — and never runs
its fixtures; here the parse target is the live engine).

The Medium test asserts FAITHFUL execution of what the XML actually says —
including its quirk that DER_NullableColumns replaces NULL checksums with
sentinels BEFORE DER_ProcessingFlags computes the ISNULL-based routing
flags, which routes feed-only/existing-only rows to UPDATE rather than
INSERT/DELETE. A translator must reproduce the package, not its intent
(the intended business logic lives in the q50 catalog query)."""

from __future__ import annotations

import shutil

import pytest

from ssis_to_pyspark_agent_spark.parsing import parse_package
from ssis_to_pyspark_agent_spark.plans.control import run_task_graph

SIMPLE = "/root/reference/input-sample packages/Sample_Simple_Package.dtsx"
MEDIUM = "/root/reference/input-sample packages/Sample_Medium_Package.dtsx"


@pytest.fixture()
def warehouse_cleanup(spark):
    yield
    for t in ("src_generictable", "dst_generictable"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_simple_package_roundtrip(spark, sf_dir, warehouse_cleanup):
    """XML -> TaskGraph -> run: TRUNCATE -> dataflow (source.sql ->
    row_count -> append destination) -> INSERT defaults."""
    pkg = parse_package(SIMPLE)
    assert [t.kind for t in pkg.task_graph.tasks] == ["sql", "pipeline", "sql"]

    spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey AS ID", "c_name AS Name", "c_acctbal AS Value",
        "c_mktsegment AS Status",
    ).createOrReplaceTempView("src_inputtable")
    spark.sql("DROP TABLE IF EXISTS src_generictable")
    spark.sql(
        "CREATE TABLE src_generictable "
        "(ID bigint, Name string, Value double, Status string)"
    )

    results, ctx = run_task_graph(spark, pkg.task_graph)

    n_src = spark.table("src_inputtable").count()
    assert ctx["VAR_RowCount"] == n_src
    final = spark.table("src_generictable")
    assert final.count() == n_src + 2
    assert {r.Name for r in final.filter("ID < 0").collect()} == {
        "Unknown", "Not Applicable",
    }
    assert all(r.status == "success" for r in results.values())


def _medium_tables(spark):
    # the XML's source SQL reads a physical [Status] column and maps it
    # positionally onto the declared CategoryDescription output
    spark.createDataFrame(
        [(100, "US", "Books"), (200, "DE", "Games"), (300, "FR", "Tools"),
         (999, "US", "Books")],
        "CategoryCode int, CountryCode string, Status string",
    ).createOrReplaceTempView("src_inputtable")
    spark.createDataFrame(
        [(7, "Books"), (8, "Games"), (9, "Tools")],
        "LocalCategoryID int, CategoryDescription string",
    ).createOrReplaceTempView("lkp_localcategorytable")
    spark.createDataFrame(
        [(10, 100), (20, 200), (30, 300)],
        "CategoryID int, CategoryCode int",
    ).createOrReplaceTempView("lkp_categorytable")
    spark.createDataFrame(
        [(1, "US"), (2, "DE"), (3, "FR")],
        "CountryID int, CountryCode string",
    ).createOrReplaceTempView("lkp_countrytable")
    spark.sql("DROP TABLE IF EXISTS dst_generictable")
    spark.sql(
        "CREATE TABLE dst_generictable (CountryID int, CategoryID int, "
        "LocalCategoryID int, ETLCheckSum int, DeletedFlag int)"
    )
    spark.sql(
        "INSERT INTO dst_generictable VALUES "
        "(1, 10, 7, 18, 0), "    # matches feed checksum 1+10+7 -> unchanged
        "(2, 20, 8, 31, 0), "    # checksum mismatch (31 vs 30) -> UPDATE
        "(4, 40, 9, 99, 0), "    # existing-only, live
        "(5, 50, 3, 77, 1), "    # existing-only, already deleted
        "(-1, -10, 0, 0, 0), "   # default rows (CountryID in (-1,-2))
        "(-2, -20, 0, 0, 0)"
    )


def test_medium_package_roundtrip(spark, warehouse_cleanup):
    _medium_tables(spark)
    pkg = parse_package(
        MEDIUM,
        sql_overrides={
            # EXEC sp_GenericGetWorkHistoryID ? OUTPUT has no Spark
            # equivalent; the variable's default (-1) stands in
            "SQL_Set_TaskWorkHistoryID": "SELECT 1 AS ok",
        },
        command_targets={
            # proc params -> target columns of the table each proc mutates
            "CMD_SP": {
                "table": "dst_generictable",
                "keys": ["CountryID", "CategoryID"],
                "column_map": {"CheckSum_New": "ETLCheckSum",
                               "WorkHistoryID": None, "TemplateFlag": None},
            },
            "CMD_Delete": {
                "table": "dst_generictable",
                "keys": ["CountryID", "CategoryID"],
                "column_map": {"WorkHistoryID": None},
            },
        },
    )
    assert pkg.task_graph.variables["TaskWorkHistoryID"] == -1

    results, ctx = run_task_graph(spark, pkg.task_graph)
    assert all(r.status == "success" for r in results.values()), {
        k: (v.status, v.error) for k, v in results.items()
    }

    # guard: SELECT COUNT(*) binding drove the DFT precedence expression
    assert ctx["SourceRowCount"] == 4

    # dataflow row counts, per faithful XML semantics (see module docstring):
    assert ctx["VAR_SelectRowCount"] == 4            # raw feed
    assert ctx["VAR_SelectRowCountExisting"] == 6    # existing side
    assert ctx["VAR_TotalRowCount"] == 7             # 3 enriched + 6 - 2 overlap
    assert ctx["VAR_InsertRowCount"] == 0            # sentinel-replacement quirk
    assert ctx["VAR_UpdateRowCount"] == 4            # (2,20),(3,30),(4,40),(5,50)
    assert ctx["VAR_DeleteRowCount"] == 0
    assert ctx["VAR_DefaultRowCount"] == 2           # the -1/-2 rows
    assert ctx["VAR_TrashArrivedUnchanged"] == 1     # (1,10) checksum match

    # the set-based stored-proc rewrite: UPDATE touched exactly the matched
    # existing keys; (3,30) came from the feed side (CountryID_OLD NULL) and
    # matched nothing — SSIS "UPDATE of a missing key affects 0 rows"
    run = results["DFT_Load"].run
    updated = {
        (r.CountryID, r.CategoryID): (r.LocalCategoryID, r.ETLCheckSum)
        for r in run.df("CMD_SP").collect()
    }
    assert updated[(2, 20)] == (8, 30)        # new checksum applied
    # NULL params keep target values (per_row_command coalesce semantics):
    # the existing-only row keeps its LocalCategoryID, gets the -1 sentinel
    assert updated[(4, 40)] == (9, -1)
    assert (3, 30) not in updated             # feed-only key: 0-row update

    # destination appended nothing (INSERT port empty by the XML's own
    # routing) — the table still holds its 6 original keys
    assert spark.table("dst_generictable").count() == 6


def test_medium_package_sabotaged_constraint_corrupts_output(
    spark, warehouse_cleanup
):
    """The parsed guard edge (SourceRowCount > 0 -> DFT_Load) is
    load-bearing: with an EMPTY feed the dataflow must be SKIPPED and
    the target left untouched — a parse that DROPPED the precedence
    constraint runs the dataflow anyway, and the package's own
    sentinel-before-flags quirk then routes every live existing row to
    UPDATE with a -1 checksum (provably different output, which is what
    corrupts q48's oracle hash if the constraint parse regresses)."""
    _medium_tables(spark)
    # empty feed: same schema, zero rows
    spark.sql("SELECT * FROM src_inputtable WHERE 1=0") \
        .createOrReplaceTempView("src_inputtable")
    kwargs = dict(
        sql_overrides={"SQL_Set_TaskWorkHistoryID": "SELECT 1 AS ok"},
        command_targets={
            "CMD_SP": {
                "table": "dst_generictable",
                "keys": ["CountryID", "CategoryID"],
                "column_map": {"CheckSum_New": "ETLCheckSum",
                               "WorkHistoryID": None, "TemplateFlag": None},
            },
            "CMD_Delete": {
                "table": "dst_generictable",
                "keys": ["CountryID", "CategoryID"],
                "column_map": {"WorkHistoryID": None},
            },
        },
    )

    pkg = parse_package(MEDIUM, **kwargs)
    results, ctx = run_task_graph(spark, pkg.task_graph)
    assert ctx["SourceRowCount"] == 0
    assert results["DFT_Load"].status == "skipped"  # guard held

    # sabotage: drop the guard constraint from the parsed graph
    pkg2 = parse_package(MEDIUM, **kwargs)
    pkg2.task_graph.edges = [
        e for e in pkg2.task_graph.edges if e.dst != "DFT_Load"
    ]
    results2, _ = run_task_graph(spark, pkg2.task_graph)
    assert results2["DFT_Load"].status == "success"
    stamped = {
        (r.CountryID, r.CategoryID): r.ETLCheckSum
        for r in results2["DFT_Load"].run.df("CMD_SP").collect()
    }
    # live existing rows got the -1 sentinel checksum; default rows kept
    assert stamped[(4, 40)] == -1 and stamped[(2, 20)] == -1
    assert stamped[(-1, -10)] == 0 and stamped[(-2, -20)] == 0


def test_positional_alias_respects_declared_output_columns():
    pkg = parse_package(MEDIUM, command_targets={
        "CMD_SP": {"table": "t", "keys": ["CountryID", "CategoryID"]},
        "CMD_Delete": {"table": "t", "keys": ["CountryID", "CategoryID"]},
    })
    src = next(s for s in pkg.pipelines["DFT_Load"].steps
               if s.name == "OLE_SRC")
    # the SQL spells [Status]; the declared output metadata wins
    assert "AS CategoryDescription" in src.config["query"]


@pytest.mark.parametrize(
    "evalop, want_cond, want_on",
    [
        ("2", None, "failure"),       # constraint only: stale Expression ignored
        ("1", "@[User::X] > 0", "completion"),  # expression only: value ignored
        ("3", "@[User::X] > 0", "failure"),     # both apply (AND)
        ("4", "@[User::X] > 0", "failure"),     # either applies (OR)
        (None, None, "failure"),      # absent -> SSIS default (constraint only)
    ],
)
def test_precedence_evalop_gating(tmp_path, evalop, want_cond, want_on):
    """DTS:EvalOp decides which of (constraint value, expression) gate the
    edge — a stale Expression on an EvalOp=2 constraint must NOT fire."""
    op_attr = f'DTS:EvalOp="{evalop}" ' if evalop is not None else ""
    xml = (
        '<?xml version="1.0"?>'
        '<DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" '
        'xmlns:SQLTask="www.microsoft.com/sqlserver/dts/tasks/sqltask" '
        'DTS:ObjectName="EvalOpPkg">'
        "<DTS:Executables>"
        '<DTS:Executable DTS:ObjectName="A" '
        'DTS:ExecutableType="Microsoft.ExecuteSQLTask">'
        '<DTS:ObjectData><SQLTask:SqlTaskData '
        'SQLTask:SqlStatementSource="SELECT 1 AS one"/></DTS:ObjectData>'
        "</DTS:Executable>"
        '<DTS:Executable DTS:ObjectName="B" '
        'DTS:ExecutableType="Microsoft.ExecuteSQLTask">'
        '<DTS:ObjectData><SQLTask:SqlTaskData '
        'SQLTask:SqlStatementSource="SELECT 2 AS two"/></DTS:ObjectData>'
        "</DTS:Executable>"
        "</DTS:Executables>"
        "<DTS:PrecedenceConstraints>"
        '<DTS:PrecedenceConstraint DTS:From="Package\\A" DTS:To="Package\\B" '
        f'DTS:Value="1" {op_attr}'
        'DTS:Expression="@[User::X] &gt; 0"/>'
        "</DTS:PrecedenceConstraints>"
        "</DTS:Executable>"
    )
    p = tmp_path / "evalop.dtsx"
    p.write_text(xml)
    pkg = parse_package(str(p))
    (edge,) = pkg.task_graph.edges
    assert edge.condition == want_cond
    assert edge.on == want_on
    assert edge.condition_or == (evalop == "4")


def test_container_executables_parse_and_run(tmp_path, spark):
    """STOCK:SEQUENCE / STOCK:FORLOOP / STOCK:FOREACHLOOP containers
    (reference data_engineering_parser.py:336-361 container dispatch)
    parse into runtime container tasks and EXECUTE: the for loop runs its
    body 3 times, the foreach accumulates its items, the sequence's inner
    constraint orders its children."""
    xml = (
        '<?xml version="1.0"?>'
        '<DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" '
        'xmlns:SQLTask="www.microsoft.com/sqlserver/dts/tasks/sqltask" '
        'DTS:ObjectName="ContainerPkg">'
        "<DTS:Variables>"
        '<DTS:Variable DTS:ObjectName="i"><DTS:VariableValue>0'
        "</DTS:VariableValue></DTS:Variable>"
        '<DTS:Variable DTS:ObjectName="acc"><DTS:VariableValue>0'
        "</DTS:VariableValue></DTS:Variable>"
        '<DTS:Variable DTS:ObjectName="hits"><DTS:VariableValue>0'
        "</DTS:VariableValue></DTS:Variable>"
        "</DTS:Variables>"
        "<DTS:Executables>"
        # sequence with two SQL tasks ordered by an inner constraint
        '<DTS:Executable DTS:ObjectName="SEQ" '
        'DTS:ExecutableType="STOCK:SEQUENCE">'
        "<DTS:Executables>"
        '<DTS:Executable DTS:ObjectName="S1" '
        'DTS:ExecutableType="Microsoft.ExecuteSQLTask">'
        '<DTS:ObjectData><SQLTask:SqlTaskData '
        'SQLTask:SqlStatementSource="CREATE OR REPLACE TEMP VIEW seq_v AS '
        'SELECT 7 AS n"/></DTS:ObjectData></DTS:Executable>'
        '<DTS:Executable DTS:ObjectName="S2" '
        'DTS:ExecutableType="Microsoft.ExecuteSQLTask">'
        '<DTS:ObjectData><SQLTask:SqlTaskData '
        'SQLTask:SqlStatementSource="SELECT n AS got FROM seq_v">'
        '<SQLTask:ResultBinding SQLTask:ResultName="got" '
        'SQLTask:DtsVariableName="User::hits"/>'
        "</SQLTask:SqlTaskData></DTS:ObjectData></DTS:Executable>"
        "</DTS:Executables>"
        "<DTS:PrecedenceConstraints>"
        '<DTS:PrecedenceConstraint DTS:From="Package\\S1" '
        'DTS:To="Package\\S2"/>'
        "</DTS:PrecedenceConstraints>"
        "</DTS:Executable>"
        # for loop: i goes 0 -> 3
        '<DTS:Executable DTS:ObjectName="FL" '
        'DTS:ExecutableType="STOCK:FORLOOP" '
        'DTS:InitExpression="@[User::i] = 0" '
        'DTS:EvalExpression="@[User::i] &lt; 3" '
        'DTS:AssignExpression="@[User::i] = @[User::i] + 1">'
        "<DTS:Executables/>"
        "</DTS:Executable>"
        # foreach over 3 items accumulating into acc
        '<DTS:Executable DTS:ObjectName="FEL" '
        'DTS:ExecutableType="STOCK:FOREACHLOOP">'
        "<DTS:ForEachEnumerator><DTS:ObjectData><FEIEItems>"
        '<FEIEItem><FEIEItemValue Type="3" Value="10"/></FEIEItem>'
        '<FEIEItem><FEIEItemValue Type="3" Value="20"/></FEIEItem>'
        '<FEIEItem><FEIEItemValue Type="3" Value="12"/></FEIEItem>'
        "</FEIEItems></DTS:ObjectData></DTS:ForEachEnumerator>"
        "<DTS:ForEachVariableMappings>"
        '<DTS:ForEachVariableMapping DTS:VariableName="User::item" '
        'DTS:ValueIndex="0"/>'
        "</DTS:ForEachVariableMappings>"
        "<DTS:Executables>"
        '<DTS:Executable DTS:ObjectName="ADD" '
        'DTS:ExecutableType="Microsoft.ExecuteSQLTask">'
        '<DTS:ObjectData><SQLTask:SqlTaskData '
        'SQLTask:SqlStatementSource="SELECT 1 AS one"/>'
        "</DTS:ObjectData></DTS:Executable>"
        "</DTS:Executables>"
        "</DTS:Executable>"
        "</DTS:Executables>"
        "<DTS:PrecedenceConstraints>"
        '<DTS:PrecedenceConstraint DTS:From="Package\\SEQ" '
        'DTS:To="Package\\FL"/>'
        '<DTS:PrecedenceConstraint DTS:From="Package\\FL" '
        'DTS:To="Package\\FEL"/>'
        "</DTS:PrecedenceConstraints>"
        "</DTS:Executable>"
    )
    p = tmp_path / "containers.dtsx"
    p.write_text(xml)
    pkg = parse_package(str(p))
    kinds = {t.name: t.kind for t in pkg.task_graph.tasks}
    assert kinds == {"SEQ": "graph", "FL": "forloop", "FEL": "foreach"}
    fl = next(t for t in pkg.task_graph.tasks if t.name == "FL").payload
    assert fl.init == ("i", "0") and fl.assign == ("i", "@[User::i] + 1")
    fel = next(t for t in pkg.task_graph.tasks if t.name == "FEL").payload
    assert fel.var == "item" and fel.items == [10, 20, 12]

    results, ctx = run_task_graph(spark, pkg.task_graph)
    assert all(r.status == "success" for r in results.values())
    assert ctx["hits"] == 7      # sequence ran S1 before S2 (binding)
    assert ctx["i"] == 3         # for loop iterated 0,1,2 then stopped
    assert ctx["item"] == 12     # foreach bound each item; last one sticks


def test_evalop_or_edge_runs_on_expression_despite_failure(spark):
    """EvalOp=4 (ExpressionOrConstraint): the edge fires when EITHER the
    constraint holds OR the expression is true — here the predecessor
    SUCCEEDS but the edge wants failure; the true expression still fires
    it, and with a false expression the edge (correctly) does not."""
    from ssis_to_pyspark_agent_spark.plans.control import (
        TaskGraph, run_task_graph,
    )

    for flag, want in ((1, "success"), (0, "skipped")):
        g = TaskGraph("orpkg", variables={"X": flag})
        g.task("a", "expression", ("X", "@[User::X]"))  # succeeds
        g.task("b", "expression", ("X", "99"))
        g.edge("a", "b", on="failure", condition="@[User::X] > 0",
               condition_or=True)
        results, _ = run_task_graph(spark, g)
        assert results["b"].status == want, flag


def test_nested_foreach_items_not_absorbed(tmp_path, spark):
    """An outer FOREACHLOOP whose body contains another FOREACHLOOP: each
    keeps its OWN item list and variable mapping (a subtree walk would
    fold the inner items into the outer loop)."""
    xml = (
        '<?xml version="1.0"?>'
        '<DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" '
        'DTS:ObjectName="NestedPkg">'
        "<DTS:Executables>"
        '<DTS:Executable DTS:ObjectName="OUTER" '
        'DTS:ExecutableType="STOCK:FOREACHLOOP">'
        "<DTS:ForEachEnumerator><DTS:ObjectData><FEIEItems>"
        '<FEIEItem><FEIEItemValue Value="1"/></FEIEItem>'
        '<FEIEItem><FEIEItemValue Value="2"/></FEIEItem>'
        "</FEIEItems></DTS:ObjectData></DTS:ForEachEnumerator>"
        "<DTS:ForEachVariableMappings>"
        '<DTS:ForEachVariableMapping DTS:VariableName="User::outer_v"/>'
        "</DTS:ForEachVariableMappings>"
        "<DTS:Executables>"
        '<DTS:Executable DTS:ObjectName="INNER" '
        'DTS:ExecutableType="STOCK:FOREACHLOOP">'
        "<DTS:ForEachEnumerator><DTS:ObjectData><FEIEItems>"
        '<FEIEItem><FEIEItemValue Value="7"/></FEIEItem>'
        '<FEIEItem><FEIEItemValue Value="8"/></FEIEItem>'
        '<FEIEItem><FEIEItemValue Value="9"/></FEIEItem>'
        "</FEIEItems></DTS:ObjectData></DTS:ForEachEnumerator>"
        "<DTS:ForEachVariableMappings>"
        '<DTS:ForEachVariableMapping DTS:VariableName="User::inner_v"/>'
        "</DTS:ForEachVariableMappings>"
        "<DTS:Executables/>"
        "</DTS:Executable>"
        "</DTS:Executables>"
        "</DTS:Executable>"
        "</DTS:Executables>"
        "</DTS:Executable>"
    )
    p = tmp_path / "nested.dtsx"
    p.write_text(xml)
    pkg = parse_package(str(p))
    outer = next(t for t in pkg.task_graph.tasks if t.name == "OUTER").payload
    assert outer.items == [1, 2] and outer.var == "outer_v"
    inner = next(t for t in outer.body.tasks if t.name == "INNER").payload
    assert inner.items == [7, 8, 9] and inner.var == "inner_v"
