"""SSIS ``.dtsx`` XML -> TaskGraph/Pipeline parser.

Scope: the component classes the reference's fixture packages use
(reference ``parsing/data_engineering_parser.py`` component dispatch;
fixture packages under ``input-sample packages/``): OLE DB Source,
Row Count, Lookup, Sort, Derived Column, Merge Join, Conditional Split,
OLE DB Command, OLE DB Destination, Execute SQL Task, precedence
constraints with expression guards.

Design: the dtsx is a DAG twice over — Executables + PrecedenceConstraints
at the control level, components + paths inside each Data Flow Task. Both
map 1:1 onto TaskGraph and Pipeline. SQL-Server-isms are rewritten
syntactically (``[dbo].[X]`` -> mapped view name); semantics that Spark
cannot host (stored procedures) are declared, not guessed:

- ``table_map``: SSIS table name (case-insensitive, sans schema) -> Spark
  view/table name. Unmapped names fall back to the bare lowercased name.
- ``sql_overrides``: Execute-SQL-Task name -> replacement Spark SQL for
  statements that are T-SQL-only (EXEC ..., OUTPUT parameters).
- ``command_targets``: OLE DB Command component name -> target table/view
  the stored-proc call mutates. The per-row EXEC becomes the engine's
  set-based ``per_row_command`` (action inferred from the proc name),
  exactly the rewrite the reference's codegen performs
  (``enhanced_json_mapper.py:2849-2973``).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Any

from ssis_to_pyspark_agent_spark.plans import Pipeline
from ssis_to_pyspark_agent_spark.plans.control import TaskGraph

DTS = "{www.microsoft.com/SqlServer/Dts}"
SQLTASK = "{www.microsoft.com/sqlserver/dts/tasks/sqltask}"


def _sanitize(name: str) -> str:
    """Step names: dtsx object names contain spaces/punctuation; the
    pipeline DSL uses ``step.port`` refs, so dots especially must go."""
    return re.sub(r"[^A-Za-z0-9_]+", "_", name).strip("_")


def _rewrite_sql(sql: str, table_map: dict[str, str]) -> str:
    """T-SQL surface -> Spark SQL: resolve ``[schema].[Name]`` /
    ``[Name]`` through table_map (case-insensitive), strip residual
    brackets. Purely syntactic — statements the rewrite cannot make
    runnable (EXEC, OUTPUT params) are the caller's job via
    ``sql_overrides``."""

    def repl_table(m: re.Match) -> str:
        name = m.group(1)
        return table_map.get(name.lower(), name.lower())

    # [dbo].[Name] or [schema].[Name] -> mapped name
    sql = re.sub(r"\[[A-Za-z0-9_]+\]\.\[([A-Za-z0-9_]+)\]", repl_table, sql)
    # bare [Name] column/table brackets -> Name
    sql = re.sub(r"\[([A-Za-z0-9_ ]+)\]", r"\1", sql)
    # T-SQL BIT has no Spark equivalent; BOOLEAN carries the semantics
    sql = re.sub(r"(?i)\bAS\s+BIT\b", "AS BOOLEAN", sql)
    return sql


def _alias_select_positionally(sql: str, names: list[str]) -> str:
    """Alias each top-level SELECT-list item to its declared output column
    name. SSIS binds source SQL to output metadata by POSITION, so the
    declared names win over whatever the SQL spells (the fixture packages
    rely on this). Only rewrites when the arity matches."""
    m = re.match(r"(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(.*)$", sql)
    if not m:
        return sql
    items, depth, cur = [], 0, []
    for ch in m.group(1):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur).strip())
    if len(items) != len(names):
        return sql
    aliased = [
        it if re.search(rf"(?i)\bAS\s+{re.escape(nm)}\s*$", it)
        or it.lower() == nm.lower()
        else f"{it} AS {nm}"
        for it, nm in zip(items, names)
    ]
    return f"SELECT {', '.join(aliased)} FROM {m.group(2)}"


def _props(el: ET.Element) -> dict[str, str]:
    out = {}
    for p in el.findall("./properties/property"):
        out[p.get("name")] = p.text or ""
    return out


def _col_of(lineage_or_ref: str) -> str:
    """``...Columns[Name]`` -> ``Name`` (the trailing bracket group)."""
    m = re.findall(r"\.(?:Columns|ExternalColumns)\[([^\]]+)\]",
                   lineage_or_ref)
    return m[-1] if m else lineage_or_ref


@dataclass
class ParsedPackage:
    name: str
    task_graph: TaskGraph
    pipelines: dict[str, Pipeline] = field(default_factory=dict)


def parse_package(
    path: str,
    *,
    table_map: dict[str, str] | None = None,
    sql_overrides: dict[str, str] | None = None,
    command_targets: dict[str, dict[str, Any]] | None = None,
) -> ParsedPackage:
    """Parse a .dtsx file into a runnable :class:`TaskGraph`.

    ``command_targets[component_name]`` = ``{"table": <view>, "keys":
    [key cols in target]}`` for each OLE DB Command (stored-proc row
    rewrite) in the package.
    """
    table_map = {k.lower(): v for k, v in (table_map or {}).items()}
    sql_overrides = sql_overrides or {}
    command_targets = command_targets or {}

    root = ET.parse(path).getroot()
    pkg_name = _sanitize(root.get(f"{DTS}ObjectName") or "package")

    g = TaskGraph(pkg_name)
    # variables may be declared at package scope or on an executable
    # (task-scoped); the runner context is flat, so collect all of them
    for var in root.findall(f".//{DTS}Variables/{DTS}Variable"):
        vname = var.get(f"{DTS}ObjectName")
        vval = var.findtext(f"./{DTS}VariableValue")
        g.variables[vname] = _coerce_scalar(vval)

    pipelines: dict[str, Pipeline] = {}
    _parse_executables(root, g, table_map, sql_overrides, command_targets,
                       pipelines)
    _parse_constraints(root, g)
    return ParsedPackage(name=pkg_name, task_graph=g, pipelines=pipelines)


def _parse_executables(
    parent: ET.Element,
    g: TaskGraph,
    table_map: dict[str, str],
    sql_overrides: dict[str, str],
    command_targets: dict[str, dict[str, Any]],
    pipelines: dict[str, Pipeline],
) -> None:
    """One level of DTS:Executables into `g` — containers recurse.

    Container coverage mirrors the reference's container dispatch
    (data_engineering_parser.py:336-361: STOCK:FORLOOP / STOCK:FOREACHLOOP
    / STOCK:SEQUENCE): each becomes a runtime container task whose body is
    the recursively-parsed sub-graph (nested Executables + the
    container's own PrecedenceConstraints)."""
    from ssis_to_pyspark_agent_spark.plans.control import Foreach, ForLoop

    for ex in parent.findall(f"./{DTS}Executables/{DTS}Executable"):
        tname = _sanitize(ex.get(f"{DTS}ObjectName"))
        etype = ex.get(f"{DTS}ExecutableType", "")
        enabled = ex.get(f"{DTS}Disabled", "False") != "True"
        if etype.endswith("ExecuteSQLTask"):
            data = ex.find(f".//{SQLTASK}SqlTaskData")
            sql = sql_overrides.get(
                tname,
                sql_overrides.get(
                    ex.get(f"{DTS}ObjectName"),
                    _rewrite_sql(
                        data.get(f"{SQLTASK}SqlStatementSource", ""),
                        table_map,
                    ),
                ),
            )
            bindings = {
                rb.get(f"{SQLTASK}ResultName"):
                    rb.get(f"{SQLTASK}DtsVariableName", "").split("::")[-1]
                for rb in data.findall(f"./{SQLTASK}ResultBinding")
            }
            if bindings:
                g.task(tname, "python", _sql_with_bindings(sql, bindings),
                       enabled=enabled)
            else:
                g.task(tname, "sql", sql, enabled=enabled)
        elif etype.endswith("Pipeline"):
            p = _parse_dataflow(
                ex, tname, table_map, command_targets
            )
            # the catalog is flat across containers: two same-named Data
            # Flow Tasks in different Sequence containers must not
            # silently overwrite each other — qualify the later one with
            # its container path (the graph task name stays local)
            key = tname
            if key in pipelines:
                key = f"{g.name}.{tname}"
            pipelines[key] = p
            g.task(tname, "pipeline", p, enabled=enabled)
        elif etype.upper().endswith("SEQUENCE"):
            sub = TaskGraph(tname)
            _parse_executables(ex, sub, table_map, sql_overrides,
                               command_targets, pipelines)
            _parse_constraints(ex, sub)
            g.task(tname, "graph", sub, enabled=enabled)
        elif etype.upper().endswith("FORLOOP"):
            sub = TaskGraph(tname)
            _parse_executables(ex, sub, table_map, sql_overrides,
                               command_targets, pipelines)
            _parse_constraints(ex, sub)
            g.task(tname, "forloop", ForLoop(
                eval_expr=ex.get(f"{DTS}EvalExpression") or "FALSE",
                body=sub,
                init=_parse_assignment(ex.get(f"{DTS}InitExpression")),
                assign=_parse_assignment(ex.get(f"{DTS}AssignExpression")),
            ), enabled=enabled)
        elif etype.upper().endswith("FOREACHLOOP"):
            sub = TaskGraph(tname)
            _parse_executables(ex, sub, table_map, sql_overrides,
                               command_targets, pipelines)
            _parse_constraints(ex, sub)
            # Item enumerator rows (FEIEItem/FEIEItemValue; attributes are
            # written both plain and DTS-prefixed by different designers).
            # Scope strictly to THIS container's direct enumerator — a
            # subtree walk would absorb a nested ForEach's items into the
            # outer loop.
            items = []
            enum_el = ex.find(f"./{DTS}ForEachEnumerator")
            for item in (enum_el.iter("FEIEItem") if enum_el is not None
                         else ()):
                vals = [
                    _coerce_scalar(v.get(f"{DTS}Value") or v.get("Value"))
                    for v in item.iter("FEIEItemValue")
                ]
                items.append(vals[0] if len(vals) == 1 else vals)
            # variable binding: first ForEachVariableMapping receives the
            # item (multi-column mappings are out of scope — declared, not
            # guessed: we bind index 0 only). Direct child only — see above.
            mapping = ex.find(
                f"./{DTS}ForEachVariableMappings/{DTS}ForEachVariableMapping"
            )
            var = (mapping.get(f"{DTS}VariableName", "item").split("::")[-1]
                   if mapping is not None else "item")
            g.task(tname, "foreach", Foreach(var=var, items=items, body=sub),
                   enabled=enabled)
        # remaining executable types (script tasks etc.) are declared via
        # sql_overrides, not guessed


def _parse_constraints(parent: ET.Element, g: TaskGraph) -> None:
    for pc in parent.findall(f"./{DTS}PrecedenceConstraints/"
                             f"{DTS}PrecedenceConstraint"):
        src = _sanitize(pc.get(f"{DTS}From").split("\\")[-1])
        dst = _sanitize(pc.get(f"{DTS}To").split("\\")[-1])
        # DTS:Value: 0 success (default) | 1 failure | 2 completion
        on = {None: "success", "0": "success", "1": "failure",
              "2": "completion"}[pc.get(f"{DTS}Value")]
        # DTS:EvalOp: 2 constraint only (default) | 1 expression only |
        # 3 both (AND) | 4 either (OR). For 2 a stale Expression attribute
        # must NOT gate the edge; for 1 the constraint result is ignored
        # (the edge still orders execution — 'completion' — but
        # success/failure is not checked, only the expression).
        evalop = pc.get(f"{DTS}EvalOp", "2")
        expr = (pc.get(f"{DTS}Expression")
                if evalop in ("1", "3", "4") else None)
        if evalop == "1":
            on = "completion"
        g.edge(src, dst, on=on, condition=expr,
               condition_or=(evalop == "4"))


def _parse_assignment(expr: str | None) -> tuple[str, str] | None:
    """SSIS For Loop Init/Assign expressions are assignments:
    ``@[User::i] = @[User::i] + 1`` (or bare ``@i = ...``) ->
    (variable, rhs-expression). None/unparseable -> None (declared
    no-op, matching SSIS's optional Init/Assign)."""
    if not expr:
        return None
    m = re.match(
        r"^\s*@\[?(?:User::)?([A-Za-z_]\w*)\]?\s*=(?!=)\s*(.+)$", expr
    )
    return (m.group(1), m.group(2).strip()) if m else None


def _coerce_scalar(v: str | None):
    if v is None:
        return 0
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def _sql_with_bindings(sql: str, bindings: dict[str, str]):
    """Execute SQL Task with a single-row result set bound into package
    variables (SQLTask:ResultBinding)."""

    def run(spark, context):
        row = spark.sql(sql).first()
        for result_name, var in bindings.items():
            context[var] = row[result_name] if row is not None else None

    return run


# --------------------------------------------------------------------------
# data flow
# --------------------------------------------------------------------------


def _parse_dataflow(
    ex: ET.Element,
    name: str,
    table_map: dict[str, str],
    command_targets: dict[str, dict[str, Any]],
) -> Pipeline:
    pipe_el = ex.find(f"./{DTS}ObjectData/pipeline")
    comps = pipe_el.findall("./components/component")
    paths = pipe_el.findall("./paths/path")

    # refId -> sanitized step name; output refId -> "step[.port]" input ref
    comp_by_ref: dict[str, ET.Element] = {}
    step_name: dict[str, str] = {}
    for c in comps:
        comp_by_ref[c.get("refId")] = c
        step_name[c.get("refId")] = _sanitize(c.get("name"))

    # upstream feed per (component refId, input name), from <paths>
    feeds: dict[tuple[str, str], str] = {}
    for pth in paths:
        start, end = pth.get("startId"), pth.get("endId")
        sm = re.match(r"(.*)\.Outputs\[([^\]]+)\]$", start)
        em = re.match(r"(.*)\.Inputs\[([^\]]+)\]$", end)
        src_ref, out_port = sm.group(1), sm.group(2)
        dst_ref, in_port = em.group(1), em.group(2)
        src_comp = comp_by_ref[src_ref]
        src_step = step_name[src_ref]
        # conditional_split consumers read a specific port; synchronous
        # outputs (everything else here) read the step itself
        if src_comp.get("componentClassID") == "Microsoft.ConditionalSplit":
            ref = f"{src_step}.{_sanitize(out_port)}"
        elif src_comp.get("componentClassID") == "Microsoft.OLEDBCommand":
            ref = f"{src_step}__rows"  # passthrough port (see below)
        elif src_comp.get("componentClassID") == "Microsoft.Lookup":
            ref = src_step  # match output (no-match handled by no_match)
        else:
            ref = src_step
        feeds[(dst_ref, in_port)] = ref

    p = Pipeline(name)

    def upstream(c: ET.Element, which: str | None = None) -> str:
        cref = c.get("refId")
        ins = [(k, v) for k, v in feeds.items() if k[0] == cref]
        if which is not None:
            for (_, iname), ref in ins:
                if which.lower() in iname.lower():
                    return ref
        assert ins, f"component {cref} has no wired input"
        return ins[0][1]

    for c in comps:  # document order is a valid topological order in dtsx
        cls = c.get("componentClassID")
        nm = step_name[c.get("refId")]
        props = _props(c)

        if cls == "Microsoft.OLEDBSource":
            declared = [oc.get("name") for oc in
                        c.findall(".//outputs/output/outputColumns/"
                                  "outputColumn")]
            if props.get("AccessMode") == "2":
                sql = _rewrite_sql(props["SqlCommand"], table_map)
                # the declared output metadata is authoritative: SSIS maps
                # the SELECT list positionally onto the output columns, so
                # alias each projection item to its declared name
                sql = _alias_select_positionally(sql, declared)
                p.step(nm, "source.sql", query=sql)
            else:
                tbl = _rewrite_sql(props.get("OpenRowset", ""), table_map)
                p.step(nm, "source.table", table=tbl)

        elif cls == "Microsoft.RowCount":
            var = props.get("VariableName", f"{nm}_count").split("::")[-1]
            p.step(nm, "row_count", upstream(c), into=var, eager=True)

        elif cls == "Microsoft.Lookup":
            ref_step = f"{nm}__ref"
            p.step(ref_step, "source.sql",
                   query=_rewrite_sql(props["SqlCommand"], table_map))
            keys = {}
            for ic in c.findall(".//inputColumns/inputColumn"):
                join_to = _props(ic).get("JoinToReferenceColumn")
                if join_to:
                    keys[ic.get("cachedName")] = join_to
            copy = {}
            for oc in c.findall(".//outputs/output/outputColumns/"
                                "outputColumn"):
                src_col = _props(oc).get("CopyFromReferenceColumn")
                if src_col:
                    copy[oc.get("name")] = src_col
            no_match = {"0": "fail", "1": "ignore"}.get(
                props.get("NoMatchBehavior", "0"), "fail")
            p.step(nm, "lookup", [upstream(c), ref_step],
                   keys=keys, copy=copy, no_match=no_match)

        elif cls == "Microsoft.Sort":
            keys = []
            for ic in c.findall(".//inputColumns/inputColumn"):
                pos = ic.get("cachedSortKeyPosition")
                if pos and int(pos) != 0:  # 0 = passthrough, not a key
                    pos = int(pos)
                    keys.append((abs(pos), ic.get("cachedName"),
                                 "desc" if pos < 0 else "asc"))
            keys.sort()
            p.step(nm, "sort", upstream(c),
                   keys=[(k, d) for _, k, d in keys],
                   eliminate_duplicates=props.get(
                       "EliminateDuplicates", "false").lower() == "true")

        elif cls == "Microsoft.DerivedColumn":
            cols = {}
            for oc in c.findall(".//outputs/output/outputColumns/"
                                "outputColumn"):
                expr = _props(oc).get("FriendlyExpression")
                if expr is not None:
                    cols[oc.get("name")] = expr
            # replace-mode derived columns live on inputColumns instead
            for ic in c.findall(".//inputColumns/inputColumn"):
                expr = _props(ic).get("FriendlyExpression")
                if expr is not None:
                    cols[ic.get("cachedName")] = expr
            p.step(nm, "derived_column", upstream(c), columns=cols)

        elif cls == "Microsoft.MergeJoin":
            # dtsx JoinType: 0 full | 1 left | 2 inner
            how = {"0": "full", "1": "left", "2": "inner"}[
                props.get("JoinType", "2")]
            lkeys, rkeys = {}, {}
            sides = {}
            for ic in c.findall(".//inputs/input"):
                side = "left" if "Left" in ic.get("name") else "right"
                for col in ic.findall(".//inputColumn"):
                    sides[col.get("refId")] = (side, col.get("cachedName"))
                    pos = col.get("cachedSortKeyPosition")
                    if pos:
                        (lkeys if side == "left" else rkeys)[int(pos)] = (
                            col.get("cachedName"))
            keys = [(lkeys[i], rkeys[i]) for i in sorted(lkeys)]
            sel_l, sel_r = {}, {}
            for oc in c.findall(".//outputs/output/outputColumns/"
                                "outputColumn"):
                src = _props(oc).get("InputColumnID", "")
                src_ref = src.strip("#{}")
                if src_ref in sides:
                    side, in_col = sides[src_ref]
                    (sel_l if side == "left" else sel_r)[
                        oc.get("name")] = in_col
            p.step(nm, "join",
                   [upstream(c, "Left"), upstream(c, "Right")],
                   how=how, keys=keys,
                   null_safe=props.get("TreatNullsAsEqual",
                                       "false").lower() == "true",
                   select_left=sel_l or None, select_right=sel_r or None)

        elif cls == "Microsoft.ConditionalSplit":
            ordered = []
            default_port = "default"
            for oc in c.findall(".//outputs/output"):
                oprops = _props(oc)
                expr = oprops.get("FriendlyExpression")
                port = _sanitize(oc.get("name"))
                if expr is None:
                    if "Error" not in oc.get("name", ""):
                        default_port = port
                    continue
                ordered.append((int(oprops.get("EvaluationOrder", "0")),
                                port, expr))
            ordered.sort()
            # persist the routed frame: SSIS packages fan a split into
            # many independently-consumed ports (row counts, commands,
            # destinations), and each port's filter would otherwise
            # re-materialize the whole upstream subplan — the same
            # reason the hand-built medium-package pipeline (q50) sets
            # persist on its split (measured on the parsed package: the
            # eager per-port row counts re-ran the lookup+join chain
            # once per port without it)
            p.step(nm, "conditional_split", upstream(c),
                   outputs={port: expr for _, port, expr in ordered},
                   default=default_port, persist=True)

        elif cls == "Microsoft.OLEDBCommand":
            spec = command_targets.get(c.get("name")) or command_targets.get(
                nm)
            if spec is None:
                raise ValueError(
                    f"OLE DB Command '{c.get('name')}' needs a "
                    "command_targets entry (stored procedures have no "
                    "Spark equivalent; declare the table the proc mutates)"
                )
            sql = props.get("SqlCommand", "")
            action = "delete" if re.search(
                r"delete", sql, re.I) else "update"
            mapping = {}
            ext_name = {}
            for emc in c.findall(".//externalMetadataColumns/"
                                 "externalMetadataColumn"):
                ext_name[emc.get("refId")] = emc.get("name")
            colmap = spec.get("column_map", {})
            for ic in c.findall(".//inputColumns/inputColumn"):
                ext = ext_name.get(ic.get("externalMetadataColumnId"), "")
                # strip the @ and the Hungarian 'pi' (parameter-input) prefix
                param = re.sub(r"^@?(?:pi)?", "", ext)
                # proc params are not table columns; column_map translates
                # (identity by default, None drops the param)
                if param in colmap:
                    target_col = colmap[param]
                else:
                    target_col = param
                if target_col:
                    mapping[target_col] = ic.get("cachedName")
            tgt_step = f"{nm}__target"
            p.step(tgt_step, "source.table", table=spec["table"])
            rows_ref = upstream(c)
            p.step(nm, "per_row_command", [tgt_step, rows_ref],
                   action=action, keys=spec["keys"], param_mapping=mapping)
            # SSIS OLE DB Command passes its input rows through; expose a
            # passthrough port for downstream consumers (row counts etc.)
            p.step(f"{nm}__rows", "filter", rows_ref, predicate="TRUE")

        elif cls == "Microsoft.OLEDBDestination":
            tbl = _rewrite_sql(props.get("OpenRowset", ""), table_map)
            ext_name = {
                emc.get("refId"): emc.get("name")
                for emc in c.findall(".//externalMetadataColumns/"
                                     "externalMetadataColumn")
            }
            colmap = {}
            for ic in c.findall(".//inputColumns/inputColumn"):
                ext = ext_name.get(ic.get("externalMetadataColumnId"))
                if ext:
                    colmap[ext] = ic.get("cachedName")
            ref = upstream(c)
            if colmap:
                p.step(f"{nm}__map", "select", ref, columns=colmap)
                ref = f"{nm}__map"
            p.step(nm, "sink.table", ref, table=tbl, mode="append",
                   align_columns=True)

        else:
            raise ValueError(f"unsupported dtsx component class: {cls}")

    return p
