"""Control flow: precedence-constraint task graphs (SURVEY §2.11).

The reference models an SSIS package's control flow as tasks (SQL task,
data-flow task, containers) ordered by precedence constraints with
Success/Failure/Completion conditions and optional expression guards
(parse: /root/reference/parsing/data_engineering_parser.py:1255-1299; map:
mapping/control_flow_mapper.py:81-99,138-149; the Medium fixture guards an
edge with ``@[User::SourceRowCount] > 0``, Sample_Medium_Package.dtsx:905).

Our runner executes a :class:`TaskGraph`:
- task kinds: ``pipeline`` (a data-flow :class:`Pipeline`), ``sql``
  (``spark.sql``), ``python`` (driver-side callable — the Script-task
  analogue);
- edges carry ``on`` (success | failure | completion) and an optional SSIS
  expression over package variables;
- SSIS AND/OR semantics: a task with multiple incoming constraints runs
  when ALL are satisfied (default) or ANY (``logic="or"``);
- a failed task's failure-edges fire; an unhandled failure aborts the run
  (matching SSIS's package-failure default);
- ``foreach`` containers: re-run a sub-graph/pipeline per parameter set
  (reference FOREACHLOOP, parser :336-361).

Everything here is driver-side orchestration — the data plane stays lazy
Spark plans produced by the pipeline runner.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ssis_to_pyspark_agent_spark.plans.runner import RunResult, Runner
from ssis_to_pyspark_agent_spark.plans.spec import Pipeline


@dataclass
class Task:
    name: str
    kind: str  # pipeline | sql | python | expression | foreach | forloop | graph
    payload: Any  # Pipeline | sql str | callable(spark, ctx) | (var, expr) | Foreach | ForLoop | TaskGraph
    logic: str = "and"  # multi-constraint combination (SSIS LogicalAnd)
    enabled: bool = True  # DTS:Disabled


@dataclass
class Edge:
    src: str
    dst: str
    on: str = "success"  # success | failure | completion
    condition: str | None = None  # SSIS expression over variables
    # SSIS EvalOp=4 (ExpressionOrConstraint): constraint OR expression —
    # the default combines them with AND (EvalOp=3). Either way the
    # predecessor must have completed (edges order execution).
    condition_or: bool = False


@dataclass
class Foreach:
    """Foreach container: run `body` once per item; `var` binds the item
    into the context for each iteration."""

    var: str
    items: list[Any] | Callable[[dict], list[Any]]
    body: "TaskGraph | Pipeline"


@dataclass
class ForLoop:
    """SSIS For Loop container (parse data_engineering_parser.py:336-361,
    FORLOOP at :345): InitExpression / EvalExpression / AssignExpression
    over package variables, body re-run while eval holds.

    init / assign: (variable, SSIS expression) pairs or None;
    eval_expr: SSIS boolean expression over @[User::...] variables;
    max_iterations: runaway guard (SSIS loops can be infinite; a pipeline
    engine should fail loudly instead)."""

    eval_expr: str
    body: "TaskGraph | Pipeline"
    init: tuple[str, str] | None = None
    assign: tuple[str, str] | None = None
    max_iterations: int = 10_000


@dataclass
class TaskGraph:
    name: str
    tasks: list[Task] = field(default_factory=list)
    edges: list[Edge] = field(default_factory=list)
    variables: dict[str, Any] = field(default_factory=dict)

    def task(self, name: str, kind: str, payload: Any, **kw) -> "TaskGraph":
        self.tasks.append(Task(name=name, kind=kind, payload=payload, **kw))
        return self

    def edge(self, src: str, dst: str, on: str = "success",
             condition: str | None = None,
             condition_or: bool = False) -> "TaskGraph":
        self.edges.append(Edge(src=src, dst=dst, on=on, condition=condition,
                               condition_or=condition_or))
        return self


@dataclass
class TaskResult:
    status: str  # success | failure | skipped
    error: Exception | None = None
    run: RunResult | None = None  # for pipeline tasks
    df: DataFrame | None = None  # for sql tasks


class ControlFlowError(RuntimeError):
    pass


def _eval_condition(spark: SparkSession, expr: str, context: dict[str, Any]) -> bool:
    """Evaluate an SSIS guard expression against scalar variables.

    Compiles to a Column and evaluates on a single literal row — the same
    compiler as the data plane, so guard semantics (ISNULL, ternary, &&)
    are identical. One tiny local job; guards run a handful of times per
    package, never per row.
    """
    from ssis_to_pyspark_agent_spark.functions.expr import ExpressionCompiler

    col = ExpressionCompiler(schema={}, variables=context).compile(expr)
    row = spark.range(1).select(col.alias("v")).first()
    return bool(row.v)


class ControlFlowRunner:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def run(self, graph: TaskGraph) -> tuple[dict[str, TaskResult], dict[str, Any]]:
        tasks = {t.name: t for t in graph.tasks if t.enabled}
        incoming: dict[str, list[Edge]] = defaultdict(list)
        outgoing: dict[str, list[Edge]] = defaultdict(list)
        for e in graph.edges:
            if e.src in tasks and e.dst in tasks:
                incoming[e.dst].append(e)
                outgoing[e.src].append(e)

        context: dict[str, Any] = dict(graph.variables)
        results: dict[str, TaskResult] = {}
        order = self._topo(tasks, incoming)

        try:
            for name in order:
                task = tasks[name]
                cons = incoming[name]
                if cons:
                    sats = [self._satisfied(e, results, context) for e in cons]
                    ok = all(sats) if task.logic == "and" else any(sats)
                    if not ok:
                        results[name] = TaskResult(status="skipped")
                        continue
                results[name] = self._execute(task, context)
                if results[name].status == "failure" and not any(
                    e.on in ("failure", "completion") for e in outgoing[name]
                ):
                    raise ControlFlowError(
                        f"task {name!r} failed with no failure-handling edge"
                    ) from results[name].error
        finally:
            # Operator-registered caches (e.g. a parsed conditional
            # split's persisted route frame) are scoped to the graph run:
            # inter-task data flows through sinks/variables, and each
            # dataflow's eager sinks have run by the time its task
            # returns, so nothing downstream needs the cache. Without
            # this, every parsed package with a split leaked one
            # session-lifetime cache per dataflow unless the CALLER dug
            # the RunResult out (the control runner strips underscore
            # keys from merged contexts, so '_op_persists' was otherwise
            # unreachable). Frames returned to the caller stay valid —
            # re-collecting them just recomputes. Idempotent with a
            # caller's own release_caches().
            for r in results.values():
                if r.run is not None:
                    r.run.release_caches()
        return results, context

    # -- internals -----------------------------------------------------------

    def _satisfied(self, e: Edge, results: dict[str, TaskResult],
                   context: dict[str, Any]) -> bool:
        pred = results.get(e.src)
        if pred is None or pred.status == "skipped":
            return False
        constraint_ok = not (
            (e.on == "success" and pred.status != "success")
            or (e.on == "failure" and pred.status != "failure")
        )
        if e.condition is None:
            return constraint_ok
        if e.condition_or and constraint_ok:
            return True  # OR: constraint alone suffices, skip the eval
        expr_ok = _eval_condition(self.spark, e.condition, context)
        return (constraint_ok or expr_ok) if e.condition_or \
            else (constraint_ok and expr_ok)

    def _execute(self, task: Task, context: dict[str, Any]) -> TaskResult:
        try:
            if task.kind == "pipeline":
                pipeline: Pipeline = task.payload
                merged = Pipeline(
                    pipeline.name, steps=pipeline.steps,
                    variables={**pipeline.variables, **context},
                )
                run = Runner(self.spark).run(merged)
                context.update(
                    {k: v for k, v in run.context.items() if not k.startswith("_")}
                )
                return TaskResult(status="success", run=run)
            if task.kind == "sql":
                df = self.spark.sql(task.payload)
                return TaskResult(status="success", df=df)
            if task.kind == "python":
                task.payload(self.spark, context)
                return TaskResult(status="success")
            if task.kind == "expression":
                # SSIS Expression Task (models.py:13-17): evaluate an SSIS
                # expression over package variables into a variable.
                # payload: (target_var, expression)
                from ssis_to_pyspark_agent_spark.functions.expr import (
                    ExpressionCompiler,
                )

                var, expr = task.payload
                col = ExpressionCompiler(schema={}, variables=context).compile(expr)
                context[var] = self.spark.range(1).select(col.alias("v")).first().v
                return TaskResult(status="success")
            if task.kind == "graph":
                # Sequence container: run the sub-graph once; variables
                # written inside flow back into the outer context. SSIS
                # semantics (MaximumErrorCount=1): a container with ANY
                # failed inner task fails itself, even when the failure
                # was routed to an inner on-failure cleanup edge — outer
                # on='success' edges must not fire.
                if self._run_body(task.payload, context):
                    return TaskResult(
                        status="failure",
                        error=ControlFlowError(
                            "container had a failed inner task"
                        ),
                    )
                return TaskResult(status="success")
            if task.kind == "foreach":
                fe: Foreach = task.payload
                items = fe.items(context) if callable(fe.items) else fe.items
                any_failed = False
                for item in items:
                    context[fe.var] = item
                    any_failed |= self._run_body(fe.body, context)
                if any_failed:
                    return TaskResult(
                        status="failure",
                        error=ControlFlowError(
                            "container had a failed inner task"
                        ),
                    )
                return TaskResult(status="success")
            if task.kind == "forloop":
                fl: ForLoop = task.payload
                if fl.init:
                    context[fl.init[0]] = self._eval_scalar(fl.init[1], context)
                it = 0
                while _eval_condition(self.spark, fl.eval_expr, context):
                    if it >= fl.max_iterations:
                        raise ControlFlowError(
                            f"for loop exceeded max_iterations="
                            f"{fl.max_iterations} (eval: {fl.eval_expr!r})"
                        )
                    it += 1
                    if self._run_body(fl.body, context):
                        return TaskResult(
                            status="failure",
                            error=ControlFlowError(
                                "container had a failed inner task"
                            ),
                        )
                    if fl.assign:
                        context[fl.assign[0]] = self._eval_scalar(
                            fl.assign[1], context
                        )
                return TaskResult(status="success")
            raise ValueError(f"unknown task kind {task.kind!r}")
        except Exception as exc:  # noqa: BLE001 — failure edges need the error
            return TaskResult(status="failure", error=exc)

    def _run_body(
        self, body: "TaskGraph | Pipeline", context: dict[str, Any]
    ) -> bool:
        """Run a container body (sub-graph or pipeline) with the current
        context merged in; surviving variables flow back out. Returns
        True when an inner task FAILED but was handled by an inner
        failure edge (an unhandled failure raises instead) — the caller
        must then fail the container, per SSIS MaximumErrorCount=1."""
        if isinstance(body, TaskGraph):
            merged_graph = TaskGraph(
                body.name, body.tasks, body.edges,
                {**body.variables, **context},
            )
            inner_results, inner_ctx = ControlFlowRunner(self.spark).run(
                merged_graph
            )
            context.update(
                {k: v for k, v in inner_ctx.items() if not k.startswith("_")}
            )
            return any(
                r.status == "failure" for r in inner_results.values()
            )
        else:
            merged = Pipeline(
                body.name, steps=body.steps,
                variables={**body.variables, **context},
            )
            run = Runner(self.spark).run(merged)
            context.update(
                {k: v for k, v in run.context.items() if not k.startswith("_")}
            )
            # container bodies discard their RunResult — release operator
            # caches here or a Foreach over a split-bearing pipeline
            # leaks one per iteration (same scope rule as run())
            run.release_caches()
            return False

    def _eval_scalar(self, expr: str, context: dict[str, Any]):
        """Evaluate an SSIS expression over package variables to a Python
        scalar (the Expression Task / For Loop init+assign evaluator)."""
        from ssis_to_pyspark_agent_spark.functions.expr import ExpressionCompiler

        col = ExpressionCompiler(schema={}, variables=context).compile(expr)
        return self.spark.range(1).select(col.alias("v")).first().v

    @staticmethod
    def _topo(tasks: dict[str, Task], incoming: dict[str, list[Edge]]) -> list[str]:
        from collections import deque

        indeg = {n: len({e.src for e in incoming[n]}) for n in tasks}
        downstream: dict[str, list[str]] = defaultdict(list)
        for n in tasks:
            for e in incoming[n]:
                downstream[e.src].append(n)
        q = deque(sorted(n for n, d in indeg.items() if d == 0))
        order: list[str] = []
        seen_edges: dict[str, set] = defaultdict(set)
        while q:
            n = q.popleft()
            order.append(n)
            for m in downstream[n]:
                if n not in seen_edges[m]:
                    seen_edges[m].add(n)
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        q.append(m)
        if len(order) != len(tasks):
            raise ValueError(
                f"cycle in control flow: {sorted(set(tasks) - set(order))}"
            )
        return order


def run_task_graph(
    spark: SparkSession, graph: TaskGraph
) -> tuple[dict[str, TaskResult], dict[str, Any]]:
    return ControlFlowRunner(spark).run(graph)
