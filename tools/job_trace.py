"""Per-ACTION job trace for a catalog query (round-12, VERDICT item 1).

`tools/job_count.py` counts a query's jobs/tasks; this tool says WHICH
Python call fired each of them. Every eager DataFrame entry point is
wrapped to (a) record the nearest non-pyspark caller frame, (b) run the
action inside its own job group so the status tracker attributes every
job it fires — including AQE stage-materialization sub-jobs — to that
action. The output ranks actions by jobs/tasks/wall so "which of q31's
36 jobs are removable" becomes a table instead of an assertion.

Usage: python tools/job_trace.py <query> [sf_dir]
Env: SPARK_GRAFT_SF_DIR fallback (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# DataFrame methods that trigger Spark jobs (directly or via the JVM).
_DF_ACTIONS = (
    "count", "collect", "first", "head", "take", "toPandas",
    "localCheckpoint", "checkpoint", "foreach", "foreachPartition",
)


def _caller() -> str:
    """Nearest stack frame outside pyspark/this tool — the engine or
    query line that fired the action."""
    for f in reversed(traceback.extract_stack()):
        fn = f.filename
        if "/pyspark/" in fn or fn.endswith("job_trace.py"):
            continue
        rel = os.path.relpath(fn, REPO) if fn.startswith(REPO) else fn
        return f"{rel}:{f.lineno}"
    return "?"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Spark 4: sessions hand out the CLASSIC DataFrame subclass, whose
    # methods shadow pyspark.sql.DataFrame's — patch the classic class
    from pyspark.sql.classic.dataframe import DataFrame

    from ssis_to_pyspark_agent_spark.queries import QUERIES

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    events: list[dict] = []
    depth = [0]  # actions nested inside actions keep the OUTER group

    def wrap(cls, meth):
        orig = getattr(cls, meth)

        def run(self, *a, **kw):
            if depth[0]:  # nested (e.g. first() -> head() -> take())
                return orig(self, *a, **kw)
            idx = len(events)
            gid = f"act{idx}"
            sc.setJobGroup(gid, f"{meth} @ {_caller()}")
            depth[0] += 1
            t0 = time.perf_counter()
            try:
                return orig(self, *a, **kw)
            finally:
                dt = time.perf_counter() - t0
                depth[0] -= 1
                sc.setJobGroup("umbrella", "outside wrapped actions")
                jobs = tracker.getJobIdsForGroup(gid)
                tasks = 0   # planned, INCLUDING skipped (reused) stages
                ran = 0     # actually executed
                seen: set[int] = set()
                for j in jobs:
                    info = tracker.getJobInfo(j)
                    if info:
                        for s in info.stageIds:
                            si = tracker.getStageInfo(s)
                            if si:
                                tasks += si.numTasks
                                if s not in seen:
                                    seen.add(s)
                                    ran += si.numCompletedTasks
                events.append({
                    "idx": idx, "action": meth, "caller": _caller(),
                    "sec": round(dt, 3), "jobs": len(jobs), "tasks": tasks,
                    "ran": ran,
                })
        run.__name__ = meth
        setattr(cls, meth, run)

    for m in _DF_ACTIONS:
        wrap(DataFrame, m)
    # sink writes (q50's parquet/table sinks) are jobs too
    from pyspark.sql import DataFrameWriter
    for m in ("save", "parquet", "saveAsTable", "csv", "json"):
        wrap(DataFrameWriter, m)

    # warm once (codegen, AQE strategies) exactly like job_count.py, so
    # the measured run's trace is the bench's steady state
    QUERIES[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    events.clear()

    sc.setJobGroup("umbrella", "outside wrapped actions")
    warm_stray = set(tracker.getJobIdsForGroup("umbrella"))
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).count()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    # jobs that fired outside every wrapped action (schema inference,
    # py4j-direct calls): the diff that keeps this trace honest
    stray = len(set(tracker.getJobIdsForGroup("umbrella")) - warm_stray)

    total_jobs = sum(e["jobs"] for e in events)
    total_tasks = sum(e["tasks"] for e in events)
    print(f"# {name}: wall {wall:.2f}s, {len(events)} actions, "
          f"{total_jobs} jobs (+{stray} unattributed), "
          f"{total_tasks} tasks", file=sys.stderr)
    for e in events:
        print(f"#   [{e['idx']:>3}] {e['sec']:>7.3f}s jobs={e['jobs']:>2} "
              f"tasks={e['tasks']:>5} ran={e['ran']:>5} "
              f"{e['action']:<16} {e['caller']}",
              file=sys.stderr)
    print(json.dumps({"query": name, "wall_sec": round(wall, 2),
                      "stray_jobs": stray, "events": events}))


if __name__ == "__main__":
    main()
