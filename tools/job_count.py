"""Per-query Spark JOB inventory for the headline set (round-11).

At bench scale the dominant per-query cost is scheduler round-trips
(~100-300 ms/job on this host), so the number of jobs an action chain
fires ranks where action-collapse wins live (guide §1.2). For each
headline query: one warm run, then a measured run inside its own job
group; report wall seconds + job count + task count.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), JC_QUERIES
(comma-separated subset).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from bench import HEADLINE

    names = os.environ.get("JC_QUERIES")
    names = names.split(",") if names else HEADLINE
    qs = entry.queries()
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext
    out = {}
    for name in names:
        qs[name](spark, sf_dir).count()  # warm
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(name)
        tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                for s in info.stageIds:
                    si = tracker.getStageInfo(s)
                    if si:
                        tasks += si.numTasks
        sc.setJobGroup("", "")
        spark.catalog.clearCache()
        out[name] = {"sec": round(dt, 2), "jobs": len(jobs), "tasks": tasks}
        print(f"# {name}: {dt:.2f}s jobs={len(jobs)} tasks={tasks}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
