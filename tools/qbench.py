"""Focused single-/few-query bench runner (bench.py's protocol, subset).

Runs only the queries named on the command line from the repo given as
the first argument — warmup once, then AB_RUNS timed runs per query
(System.gc + clearCache between runs, min is the estimator, same
rationale as bench.py) — and prints one JSON line. Exists for the
same-host alternating A/B workflow: check two commits out as worktrees
and interleave invocations, e.g.

    for pair in 1 2 3; do
      python tools/qbench.py /tmp/r8wt  q78_stream_stream_join >> ab.txt
      python tools/qbench.py /root/repo q78_stream_stream_join >> ab.txt
    done

Env: SPARK_GRAFT_SF_DIR (default /tmp/spark_graft_sf1), AB_RUNS
(default 5). Used for the round-10 sf1 riser adjudication and the 30x
growth sweep (BENCH_LOCAL_sf1_r10.json `ab_raw`, PLANS.md round-10).
"""

import json
import os
import sys
import time

repo = sys.argv[1]
names = sys.argv[2:]
os.chdir(repo)
sys.path.insert(0, repo)

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
QUERIES = entry.queries()
# validate every name BEFORE creating the session / warming anything: a
# typo must not cost minutes of sf1 warmup before the KeyError (ADVICE r10)
unknown = [n for n in names if n not in QUERIES]
if unknown:
    raise SystemExit(
        f"unknown queries: {unknown}; known: {sorted(QUERIES)}"
    )
spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})

for name in names:
    QUERIES[name](spark, sf_dir).count()
    spark.catalog.clearCache()

out = {}
for name in names:
    samples = []
    for _ in range(int(os.environ.get("AB_RUNS", "5"))):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        samples.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    out[name] = {"min": min(samples), "samples": samples}
print(json.dumps({"repo": repo, "sf_dir": sf_dir, "queries": out}))
