"""Bench-drift diagnostic (round-6 verdict item 3).

The driver's r6 bench showed RISING samples within q44's and q32's runs
(q44 local [9.3 .. 17.2] monotone; q32 swinging 9-41s). Two hypotheses:
(a) shared-microVM hypervisor steal (one-sided, additive — bench.py's
min-estimator already absorbs it), or (b) page-cache/GC pressure from
the funnel's persist/unpersist cycles — a genuine leak that would bite
a long-lived 100 TB session.

This runs N iterations of the named queries exactly like bench.py
(System.gc + clearCache between runs) and records per iteration:
wall seconds, cumulative JVM GC time DELTA during the run, heap used
after the run, and the persistent-RDD count after the run. A leak shows
as monotone heap/persistent growth and GC-delta growth tracking the
wall-time growth; pure host steal shows flat heap, flat GC, spiky wall.

Usage: python tools/bench_diag.py [q44_data_hygiene q32_... ] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    for b in mf.getGarbageCollectorMXBeans():
        gc_ms += b.getCollectionTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed()
    n_persist = spark.sparkContext._jsc.getPersistentRDDs().size()
    return gc_ms, heap, n_persist


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.isdigit()]
    iters = next((int(a) for a in sys.argv[1:] if a.isdigit()), 10)
    names = args or ["q44_data_hygiene", "q32_dedup_minhash_lsh"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from ssis_to_pyspark_agent_spark.queries import QUERIES

    spark = get_spark(
        app_name="bench_diag",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        QUERIES[name](spark, sf_dir).count()  # warm codegen, like bench.py
        spark.catalog.clearCache()
        print(f"DIAG {name}: iter wall_s gc_delta_ms heap_mb n_persist")
        for it in range(iters):
            spark.sparkContext._jvm.System.gc()
            gc0, _, _ = jvm_stats(spark)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            gc1, heap, np_ = jvm_stats(spark)
            spark.catalog.clearCache()
            print(
                f"DIAG {name}: {it} {wall:.2f} {gc1 - gc0} "
                f"{heap // (1 << 20)} {np_}"
            )


if __name__ == "__main__":
    main()
