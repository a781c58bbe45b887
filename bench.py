"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries from the catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timing each
query's full execution (plan + run + collect-to-count). Prints:
{"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
 "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: one per operator family, weighted toward the
# shuffle-heavy / scale-relevant paths.
HEADLINE = [
    "q01_agg_pricing_summary",      # scan + filter + partial-agg shuffle
    "q03_lookup_chain",             # broadcast joins
    "q05_merge_join_full",          # full outer + null-safe
    "q08_join_theta_range",         # big-big join
    "q09_conditional_split_route",  # single-pass routing
    "q15_topk_per_group",           # window shuffle
    "q19_multilevel_aggregates",    # rollup+cube+grouping sets
    "q30_dedup_exact_digest",       # digest dedup shuffle
    "q32_dedup_minhash_lsh",        # signature + band self-join
    "q34_text_features",            # regex/array narrow pass
    "q37_ann_topk",                 # vector math (brute/lsh/ivf legs)
    "q41_events_windows_json",      # time windows + json props
    "q42_sessionization",           # window lag + agg
    "q50_medium_package_flow",      # flagship: full SSIS change-detection DAG
    "q57_bigjoin_revenue",          # big-big shuffle join
    # the heavy tail — these dominate the cold full-catalog sweep, so a
    # regression here must be visible in BENCH, not just the sweep
    "q31_dedup_ngram_cluster",      # exact ngram block-join + closure
    "q40_dedup_embedding_pairs",    # vectorized quantized matmul
    "q78_stream_stream_join",       # micro-batch stream-stream join
    # round-5/6 additions: the clustering + composed-pipeline flagships
    "q80_embedding_kmeans",         # distributed Lloyd's + prune (iterative)
    "q44_data_hygiene",             # hygiene legs + single-pass curation funnel
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # headroom for 32 concurrent codegen'd tasks + cached LSH stages; GC
    # pauses were the main run-to-run timing variance at 8g
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from ssis_to_pyspark_agent_spark.queries import QUERIES
    from ssis_to_pyspark_agent_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Warm the JVM/whole-stage-codegen path of EVERY headline query once AT
    # THE BENCHED SF so timings measure the steady-state engine, not
    # first-call janino compilation (~10s for the wide minhash expression).
    # Warming at a smaller sf is not enough: AQE picks different join
    # strategies per size, so the compiled variant differs.
    # Per-query fault isolation everywhere: one broken query must never take
    # down the whole bench (round-1 lesson — a source crash during warmup
    # left the driver with no bench number at all).
    errors: dict[str, str] = {}
    for name in HEADLINE:
        try:
            QUERIES[name](spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# WARMUP ERR {name}: {errors[name]}", file=sys.stderr)
        spark.catalog.clearCache()

    # Queries are independent; drop operator-internal caches from warmup so
    # measured runs don't fight leftover cached partitions for memory.
    spark.catalog.clearCache()

    # Min of 5 runs per query (GC + cache-clear between runs). This host is
    # a shared microVM: hypervisor CPU steal intermittently slows EVERY
    # stage of a run uniformly ~3x (verified: no GC, no recompile, no plan
    # change — identical stage lists, all proportionally slower). Timing
    # contamination here is strictly one-sided/additive, so the minimum is
    # the unbiased estimator of the code's actual cost (same rationale as
    # the stdlib timeit docs). Raw samples are published in the JSON so the
    # spread is auditable.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        if name in errors:
            continue  # already failed warmup; keep its err field, skip timing
        samples = []
        n = -1
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()  # type: ignore[union-attr]
            t0 = time.perf_counter()
            try:
                n = QUERIES[name](spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"# RUN ERR {name}: {errors[name]}", file=sys.stderr)
                break
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        if not samples:
            continue
        dt = min(samples)
        timings[name] = round(dt, 3)
        raw[name] = [round(s, 3) for s in samples]
        total += dt
        print(
            f"# {name}: min {dt:.2f}s of {[round(s, 2) for s in samples]} "
            f"rows={n}",
            file=sys.stderr,
        )

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "samples": raw,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — always emit a parseable line
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total",
                    "value": None,
                    "unit": "sec",
                    "queries": {},
                    "error": f"{type(exc).__name__}: {exc}"[:500],
                }
            )
        )
        raise SystemExit(1)
