"""Time EVERY catalog query once (warm) at $SPARK_GRAFT_SF_DIR.

Breadth instrument for the optimization checklist: one warmup pass +
N timed runs (min) per query, all 50, one JSON line at the end. Not a
substitute for bench.py (different query set, single session) — use it
to rank where the non-headline catalog time goes.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01), SWEEP_RUNS
(default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    runs = int(os.environ.get("SWEEP_RUNS", "2"))
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark(
        app_name="catalog_sweep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).count()  # warm
        except Exception as exc:  # noqa: BLE001
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# ERR {name}: {errs[name]}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        spark.catalog.clearCache()
        samples = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()  # type: ignore[union-attr]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(min(samples), 3)
        print(f"# {name}: {out[name]}s {[round(s, 2) for s in samples]}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": out,
                      "errors": errs, "total": round(sum(out.values()), 2)}))


if __name__ == "__main__":
    main()
