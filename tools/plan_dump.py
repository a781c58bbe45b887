"""Dump .explain('formatted') for catalog queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]
  tag     subdirectory under plans/ (e.g. r11)
  suffix  'before' or 'after'
  query   names from the catalog; default = the bench HEADLINE set

Builds each query's DataFrame at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and writes the formatted physical plan. Queries
with operator-internal eager actions run those while building — capture
is therefore slower than a pure explain but exact: the captured plan is
the one the bench's final action executes.
"""

from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from ssis_to_pyspark_agent_spark.queries import QUERIES

    if not names:
        names = list(bench.HEADLINE)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {sorted(QUERIES)}")

    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"plan_dump_{tag}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan)} bytes)", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
