"""Institutionalized data-growth sweep (r10 item 4 / r11 verdict item 6).

Runs bench.py twice — once at the base fixture, once at a K-times
synthetic rig (tools/make_sf.py) — with the bench's own protocol
(same warmup, same min-of-N estimator), then records per-query
time ratios and flags any query whose time grows by more than
ALERT_RATIO at K-times data: a super-linear riser is the earliest
cluster-scale warning the fixture can give.

Usage: python tools/growth_sweep.py [out.json]
Env:   SPARK_GRAFT_SF_DIR   base dir   (default /root/testdata/sf0.1)
       GROWTH_DIR           K-x rig    (default /tmp/spark_graft_sf03;
                            generate with tools/make_sf.py <base> <dir> K)
       GROWTH_K             rig factor (default 3)
       GROWTH_ALERT_RATIO   alert bar  (default 2.0 — ">2x time at 3x
                            data" per the round brief)
       SPARK_GRAFT_BENCH_RUNS forwarded to bench.py (default 3 here:
                            this is a diagnostic, not the driver bench)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", "3")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_GROWTH.json")
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    growth_dir = os.environ.get("GROWTH_DIR", "/tmp/spark_graft_sf03")
    k = float(os.environ.get("GROWTH_K", "3"))
    alert = float(os.environ.get("GROWTH_ALERT_RATIO", "2.0"))

    print(f"# base bench: {base_dir}", file=sys.stderr)
    base = run_bench(base_dir)
    print(f"# growth bench: {growth_dir} (K={k:g})", file=sys.stderr)
    grown = run_bench(growth_dir)

    ratios, alerts = {}, []
    for q, b in base["queries"].items():
        g = grown["queries"].get(q)
        if g is None or not b:
            continue
        r = round(g / b, 3)
        ratios[q] = {"base_sec": b, "grown_sec": g, "ratio": r}
        if r > alert:
            alerts.append(q)
        print(f"# {q}: {b:.2f}s -> {g:.2f}s  ratio {r:.2f}"
              f"{'  ALERT' if r > alert else ''}", file=sys.stderr)

    result = {
        "base_dir": base_dir, "growth_dir": growth_dir, "k": k,
        "alert_ratio": alert,
        "base_total": base["value"], "grown_total": grown["value"],
        "total_ratio": round(grown["value"] / base["value"], 3)
        if base["value"] else None,
        "per_query": ratios,
        "alerts": alerts,
        "runs": int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")),
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({"out": out_path, "alerts": alerts,
                      "total_ratio": result["total_ratio"]}))


if __name__ == "__main__":
    main()
