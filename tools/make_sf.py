"""Synthetic scale-up of a test-fixture sf directory.

Replicates every table K times with key offsets while preserving
referential integrity (orders.o_custkey follows customer, lineitem FKs
follow orders/part/supplier; region/nation stay fixed like TPC-H does at
any scale factor). Text and embeddings are DECORRELATED per replica —
words pseudo-shuffled by a per-(doc, replica) hash sort, embeddings
rotated — so dedup/ANN load grows linearly with the data instead of
quadratically with the replica count (10x data should mean 10x docs,
not 45 planted near-dup pairs per original doc).

Usage: python tools/make_sf.py [src_sf_dir] [dst_dir] [K]
       (defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 10)

This is a THROUGHPUT rig for bench.py at larger scale
(SPARK_GRAFT_SF_DIR=<dst>), not an oracle fixture — values don't need
to match any reference output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# key column -> offset unit is (max(key)+1) of the table OWNING the key;
# FK columns reuse the owner's unit so joins keep matching
KEY_OWNERS = {
    "c_custkey": "customer", "s_suppkey": "supplier", "p_partkey": "part",
    "o_orderkey": "orders", "o_custkey": "customer",
    "l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier",
    "event_id": "events", "user_id": "events",
    "doc_id": "documents", "vec_id": "embeddings",
}
FIXED = {"region", "nation"}  # dimension tables don't scale in TPC-H


def scale_table(spark, src: str, name: str, k: int, units: dict) -> DataFrame:
    df = spark.read.parquet(f"{src}/{name}.parquet")
    if name in FIXED or k <= 1:
        return df
    parts = []
    for i in range(k):
        rep = df
        for col in df.columns:
            if col in KEY_OWNERS:
                rep = rep.withColumn(col, F.col(col) + F.lit(i * units[col]))
        if name == "documents" and i > 0:
            # deterministic per-replica word shuffle: sorting words by a
            # replica-salted hash destroys shingle overlap with the
            # original (J ~ vocab overlap only), so replicas are new
            # documents, not planted near-dups
            w = F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
            shuffled = F.transform(
                F.array_sort(
                    F.transform(
                        w,
                        lambda x: F.struct(
                            F.xxhash64(x, F.col("doc_id")).alias("h"),
                            x.alias("w"),
                        ),
                    )
                ),
                lambda s: s["w"],
            )
            rep = rep.withColumn("text", F.array_join(shuffled, " "))
        if name == "embeddings" and i > 0:
            # rotate the vector by i positions: decorrelated but same
            # norm/dtype/dimension
            v = F.col("embedding")
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.slice(v, (i % 64) + 1, 10_000), F.slice(v, 1, i % 64)
                ).cast("array<float>"),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(
        app_name="make_sf",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    units = {}
    for col, owner in KEY_OWNERS.items():
        own_col = col if col in ("event_id", "user_id", "doc_id", "vec_id") \
            else {"customer": "c_custkey", "supplier": "s_suppkey",
                  "part": "p_partkey", "orders": "o_orderkey"}[owner]
        if own_col not in units:
            mx = (
                spark.read.parquet(f"{src}/{owner}.parquet")
                .agg(F.max(own_col)).collect()[0][0]
            )
            units[own_col] = int(mx) + 1
        units[col] = units[own_col]
    os.makedirs(dst, exist_ok=True)
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    for t in TABLES:
        if only and t not in only:
            continue
        t0 = time.time()
        df = scale_table(spark, src, t, k, units)
        # keep enough splits that downstream scans parallelize
        n_rows = df.count()
        target = max(8, min(64, n_rows // 200_000 + 1))
        if t == "events":
            # ts-ORDERED file layout: the streaming file source delivers
            # one file per micro-batch, so arrival order must respect
            # event time within the watermark — exactly what a real
            # file-drop ingest produces. Round-robin repartition
            # interleaves the K replicas' time ranges across files and
            # the watermark silently DROPS whole files as late (found
            # by the round-9 sf1 oracle sweep: q78 spark=30 rows vs
            # oracle=590). Range-partition by ts + equalized mtimes
            # (path breaks the FileStreamSource tie) make file order ==
            # event-time order.
            out = df.repartitionByRange(target, "ts").sortWithinPartitions("ts")
        else:
            out = df.repartition(target)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        if t == "events":
            # strictly increasing mtimes in part-index order: the file
            # source orders by modification time, and parallel write
            # tasks finish in arbitrary order — equal or shuffled
            # mtimes would randomize micro-batch order and re-introduce
            # the late-drop
            import glob as _glob

            base_t = time.time()
            for j, f in enumerate(
                    sorted(_glob.glob(f"{dst}/{t}.parquet/part-*"))):
                os.utime(f, (base_t + j, base_t + j))
        print(f"{t}: {n_rows} rows in {time.time()-t0:.1f}s")
    print(f"done -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
