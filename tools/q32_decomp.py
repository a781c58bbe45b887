"""Fresh-session stage decomposition for q32_dedup_minhash_lsh
(round-9 item 4): at sf0.1 the query is the suite's most expensive
(~7-9s driver min) and NOTES claims "fixed pipeline overhead, don't
chase without a lever" — earn that claim the way q78's was earned.

One stage per process (in-session legs contaminate later timings):

    for s in query full inc sig banded cand pairs; do
        python tools/q32_decomp.py $s; done

  query  — the whole catalog query (full + inc legs, union, count)
  full   — the dd leg alone (dedup.minhash survivors count)
  inc    — the incremental leg alone (hist 10% / batch 10%)
  sig    — stage 1+2: signature + band frame (count of band rows)
  banded — sig + posexplode (count)
  cand   — sig + explode + _bucket_pairs candidate generation (count)
  pairs  — cand + exact-Jaccard verify (count) == minhash return_pairs
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ssis_to_pyspark_agent_spark.operators import get_operator  # noqa: E402
from ssis_to_pyspark_agent_spark.operators.dedup import (  # noqa: E402
    _bucket_pairs,
    _signature_bands,
    _spread,
)
from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
CFG = dict(id_col="doc_id", text_col="text", threshold=0.7,
           num_hashes=128, bands=16)


def main():
    stage = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    if stage == "query":
        import __spark_entry__ as e

        n = e.queries()["q32_dedup_minhash_lsh"](spark, sf_dir).count()
        extra = f"rows={n}"
    elif stage == "full":
        out = get_operator("dedup.minhash")(spark, [docs], dict(CFG), {})
        extra = f"survivors={out.count()}"
    elif stage == "inc":
        n_docs = docs.count()
        t0 = time.perf_counter()  # exclude the count
        cut1, cut2 = n_docs // 10, n_docs // 5
        hist = docs.filter(F.col("doc_id") < cut1)
        batch = docs.filter(
            (F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2))
        out = get_operator("dedup.minhash_incremental")(
            spark, [batch, hist], dict(CFG), {})
        extra = f"survivors={out.count()}"
    elif stage in ("sig", "banded", "cand", "pairs"):
        src = _spread(spark, docs)
        base, band_frame = _signature_bands(
            src, "doc_id", "text", 3, 16, 8, 42, "numpy", False)
        if stage == "sig":
            extra = f"rows={band_frame.count()}"
        else:
            banded = band_frame.select(
                "_id", F.posexplode("_bh").alias("_band", "_bh"))
            if stage == "banded":
                extra = f"rows={banded.count()}"
            elif stage == "cand":
                cand = _bucket_pairs(banded, ["_band", "_bh"], 200)
                extra = f"cands={cand.count()}"
            else:
                out = get_operator("dedup.minhash")(
                    spark, [docs], dict(CFG, return_pairs=True), {})
                extra = f"pairs={out['pairs'].count()}"
    else:
        raise SystemExit(f"unknown stage {stage}")
    dt = time.perf_counter() - t0
    print(f"Q32_DECOMP stage={stage} t={dt:.2f}s {extra}")


if __name__ == "__main__":
    main()
