"""Fresh-session stage decomposition for text.lm_score (round-9 item 1).

NOTES round-8: in-session profiling legs contaminate later timings
(leftover shuffle/GC state), so each stage runs in its OWN process:

    for s in full tokenize counts merged vocab; do
        python tools/lm_decomp.py $s 1000000; done

Stages mirror the operator's self-trained n=2 plan pieces:
  full      — the operator end-to-end (1-row agg over its output)
  tokenize  — doc-side gram-hash explode alone (count)
  counts    — train explode + groupBy(_g,_ctx) (1-row agg over counts)
  merged    — counts -> ctx_tab -> join -> hapax filter (1-row agg)
  vocab     — the distinct-train-token pass alone
Corpus = probe_lm's adversarial Zipf(50k)+boilerplate, 80 words/doc.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ssis_to_pyspark_agent_spark.operators import get_operator  # noqa: E402
from ssis_to_pyspark_agent_spark.operators.dedup import (  # noqa: E402
    _lambda_bind,
    _words,
)
from ssis_to_pyspark_agent_spark.session import get_spark  # noqa: E402
from tools.scale_probe import BOILER, _zipf_lines_expr  # noqa: E402


def corpus(spark, n_docs):
    d = (
        spark.range(n_docs)
        .repartition(64)
        .select(
            F.col("id").alias("doc_id"),
            F.regexp_replace(
                _zipf_lines_expr(10, 8, vocab=50_000, salt=21,
                                 boiler=BOILER),
                "\n", " ",
            ).alias("text"),
        )
        .persist()
    )
    d.count()
    return d


def _gh(w, i, m):
    return F.xxhash64(*[F.element_at(w, i + j) for j in range(m)])


def gram_hashes(tcol, n=2):
    return _lambda_bind(
        _words(F.col(tcol)),
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: _gh(w, i, n),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )


def gram_ctx_pairs(tcol, n=2):
    return _lambda_bind(
        _words(F.col(tcol)),
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.struct(
                    _gh(w, i, n).alias("_g"),
                    _gh(w, i, n - 1).alias("_ctx"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<_g:bigint,_ctx:bigint>>")),
    )


def main():
    stage = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # LM order for the ext_* stages: n=2 contexts are unigrams (~vocab
    # rows, AQE already broadcast the old plan's ctx join), n=3 contexts
    # are bigrams (gram-sized ctx_tab — the regime the round-10
    # restructure targets: the old plan's second join-back is a
    # stream-sized SMJ there)
    order = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # train-corpus size for ext_* (default: same as docs). The
    # deployment shape external-train exists for is CCNet scoring:
    # train = a small clean corpus, docs = the crawl (docs >> train).
    train_docs = int(sys.argv[4]) if len(sys.argv) > 4 else n_docs
    spark = get_spark(
        extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = corpus(spark, n_docs)
    t0 = time.perf_counter()
    if stage == "full":
        out = get_operator("text.lm_score")(
            spark, [docs],
            {"id_col": "doc_id", "text_col": "text", "n": 2}, {})
        r = out.agg(F.sum("lm_ngrams"), F.sum("lm_bits_fp")).collect()[0]
        extra = f"grams={r[0]} bits={r[1]}"
    elif stage == "tokenize":
        dg = docs.select(
            F.col("doc_id").alias("_id"),
            F.explode(gram_hashes("text")).alias("_g"))
        extra = f"rows={dg.count()}"
    elif stage == "counts":
        tg = docs.select(
            F.explode(gram_ctx_pairs("text")).alias("_p")
        ).select("_p._g", "_p._ctx")
        counts = tg.groupBy("_g", "_ctx").agg(F.count(F.lit(1)).alias("_c"))
        r = counts.agg(F.count(F.lit(1)), F.sum("_c")).collect()[0]
        extra = f"distinct={r[0]} total={r[1]}"
    elif stage == "merged":
        tg = docs.select(
            F.explode(gram_ctx_pairs("text")).alias("_p")
        ).select("_p._g", "_p._ctx")
        counts = tg.groupBy("_g", "_ctx").agg(F.count(F.lit(1)).alias("_c"))
        ctx_tab = counts.groupBy("_ctx").agg(F.sum("_c").alias("_cc"))
        merged = (
            counts.join(ctx_tab, "_ctx")
            .filter(~((F.col("_c") == 1) & (F.col("_cc") == 1)))
            .select("_g", "_c", "_cc")
        )
        r = merged.agg(F.count(F.lit(1)), F.sum("_c")).collect()[0]
        extra = f"rows={r[0]} total_c={r[1]}"
    elif stage == "full_old":
        # the pre-round-9 plan, inlined verbatim so the A/B needs no git
        # stash: un-pruned (g, c, cc) merged table, doc-side SMJ
        from ssis_to_pyspark_agent_spark.operators.text import (
            LM_ILOG, LM_QGRID)

        tg = docs.select(
            F.explode(gram_ctx_pairs("text")).alias("_p")
        ).select("_p._g", "_p._ctx")
        counts = tg.groupBy("_g", "_ctx").agg(F.count(F.lit(1)).alias("_c"))
        ctx_tab = counts.groupBy("_ctx").agg(F.sum("_c").alias("_cc"))
        tw = docs.select(
            F.explode(_words(F.col("text"))).alias("_w")
        ).filter(F.col("_w") != "")
        vocab = tw.agg(
            F.count_distinct(F.xxhash64(F.col("_w"))).alias("_v"))
        merged = (
            counts.join(ctx_tab, "_ctx")
            .filter(~((F.col("_c") == 1) & (F.col("_cc") == 1)))
            .select("_g", "_c", "_cc")
        )
        dg = docs.select(
            F.col("doc_id").alias("_id"),
            F.explode(gram_hashes("text")).alias("_g"))
        joined = (
            dg.join(merged, "_g", "left")
            .withColumn("_c", F.coalesce(F.col("_c"), F.lit(1)))
            .withColumn("_cc", F.coalesce(F.col("_cc"), F.lit(1)))
        )
        scored = (
            joined.crossJoin(F.broadcast(vocab))
            .withColumn(
                "_q",
                F.least(
                    F.lit(LM_QGRID),
                    F.greatest(
                        F.lit(1),
                        F.expr(
                            f"(( _c + 1 ) * {LM_QGRID}) div (_cc + _v)"
                        ).cast("int"))))
            .withColumn("_bits", F.element_at(F.lit(LM_ILOG), F.col("_q")))
        )
        per_doc = scored.groupBy("_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("lm_ngrams"),
            F.sum("_bits").cast("bigint").alias("lm_bits_fp"),
        )
        out = docs.join(
            per_doc.withColumnRenamed("_id", "doc_id"), "doc_id", "left")
        r = out.agg(F.sum("lm_ngrams"), F.sum("lm_bits_fp")).collect()[0]
        extra = f"grams={r[0]} bits={r[1]}"
    elif stage == "qtab":
        # surviving stats-table size after the quantization-floor prune
        from ssis_to_pyspark_agent_spark.operators.text import LM_QGRID

        tg = docs.select(
            F.explode(gram_ctx_pairs("text")).alias("_p")
        ).select("_p._g", "_p._ctx")
        counts = tg.groupBy("_g", "_ctx").agg(F.count(F.lit(1)).alias("_c"))
        ctx_tab = counts.groupBy("_ctx").agg(F.sum("_c").alias("_cc"))
        tw = docs.select(
            F.explode(_words(F.col("text"))).alias("_w")
        ).filter(F.col("_w") != "")
        vocab = tw.agg(
            F.count_distinct(F.xxhash64(F.col("_w"))).alias("_v"))

        def q(num):
            return F.least(F.lit(LM_QGRID),
                           F.greatest(F.lit(1), F.expr(num).cast("int")))

        qtab = (
            counts.join(ctx_tab, "_ctx")
            .crossJoin(F.broadcast(vocab))
            .withColumn("_q", q(f"((_c + 1) * {LM_QGRID}) div (_cc + _v)"))
            .filter(F.col("_q") != q(f"(2 * {LM_QGRID}) div (1 + _v)"))
        )
        r = qtab.agg(F.count(F.lit(1))).collect()[0]
        extra = f"survivors={r[0]}"
    elif stage in ("ext_new", "ext_old"):
        # External-train A/B (round-10, round-9 verdict item 4): train =
        # a same-shape Zipf corpus with a DIFFERENT salt, so the doc
        # stream carries real OOV grams (different Zipf tails) alongside
        # shared boilerplate/head grams. ext_old inlines the
        # pre-round-10 plan verbatim (doc stream joins counts on _g,
        # then ctx_tab on _ctx — TWO stream-sized join-backs); ext_new
        # runs the operator (score precomputed train-side, ONE stream
        # join on _g + the quantization-floor-pruned OOV ctx table).
        # Checksums (grams/bits/oov) must match bit-exactly.
        from ssis_to_pyspark_agent_spark.operators.text import (
            LM_ILOG, LM_QGRID)

        train = (
            spark.range(train_docs)
            .repartition(64)
            .select(
                F.col("id").alias("doc_id"),
                F.regexp_replace(
                    _zipf_lines_expr(10, 8, vocab=50_000, salt=22,
                                     boiler=BOILER),
                    "\n", " ",
                ).alias("text"),
            )
            .persist()
        )
        train.count()
        t0 = time.perf_counter()  # time the scoring, not the rigs
        if stage == "ext_new":
            out = get_operator("text.lm_score")(
                spark, [docs, train],
                {"id_col": "doc_id", "text_col": "text", "n": order}, {})
        else:
            tg = train.select(
                F.explode(gram_ctx_pairs("text", order)).alias("_p")
            ).select("_p._g", "_p._ctx")
            counts = tg.groupBy("_g", "_ctx").agg(
                F.count(F.lit(1)).alias("_c"))
            ctx_tab = counts.groupBy("_ctx").agg(F.sum("_c").alias("_cc"))
            tw = train.select(
                F.explode(_words(F.col("text"))).alias("_w")
            ).filter(F.col("_w") != "")
            vocab = tw.agg(
                F.count_distinct(F.xxhash64(F.col("_w"))).alias("_v"))
            dg = docs.select(
                F.col("doc_id").alias("_id"),
                F.explode(gram_ctx_pairs("text", order)).alias("_p"),
            ).select("_id", "_p._g", "_p._ctx")
            joined = (
                dg.join(counts.select("_g", "_c"), "_g", "left")
                .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
                .join(ctx_tab, "_ctx", "left")
                .withColumn("_cc", F.coalesce(F.col("_cc"), F.lit(0)))
            )
            scored = (
                joined.crossJoin(F.broadcast(vocab))
                .withColumn(
                    "_q",
                    F.least(
                        F.lit(LM_QGRID),
                        F.greatest(
                            F.lit(1),
                            F.expr(
                                f"((_c + 1) * {LM_QGRID}) div (_cc + _v)"
                            ).cast("int"))))
                .withColumn(
                    "_bits", F.element_at(F.lit(LM_ILOG), F.col("_q")))
            )
            per_doc = scored.groupBy("_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("lm_ngrams"),
                F.sum(F.when(F.col("_c") == 0, 1).otherwise(0))
                .cast("bigint").alias("lm_oov"),
                F.sum("_bits").cast("bigint").alias("lm_bits_fp"),
            )
            out = docs.join(
                per_doc.withColumnRenamed("_id", "doc_id"),
                "doc_id", "left")
        r = out.agg(
            F.sum("lm_ngrams"), F.sum("lm_bits_fp"), F.sum("lm_oov")
        ).collect()[0]
        extra = f"grams={r[0]} bits={r[1]} oov={r[2]}"
    elif stage == "vocab":
        tw = docs.select(F.explode(_words(F.col("text"))).alias("_w")).filter(
            F.col("_w") != "")
        v = tw.agg(
            F.count_distinct(F.xxhash64(F.col("_w"))).alias("_v")
        ).collect()[0][0]
        extra = f"V={v}"
    else:
        raise SystemExit(f"unknown stage {stage}")
    dt = time.perf_counter() - t0
    print(f"LM_DECOMP stage={stage} n={n_docs} order={order} "
          f"train={train_docs} t={dt:.1f}s {extra}")


if __name__ == "__main__":
    main()
