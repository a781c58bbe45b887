"""Similarity search over embedding columns (SURVEY §2.12 — NEW).

Approximate-nearest-neighbor over ``array<float>``:
- ``similarity.topk_bruteforce`` — exact cosine top-k (broadcast the query
  set, one pass over the corpus, per-group heap via window). The baseline
  and the verifier for the approximate paths.
- ``similarity.topk_lsh`` — random-hyperplane LSH buckets (the scale path:
  probes only matching buckets; recall tuned by tables x bits).
- ``similarity.topk_ivf`` — IVF-style coarse quantizer: corpus assigned to
  nearest of C centroids (one broadcast pass), queries probe the nprobe
  nearest centroid lists only.

All dot products are ``F.zip_with`` + ``F.aggregate`` — JVM-side, codegen,
no Python in the loop. The reference has no vector surface at all; its
nearest concept is Fuzzy Lookup (data_engineering_parser.py:1204-1207).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _q(x: Column, q: int) -> Column:
    return F.round(x.cast("double") * q, 0).cast("long")


def _cosine(a: Column, b: Column, quantize: int | None = None) -> Column:
    """Cosine similarity. With `quantize`, elements are scaled to integers
    first so dot/norm sums are EXACT (bit-identical in any engine — the
    oracle-comparable mode; also immune to accumulation-order effects).
    Precision loss at q=10000 on unit-ish vectors is ~1e-4 relative."""
    if quantize:
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: _q(x, quantize) * _q(y, quantize)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        na = F.aggregate(
            F.transform(a, lambda x: _q(x, quantize) * _q(x, quantize)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        nb = F.aggregate(
            F.transform(b, lambda x: _q(x, quantize) * _q(x, quantize)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return dot.cast("double") / (
            F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
        )
    return _dot(a, b) / (_norm(a) * _norm(b))


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> list[list[list[float]]]:
    """Deterministic random hyperplanes (driver-side constants, broadcast
    into the plan as literals — tiny: tables*bits*dim floats)."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def _md5_int_planes(dim: int, n_tables: int, n_bits: int, seed: int) -> list[list[list[int]]]:
    """Engine-neutral INTEGER hyperplanes: w = md5(seed:t:b:d) mod 2001
    - 1000. Reproducible in plain SQL (DuckDB: CAST('0x'||substr(md5(..),
    1,15) AS BIGINT) % 2001 - 1000), so an oracle can re-derive the exact
    same LSH tables. Combined with integer-quantized vectors the bucket
    bits are exact integer arithmetic — no float-sum sign flips between
    engines, in any summation order."""
    import hashlib

    def w(t: int, b: int, d: int) -> int:
        h = hashlib.md5(f"{seed}:{t}:{b}:{d}".encode()).hexdigest()
        return int(h[:15], 16) % 2001 - 1000

    return [
        [[w(t, b, d) for d in range(dim)] for b in range(n_bits)]
        for t in range(n_tables)
    ]


def _hyperplane_bucket(
    vec: Column,
    dim: int,
    n_tables: int,
    n_bits: int,
    seed: int = 42,
    planes: list | None = None,
    quantize: int | None = None,
) -> Column:
    """array<bigint> of bucket ids, one per table: sign-bit signature of the
    vector against each table's hyperplanes. With integer `planes` +
    `quantize`, the dot is exact integer arithmetic (oracle-reproducible)."""
    if planes is None:
        planes = _hyperplanes(dim, n_tables, n_bits, seed)
    v = F.transform(vec, lambda x: _q(x, quantize)) if quantize else vec
    buckets = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for j in range(n_bits):
            plane = F.array(*[F.lit(w) for w in planes[t][j]])
            bit = F.when(_dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
            bucket = bucket + (bit.cast("long") * F.lit(1 << j))
        buckets.append(bucket)
    return F.array(*buckets)


def _bucket_frame(
    df: DataFrame,
    id_name: str,
    vec_name: str,
    dim: int,
    n_tables: int,
    n_bits: int,
    seed: int,
    keep_vec: bool = False,
    planes: list | None = None,
    quantize: int | None = None,
) -> DataFrame:
    """Exploded LSH bucket rows (id[, vec], _table, _bucket) via one BLAS
    matmul per Arrow batch: (batch x dim) @ (dim x tables*bits) -> sign
    bits -> bucket ids. Replaces the expr formulation (tables*bits
    zip_with/aggregate dot folds per row, each allocating an intermediate
    array) — measured 4.8s -> 0.8s at 200k x dim64 x 8x10. Sign rule
    (dot >= 0, NaN -> 0) matches `_hyperplane_bucket`; bucket ids can
    differ from the expr path only for dots within float-sum ulp of 0 —
    candidate-set recall, not correctness, both paths verify with exact
    cosine."""
    import numpy as np
    import pandas as pd

    if planes is None:
        planes = _hyperplanes(dim, n_tables, n_bits, seed)
    proj = np.array(
        [
            [planes[t][j][d] for d in range(dim)]
            for t in range(n_tables)
            for j in range(n_bits)
        ],
        dtype=np.float64,
    ).T  # dim x (tables*bits)
    pow2 = np.array([1 << j for j in range(n_bits)], dtype=np.int64)
    id_type = df.schema[id_name].dataType.simpleString()
    vec_type = df.schema[vec_name].dataType.simpleString()
    schema = (
        f"{id_name} {id_type}, "
        + (f"{vec_name} {vec_type}, " if keep_vec else "")
        + "_table int, _bucket long"
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = _vecmat(pdf[vec_name])
            if quantize:
                v = _half_up(v, quantize)
            # int-valued float64 products stay < 2^53 -> the matmul is
            # exact integer arithmetic in any order (oracle-identical)
            signs = ((v @ proj) >= 0).reshape(len(pdf), n_tables, n_bits)
            buckets = (signs.astype(np.int64) * pow2).sum(axis=2)
            data = {id_name: np.repeat(pdf[id_name].values, n_tables)}
            if keep_vec:
                data[vec_name] = np.repeat(pdf[vec_name].values, n_tables)
            data["_table"] = np.tile(
                np.arange(n_tables, dtype=np.int32), len(pdf)
            )
            data["_bucket"] = buckets.ravel()
            yield pd.DataFrame(data)

    return df.select(id_name, vec_name).mapInPandas(gen, schema=schema)


def _kmeans_centroids(
    c: DataFrame, n_cent: int, sample_n: int, iters: int, seed: int
) -> list[dict]:
    """Lloyd's k-means on a seeded hash-sample of the corpus, driver-side
    numpy (sample_n x dim floats — a few MB). Deterministic: hash-ordered
    sample, hash-ordered init, fixed iteration count with early stop."""
    import numpy as np

    sample = (
        c.orderBy(F.xxhash64(F.col("corpus_id").cast("string"), F.lit(seed)))
        .limit(sample_n)
        .select("_cv")
        .collect()
    )
    x = np.array([list(r["_cv"]) for r in sample], dtype=np.float64)
    cent = x[:n_cent].copy()  # init = first n hash-ordered sample rows
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = np.array(
            [
                x[assign == j].mean(axis=0) if (assign == j).any() else cent[j]
                for j in range(n_cent)
            ]
        )
        if np.allclose(new, cent):
            break
        cent = new
    return [{"_centv": row.tolist()} for row in cent]


def _topk(scored: DataFrame, query_id: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .withColumnRenamed("_rank", "rank")
    )


@operator("similarity.topk_bruteforce")
def topk_bruteforce(spark: SparkSession, inputs, config, context) -> DataFrame:
    """inputs: [corpus, queries]; config: id_col, vec_col, query_id_col,
    query_vec_col, k. Queries are broadcast (a query batch is dimension-
    sized); corpus streams through once — the right exact plan at any scale.
    Output: (query_id, corpus_id, cosine, rank).

    method='expr' (default): JVM-side zip_with/aggregate dot products —
    codegen'd, oracle-exact with `quantize`.
    method='pandas': numpy matmul per Arrow batch (corpus-batch x query
    matrix) — one BLAS call scores a whole batch against all queries;
    wins once |queries| x dim is non-trivial (measured ~3x at 2k x 64 x 50,
    growing with batch size)."""
    from ssis_to_pyspark_agent_spark.operators.dedup import _spread

    corpus, queries = inputs[0], inputs[1]
    qid = config.get("query_id_col", "query_id")
    qv = config.get("query_vec_col", config["vec_col"])
    k = config.get("k", 10)
    c = _spread(spark, corpus).select(
        F.col(config["id_col"]).alias("corpus_id"), F.col(config["vec_col"]).alias("_cv")
    )

    if config.get("method", "expr") == "pandas":
        import numpy as np
        import pandas as pd

        quant = config.get("quantize")
        q_rows = queries.select(
            F.col(qid).alias("query_id"), F.col(qv).alias("_qv")
        ).collect()  # a query batch is small by construction
        q_ids = [r.query_id for r in q_rows]
        qm = np.array([list(r._qv) for r in q_rows], dtype=np.float64)

        def _qint(m):
            # bit-equality with the expr path is pinned by
            # test_pandas_quantized_matches_expr on the driver's actual
            # embeddings tables (see _half_up for the rounding contract)
            return _half_up(m, quant).astype(np.int64)

        if quant:
            qmi = _qint(qm)  # int64: dot/norm sums are exact, like the oracle
            q_norm = np.sqrt((qmi * qmi).sum(axis=1).astype(np.float64))
        else:
            qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)

        def score(it):
            for pdf in it:
                cm = np.array(list(map(list, pdf["_cv"])), dtype=np.float64)
                if quant:
                    cmi = _qint(cm)
                    c_norm = np.sqrt((cmi * cmi).sum(axis=1).astype(np.float64))
                    dots = (cmi @ qmi.T).astype(np.float64)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        # same IEEE ops in the same order as the expr path
                        # (dot / (sqrt(na)*sqrt(nb))) — no epsilon guard, so
                        # zero vectors give the identical Inf/NaN
                        sims = dots / (c_norm[:, None] * q_norm[None, :])
                else:
                    cm_n = cm / np.maximum(
                        np.linalg.norm(cm, axis=1, keepdims=True), 1e-12
                    )
                    sims = cm_n @ qm_n.T  # |batch| x |queries|, one BLAS call
                out = pd.DataFrame(
                    {
                        "corpus_id": np.repeat(pdf["corpus_id"].values, len(q_ids)),
                        "query_id": np.tile(q_ids, len(pdf)),
                        "cosine": sims.ravel(),
                    }
                )
                yield out

        scored = c.mapInPandas(
            score, schema="corpus_id long, query_id long, cosine double"
        )
    else:
        q = F.broadcast(
            queries.select(F.col(qid).alias("query_id"), F.col(qv).alias("_qv"))
        )
        scored = c.crossJoin(q).select(
            "query_id",
            "corpus_id",
            _cosine(F.col("_cv"), F.col("_qv"), config.get("quantize")).alias("cosine"),
        )
    return _topk(scored, "query_id", k).select(
        "query_id", "corpus_id", "cosine", "rank"
    )


@operator("similarity.topk_lsh")
def topk_lsh(spark: SparkSession, inputs, config, context) -> DataFrame:
    """LSH-bucketed ANN: corpus and queries hashed with the same seeded
    hyperplanes; candidates = bucket collisions in any table; exact cosine
    re-rank of candidates only."""
    corpus, queries = inputs[0], inputs[1]
    qid = config.get("query_id_col", "query_id")
    qv = config.get("query_vec_col", config["vec_col"])
    dim = config.get("dim") or len(corpus.select(config["vec_col"]).first()[0])
    n_tables = config.get("lsh_tables", 8)
    n_bits = config.get("lsh_bits")
    if n_bits is None:
        # Auto-size bucket granularity to the corpus (~8 rows/bucket):
        # fixed bit-widths are a silent cost/recall trap — too few bits
        # puts hundreds of rows per bucket (candidate explosion +
        # bucket_cap truncation), too many splits true neighbors. Tables
        # stay the recall knob (more tables = more chances to collide).
        # One count() of the corpus; see dedup.embedding for the measured
        # failure mode.
        import math

        n_bits = min(18, max(8, math.ceil(math.log2(max(corpus.count(), 16) / 8))))
    seed = config.get("seed", 42)
    # hyperplanes='md5': engine-neutral integer planes + quantized vectors
    # -> bucket assignment reproducible in plain SQL (exact oracle for the
    # whole approximate pipeline, not just the re-rank)
    if config.get("hyperplanes") == "md5":
        planes = _md5_int_planes(dim, n_tables, n_bits, seed)
        plane_quant = config.get("quantize", 10000)
    else:
        planes, plane_quant = None, None

    from ssis_to_pyspark_agent_spark.operators.dedup import _spread

    c_named = _spread(spark, corpus).select(
        F.col(config["id_col"]).alias("corpus_id"),
        F.col(config["vec_col"]).alias("_cv"),
    )
    q_named = queries.select(
        F.col(qid).alias("query_id"), F.col(qv).alias("_qv")
    )
    if config.get("bucket_impl", "numpy") == "numpy":
        c = _bucket_frame(
            c_named, "corpus_id", "_cv", dim, n_tables, n_bits, seed,
            keep_vec=True, planes=planes, quantize=plane_quant,
        )
        q = _bucket_frame(
            q_named, "query_id", "_qv", dim, n_tables, n_bits, seed,
            keep_vec=True, planes=planes, quantize=plane_quant,
        )
    else:
        c = c_named.select(
            "corpus_id",
            "_cv",
            F.posexplode(
                _hyperplane_bucket(F.col("_cv"), dim, n_tables, n_bits,
                                   seed, planes, plane_quant)
            ).alias("_table", "_bucket"),
        )
        q = q_named.select(
            "query_id",
            "_qv",
            F.posexplode(
                _hyperplane_bucket(F.col("_qv"), dim, n_tables, n_bits,
                                   seed, planes, plane_quant)
            ).alias("_table", "_bucket"),
        )
    cand = (
        c.join(F.broadcast(q), ["_table", "_bucket"])
        .select("query_id", "corpus_id", "_cv", "_qv")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    scored = _pair_cosine_frame(
        cand, "_cv", "_qv", ["query_id", "corpus_id"], config.get("quantize")
    )
    return _topk(scored, "query_id", config.get("k", 10)).select(
        "query_id", "corpus_id", "cosine", "rank"
    )


def _pair_cosine_frame(
    df: DataFrame,
    vec_a: str,
    vec_b: str,
    keep: list[str],
    quantize: int | None,
) -> DataFrame:
    """Project `keep` columns plus a rowwise `cosine` between two vector
    columns. With `quantize`, runs as Arrow batches (one einsum per batch
    instead of an interpreted 3-fold Catalyst expression per row) —
    value-identical to `_cosine(a, b, quantize)`: quantized dots/norms
    are exact integer arithmetic in float64 (< 2^53, so summation order
    is irrelevant) and the final dot/(sqrt*sqrt) is the same IEEE ops;
    zero vectors give the identical NaN. Without quantize, falls back to
    the expression (float fold order would differ in the last ulp).

    Candidate-verify stages are where ANN/dedup time actually goes at
    scale (candidates >> rows); measured 37s -> 11s on a 500k-vector IVF
    probe scoring ~6M pairs."""
    if not quantize:
        return df.select(
            *keep, _cosine(F.col(vec_a), F.col(vec_b), None).alias("cosine")
        )
    import numpy as np
    import pandas as pd

    fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep
    )

    def _qm(col):
        return _half_up(_vecmat(col), quantize)

    def gen(batches):
        for pdf in batches:
            out = pdf[list(keep)].copy()
            if not len(pdf):
                out["cosine"] = pd.Series(dtype="float64")
                yield out
                continue
            a, b = _qm(pdf[vec_a]), _qm(pdf[vec_b])
            dots = np.einsum("ij,ij->i", a, b)
            na = np.sqrt(np.einsum("ij,ij->i", a, a))
            nb = np.sqrt(np.einsum("ij,ij->i", b, b))
            with np.errstate(divide="ignore", invalid="ignore"):
                out["cosine"] = dots / (na * nb)
            yield out

    return df.mapInPandas(gen, schema=f"{fields}, cosine double")


def _half_up(m, quantize: int):
    """Scale and HALF_UP-round to int-valued float64 — matches Spark's
    F.round(double, 0) semantics (np.round would banker's-round ties the
    other way). EVERY numpy kernel that claims value-identity with the
    `_cosine(..., quantize)` expression must round through this one
    helper — a divergent copy silently breaks the oracle guarantees."""
    import numpy as np

    m = np.asarray(m, dtype=np.float64) * quantize
    return np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5))


def _vecmat(col) -> "object":
    """pandas Series of Arrow list cells -> (n, dim) float64 matrix.
    Cells arrive as numpy arrays from Arrow — np.stack avoids the
    per-element Python list conversion (the measured bottleneck on
    multi-million-row scoring batches)."""
    import numpy as np

    try:
        return np.stack(col.to_numpy()).astype(np.float64)
    except ValueError:  # ragged / object cells — slow path
        return np.array(list(map(list, col)), dtype=np.float64)


def _ivf_score_frame(
    c_assigned: DataFrame,
    q_rows: list,
    quantize: int,
    id_type: str,
    qid_type: str,
) -> DataFrame:
    """Score every assigned corpus row against the queries probing its
    list, WITHOUT materializing per-pair vectors: the per-list query
    matrices (bounded — a query batch is small by construction, the
    same contract as topk_bruteforce) ride into the kernel as a plain
    dict; corpus vectors cross Arrow exactly once and each batch-group
    is one BLAS matmul. Replaces a candidate join whose per-pair vector
    transfer dominated (measured 47s -> ~4s on 6.3M candidate pairs).

    `q_rows`: collected (query_id, _qv, _cids array) rows. Quantized
    cosine values are identical to `_cosine(...)` (exact ints + same
    IEEE finish)."""
    import numpy as np
    import pandas as pd

    qmap: dict[int, list] = {}
    for r in q_rows:
        for cid in r["_cids"]:
            qmap.setdefault(int(cid), []).append(r)
    packed = {}
    for cid, rows in qmap.items():
        qm = _half_up([list(r["_qv"]) for r in rows], quantize)
        packed[cid] = (
            np.asarray([r["query_id"] for r in rows]),
            qm,
            np.sqrt((qm * qm).sum(axis=1)),
        )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {"query_id": pd.Series(dtype="object"),
                     "corpus_id": pdf["corpus_id"],
                     "cosine": pd.Series(dtype="float64")}
                )
                continue
            v = _half_up(_vecmat(pdf["_cv"]), quantize)
            vnorm = np.sqrt((v * v).sum(axis=1))
            ids = pdf["corpus_id"].to_numpy()
            cids = pdf["_cid"].to_numpy()
            outs = []
            for cid in np.unique(cids):
                hit = packed.get(int(cid))
                if hit is None:
                    continue
                qids, qm, qnorm = hit
                idx = np.nonzero(cids == cid)[0]
                dots = v[idx] @ qm.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (vnorm[idx, None] * qnorm[None, :])
                outs.append(pd.DataFrame({
                    "query_id": np.tile(qids, len(idx)),
                    "corpus_id": np.repeat(ids[idx], len(qids)),
                    "cosine": cos.ravel(),
                }))
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({"query_id": [], "corpus_id": [],
                                   "cosine": pd.Series(dtype="float64")})
            )

    return c_assigned.mapInPandas(
        gen,
        schema=f"query_id {qid_type}, corpus_id {id_type}, cosine double",
    )


def _ivf_assign_frame(
    df: DataFrame,
    id_name: str,
    vec_name: str,
    cents,
    quantize: int,
    n: int,
) -> DataFrame:
    """(id, vec, _cids: array<int>) — each row's top-`n` centroids by
    quantized cosine, ties broken by ascending centroid id. Arrow-batched
    numpy: one matmul per batch against the (C x dim) centroid matrix.

    Value-identical to the `_cosine(vec, cent, quantize)` expr ranking:
    quantized dots/norms are exact integer arithmetic in float64 (< 2^53),
    and the final dot/(sqrt*sqrt) runs the same IEEE ops; NaN (zero
    vector) sorts last in both np.argsort and array_sort-on-negated
    struct. Replaces a per-row interpreted expression that re-quantized
    the vector and recomputed its norm once PER CENTROID (measured 4.1s
    -> 0.4s warm on 2k rows x 16 centroids, identical assignment)."""
    import numpy as np
    import pandas as pd

    cm = _half_up(cents, quantize)
    cent_norm = np.sqrt((cm * cm).sum(axis=1))
    id_type = df.schema[id_name].dataType.simpleString()
    vec_type = df.schema[vec_name].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {id_name: pdf[id_name], vec_name: pdf[vec_name],
                     "_cids": []}
                )
                continue
            vq = _half_up(_vecmat(pdf[vec_name]), quantize)
            vnorm = np.sqrt((vq * vq).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (vq @ cm.T) / (vnorm[:, None] * cent_norm[None, :])
            order = np.argsort(-cos, axis=1, kind="stable")[:, :n]
            yield pd.DataFrame(
                {id_name: pdf[id_name], vec_name: pdf[vec_name],
                 "_cids": [row.astype("int32") for row in order]}
            )

    return df.select(id_name, vec_name).mapInPandas(
        gen, schema=f"{id_name} {id_type}, {vec_name} {vec_type}, _cids array<int>"
    )


@operator("similarity.topk_ivf")
def topk_ivf(spark: SparkSession, inputs, config, context) -> DataFrame:
    """IVF coarse quantization. Centroids come from either a deterministic
    hash-sample of the corpus (default: one-pass, seed-stable) or a real
    k-means (`kmeans=True`: Lloyd's iterations on a seeded corpus sample,
    numpy on the driver — centroid count x dim is tiny; better-balanced
    lists => better recall at the same nprobe). Corpus rows index to their
    nearest centroid; queries scan only the `nprobe` nearest lists.

    The assignment join shuffles on centroid_id — at 100 TB, write the
    assigned corpus partitioned by centroid_id once and amortize across
    query batches."""
    from ssis_to_pyspark_agent_spark.operators.dedup import _spread

    corpus, queries = inputs[0], inputs[1]
    qid = config.get("query_id_col", "query_id")
    qv = config.get("query_vec_col", config["vec_col"])
    n_cent = config.get("centroids", 16)
    nprobe = config.get("nprobe", 4)

    c = _spread(spark, corpus).select(
        F.col(config["id_col"]).alias("corpus_id"), F.col(config["vec_col"]).alias("_cv")
    )
    if config.get("kmeans"):
        cent_rows = _kmeans_centroids(
            c, n_cent,
            sample_n=config.get("kmeans_sample", 10_000),
            iters=config.get("kmeans_iters", 10),
            seed=config.get("seed", 42),
        )
    else:
        # deterministic sample of n_cent rows as centroids. Order key:
        # xxhash64 (default) or md5 hex string (engine-neutral — the same
        # ORDER BY md5(CAST(id AS VARCHAR)) works in any SQL oracle).
        if config.get("centroid_order") == "md5":
            key = F.md5(F.col("corpus_id").cast("string"))
        else:
            key = F.xxhash64(F.col("corpus_id").cast("string"))
        cent = (
            c.orderBy(key)
            .limit(n_cent)
            .select(F.col("_cv").alias("_centv"))
        )
        cent_rows = cent.collect()  # n_cent rows of dim floats: driver-safe
    quantize = config.get("quantize")
    q_named = queries.select(
        F.col(qid).alias("query_id"), F.col(qv).alias("_qv")
    )
    if quantize and config.get("assign_impl", "numpy") == "numpy":
        cents = [list(r["_centv"]) for r in cent_rows]
        c_assigned = _ivf_assign_frame(
            c, "corpus_id", "_cv", cents, quantize, 1
        ).withColumn("_cid", F.col("_cids")[0]).drop("_cids")
        # the query batch is bounded by construction (same contract as
        # topk_bruteforce): collect its probe lists and score corpus
        # lists against per-list query matrices in one kernel — no
        # per-pair vector join at all
        q_rows = _ivf_assign_frame(
            q_named, "query_id", "_qv", cents, quantize, nprobe
        ).collect()
        scored = _ivf_score_frame(
            c_assigned, q_rows, quantize,
            id_type=c_assigned.schema["corpus_id"].dataType.simpleString(),
            qid_type=q_named.schema["query_id"].dataType.simpleString(),
        )
        return _topk(scored, "query_id", config.get("k", 10)).select(
            "query_id", "corpus_id", "cosine", "rank"
        )
    else:
        cent_arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("cid"),
                    F.array(*[F.lit(float(x)) for x in r["_centv"]]).alias("v"),
                )
                for i, r in enumerate(cent_rows)
            ]
        )

        def nearest(vec: Column, n: int) -> Column:
            # quantized cosine here too: list assignment must be
            # reproducible by the oracle, not just the final re-rank
            scored = F.transform(
                cent_arr,
                lambda s: F.struct(
                    (-_cosine(vec, s["v"], quantize)).alias("neg"),
                    s["cid"].alias("cid"),
                ),
            )
            return F.slice(F.array_sort(scored), 1, n)

        c_assigned = c.withColumn("_cid", nearest(F.col("_cv"), 1)[0]["cid"])
        q = q_named.select(
            "query_id",
            "_qv",
            F.explode(
                F.transform(nearest(F.col("_qv"), nprobe), lambda s: s["cid"])
            ).alias("_cid"),
        )
    scored = _pair_cosine_frame(
        c_assigned.join(F.broadcast(q), "_cid")
        .select("query_id", "corpus_id", "_cv", "_qv")
        .dropDuplicates(["query_id", "corpus_id"]),
        "_cv", "_qv", ["query_id", "corpus_id"], quantize,
    )
    return _topk(scored, "query_id", config.get("k", 10)).select(
        "query_id", "corpus_id", "cosine", "rank"
    )
