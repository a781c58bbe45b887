"""Join operators (SURVEY §2.5): Lookup, Merge Join, semi/anti, fuzzy lookup.

Scale positions:
- Lookup reference sets are dimension-sized -> explicit ``F.broadcast`` on
  FULL cache (SSIS CacheType=0), matching the reference's Databricks
  template which relies on implicit broadcast
  (enhanced_json_mapper.py:1845-1934). PARTIAL cache = restrict the
  reference to the input's distinct probe keys (broadcast semi-join),
  then broadcast — the set-based analogue of SSIS's probe-driven LRU
  cache; row-at-a-time probing itself would be a disaster. NONE cache =
  plain shuffle join; AQE still picks broadcast under threshold.
- Merge Join requires *pre-sorted* inputs in SSIS; Spark's sort-merge join
  sorts shuffle partitions itself, so sortedness metadata (IsSorted /
  SortKeyPosition, Sample_Medium_Package.dtsx:93-96) is a no-op here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator

_JOIN_TYPES = {0: "inner", 1: "left", 2: "full"}


def _apply_select(df: DataFrame, sel) -> DataFrame:
    if sel is None:
        return df
    if isinstance(sel, dict):
        return df.select(*[F.col(s).alias(o) for o, s in sel.items()])
    return df.select(*sel)


@operator("lookup")
def lookup(spark: SparkSession, inputs, config, context):
    """SSIS Lookup (reference parse data_engineering_parser.py:919-994,
    codegen enhanced_json_mapper.py:1845-1934).

    config:
      keys: {input_col: reference_col} equi-join mapping
            (JoinToReferenceColumn)
      copy: {out_name: reference_col} columns copied on match
            (CopyFromReferenceColumn; alias-on-collision as the reference
            does at :1908-1917)
      no_match: 'fail' (CacheType NoMatchBehavior 0 -> inner join) |
                'ignore' (1 -> left join) | 'redirect' (separate no-match
                port, like SSIS error output)
      cache: 'full' (default; broadcast reference) | 'partial' (reference
             semi-joined down to the input's distinct probe keys, then
             broadcast) | 'none' (shuffle join)
      split_match: True -> return {'match':…, 'nomatch':…} ports
    """
    left, ref = inputs[0], inputs[1]
    keys: dict[str, str] = config["keys"]
    copy: dict[str, str] = config.get("copy", {})
    no_match = config.get("no_match", "ignore")
    how = "inner" if no_match == "fail" else "left"

    # Project the reference to keys + copied columns only (column pruning on
    # the broadcast side) and dedupe join keys: SSIS lookup returns ONE match
    # per input row (first); we keep an arbitrary-but-deterministic one.
    ref_cols = list(dict.fromkeys(list(keys.values()) + list(copy.values())))
    ref_proj = ref.select(*ref_cols).dropDuplicates(list(keys.values()))
    ref_proj = ref_proj.select(
        *[F.col(c).alias(f"__ref_{c}") for c in ref_proj.columns]
    )
    cache = config.get("cache", "full")
    if cache == "full":
        ref_proj = F.broadcast(ref_proj)
    elif cache == "partial":
        # SSIS partial cache = only keys the input actually probes get
        # cached. Set-based translation: restrict the reference to the
        # input's distinct key set (broadcast semi-join — the key set is
        # small whenever a partial cache would have been effective), then
        # broadcast the now-small reference into the main join. Big
        # reference + selective input never shuffles the reference; if the
        # key set is genuinely huge, use cache='none' (plain shuffle join).
        probe_keys = left.select(
            *[left[l].alias(f"__ref_{r}") for l, r in keys.items()]
        ).dropDuplicates()
        ref_proj = F.broadcast(
            ref_proj.join(
                F.broadcast(probe_keys), list(probe_keys.columns), "left_semi"
            )
        )

    cond: Column | None = None
    for lcol, rcol in keys.items():
        c = left[lcol] == F.col(f"__ref_{rcol}")
        cond = c if cond is None else (cond & c)
    joined = left.join(ref_proj, cond, how)

    match_flag = F.col(f"__ref_{next(iter(keys.values()))}").isNotNull()
    out_cols = [left[c] for c in left.columns] + [
        F.col(f"__ref_{src}").alias(out) for out, src in copy.items()
    ]
    if config.get("split_match") or no_match == "redirect":
        return {
            "match": joined.filter(match_flag).select(*out_cols),
            "nomatch": joined.filter(~match_flag).select(*[left[c] for c in left.columns]),
        }
    return joined.select(*out_cols)


@operator("join")
def join(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Merge Join (reference parse :731-810, codegen :2975-3082) generalized.

    config:
      how: inner|left|right|full|left_semi|left_anti|cross (SSIS JoinType
           0/1/2 ints accepted; semi/anti are our extension — the reference
           only mentions anti-join in a comment, enhanced_json_mapper.py:291)
      keys: [(left_col, right_col), ...] or [name, ...] for same-name keys
      null_safe: TreatNullsAsEqual (parser :808; fixture dtsx:399) -> eqNullSafe
      select_left / select_right: per-side output column selection/rename
           (the fixture's CountryID_NEW vs CountryID_OLD, dtsx:426-484)
      condition: extra non-equi SQL condition (our extension: theta joins)
      broadcast: 'left'|'right' hint
    """
    left, right = inputs[0], inputs[1]
    how = config.get("how", "inner")
    if isinstance(how, int):
        how = _JOIN_TYPES[how]

    if config.get("broadcast") == "left":
        left = F.broadcast(left)
    if config.get("broadcast") == "right":
        right = F.broadcast(right)

    if salt := config.get("skew_salt"):
        # Manual skew mitigation for when AQE's skew-join can't kick in
        # (e.g. the skewed key feeds a non-sort-merge plan): the big left
        # side gets a random salt in [0, N); the right side is replicated N
        # times. The hot key's rows then spread over N reducers. Inner/left
        # only (salting a full join would duplicate unmatched right rows).
        if how not in ("inner", "left", "left_semi", "left_anti"):
            raise ValueError("skew_salt supports inner/left/semi/anti joins")
        left = left.withColumn(
            "_salt", (F.rand(config.get("seed", 42)) * salt).cast("int")
        )
        right = right.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        config = dict(config)
        config["keys"] = list(config.get("keys", [])) + [("_salt", "_salt")]

    la, ra = left.alias("l"), right.alias("r")
    cond: Column | None = None
    for k in config.get("keys", []):
        lk, rk = (k, k) if isinstance(k, str) else k
        c = (
            F.col(f"l.{lk}").eqNullSafe(F.col(f"r.{rk}"))
            if config.get("null_safe")
            else F.col(f"l.{lk}") == F.col(f"r.{rk}")
        )
        cond = c if cond is None else (cond & c)
    if extra := config.get("condition"):
        ec = F.expr(extra)
        cond = ec if cond is None else (cond & ec)

    joined = la.join(ra, cond, how) if cond is not None else la.crossJoin(ra)
    if salt:
        joined = joined.drop("_salt")

    if how in ("left_semi", "left_anti"):
        return _apply_select(joined, config.get("select_left"))

    sel_l = config.get("select_left")
    sel_r = config.get("select_right")
    if sel_l is None and sel_r is None:
        return joined
    cols: list[Column] = []
    for sel, side in ((sel_l, "l"), (sel_r, "r")):
        if sel is None:
            continue
        if isinstance(sel, dict):
            cols += [F.col(f"{side}.{s}").alias(o) for o, s in sel.items()]
        else:
            cols += [F.col(f"{side}.{c}") for c in sel]
    return joined.select(*cols)


@operator("fuzzy_lookup")
def fuzzy_lookup(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Fuzzy Lookup (reference :1113, 1204-1207: MinSimilarity,
    MaxOutputMatchesPerInput — mapper has only a generic fallback).

    Implemented as a similarity join on normalized strings:
    method='levenshtein' (small ref side: broadcast + threshold filter) or
    method='ngram_jaccard' (scale path: token 3-gram inverted-index join —
    only candidate pairs sharing a shingle are compared; no cross join).

    config: left_on, right_on, min_similarity (0..1), max_matches (top-k),
            copy: {out: ref_col}
    """
    left, ref = inputs[0], inputs[1]
    lcol, rcol = config["left_on"], config["right_on"]
    min_sim = float(config.get("min_similarity", 0.8))
    max_matches = int(config.get("max_matches", 1))
    copy = config.get("copy", {})
    method = config.get("method", "levenshtein")

    ln = F.lower(F.trim(F.col(lcol)))
    rn = F.lower(F.trim(F.col(rcol)))

    if method == "levenshtein":
        la = left.withColumn("__lnorm", ln).alias("l")
        ra = F.broadcast(
            ref.withColumn("__rnorm", rn).alias("r")
        )
        sim = 1 - F.levenshtein(F.col("l.__lnorm"), F.col("r.__rnorm")) / F.greatest(
            F.length("l.__lnorm"), F.length("r.__rnorm")
        )
        joined = la.join(ra, sim >= min_sim, "inner").withColumn("_similarity", sim)
    elif method == "ngram_jaccard":
        from ssis_to_pyspark_agent_spark.operators.dedup import _shingles

        la = left.withColumn("__lnorm", ln).withColumn(
            "__lsh", _shingles(F.col("__lnorm"), 3)
        )
        ra = ref.withColumn("__rnorm", rn).withColumn(
            "__rsh", _shingles(F.col("__rnorm"), 3)
        )
        lex = la.select("*", F.explode("__lsh").alias("__g"))
        rex = ra.select("*", F.explode("__rsh").alias("__g"))
        cand = (
            lex.alias("l")
            .join(rex.alias("r"), "__g")
            .drop("__g")
            .dropDuplicates([lcol, rcol])
        )
        inter = F.size(F.array_intersect(F.col("l.__lsh"), F.col("r.__rsh")))
        union = F.size(F.array_union(F.col("l.__lsh"), F.col("r.__rsh")))
        sim = inter / union
        joined = cand.withColumn("_similarity", sim).filter(
            F.col("_similarity") >= min_sim
        )
    else:
        raise ValueError(f"unknown fuzzy method {method!r}")

    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(f"l.{c}") for c in left.columns]).orderBy(
        F.desc("_similarity"), F.asc(f"r.{rcol}")  # deterministic tie-break
    )
    ranked = joined.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= max_matches
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{src}").alias(out) for out, src in copy.items()
    ] + [F.col("_similarity")]
    return ranked.select(*out_cols)
