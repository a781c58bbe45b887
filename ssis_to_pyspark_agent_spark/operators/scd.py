"""Set-based mutation: merge upsert/delete, SCD Type-1/Type-2 (SURVEY §2.9,
§2.5 OLE DB Command).

The reference handles per-row UPDATE/DELETE via OLE DB Command — literally
one parameterized statement per row (parse data_engineering_parser.py:
878-917, codegen enhanced_json_mapper.py:2849-2973) — and SCD only as a
recognized type (:1228-1232). The Medium fixture implements SCD-ish change
detection manually: checksum compare -> INSERT/UPDATE/DELETE/NO-CHANGE
routing into stored procs (Sample_Medium_Package.dtsx:536-605).

Our engine is strictly set-based (SURVEY §4: "Never per-row"): MERGE
semantics expressed as join + union over DataFrames. On Delta/Iceberg these
become native ``MERGE INTO`` (jars not in this image — the DataFrame
emulation is the portable core and returns the post-merge table for the
caller/sink to write).

Scale: one shuffle on the merge keys; updates side is usually << target, so
broadcast it when small (AQE handles this); the anti-join half reuses the
same exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator


def _key_cond(keys: list[str]) -> Column:
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}"))
        cond = c if cond is None else cond & c
    return cond


@operator("merge_upsert")
def merge_upsert(spark: SparkSession, inputs, config, context) -> DataFrame:
    """UPSERT: rows in `updates` replace matched rows in `target` (Type-1
    overwrite), unmatched update rows insert. Replaces the fixture's
    ``EXEC sp_GenericUpdate`` per-row command (dtsx:640).

    inputs: [target, updates]
    config: keys, when_matched (optional SQL condition on t./u. — e.g.
    'u.checksum != t.checksum'); columns updated = all shared columns.
    broadcast_delta (default False): AQE already converts these joins to
    broadcast at runtime from TRUE post-shuffle sizes, and the explicit
    hint inserts a serial driver-side broadcast barrier (measured ~0.7s
    slower for q50 at sf0.1, same plan quality). Set True on a real
    cluster when the target is huge and you want to skip even its
    shuffle-map write — the one case where the static hint beats AQE.
    """
    target, updates = inputs[0], inputs[1]
    keys = config["keys"]
    updates = updates.dropDuplicates(keys)  # one update per key, like MERGE requires
    if config.get("broadcast_delta", False):
        updates = F.broadcast(updates)

    t, u = target.alias("t"), updates.alias("u")
    cond = _key_cond(keys)
    if wm := config.get("when_matched"):
        # ONE probe of the target resolves, per update key, existence and
        # the matched-row condition; it is bounded by |updates| and
        # persisted, so every join below is small-vs-small or probes the
        # target with a broadcast build. The naive formulation (updates
        # SEMI target / updates ANTI target) puts the TARGET on the build
        # side, which at scale means shuffling the whole dimension twice —
        # measured 11.7s -> 6.8s on a 20M-row dim, zero SortMergeJoins in
        # the final AQE plan (tools/scale_probe.py cdc).
        hits = (
            t.join(u, cond, "inner")
            .select(*[F.col(f"t.{k}") for k in keys], F.expr(wm).alias("_upd"))
            .persist()
        )
        matched_keys = hits.filter("_upd").drop("_upd")
        # matched-but-condition-false rows keep the target version
        kept = target.join(matched_keys, keys, "left_anti")
        replaced = updates.join(matched_keys, keys, "left_semi").select(
            *target.columns
        )
        inserted = updates.join(hits.drop("_upd"), keys, "left_anti").select(
            *target.columns
        )
        return kept.unionByName(replaced).unionByName(inserted)
    kept = target.join(updates, keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


@operator("merge_delete")
def merge_delete(spark: SparkSession, inputs, config, context) -> DataFrame:
    """DELETE matching keys (the fixture's ``EXEC sp_GenericHardDelete``,
    dtsx:720): anti-join rewrite. `soft`: set flag column instead of
    removing (the fixture's DeletedFlag pattern)."""
    target, deletes = inputs[0], inputs[1]
    keys = config["keys"]
    del_keys = deletes.select(*keys).distinct()
    if config.get("broadcast_delta", False):  # see merge_upsert docstring
        del_keys = F.broadcast(del_keys)
    if flag := config.get("soft"):
        marked = target.join(del_keys, keys, "left_semi")
        kept = target.join(del_keys, keys, "left_anti")
        return kept.unionByName(marked.withColumn(flag, F.lit(1)))
    return target.join(del_keys, keys, "left_anti")


@operator("scd2")
def scd2(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Slowly Changing Dimension Type-2 (reference parse :1228-1232 only).

    inputs: [dimension, updates]
    config:
      keys: business keys (BusinessKey)
      tracked: changing attributes (change detection = any tracked col
               differs, null-safe)
      from_col/to_col/current_col: effective-dating columns
               (defaults effective_from / effective_to / is_current)
      as_of: literal timestamp string for the new version boundary
             (defaults current_timestamp — pass a literal for deterministic
             tests/oracles)

    Semantics: for each changed key, close out the current row
    (effective_to = as_of, is_current = false) and insert the new version;
    brand-new keys insert as current. Unchanged rows pass through.
    """
    dim, upd = inputs[0], inputs[1]
    keys = config["keys"]
    tracked = config["tracked"]
    f_from = config.get("from_col", "effective_from")
    f_to = config.get("to_col", "effective_to")
    f_cur = config.get("current_col", "is_current")
    as_of = (
        F.to_timestamp(F.lit(config["as_of"]))
        if config.get("as_of")
        else F.current_timestamp()
    )
    upd = upd.dropDuplicates(keys)
    if config.get("broadcast_delta", False):  # see merge_upsert docstring
        upd = F.broadcast(upd)

    cur = dim.filter(F.col(f_cur))
    hist = dim.filter(~F.col(f_cur))

    changed_cond = None
    for c in tracked:
        d = ~F.col(f"t.{c}").eqNullSafe(F.col(f"u.{c}"))
        changed_cond = d if changed_cond is None else changed_cond | d

    t, u = cur.alias("t"), upd.alias("u")
    join_cond = _key_cond(keys)

    # ONE probe of the current dimension resolves, per update key,
    # existence and whether any tracked attribute changed; bounded by
    # |upd| and persisted. Keeps the dimension strictly on the probe side
    # everywhere (the naive `upd ANTI cur` for brand-new keys builds a
    # hash table from the whole dimension — a full shuffle at scale;
    # measured 11.4s -> 6.9s on a 20M-row dim, tools/scale_probe.py cdc).
    hits = (
        t.join(u, join_cond, "inner")
        .select(
            *[F.col(f"t.{k}") for k in keys],
            changed_cond.alias("_chg"),
        )
        .persist()
    )
    # keys whose current version differs from the incoming row
    changed_keys = hits.filter("_chg").drop("_chg")
    if config.get("broadcast_delta", False):
        # bounded by |upd| — broadcast so the three consumers below probe
        # the dimension without shuffling it
        changed_keys = F.broadcast(changed_keys)
    # close-out: current rows for changed keys get end-dated
    closed = (
        cur.join(changed_keys, keys, "left_semi")
        .withColumn(f_to, as_of)
        .withColumn(f_cur, F.lit(False))
    )
    unchanged_cur = cur.join(changed_keys, keys, "left_anti")

    # new versions: updates for changed keys + brand-new keys
    new_for_changed = upd.join(changed_keys, keys, "left_semi")
    brand_new = upd.join(hits.drop("_chg"), keys, "left_anti")
    inserts = (
        new_for_changed.unionByName(brand_new)
        .withColumn(f_from, as_of)
        .withColumn(f_to, F.lit(None).cast("timestamp"))
        .withColumn(f_cur, F.lit(True))
        .select(*dim.columns)
    )
    return hist.unionByName(unchanged_cur).unionByName(closed).unionByName(inserts)


@operator("scd1")
def scd1(spark: SparkSession, inputs, config, context) -> DataFrame:
    """SCD Type-1 = overwrite-in-place = merge_upsert with change detection
    on tracked columns (avoids rewriting unchanged rows)."""
    tracked = config.get("tracked")
    cfg = dict(config)
    if tracked and "when_matched" not in cfg:
        cfg["when_matched"] = " OR ".join(
            f"NOT (u.{c} <=> t.{c})" for c in tracked
        )
    return merge_upsert(spark, inputs, cfg, context)
