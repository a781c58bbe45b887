"""Streaming pipeline pieces (SURVEY §2.10, build-plan phase 7).

The reference has no streaming concept at all (grep for watermark/stream
yields nothing — SURVEY §1.1). These helpers give the engine a Structured
Streaming variant of the batch operators: readStream sources, watermarked
tumbling/sliding/session windows, dedup-within-watermark, and a
memory-sink test harness (`processAllAvailable` drives a bounded parquet
directory through the streaming engine synchronously — the recommended
local smoke pattern).

The batch/stream operator split is intentionally thin: a streaming query
is the same DataFrame expression over an unbounded source, so every
stateless operator in the registry (derived_column, filter, lookup against
a static dim, union) works unchanged on a streaming DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators.agg import build_aggs
from ssis_to_pyspark_agent_spark.operators.sources_sinks import normalize_event_time


def stream_events(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    max_files_per_trigger: int = 1,
    nanos_ts_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """readStream over a parquet directory (file source: the bounded-input
    test stand-in for kafka). Handles TIMESTAMP(NANOS) parquet columns the
    same way as the batch source (long nanos -> micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema  # one cheap footer read
    r = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    import os

    if path.endswith(".parquet") and "/" in path and not os.path.isdir(path):
        # FileStreamSource needs a directory; point at the parent and
        # glob-filter to the single file. A DIRECTORY named *.parquet
        # (a normal multi-part dataset) must NOT take this branch — the
        # glob would match zero part files and the stream silently
        # produces nothing.
        base, _, fname = path.rpartition("/")
        r = r.option("pathGlobFilter", fname)
        path = base
    df = r.parquet(path)
    # dtype-branching normalization (bigint nanos / TIMESTAMP_NTZ / TIMESTAMP):
    # withWatermark requires a true TIMESTAMP column, so NTZ must be converted.
    return normalize_event_time(df, [c for c in nanos_ts_cols if c in df.columns])


def windowed_agg(
    events: DataFrame,
    ts_col: str,
    window: str,
    aggs: dict,
    keys: list[str] | None = None,
    slide: str | None = None,
    watermark: str = "10 minutes",
    session_gap: str | None = None,
) -> DataFrame:
    """Watermarked windowed aggregation: tumbling (default), sliding
    (`slide`), or session (`session_gap`) windows."""
    e = events.withWatermark(ts_col, watermark)
    if session_gap:
        win = F.session_window(F.col(ts_col), session_gap)
    elif slide:
        win = F.window(F.col(ts_col), window, slide)
    else:
        win = F.window(F.col(ts_col), window)
    g = e.groupBy(win, *(keys or []))
    out = g.agg(*build_aggs(aggs))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact-dedup with bounded state."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    watermark: str = "10 minutes",
    time_bound: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream join: equality on `keys` plus the
    event-time range `left_ts <= right_ts <= left_ts + time_bound`.

    Both sides buffer join state; the watermark + time-range condition is
    what lets Spark EVICT that state (without it, state grows without
    bound — Spark requires the range condition for append-mode
    stream-stream joins precisely because it bounds the buffer to
    watermark + time_bound per key). Outer variants emit the unmatched
    side only once the watermark passes the bound.

    Column-name hygiene: rename overlapping non-key columns on one side
    before this step — the join keeps both sides' columns.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    rng = (rt >= lt) & (rt <= lt + F.expr(f"INTERVAL {time_bound}"))
    cond = rng if cond is None else cond & rng
    joined = lw.join(rw, cond, how)
    # drop the duplicated key columns from the right side
    return joined.drop(*[F.col(f"r.{k}") for k in keys])


class _state_partitions:
    """Scope `spark.sql.shuffle.partitions` around a streaming-query
    START. Stateful streaming operators allocate one state store per
    shuffle partition per stateful op PER MICRO-BATCH (a stream-stream
    join keeps FOUR stores per partition), and each store pays fixed
    WAL/commit/maintenance overhead every batch regardless of rows — at
    the cluster default of 32+ partitions a 59-row join spends its whole
    wall time on store bookkeeping (measured 16.4s -> 2.9s at 4
    partitions, identical output). Size to expected KEYS PER WATERMARK
    WINDOW, not to the batch-side cluster default; the setting is
    captured into the query's checkpoint at first start, so it is also
    the one knob that CANNOT be changed later without a new checkpoint.
    Restoring after start is safe — StreamExecution clones the session
    conf when the query starts. ONLY ``.start()`` belongs inside the
    scope: holding it across the synchronous drain would leak the
    override to every batch job another thread plans meanwhile."""

    def __init__(self, spark: SparkSession, n):
        self.spark, self.n, self.old = spark, n, None

    def __enter__(self):
        if self.n is not None:
            self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set(
                "spark.sql.shuffle.partitions", str(int(self.n)))

    def __exit__(self, *exc):
        if self.old is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


#: 'auto' sizing constant — the K x P sweep (PLANS.md round-9) measured
#: state-store cost ~linear in P (~25-40 ms WAL/commit per store per
#: micro-batch) with the more-partitions crossover NOT reached even at
#: 200k live keys on local[32]: a partition comfortably holds ~1M keys
#: of small per-key state before memory pressure argues for more.
_KEYS_PER_STATE_PARTITION = 1_000_000


def resolve_state_partitions(config: dict):
    """Resolve a sink's ``state_partitions`` config: an int passes
    through, ``'auto'`` applies the sweep-pinned rule
    ``max(ceil(expected_live_keys / ~1M), min_parallelism)`` — size to
    live keys per watermark horizon, never to cluster width. 'auto'
    REQUIRES ``expected_live_keys`` (explicit beats guessing: the
    engine cannot know the key cardinality of an unbounded source);
    ``min_parallelism`` (default 1) floors at the cores a batch's CPU
    actually needs."""
    n = config.get("state_partitions")
    if n != "auto":
        # validate HERE, with the config key named — deferring to the
        # int() inside _state_partitions raises a bare "invalid literal"
        # at query-start time, far from the config mistake ('Auto', 2.7,
        # ... — round-10 self-review). bool is an int subclass; reject.
        if n is None:
            return None
        if isinstance(n, bool) or not isinstance(n, int):
            raise ValueError(
                f"state_partitions must be an int or 'auto', got {n!r}"
            )
        if n < 1:
            raise ValueError(
                f"state_partitions must be >= 1, got {n}"
            )
        return n
    keys = config.get("expected_live_keys")
    if keys is None:
        raise ValueError(
            "state_partitions='auto' requires expected_live_keys (the "
            "key cardinality per watermark horizon) — pass an integer "
            "state_partitions to size by hand"
        )
    keys = int(keys)
    if keys < 0:
        raise ValueError(f"expected_live_keys must be >= 0, got {keys}")
    floor = int(config.get("min_parallelism", 1))
    if floor < 1:
        raise ValueError(f"min_parallelism must be >= 1, got {floor}")
    return max(-(-keys // _KEYS_PER_STATE_PARTITION), floor)


def run_stream_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> None:
    """Drive a (bounded-source) streaming DataFrame to completion into an
    in-memory table `name` — synchronous, for tests/smoke.
    ``state_partitions`` scopes the stateful shuffle-partition count
    around ``.start()`` ONLY (see _state_partitions) — the drain runs
    with the session conf restored."""
    with _state_partitions(df.sparkSession, state_partitions):
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stateful_counter(
    events: DataFrame,
    keys: list[str],
    out_col: str = "n",
) -> DataFrame:
    """Custom stateful streaming operator (the Script-Component-with-state
    analogue): a running per-key event counter via
    ``applyInPandasWithState``. Each micro-batch updates the persisted
    per-key state and emits the new running total, so in update mode the
    sink sees a monotone series per key whose MAX is the final count —
    equal to the batch ``groupBy(keys).count()`` on a bounded replay
    regardless of part-file arrival order.

    State is one bigint per key; NoTimeout because the bounded-replay
    contract wants every key's final total (real deployments would use
    event-time timeout to shed idle keys)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_schema = ", ".join(
        f"{k} {events.schema[k].dataType.simpleString()}" for k in keys
    )

    def count_events(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame(
            {**{k: [key[i]] for i, k in enumerate(keys)}, out_col: [total]}
        )

    return events.groupBy(*keys).applyInPandasWithState(
        count_events,
        outputStructType=f"{key_schema}, {out_col} bigint",
        stateStructType=f"{out_col} bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
