"""Structured Streaming over events — the incremental twin of
q19_events_hourly (operators/relational.py).

The reference has no streaming surface (SURVEY.md §2.D), so this is the
engine extension the builder brief calls for: the SAME tumbling-window
aggregation expressed over ``readStream``, with ``withWatermark`` to
bound state and admit late data up to the watermark delay.

Design notes for scale:
- the aggregation is shared with the batch path (``hourly_agg``), so
  batch backfill and streaming tail produce identical schemas/values —
  the classic kappa pattern;
- state is keyed by (window, event_type); the watermark expires windows
  older than ``delay``, so state size is bounded by (#event_types ×
  windows-in-delay), independent of stream length;
- ``F.window`` (not date_trunc) is used in streaming mode because the
  watermark operator needs a true window column for state cleanup; the
  batch path's date_trunc produces the same hour buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# sf_dir -> staging dir for the file-source stream (atexit-cleaned)
_STAGE_DIRS: dict[str, str] = {}


def _bounded_state_partitions(spark: SparkSession):
    """Run a bounded-cardinality streaming aggregation with a SMALL
    state-store partition count.

    The memory-sink runners here aggregate keys whose cardinality is
    bounded by construction (hours×event_types, days×drift_buckets,
    sessions inside the watermark horizon) — yet the state store
    inherits ``spark.sql.shuffle.partitions`` (32 here, thousands on a
    cluster), so every micro-batch pays per-partition state-store
    open/commit/checkpoint I/O for mostly-empty stores. Guide §2.2:
    fewer, larger partitions; the per-epoch fixed cost scales with the
    partition count, not the data. Measured on q147: 2.82 s → 1.64 s
    min (interleaved A/B) at 8 vs 32. Results are identical — only
    state layout changes. Scale note: the right number tracks the
    AGGREGATE's key count, not the cluster size, so a small constant is
    the scale-correct default for these bounded aggregations;
    env-overridable for deployments with wider key spaces.

    Returns a context manager that pins the conf around the stream's
    whole lifecycle (Spark records the shuffle-partition count in the
    query's offset log at start) and restores it after.
    """
    import contextlib
    import os as _os

    @contextlib.contextmanager
    def cm():
        n = _os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    return cm()

def events_stream_schema(path: str) -> T.StructType:
    """Stream-source schema matching the file's actual ``ts`` layout.

    The driver's testdata has shipped both TIMESTAMP(NANOS) (read as a
    nanos long under ``nanosAsLong``, then truncated to micros by
    ``_normalize_ts``) and plain TIMESTAMP(MICROS) (read natively as a
    timestamp, no conversion). A file stream must declare its schema up
    front, so probe the parquet footer once instead of assuming one
    layout — assuming nanos silently shifts every micros timestamp
    1000x toward the epoch.
    """
    import pyarrow.parquet as pa_pq
    import pyarrow.types as pa_t

    ts_arrow = pa_pq.ParquetFile(path).schema_arrow.field("ts").type
    nanos_as_long = pa_t.is_integer(ts_arrow) or (
        pa_t.is_timestamp(ts_arrow) and ts_arrow.unit == "ns"
    )
    ts_type = T.LongType() if nanos_as_long else T.TimestampType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _normalize_ts(df: DataFrame) -> DataFrame:
    """nanos-long → microsecond timestamp, NTZ → UTC timestamp (same
    normalizations as sources/parquet.py:load_table, so batch and
    stream agree)."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # `div` not `/`: double division skews nanos beyond 2^53 by ±1µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # session timezone is UTC, so the cast is value-identical
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def hourly_agg(events: DataFrame, streaming: bool, watermark: str = "2 hours") -> DataFrame:
    """Shared tumbling-window rollup: (hour_start, event_type) →
    count / sum / avg. In streaming mode the watermark bounds state and
    late-data admission."""
    e = _normalize_ts(events)
    if streaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-cents sum/avg — see q19_events_hourly for why the
            # double avg() is a cross-engine round-4 tie hazard
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("__cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            F.round(F.col("__cents") / 100.0, 2).alias("sum_value"),
            (
                F.expr("(__cents * 100 + n_events div 2) div n_events")
                / 10000.0
            ).alias("avg_value"),
        )
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch here; on a real deployment this is a Kafka/file-drop
    directory with the same schema).

    The file source requires a *directory*, and the testdata dir mixes
    all tables — so the events file is linked into a scratch directory,
    the file-drop layout a stream would really use. The staging dir is
    cached per sf_dir and removed at interpreter exit, so repeated
    registry/bench/harness invocations don't leak temp directories.
    """
    import os

    from ..session import ensure_event_time_confs

    ensure_event_time_confs(spark)
    stage = _STAGE_DIRS.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        import atexit
        import shutil
        import tempfile

        from ..session import scratch_dir_base

        stage = tempfile.mkdtemp(
            prefix="events_stream_", dir=scratch_dir_base()
        )
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(stage, "events.parquet"),
        )
        _STAGE_DIRS[sf_dir] = stage
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
    schema = events_stream_schema(os.path.join(stage, "events.parquet"))
    return spark.readStream.schema(schema).format("parquet").load(stage)


def hourly_rollup_stream(spark: SparkSession, sf_dir: str, watermark: str = "2 hours") -> DataFrame:
    """The streaming query: readStream → watermark → tumbling window."""
    return hourly_agg(read_events_stream(spark, sf_dir), streaming=True, watermark=watermark)


def run_to_memory_sink(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "events_hourly_stream",
    timeout_s: int = 120,
) -> DataFrame:
    """Execute the streaming rollup into an in-memory sink until the
    source is exhausted (complete mode: windows re-emit as they close);
    returns the sink contents as a DataFrame. Test/demo harness — a real
    deployment writes append-mode to a table/queue."""
    with _bounded_state_partitions(spark):
        q = (
            hourly_rollup_stream(spark, sf_dir)
            .writeStream.format("memory")
            .queryName(table_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
    return spark.table(table_name)


def session_agg(
    events: DataFrame,
    streaming: bool,
    gap_seconds: int = 1800,
    watermark: str = "4 hours",
) -> DataFrame:
    """Shared gap-sessionization: the SAME ``session_window`` plan runs
    in batch (q55) and under Structured Streaming — sessions merge as
    events arrive and the watermark expires state for sessions whose
    close time has passed, so state is bounded by (keys active inside
    the watermark horizon), independent of stream length."""
    e = _normalize_ts(events)
    if streaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(
            "user_id",
            F.session_window("ts", f"{int(gap_seconds)} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_events",
            "sum_value",
        )
    )


def sessions_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "events_sessions_stream",
    timeout_s: int = 120,
) -> DataFrame:
    """Run the streaming sessionization to a memory sink until the file
    source drains. Session-window aggregation admits append/complete
    sinks only; complete mode re-emits the merged session set each
    micro-batch, so after the source drains the sink holds exactly the
    batch q55 result (the parity test asserts equality)."""
    with _bounded_state_partitions(spark):
        q = (
            session_agg(read_events_stream(spark, sf_dir), streaming=True)
            .writeStream.format("memory")
            .queryName(table_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
    return spark.table(table_name)


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once-per-id dedup: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` on ``event_id`` — the ingestion
    guard an at-least-once source (Kafka redelivery, file re-drops)
    needs. State holds one key per event_id seen inside the watermark
    horizon and is expired past it, so memory is bounded by arrival
    rate × delay, independent of stream length. Batch twin:
    ``dropDuplicates(["event_id"])`` — the parity test replays a
    doubled stream and asserts the sink equals the batch distinct."""
    return _normalize_ts(events).withWatermark(
        "ts", watermark
    ).dropDuplicatesWithinWatermark(["event_id"])


def q38_events_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: run the watermarked streaming rollup to a memory
    sink and return the materialized result — hash-checked against the
    SAME DuckDB oracle as batch q19 (kappa parity is the correctness
    contract, not a weaker rows-only check)."""
    out = run_to_memory_sink(spark, sf_dir, table_name="q38_sink")
    return out.orderBy("hour_start", "event_type")


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay_seconds: int = 3600,
    streaming: bool = True,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INTERVAL join: each purchase pairs with every click
    by the same user in the preceding ``max_delay_seconds`` (attribution
    join). The SAME plan runs in batch — the kappa parity contract the
    other streaming ops here follow.

    Why this shape bounds state: both inputs carry a watermark AND the
    join condition constrains the two event times to a finite interval,
    so Spark derives a state-eviction bound for each side (a click
    older than watermark + delay can never match a future purchase and
    is dropped from state). Without the time-range predicate a
    stream-stream inner join would buffer both sides forever — the
    interval is what makes the join runnable on an unbounded stream.
    """
    c = _normalize_ts(clicks)
    p = _normalize_ts(purchases)
    if streaming:
        c = c.withWatermark("ts", watermark)
        p = p.withWatermark("ts", watermark)
    c = c.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = p.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def sliding_agg(
    events: DataFrame,
    streaming: bool,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Shared SLIDING-window rollup: every event contributes to
    window/slide overlapping buckets (4 here). Same kappa contract as
    ``hourly_agg``: one builder for batch backfill and streaming tail;
    in streaming mode the watermark expires windows past the horizon,
    so state is bounded by (#event_types × windows-in-horizon ×
    overlap factor). The oracle re-derives the overlapping buckets by
    fanning each event out k ∈ [0, window/slide) slides back — the
    fan-out is the semantic definition of a sliding window, which the
    Spark operator implements without materializing it per-event."""
    e = _normalize_ts(events)
    if streaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q69_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sliding-window rollup (1h window / 15min slide), ordered;
    the streaming twin is parity-tested in pytest like q38's."""
    from ..sources.parquet import load_table

    return sliding_agg(
        load_table(spark, sf_dir, "events"), streaming=False
    ).orderBy("win_start", "event_type")


def click_purchase_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay_seconds: int = 3600,
    streaming: bool = True,
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click appears —
    paired with attributable purchases, or null-padded when the
    watermark proves no purchase can arrive in its window anymore (the
    unconverted-click feed an attribution pipeline alerts on).

    Distinct semantics from the inner variant
    (:func:`click_purchase_interval_join`): unmatched left rows are
    held in state and EMITTED ONLY when the watermark passes
    ``click_ts + max_delay`` — so outer results trail the event time by
    the watermark delay, and a drained stream only emits null rows up
    to its final watermark (callers replaying finite data append a
    max-event sentinel batch if they need the tail; the parity test
    does exactly that). Same state bound as the inner join: the
    time-range predicate lets both sides evict.
    """
    c = _normalize_ts(clicks)
    p = _normalize_ts(purchases)
    if streaming:
        c = c.withWatermark("ts", watermark)
        p = p.withWatermark("ts", watermark)
    c = c.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = p.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    return c.join(p, cond, "leftOuter").select(
        F.col("c_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


# ------------------------------------------------- stream-static enrichment
def user_profile_static(
    events: DataFrame, cutoff: str = "2024-01-15"
) -> DataFrame:
    """Static per-user profile from events BEFORE ``cutoff``: event
    count, total value (exact cents), first-seen timestamp. The batch
    side of the stream-static enrichment — at deployment this is the
    nightly-refreshed dimension the live stream joins against."""
    return (
        events.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("hist_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0, 2
            ).alias("hist_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_seen"
            ),
        )
    )


def enrich_with_profile(
    events: DataFrame, profile: DataFrame, cutoff: str = "2024-01-15"
) -> DataFrame:
    """Stream-static enrichment: each event at/after ``cutoff`` is
    LEFT-joined to the static profile — users never seen before the
    cutoff keep NULL history and get flagged ``is_new``. Works
    identically on a batch or streaming ``events`` frame (kappa: the
    builder is the parity contract).

    Scale: the profile is a per-user aggregate, orders smaller than the
    event stream — ``F.broadcast`` pins a broadcast hash join so each
    micro-batch maps through the dimension with NO stateful shuffle
    (stream-static joins are stateless by construction). Refresh
    caveat, pinned by ``test_stream_static_dim_refresh_contract``: the
    static side's FILE LISTING is captured when the streaming query
    starts — a file-based dimension overwritten in place FAILS the next
    micro-batch rather than refreshing. A nightly-refreshed dim must be
    re-read inside ``foreachBatch`` (per-batch plan) or come from a
    snapshot-resolving table format."""
    return (
        events.filter(F.col("ts") >= cutoff)
        .join(F.broadcast(profile), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.coalesce(F.col("hist_events"), F.lit(0)).alias("hist_events"),
            F.coalesce(F.col("hist_value"), F.lit(0.0)).alias("hist_value"),
            F.col("first_seen").isNull().alias("is_new"),
        )
    )


def enriched_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    cutoff: str = "2024-01-15",
    table_name: str = "events_enriched_stream",
    timeout_s: int = 120,
) -> DataFrame:
    """Run the stream-static enrichment over the file-drop stream into a
    memory sink (append mode — enrichment is stateless, rows emit once)
    and return the sink contents."""
    from ..sources.parquet import load_table

    profile = user_profile_static(
        load_table(spark, sf_dir, "events"), cutoff
    )
    q = (
        enrich_with_profile(read_events_stream(spark, sf_dir), profile, cutoff)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
    return spark.table(table_name)


# ------------------------------------------- dedup -> export composition
def slot_columns(df: DataFrame) -> DataFrame:
    """The exported slot projection shared by the streaming composition
    and its batch twin: a (user, type, clock-hour) slot id/key derived
    ONLY from the dedup key columns. Because every redelivered copy of
    a slot carries the same key fields, the export's manifest (counts,
    id range, content checksum over slot_key) is identical no matter
    WHICH copy the stream kept — the honest determinism contract of
    at-least-once dedup: the slot SET is deterministic, the winning
    row's payload columns need not be."""
    return df.select(
        F.xxhash64("user_id", "event_type", "hour_start").alias("slot_id"),
        F.concat_ws(
            "|", "user_id", "event_type", "hour_start"
        ).alias("slot_key"),
        "event_id", "user_id", "event_type", "hour_start",
    )


def dedup_export_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
    n_shards: int = 8,
    stream: DataFrame | None = None,
):
    """ONE streaming query composing the two stateful guarantees:
    watermarked slot dedup (``dropDuplicatesWithinWatermark`` on the
    q106 (user, type, clock-hour) key — at-least-once sources redeliver)
    feeding the exactly-once sharded export (idempotent foreachBatch,
    per-batch manifest + observed-write audit). Batch twin/oracle:
    ``timeseries.hourly_first_events`` over the single-copy corpus,
    pushed through the SAME slot projection and ``shard_manifest`` —
    the replay pytest pins manifest equality and no duplicate slots.

    Scale: dedup state holds one key per live slot inside the watermark
    horizon (bounded by arrival rate x delay); the export inherits the
    sink's single-writer, overwrite-by-batch contract.
    """
    from .export import export_stream

    ev = _normalize_ts(
        stream if stream is not None else read_events_stream(spark, sf_dir)
    )
    slotted = ev.withColumn(
        "hour_start",
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"),
    )
    deduped = slotted.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "hour_start"]
    )
    return export_stream(
        slot_columns(deduped),
        out_dir,
        n_shards=n_shards,
        id_col="slot_id",
        text_col="slot_key",
    )


# ----------------------------------------------- streaming drift monitor
DRIFT_V_LO, DRIFT_V_HI, DRIFT_BUCKETS = 0.0, 500.0, 10
DRIFT_EPS = 1e-4


def daily_bucket_counts(
    events: DataFrame, streaming: bool, watermark: str = "2 days"
) -> DataFrame:
    """Shared batch/stream builder: per (day, value-bucket) event counts
    over FIXED equi-width buckets. Fixed edges (not data-derived, unlike
    batch q145): a stream cannot re-derive min/max without breaking
    incremental aggregation, so the monitoring band is part of the
    contract and out-of-band values clamp into the edge buckets.

    This is the heavy half of the drift monitor and the only part that
    touches raw events: the stream maintains ≤ days×buckets rows of
    state (watermark-bounded), and drift scoring reads the counts table
    — never the firehose."""
    e = _normalize_ts(events)
    if streaming:
        e = e.withWatermark("ts", watermark)
    width = (DRIFT_V_HI - DRIFT_V_LO) / DRIFT_BUCKETS
    bucket = F.least(
        F.greatest(
            F.floor((F.col("value") - DRIFT_V_LO) / width).cast("int"),
            F.lit(0),
        ),
        F.lit(DRIFT_BUCKETS - 1),
    )
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "bucket",
            "n",
        )
    )


def drift_from_counts(counts: DataFrame, dense: bool = False) -> DataFrame:
    """Day-over-day PSI from the materialized counts table: densify to
    the full day×bucket grid (a missing bucket is a zero count, which
    must contribute its ε-clamped term, not silently drop), share per
    day, lag the share per bucket, fold. Pure batch arithmetic over a
    days×buckets-sized frame — at 100 TB this reads kilobytes while the
    stream does the counting. ``dense=True`` declares the caller
    already supplies every (day, 0..DRIFT_BUCKETS-1) row (the
    driver-dict sink densifies for free), skipping the
    distinct-collect + grid join that densification otherwise costs —
    same rows either way, pinned by the kappa-parity pytest."""
    from pyspark.sql import Window

    spark = counts.sparkSession
    if dense:
        f = counts
    else:
        # densify via a driver-built grid: the day list is calendar-sized
        # (bounded collect), and building the grid fresh sidesteps the
        # self-join ambiguity of deriving days FROM counts and joining back
        # to counts (both sides would share the sink view's lineage)
        day_list = sorted(
            r["day"] for r in counts.select("day").distinct().collect()
        )
        grid = spark.createDataFrame(
            [(d, b) for d in day_list for b in range(DRIFT_BUCKETS)],
            "day string, bucket int",
        )
        f = grid.join(counts, ["day", "bucket"], "left").fillna(0, ["n"])
    w_day = Window.partitionBy("day")
    w_lag = Window.partitionBy("bucket").orderBy("day")
    q_expr = F.greatest(
        F.col("n") / F.sum("n").over(w_day), F.lit(DRIFT_EPS)
    )
    if dense:
        # The dense contract (every day carries all DRIFT_BUCKETS rows)
        # is otherwise enforced only by caller convention; a sparse
        # frame would silently drop its zero-count ε-terms and skew the
        # PSI. Validate in-plan on the SAME day window the share
        # already computes (no extra exchange, kilobyte frame): a
        # short-bucketed day fails loudly instead of mis-scoring.
        q_expr = F.when(
            F.count(F.lit(1)).over(w_day) == DRIFT_BUCKETS, q_expr
        ).otherwise(
            F.raise_error(
                F.lit(
                    "drift_from_counts(dense=True) received a sparse "
                    f"grid: expected {DRIFT_BUCKETS} buckets per day"
                )
            )
        )
    shared = f.select(
        "day",
        "bucket",
        "n",
        q_expr.alias("q"),
    ).withColumn("p", F.lag("q").over(w_lag))
    return (
        shared.filter(F.col("p").isNotNull())
        .groupBy("day")
        .agg(
            F.round(
                F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))),
                4,
            ).alias("psi"),
            F.sum("n").alias("n_events"),
        )
        .orderBy("day")
    )


def drift_counts_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "drift_counts_stream",
    timeout_s: int = 120,
    dense: bool = False,
) -> DataFrame:
    """Run the streaming counts half until the source drains; returns
    the accumulated counts frame.

    UPDATE mode + a foreachBatch upsert, NOT a complete-mode sink: in
    complete mode Spark never uses the watermark to evict aggregation
    state, so the docstring's days×buckets state bound would be false —
    state would grow with every day ever seen (the r5 ADVICE finding).
    Update mode re-emits only the (day, bucket) rows that changed in
    the epoch and the watermark really evicts finalized days; the
    upsert keeps each key's LAST emitted total (counts are monotone per
    key until eviction, so last write = final value — the standard
    update-mode upsert contract). The sink itself is a driver dict:
    legitimate here because the aggregate is days×buckets-sized
    (kilobytes) BY CONSTRUCTION — a deployment would upsert into a
    table the same way (the q159 CdcUpsertSink shape)."""
    acc: dict[tuple, int] = {}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():  # ≤ days×buckets rows per epoch
            acc[(r["day"], r["bucket"])] = r["n"]

    with _bounded_state_partitions(spark):
        q = (
            daily_bucket_counts(
                read_events_stream(spark, sf_dir), streaming=True
            )
            .writeStream.foreachBatch(upsert)
            .queryName(table_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
    if dense:
        # densify in the driver dict, where it is a comprehension over a
        # days×buckets-sized map: a missing (day, bucket) is a zero
        # count — exactly the rows drift_from_counts' grid join would
        # add, so the scorer can skip that distinct-collect + join
        # (dense=True). Default stays SPARSE: the kappa-parity pytest
        # pins streamed counts == batch builder counts row-for-row.
        days = sorted({d for (d, _b) in acc})
        rows = [
            (d, b, acc.get((d, b), 0))
            for d in days
            for b in range(DRIFT_BUCKETS)
        ]
    else:
        rows = [(d, b, n) for (d, b), n in sorted(acc.items())]
    return spark.createDataFrame(rows, "day string, bucket int, n long")


def q147_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: stream the day×bucket counts (watermarked,
    update-mode upsert drain), then score day-over-day PSI from the SINK —
    hash-checked against a DuckDB twin that derives the same series
    from raw events (kappa parity for the whole monitor, not just the
    counting half)."""
    counts = drift_counts_stream_to_memory(
        spark, sf_dir, table_name="q147_sink", dense=True
    )
    return drift_from_counts(counts, dense=True)


def stream_drift_oracle_sql() -> str:
    """DuckDB twin of q147: same fixed buckets, dense grid, ε-clamped
    shares, lagged-share PSI."""
    width = (DRIFT_V_HI - DRIFT_V_LO) / DRIFT_BUCKETS
    return f"""
        WITH c AS (
          SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                 least(greatest(CAST(floor((value - {DRIFT_V_LO}) / {width})
                                     AS INT), 0), {DRIFT_BUCKETS - 1})
                     AS bucket,
                 count(*) AS n
          FROM events GROUP BY day, bucket
        ), days AS (SELECT DISTINCT day FROM c),
        g AS (
          SELECT days.day, b.bucket::INT AS bucket
          FROM days, UNNEST(range(0, {DRIFT_BUCKETS})) AS b(bucket)
        ),
        f AS (
          SELECT g.day, g.bucket, coalesce(c.n, 0) AS n
          FROM g LEFT JOIN c ON g.day = c.day AND g.bucket = c.bucket
        ),
        s AS (
          SELECT day, bucket, n,
                 greatest(n / (sum(n) OVER (PARTITION BY day)),
                          {DRIFT_EPS}) AS q
          FROM f
        ),
        s2 AS (
          SELECT day, bucket, n, q,
                 lag(q) OVER (PARTITION BY bucket ORDER BY day) AS p
          FROM s
        )
        SELECT day,
               round(sum((q - p) * ln(q / p)), 4) AS psi,
               sum(n)::BIGINT AS n_events
        FROM s2 WHERE p IS NOT NULL
        GROUP BY day ORDER BY day
    """
