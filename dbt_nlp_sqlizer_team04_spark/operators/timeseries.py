"""Time-series operators — as-of join and sessionization (builder-brief
"custom operators Spark lacks"; no reference analog).

Both are implemented as compositions of existing DataFrame operators
(option (a) of the brief's ladder) — no UDFs, no mapPartitions:

- ``asof_join``: the classic union trick. Tag both sides, sort each
  partition by (ts, side, tiebreak), and carry the right side's last
  non-null values forward with ``F.last(ignorenulls=True)`` over an
  unbounded-preceding row frame; keep only left rows. One shuffle on
  the partition key, state is the running last values — the same plan a
  purpose-built as-of physical operator would produce.
- ``sessionize``: gap-based session ids. ``lag`` the event time per
  key, mark rows whose gap exceeds the threshold as session starts, and
  running-sum the markers. One shuffle on the key; at 100 TB this is
  the standard sessionization used before per-session aggregation
  (Structured Streaming's session_window covers the streaming case).

Timestamps compare in integer microseconds (``unix_micros`` ↔ DuckDB
``epoch_us``) so the oracle agrees exactly on gap boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    right_tiebreak_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """LEFT as-of join: each left row gains the right side's most recent
    ``value_cols`` at or before its ``ts_col`` within ``partition_cols``
    (NULLs when no prior right row exists).

    Ties at identical timestamps resolve right-row-first (the right row
    is visible to a left row with the same timestamp, matching ASOF
    ``>=`` semantics). When multiple RIGHT rows share a (partition, ts),
    pass ``right_tiebreak_col`` to pick the one with the greatest
    tiebreak value deterministically — without it the carried value
    among exact right-side ties is whichever the sort surfaces last.
    """
    lcols = left.columns
    l = left
    for v in value_cols:
        l = l.withColumn(f"__r_{v}", F.lit(None).cast(right.schema[v].dataType))
    if right_tiebreak_col is not None:
        l = l.withColumn(
            "__rtb", F.lit(None).cast(right.schema[right_tiebreak_col].dataType)
        )
    l = l.withColumn("__side", F.lit(1))

    r = right.select(
        *partition_cols,
        F.col(ts_col),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
        *(
            [F.col(right_tiebreak_col).alias("__rtb")]
            if right_tiebreak_col is not None
            else []
        ),
    ).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    if right_tiebreak_col is not None:
        # orders right rows within an exact (partition, ts) tie so the
        # running F.last deterministically carries the greatest tiebreak
        order.append(F.col("__rtb").asc_nulls_first())
    if tiebreak_col is not None and tiebreak_col in left.columns:
        order.append(F.col(tiebreak_col).asc_nulls_first())
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = l.unionByName(r.select(*l.columns))
    carried = both.select(
        "*",
        *[
            F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"{prefix}{v}")
            for v in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[f"{prefix}{v}" for v in value_cols]
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``. Session ids
    are 1-based per key, in event-time order."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    micros = F.unix_micros(F.col(ts_col))
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    prev = F.lag(micros).over(w)
    new_session = (prev.isNull() | ((micros - prev) > gap_us)).cast("long")
    run = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(run))


def sessionize_native(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    agg_exprs: list | None = None,
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window`` — the
    idiomatic engine path (one ``SessionWindowStateStore``-style merge
    agg instead of two window passes), and the same operator Structured
    Streaming uses, so batch and streaming sessions share semantics.

    Boundary convention (pinned by
    ``test_native_session_window_boundary_convention``): an event
    arriving EXACTLY at ``last_ts + gap`` still merges — containment is
    inclusive — so sessions split only on gaps strictly ``> gap``,
    matching the lag-based :func:`sessionize` tier; the two tiers are
    interchangeable on session membership.

    Returns one row per (key, session): start/end in integer epoch
    micros (end = last event + gap, the native definition) plus the
    requested aggregates. One shuffle on the key; state is bounded by
    the gap, which is what makes the same plan watermark-safe in
    streaming.
    """
    aggs = agg_exprs or [F.count(F.lit(1)).alias("n_events")]
    win = F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds")
    return (
        df.groupBy(F.col(key_col), win)
        .agg(*aggs)
        .withColumn("start_us", F.unix_micros(F.col("session_window.start")))
        .withColumn("end_us", F.unix_micros(F.col("session_window.end")))
        .drop("session_window")
    )


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    within_seconds: int,
    left_id: str,
    right_id: str,
    extra_cond=None,
) -> DataFrame:
    """Banded range join: pairs (left, right) with |left.ts - right.ts|
    ≤ within_seconds.

    A naive range join is a cross join + filter (O(n²)). Here both
    sides are binned into ``within_seconds``-wide buckets and the left
    side probes its own and both neighbor buckets (explode of 3 ids) —
    every qualifying pair shares one of those bucket pairs, so the join
    is a plain equi-join on the bucket id with an exact range re-check.
    Shuffle keys are (bucket, id); pair count is bounded by temporal
    density, never n².
    """
    width_us = int(within_seconds) * 1_000_000

    def bucket(col):
        return F.expr(f"unix_micros({col}) div {width_us}")

    l = left.select(
        F.col(left_id), F.col(ts_col).alias("__lts"),
        F.explode(
            F.array(bucket(ts_col) - 1, bucket(ts_col), bucket(ts_col) + 1)
        ).alias("__bkt"),
    )
    r = right.select(
        F.col(right_id), F.col(ts_col).alias("__rts"), bucket(ts_col).alias("__bkt")
    )
    pairs = l.join(r, "__bkt").filter(
        F.abs(F.unix_micros("__lts") - F.unix_micros("__rts")) <= F.lit(width_us)
    )
    if extra_cond is not None:
        pairs = pairs.filter(extra_cond)
    return pairs.select(left_id, right_id, "__lts", "__rts").dropDuplicates(
        [left_id, right_id]
    )


def rollup_cascade(
    df: DataFrame, ts_col: str, group_cols: list[str], value_col: str
) -> dict[str, DataFrame]:
    """Hypertable-style continuous aggregate cascade: minute → hour →
    day, each level computed FROM the previous one (sum/count compose;
    avg derives as sum/count at read time). The raw table is scanned
    once; coarser grains aggregate the much smaller finer grain —
    exactly how continuous aggregates refresh at scale.
    """
    minute = (
        df.groupBy(
            F.date_trunc("minute", F.col(ts_col)).alias("bucket"), *group_cols
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_v"),
        )
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", F.col("bucket")).alias("bucket"), *group_cols)
        .agg(F.sum("n").cast("long").alias("n"), F.sum("sum_v").alias("sum_v"))
    )
    day = (
        hour.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"), *group_cols)
        .agg(F.sum("n").cast("long").alias("n"), F.sum("sum_v").alias("sum_v"))
    )
    return {"minute": minute, "hour": hour, "day": day}


# ----------------------------------------------------- registry queries
def q44_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join over events: every purchase gains the same user's most
    recent click at-or-before it (oracle: DuckDB native ASOF LEFT JOIN).
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(
        purchases,
        clicks.withColumn("click_ts", F.col("ts")),
        partition_cols=["user_id"],
        ts_col="ts",
        value_cols=["click_ts"],
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.round("value", 2).alias("value"),
        F.date_format("asof_click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_click_ts"
        ),
    ).orderBy("event_id")


def q46_range_join_nearby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: per purchase, how many OTHER-user events fall
    within ±60 s (oracle: DuckDB inequality join). Left join semantics —
    purchases with zero nearby events keep n_nearby = 0."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id").alias("l_user"), "ts"
    )
    others = e.select(
        F.col("event_id").alias("r_event"), F.col("user_id").alias("r_user"), "ts"
    )
    pairs = range_join_within(
        purchases.select("event_id", "ts"),
        others,
        "ts",
        60,
        "event_id",
        "r_event",
    )
    # attach users, drop same-user pairs and self-pairs, count per purchase
    pu = purchases.select("event_id", "l_user")
    ru = others.select("r_event", "r_user")
    counted = (
        pairs.join(pu, "event_id")
        .join(ru, "r_event")
        .filter((F.col("l_user") != F.col("r_user")))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
    )
    return (
        purchases.select("event_id")
        .join(counted, "event_id", "left")
        .select("event_id", F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"))
        .orderBy("event_id")
    )


def q47_rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: the DAILY grain computed through the
    minute→hour→day cascade must equal a direct daily aggregation
    (oracle-checked) — the continuous-aggregate correctness property."""
    e = load_table(spark, sf_dir, "events")
    day = rollup_cascade(e, "ts", ["event_type"], "value")["day"]
    return day.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round("sum_v", 2).alias("sum_value"),
    ).orderBy("day", "event_type")


def q45_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats at a 30-minute gap (oracle-checked:
    lag/running-sum window SQL)."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", gap_seconds=1800)
    return (
        s.groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def q55_session_window_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session detail rows from Spark's NATIVE session_window
    operator (oracle-checked: lag/running-sum SQL with the native
    ``>= gap`` split convention and ``end = last_ts + gap``)."""
    e = load_table(spark, sf_dir, "events")
    return sessionize_native(
        e,
        "user_id",
        "ts",
        gap_seconds=1800,
        agg_exprs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    ).select("user_id", "start_us", "end_us", "n_events", "sum_value").orderBy(
        "user_id", "start_us"
    )


def incremental_rollup_merge(
    existing: DataFrame,
    new_events: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    grain: str = "hour",
) -> DataFrame:
    """Incrementally maintain a (bucket, groups) → (n, sum_v) rollup:
    aggregate ONLY the newly-arrived events to the grain, then merge
    into the existing rollup by re-aggregating the union of partials.

    The continuous-aggregate refresh pattern: at 100 TB the history is
    never rescanned — the per-refresh cost is (new partition scan +
    a shuffle of partial rows, bounded by #touched buckets × #groups,
    not by history size). sum/count compose associatively, so
    merged == full recompute exactly; avg derives at read time.

    Late data needs no special case: a late event lands in an old
    bucket's partial and the merge updates that bucket — the batch
    twin of what the streaming path's watermark does.
    """
    new_partial = (
        new_events.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"), *group_cols
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum(value_col).alias("sum_v"))
    )
    return (
        existing.select("bucket", *group_cols, "n", "sum_v")
        .unionByName(new_partial)
        .groupBy("bucket", *group_cols)
        .agg(F.sum("n").cast("long").alias("n"), F.sum("sum_v").alias("sum_v"))
    )


def q64_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correctness contract for incremental maintenance: split events at
    the MEAN timestamp's day into history + new arrivals (mean, not
    median — the split point only has to be interior, and on skewed
    event-time data the two partitions will be uneven), build the hourly rollup
    from history, merge ONLY the new partition in — and return the
    merged rollup. The oracle recomputes the same rollup from ALL
    events in one pass; hash equality proves incremental == full.

    Values are summed as DECIMAL(30,9), not double: the merge path adds
    (history partial + arrivals partial) in a different order than the
    oracle's single pass, and double addition is order-sensitive near a
    rounding boundary. The testdata values are 2-decimal, so the
    double→decimal cast is exact and identical in both engines, and
    decimal addition is associative — merged == rebuilt bit-for-bit.
    """
    e = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(30,9)").alias("value")
    )
    split_day = e.select(
        F.date_trunc("day", F.expr("timestamp_micros(cast(avg(unix_micros(ts)) as long))"))
    ).first()[0]
    history = e.filter(F.col("ts") < F.lit(split_day))
    arrivals = e.filter(F.col("ts") >= F.lit(split_day))
    existing = (
        history.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("value").alias("sum_v"))
    )
    merged = incremental_rollup_merge(
        existing, arrivals, "ts", ["event_type"], "value", grain="hour"
    )
    return merged.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n",
        F.round(F.col("sum_v").cast("double"), 2).alias("sum_value"),
        # integer half-up division on exact cents (see q19) — the
        # decimal sum is exact, so cents = sum_v*100 is an exact long
        (
            F.expr(
                "(cast(sum_v * 100 as bigint) * 100 + n div 2) div n"
            )
            / 10000.0
        ).alias("avg_value"),
    ).orderBy("hour_start", "event_type")


# ------------------------------------------------------ cohort retention
def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention triangle: users cohorted by the week of
    their FIRST event; each (cohort week, week offset) cell counts the
    distinct users of that cohort active in that later week — the
    standard retention analysis, and a second sequenced-behavior shape
    next to the conversion funnel (q87).

    Plan: one user-keyed min aggregate (the cohort frame), one equi-join
    back to events on the same user key (partitioning reused), then a
    distinct-count aggregate keyed on the (cohort, offset) pair. Both
    engines truncate weeks to Monday and the offset is an exact
    multiple-of-7 day difference, so the cell counts are oracle-exact.
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_ts")
    )
    return (
        events.join(first, user_col)
        .select(
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.date_trunc("week", F.col(ts_col)), F.col("cohort_ts"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q88_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over events (oracle-checked)."""
    from ..sources.parquet import load_table

    return cohort_retention(load_table(spark, sf_dir, "events"))


def cohort_retention_oracle_sql() -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    return """
        WITH first AS (
          SELECT user_id, date_trunc('week', min(ts)) AS cohort_ts
          FROM events GROUP BY user_id
        )
        SELECT strftime(cohort_ts, '%Y-%m-%d') AS cohort_week,
               CAST(floor(date_diff('day', cohort_ts,
                                    date_trunc('week', e.ts)) / 7) AS INT)
                   AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN first ON e.user_id = first.user_id
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """


# ----------------------------------------------- event transition matrix
def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts + probabilities over each
    user's time-ordered event stream: how often does ``from_type`` lead
    to ``to_type``? The sequence-mining primitive behind next-action
    prediction features and funnel-drop diagnosis.

    Scale: one shuffle on user_id for the lag window (sessions/as-of
    reuse the same partitioning); the transition aggregate is
    |event_types|² rows at most. Ties on ts are ordered by event_id so
    the successor relation is total and engine-deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    per_from = Window.partitionBy("from_type")
    return (
        steps.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(per_from), 6)
        )
        .orderBy("from_type", "to_type")
    )


def q103_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(load_table(spark, sf_dir, "events"))


def event_transitions_oracle_sql() -> str:
    """DuckDB twin of :func:`event_transitions`."""
    return """
        WITH steps AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        ), counts AS (
          SELECT from_type, to_type, count(*) AS n
          FROM steps WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
        FROM counts
        ORDER BY from_type, to_type
    """


# -------------------------------------------------- value anomaly flags
def event_value_anomalies(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-type z-score outliers: events whose value sits more than
    ``z`` standard deviations from their type's mean — the numeric
    outlier gate a training pipeline runs before aggregating noisy
    telemetry (the events-plane sibling of the text quality gates).

    Scale: the per-type mean/stddev is a tiny broadcast aggregate
    (|event_types| rows); the flagging pass is then map-side only. The
    z-score compares at 4dp-rounded values so the boundary decision is
    engine-exact; population stddev (not sample) because both engines
    define it identically and the gate describes THIS corpus. Types
    with ZERO variance are excluded BY CONTRACT (``sigma > 0`` in both
    engines) — a constant-valued type has no outliers by definition,
    and leaving the divide-by-zero to engine-specific NULL/inf
    propagation (Spark → NULL, DuckDB → setting-dependent) would make
    the result depend on which engine ran it.
    """
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    ).filter(F.col("sigma") > 0)
    zscore = F.round(
        (F.col("value") - F.col("mu")) / F.col("sigma"), 4
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", zscore)
        .filter(F.abs(F.col("zscore")) >= z)
        .select(
            "event_id", "event_type",
            F.round("value", 2).alias("value"), "zscore",
        )
        .orderBy("event_id")
    )


def q105_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_value_anomalies(load_table(spark, sf_dir, "events"))


def event_anomalies_oracle_sql(z: float = 3.0) -> str:
    """DuckDB twin of :func:`event_value_anomalies`."""
    return f"""
        WITH stats AS (
          SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
          FROM events GROUP BY event_type
          HAVING stddev_pop(value) > 0
        )
        SELECT event_id, e.event_type, round(value, 2) AS value,
               round((value - mu) / sigma, 4) AS zscore
        FROM events e JOIN stats USING (event_type)
        WHERE abs(round((value - mu) / sigma, 4)) >= {z}
        ORDER BY event_id
    """


# --------------------------------------- windowed first-event dedup (batch)
def hourly_first_events(events: DataFrame) -> DataFrame:
    """Keep only the FIRST event per (user, type, clock hour) — the
    batch twin of the streaming watermarked dedup (same idempotency
    contract a redelivering source needs, expressed as a window rank so
    it is oracle-checkable; the streaming side is pytest-pinned via
    dropDuplicatesWithinWatermark).

    Scale: one shuffle on the (user, type, hour) key; row_number's
    per-key sort is bounded by the events one user emits in one hour.
    """
    hour = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy("user_id", "event_type", hour).orderBy(
        "ts", "event_id"
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "user_id", "event_type",
            F.date_format(hour, "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        )
        .orderBy("event_id")
    )


def q106_hourly_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_first_events(load_table(spark, sf_dir, "events"))


def hourly_first_oracle_sql() -> str:
    """DuckDB twin of :func:`hourly_first_events`."""
    return """
        SELECT event_id, user_id, event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS hour_start
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn
          FROM events
        )
        WHERE rn = 1
        ORDER BY event_id
    """


# ------------------------------------------------ rolling time-range window
def rolling_user_value(events: DataFrame, days: int = 7) -> DataFrame:
    """Per-user trailing-``days`` rolling aggregate at every event: how
    much value did this user generate in the window ending here? The
    feature-engineering staple (recency-weighted activity) expressed as
    a RANGE window — rows don't qualify by count but by how close in
    TIME they are, which is the semantics count-based windows get wrong
    on irregular event streams.

    Scale: one shuffle on user_id; the range frame is evaluated with a
    sliding two-pointer over each user's time-sorted events (linear,
    not per-row rescans). Value sums ride the exact-cents integers so
    both engines add identical numbers in any order; the frame bound is
    on FLOORED whole seconds in both engines (Spark's timestamp→long
    cast truncates; DuckDB's epoch() keeps the fractional part, which
    flips boundary events exactly 7 days apart — caught at sf0.1).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-days * 86400, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0,
            2,
        ).alias("value_7d"),
    ).orderBy("event_id")


def q109_rolling_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_user_value(load_table(spark, sf_dir, "events"))


def rolling_value_oracle_sql(days: int = 7) -> str:
    """DuckDB twin of :func:`rolling_user_value` (same epoch-seconds
    RANGE frame)."""
    return f"""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               count(*) OVER w AS n_7d,
               round(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                     / 100.0, 2) AS value_7d
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN {days * 86400} PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """


# --------------------------------------------- winsorized value stats
WINSOR_LO, WINSOR_HI = 0.01, 0.99


def winsorized_stats(
    events: DataFrame, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Per-event-type winsorized value statistics: clamp each value to
    the type's [p01, p99] band and report raw vs winsorized means — the
    outlier-robust feature-scaling pass a metrics/training pipeline runs
    before aggregating a heavy-tailed column.

    Plan shape: ONE shuffle on event_type — the exact percentiles ride
    a partitioned window (no second scan, no percentile-table join),
    the clamp is a codegen projection over the windowed row, and the
    final groupBy reuses the window's hash partitioning (no second
    exchange). At 100 TB the per-type window is the documented
    hot-partition shape: types are few but rows per type are many, so a
    deployment runs the GK-sketch twin instead
    (:func:`winsorized_stats_sketch`, registry q155) — this operator is
    that tier's exact oracle, and test_sketches.py pins the twin's rank
    error against it.
    """
    w = Window.partitionBy("event_type")
    p_lo = F.percentile(F.col("value"), F.lit(lo)).over(w)
    p_hi = F.percentile(F.col("value"), F.lit(hi)).over(w)
    rows = events.select("event_type", "value").select(
        "event_type",
        "value",
        p_lo.alias("p_lo"),
        p_hi.alias("p_hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return (
        rows.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_lo"), 4).alias("p01"),
            F.round(F.min("p_hi"), 4).alias("p99"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(clamped), 4).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


def q144_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-clamped per-type value stats (oracle-checked percentile
    window twin)."""
    return winsorized_stats(load_table(spark, sf_dir, "events"))


def winsorized_oracle_sql(
    lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> str:
    """DuckDB twin of :func:`winsorized_stats` (quantile_cont matches
    Spark's exact interpolating percentile — the q49 precedent)."""
    return f"""
        WITH b AS (
          SELECT event_type, value,
                 quantile_cont(value, {lo}) OVER (PARTITION BY event_type)
                     AS p_lo,
                 quantile_cont(value, {hi}) OVER (PARTITION BY event_type)
                     AS p_hi
          FROM events
        )
        SELECT event_type,
               count(*) AS n,
               round(min(p_lo), 4) AS p01,
               round(min(p_hi), 4) AS p99,
               round(avg(value), 4) AS mean_raw,
               round(avg(least(greatest(value, p_lo), p_hi)), 4)
                   AS mean_winsorized
        FROM b
        GROUP BY event_type
        ORDER BY event_type
    """


# The accuracy knob for the sketch tier: GK rank error <= n / ACC rows
# per group. At sf0.01 each event type holds ~12k rows, so the clamp
# bounds land within ~12 ranks of the exact percentile — tight enough
# that the winsorized mean moves in the 4th decimal at most, and the
# pytest contract (test_sketches.py::test_winsorized_sketch_rank_error)
# pins the rank bound itself, not the mean.
WINSOR_SKETCH_ACC = 1000


def winsorized_stats_sketch(
    events: DataFrame,
    lo: float = WINSOR_LO,
    hi: float = WINSOR_HI,
    accuracy: int = WINSOR_SKETCH_ACC,
) -> DataFrame:
    """Sketch tier of :func:`winsorized_stats` — the 100 TB path that
    the exact operator's docstring promises (q144 is this operator's
    oracle; ``tests/test_sketches.py`` pins the GK rank-error bound).

    Where the exact tier rides ONE per-type window (a full sort of
    every row within each type — the documented hot-partition shape),
    this tier never sorts: pass 1 is a map-side-combinable aggregate
    producing one GK percentile sketch row per type (bytes per type,
    not rows), which is then BROADCAST back onto the events scan for
    the clamp — so the big table is scanned twice but shuffled only as
    partial aggregates, and no partition ever materializes a type's
    full value list. ``percentile_approx`` is Spark's built-in
    Greenwald–Khanna sketch: rank error <= n_type / accuracy, merged
    associatively across partitions (exactly the property that makes
    it safe at 1000 executors).

    Output schema matches :func:`winsorized_stats` column-for-column so
    the pytest can diff the tiers row-by-row; a hash oracle is
    impossible (DuckDB has no bit-identical GK implementation), so the
    registry entry is rows-only and the accuracy contract lives in
    test_sketches.py against the exact twin.
    """
    vals = events.select("event_type", "value")
    bounds = vals.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(F.lit(lo), F.lit(hi)), F.lit(accuracy)
        ).alias("pp")
    ).select(
        "event_type",
        F.col("pp")[0].alias("p_lo"),
        F.col("pp")[1].alias("p_hi"),
    )
    joined = vals.join(F.broadcast(bounds), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_lo"), 4).alias("p01"),
            F.round(F.min("p_hi"), 4).alias("p99"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(clamped), 4).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


def q155_winsorized_stats_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-tier winsorized stats (GK percentile clamp; q144 exact
    twin is the oracle, rank-error pytest in test_sketches.py)."""
    return winsorized_stats_sketch(load_table(spark, sf_dir, "events"))
