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
    prefix: str = "asof_",
) -> DataFrame:
    """LEFT as-of join: each left row gains the right side's most recent
    ``value_cols`` at or before its ``ts_col`` within ``partition_cols``
    (NULLs when no prior right row exists).

    Ties at identical timestamps resolve right-row-first (the right row
    is visible to a left row with the same timestamp, matching ASOF
    ``>=`` semantics), then by ``tiebreak_col`` among right rows.
    """
    lcols = left.columns
    l = left
    for v in value_cols:
        l = l.withColumn(f"__r_{v}", F.lit(None).cast(right.schema[v].dataType))
    l = l.withColumn("__side", F.lit(1))

    r = right.select(
        *partition_cols,
        F.col(ts_col),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    ).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    order = [F.col(ts_col).asc(), F.col("__side").asc()]
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
