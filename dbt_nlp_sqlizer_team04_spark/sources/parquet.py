"""Parquet source registry for the driver's testdata star schema.

The reference discovers tables dynamically via SQLAlchemy's inspector
(NLP_SQLizer/backend/app/ai/nl2sql.py:14-21); here the analog is
registering parquet-backed DataFrames as temp views so the whole engine
(SQL safety layer, executor, profiler) sees a normal Spark catalog.

Scale note: at 100 TB these would be partitioned/bucketed external
tables (e.g. orders bucketed by o_custkey, lineitem by l_orderkey) so
FK joins co-locate without a shuffle; parquet scans still get predicate
pushdown + column pruning from Catalyst either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table, normalizing physical-type quirks.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; we read it as raw nanos
    (``nanosAsLong``, set in session.py's factory) and truncate to
    microseconds — the same truncation DuckDB applies, so both engines
    see identical values. For sessions not built by ``get_spark`` (e.g.
    the driver harness) the conf is set here once, narrowly, before the
    only read that needs it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    key = "spark.sql.legacy.parquet.nanosAsLong"
    if name == "events" and spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
    if name == "events" and spark.conf.get("spark.sql.session.timeZone") != "UTC":
        # the NTZ→timestamp normalization below reinterprets the naive
        # wall-clock in the session timezone; the engine contract (and
        # the DuckDB oracle's epoch_us) treats event timestamps as UTC,
        # so pin it for driver-owned sessions that didn't use get_spark
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: `/` promotes to double, and nanos-since-epoch
        # (~1.7e18) exceeds double's exact-integer range (2^53), which
        # skews individual timestamps by up to ±1 microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # TIMESTAMP(MICROS) with isAdjustedToUTC=false infers as NTZ,
        # which unix_micros/window-state functions reject; the session
        # timezone is pinned to UTC so this cast is value-identical to
        # what DuckDB's epoch_us sees.
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Register every available parquet table as a temp view; returns names."""
    registered = []
    for t in tables:
        if os.path.exists(table_path(sf_dir, t)):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
            registered.append(t)
    return registered
