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
    (``nanosAsLong``) and truncate to microseconds — the same truncation
    DuckDB applies, so both engines see identical values. For sessions
    not built by ``get_spark`` (e.g. the driver harness) the event-time
    confs are pinned via the one shared setup path,
    ``session.ensure_event_time_confs`` — the streaming reader applies
    the same guard.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        from ..session import ensure_event_time_confs

        ensure_event_time_confs(spark)
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
