"""Hive-style date-partitioned layout + partition pruning — builder-brief
scale extension (no reference analog; the reference's Postgres tables
have no lake layout at all).

Why: at 100 TB the events table is not one parquet directory — it is a
``event_date=YYYY-MM-DD/`` partition tree, and a time-scoped query must
prune to the matching directories BEFORE any file is opened (directory
listing only, no footer reads). That is Spark's built-in partition
discovery: ``partitionBy`` at write time turns the column into a
directory key, and Catalyst turns predicates on it into
``PartitionFilters`` on the scan node. This module is the thin,
contract-tested wrapper: write the tree, read it back, and expose a
helper the tests use to assert the scan touched only the expected
partition directories.

Contrast with the sibling layouts:
- ``bucketing.py`` — co-locates JOIN keys (removes the shuffle);
- ``zorder.py``    — 2-D min-max file skipping WITHIN a partition;
- here            — coarse directory-level pruning on the time axis,
  the first gate every production scan passes through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
) -> None:
    """Write ``df`` as a hive-partitioned parquet tree keyed by the DATE
    of ``ts_col``. The derived partition column is a plain ``date`` —
    string-typed partition values would break predicate pushdown's type
    coercion on read.

    Scale: ``partitionBy`` shuffles nothing by itself — each task writes
    one file per distinct date it holds. For a real daily ingest the
    incoming batch is a single date, so this degenerates to a plain
    append of one directory; a backfill over many dates should
    ``repartition(partition_col)`` first to avoid the
    tasks×dates small-file explosion.
    """
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partition tree back; the partition column materializes
    from directory names (no data-file bytes are read for it)."""
    return spark.read.parquet(path)


def scan_footprint(df: DataFrame) -> dict[str, int]:
    """Execute ``df`` and report what its parquet scan actually touched:
    ``{"numFiles": ..., "numPartitions": ...}`` from the executed
    FileSourceScan node's metrics. This is the honest pruning audit —
    ``DataFrame.inputFiles()`` lists the relation's files from the
    UNfiltered file index and does NOT reflect partition pruning
    (verified: a one-day filter over a 30-day tree still inputFiles()'s
    all 30 directories while the executed scan reads 1 file)."""
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    metrics = scan.metrics()
    out = {}
    for key in ("numFiles", "numPartitions"):
        if metrics.contains(key):
            out[key] = metrics.apply(key).value()
    return out
