"""Small-files diagnosis + compaction for partitioned parquet trees —
builder-brief scale extension (no reference analog; Postgres has no
file layout to degrade).

Why: the #1 silent performance killer of a 100 TB lake is file-count
drift — streaming appends and per-task partitioned writes leave daily
partitions with thousands of KB-sized files, and every scan then pays
per-file open/footer/schedule overhead that dwarfs the byte cost. The
fix is boring and mechanical (rewrite each offending partition into
ceil(bytes/target) files); what a pipeline needs is the AUDIT that says
WHICH partitions to rewrite, computed from the filesystem listing
alone — no data bytes read, so it runs in seconds against any store the
Hadoop FileSystem API fronts (HDFS, S3A, local).

``layout_stats`` → per-partition file census (driver-side metadata op,
same class as the profiler's schema scan); ``compaction_plan`` → the
partitions whose file count exceeds 2× their byte-justified target;
``compact_partition`` → the rewrite itself (repartition(n) + overwrite
of ONE partition directory, so a backfill can run partition-by-
partition under whatever orchestration retries exist).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 512 * 1024 * 1024  # the usual lake target file size


@dataclass(frozen=True)
class PartitionStats:
    partition: str  # relative directory ("" for an unpartitioned root)
    n_files: int
    total_bytes: int
    min_bytes: int
    max_bytes: int


def layout_stats(spark: SparkSession, path: str) -> list[PartitionStats]:
    """Recursive file census of a parquet tree via the JVM Hadoop
    FileSystem API — metadata listing only, zero data bytes read, works
    against any supported filesystem scheme. Hidden/commit files
    (``_SUCCESS``, ``.…``) are excluded the same way Spark's own file
    index excludes them."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    root = fs.getFileStatus(jpath).getPath().toUri().getPath()
    per_dir: dict[str, list[int]] = {}
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith("_") or name.startswith("."):
            continue
        parent = p.getParent().toUri().getPath()
        rel = parent[len(root):].strip("/")
        per_dir.setdefault(rel, []).append(st.getLen())
    return sorted(
        (
            PartitionStats(
                partition=rel,
                n_files=len(sizes),
                total_bytes=sum(sizes),
                min_bytes=min(sizes),
                max_bytes=max(sizes),
            )
            for rel, sizes in per_dir.items()
        ),
        key=lambda s: s.partition,
    )


def compaction_plan(
    stats: list[PartitionStats],
    target_bytes: int = DEFAULT_TARGET_BYTES,
    slack: float = 2.0,
) -> list[tuple[PartitionStats, int]]:
    """Partitions worth rewriting: file count exceeds ``slack``× the
    byte-justified target count ``ceil(total/target)``. Returns
    (stats, recommended_n_files) pairs — the advisor half; feeding each
    through :func:`compact_partition` is the mechanical half."""
    plan = []
    for s in stats:
        n_target = max(1, math.ceil(s.total_bytes / target_bytes))
        if s.n_files > slack * n_target:
            plan.append((s, n_target))
    return plan


def compact_partition(
    spark: SparkSession, root: str, partition: str, n_files: int
) -> None:
    """Rewrite ONE partition directory into ``n_files`` parquet files.
    Reads only that directory (directory-scoped, so a 30 000-partition
    backfill is 30 000 independent, retryable jobs) and overwrites it in
    place. ``repartition(n)`` is a full shuffle of the partition's rows —
    the price of exact output file count; the alternative (coalesce)
    skips the shuffle but can't split files."""
    src = f"{root}/{partition}" if partition else root
    df: DataFrame = spark.read.parquet(src)
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .parquet(src + "__compacting")
    )
    # Swap via rename-ASIDE, never delete-first: src -> src__old,
    # __compacting -> src, delete __old. A crash between any two steps
    # leaves a readable copy on disk under a deterministic name —
    # recovery is "if src missing, rename __compacting (or __old) back"
    # — whereas delete-then-rename has a window where the partition is
    # simply gone and a failed rename loses it permanently. Renames are
    # atomic per-directory on HDFS/local FS; on object stores you'd use
    # a table format's commit protocol instead (see schema_evolution.py
    # notes), but the aside ordering is still the crash-safe shape.
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(src).getFileSystem(conf)
    old = Path(src + "__old")
    if fs.exists(old):  # leftover from a crashed prior swap
        fs.delete(old, True)
    if not fs.rename(Path(src), old):
        raise IOError(f"compact_partition: rename-aside of {src} failed")
    if not fs.rename(Path(src + "__compacting"), Path(src)):
        # roll back so the partition stays readable under its own name
        fs.rename(old, Path(src))
        raise IOError(
            f"compact_partition: swap-in of {src}__compacting failed; "
            "original restored"
        )
    fs.delete(old, True)
