"""Streaming CDC sink: maintain a latest-wins snapshot incrementally in
a ``foreachBatch`` upsert — the streaming composition of the batch CDC
plane (``operators/cdc.merge_snapshot``, q135) with the crash-safety
patterns of the exactly-once export (``streaming/export.py``) and the
rename-aside swap (``sources/compaction.py``). The reference queries a
live Postgres/Mongo (NLP_SQLizer/backend/app/ai/nl2sql.py:14-21), so
its snapshots are always current by construction; a parquet-backed
engine keeps them current by applying the change stream as it lands.

Per micro-batch: ``merge_snapshot(current, batch_changes)`` — union +
ONE key-window rank against the persisted snapshot — is staged to a
sibling directory and swapped in via rename-aside. Correctness under
the streaming failure model:

- **Replay (at-least-once foreachBatch)**: the merge is IDEMPOTENT —
  re-applying the same changelog rows elects the same winners (equal
  version + change tier → same value) and re-deleting an absent key is
  a no-op — so a re-delivered epoch moves nothing. The replay pytest
  pins this by invoking the sink twice with the same batch.
- **Crash mid-swap**: rename-aside (snapshot → __old, __staged →
  snapshot, delete __old) never deletes-first; on entry the sink heals
  an orphaned ``__old`` (snapshot missing → rename it back) and clears
  a stale ``__staged``, then the replayed epoch redoes the merge.
- **Restart-resume**: the checkpoint replays only uncommitted epochs;
  committed ones are skipped by the engine, and replayed ones are
  idempotent per the above.

Scale: each epoch costs one key-shuffle of (snapshot + batch) — the
full-snapshot-rewrite MERGE plan. At 100 TB you'd bound that by
partitioning the snapshot on the key (only touched partitions rewrite,
composing with ``sources/compaction.py``'s per-partition swap) or by a
table format's MERGE; the epoch-level commit/replay contract here is
unchanged under either. State lives entirely in the snapshot files —
the streaming query itself is stateless (no watermark aggregation), so
executor state stores hold nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import merge_snapshot

SNAPSHOT_SUBDIR = "snapshot"


class CdcUpsertSink:
    """``foreachBatch`` target: applies each changelog micro-batch to a
    persisted parquet snapshot with latest-wins semantics. Safe under
    epoch re-delivery (idempotent merge) and crashes at any step
    (rename-aside swap + entry-time healing)."""

    def __init__(
        self,
        out_dir: str,
        key: str,
        version: str,
        op_col: str = "op",
    ) -> None:
        self.out_dir = out_dir
        self.key = key
        self.version = version
        self.op_col = op_col

    @property
    def snapshot_dir(self) -> str:
        return os.path.join(self.out_dir, SNAPSHOT_SUBDIR)

    # -- filesystem helpers (Hadoop FS so the same code runs on HDFS)
    def _fs(self, spark: SparkSession):
        jvm = spark._jvm  # noqa: SLF001
        Path = jvm.org.apache.hadoop.fs.Path
        conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
        return Path, Path(self.snapshot_dir).getFileSystem(conf)

    def _heal(self, spark: SparkSession) -> None:
        """Entry-time recovery from a crash mid-swap: an orphaned
        ``__old`` with the snapshot missing is the pre-batch state —
        rename it back (the replayed epoch redoes the merge); a stale
        ``__staged`` from a crash before the swap is garbage."""
        Path, fs = self._fs(spark)
        snap, old = Path(self.snapshot_dir), Path(self.snapshot_dir + "__old")
        staged = Path(self.snapshot_dir + "__staged")
        if fs.exists(old) and not fs.exists(snap):
            fs.rename(old, snap)
        if fs.exists(staged):
            fs.delete(staged, True)

    def init_snapshot(self, base: DataFrame) -> None:
        """Seed the snapshot with the base table (version column
        included) — the bootstrap load before the change stream runs."""
        base.write.mode("overwrite").parquet(self.snapshot_dir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        self._heal(spark)
        current = spark.read.parquet(self.snapshot_dir)
        merged = merge_snapshot(
            current,
            batch_df.select(*current.columns, self.op_col),
            self.key,
            self.version,
            op_col=self.op_col,
        )
        staged = self.snapshot_dir + "__staged"
        # materialize the merge BEFORE the swap — merged reads the live
        # snapshot, so writing over it in place would read-while-write
        merged.write.mode("overwrite").parquet(staged)
        Path, fs = self._fs(spark)
        old = Path(self.snapshot_dir + "__old")
        if fs.exists(old):
            fs.delete(old, True)
        if not fs.rename(Path(self.snapshot_dir), old):
            raise IOError(f"cdc swap: rename-aside of {self.snapshot_dir} failed")
        if not fs.rename(Path(staged), Path(self.snapshot_dir)):
            fs.rename(old, Path(self.snapshot_dir))  # restore readability
            raise IOError(
                f"cdc swap: swap-in of {staged} failed; snapshot restored"
            )
        fs.delete(old, True)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        self._heal(spark)
        return spark.read.parquet(self.snapshot_dir)


def run_cdc_stream(
    spark: SparkSession,
    base: DataFrame,
    changes_dir: str,
    out_dir: str,
    key: str,
    version: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> "CdcUpsertSink":
    """Drain a file-drop changelog directory into a maintained snapshot
    (availableNow trigger — each changelog file is one micro-batch, the
    multi-epoch shape the replay/restart pytests exercise). Seeds the
    snapshot from ``base`` only when no snapshot exists yet, so a
    RESTART resumes the maintained state instead of resetting it."""
    sink = CdcUpsertSink(out_dir, key=key, version=version)
    # existence check through the Hadoop FS API, NOT os.path — on
    # HDFS/S3 a local isdir() is always False and a restart would
    # re-seed from base, silently destroying the maintained snapshot
    Path, fs = sink._fs(spark)
    if not fs.exists(Path(sink.snapshot_dir)):
        sink.init_snapshot(base)
    schema = spark.read.parquet(changes_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format("parquet")
        .load(changes_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


# ------------------------------------------------------ registry entry
def q159_cdc_stream_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q135's changelog applied as a STREAM — updates and deletes land
    as separate micro-batches through the foreachBatch upsert, then the
    maintained snapshot is rolled up exactly like the batch twin, so
    q135's oracle SQL hash-checks the streaming path end-to-end
    (the kappa-architecture parity contract, same as q38/q101/q147)."""
    import atexit
    import shutil
    import tempfile

    from ..operators.cdc import _orders_changelog, snapshot_rollup
    from ..sources.parquet import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn("__v", F.lit(1))
    changelog = _orders_changelog(orders)
    work = tempfile.mkdtemp(prefix="cdc_stream_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    changes_dir = os.path.join(work, "changes")
    # two files → two micro-batches: updates first, deletes second
    changelog.filter(F.col("op") == "U").coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)
    changelog.filter(F.col("op") == "D").coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)
    sink = run_cdc_stream(
        spark,
        orders,
        changes_dir,
        os.path.join(work, "out"),
        key="o_orderkey",
        version="__v",
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    return snapshot_rollup(sink.snapshot(spark))
