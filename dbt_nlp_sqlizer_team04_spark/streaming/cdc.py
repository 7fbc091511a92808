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

**Scale — the partitioned snapshot (``n_buckets``).** Monolithic mode
(``n_buckets=None``) rewrites the FULL snapshot every epoch — fine for
dim-sized state, wrong at 100 TB. With ``n_buckets=N`` the snapshot is
laid out as N key-hash bucket directories (``__bucket=i`` where
``i = pmod(xxhash64(key), N)``); each epoch reads ONLY the buckets its
batch keys hash into, merges only those rows, and swaps only those
bucket directories (the per-bucket composition of the same
rename-aside). Untouched buckets are never read, never rewritten —
their files stay byte-identical (pinned by pytest on name+size+mtime).
A typical 100 TB deployment sizes N so a bucket is a few GB: an epoch
touching k buckets costs k bucket-rewrites regardless of total
snapshot size, the same bound a table format's MERGE gives. Healing
generalizes per bucket: an orphaned ``__old_b{i}`` whose bucket dir is
missing is restored on entry, and a replayed epoch re-merges to the
same state either way (idempotence). State lives entirely in the
snapshot files — the streaming query itself is stateless (no watermark
aggregation), so executor state stores hold nothing.

**Concurrency contract (single writer, single reader — same as
``sources/compaction.py``)**: the swap is crash-safe but not
reader-ATOMIC — between the two renames of a bucket (or of the whole
snapshot in monolithic mode) a concurrent reader sees no directory.
foreachBatch serializes ``__call__`` per query, and ``snapshot()`` must
not race ``__call__`` from another thread/process: this sink assumes
one writer process and readers that either run between epochs (the
process model here) or tolerate retry-on-missing. ``_heal`` on entry
covers the crash case, not a live race.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import merge_snapshot

SNAPSHOT_SUBDIR = "snapshot"

# One task writes each bucket (the repartition("__bucket") below), so a
# bucket that outgrows one sensible file must shard WITHIN the task:
# maxRecordsPerFile rolls the writer to a new file past this row count
# (guide §6 output sizing — the in-code remedy the r13 verdict asked to
# wire up). Local default keeps today's one-file-per-bucket layout
# (buckets are ≪ 5M rows at bench SFs); deployments size via env.
_CDC_MAX_RECORDS_PER_FILE = int(
    os.environ.get("SPARK_GRAFT_CDC_MAX_RECORDS_PER_FILE", "5000000")
)


class CdcUpsertSink:
    """``foreachBatch`` target: applies each changelog micro-batch to a
    persisted parquet snapshot with latest-wins semantics. Safe under
    epoch re-delivery (idempotent merge) and crashes at any step
    (rename-aside swap + entry-time healing). ``n_buckets=N`` switches
    to the key-hash-bucketed layout where an epoch rewrites only the
    buckets its batch touches (the 100 TB shape — see module
    docstring); ``None`` keeps the monolithic full-rewrite snapshot."""

    def __init__(
        self,
        out_dir: str,
        key: str,
        version: str,
        op_col: str = "op",
        n_buckets: int | None = None,
    ) -> None:
        self.out_dir = out_dir
        self.key = key
        self.version = version
        self.op_col = op_col
        self.n_buckets = n_buckets

    @property
    def snapshot_dir(self) -> str:
        return os.path.join(self.out_dir, SNAPSHOT_SUBDIR)

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets))

    def _bucket_dir(self, i: int) -> str:
        return os.path.join(self.snapshot_dir, f"__bucket={i}")

    def _old_dir(self, i: int) -> str:
        return os.path.join(self.out_dir, f"__old_b{i}")

    # -- filesystem helpers (Hadoop FS so the same code runs on HDFS)
    def _fs(self, spark: SparkSession):
        jvm = spark._jvm  # noqa: SLF001
        Path = jvm.org.apache.hadoop.fs.Path
        conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
        return Path, Path(self.snapshot_dir).getFileSystem(conf)

    def _heal(self, spark: SparkSession) -> None:
        """Entry-time recovery from a crash mid-swap: an orphaned aside
        dir with its snapshot (bucket) missing is the pre-batch state —
        rename it back (the replayed epoch redoes the merge); a stale
        ``__staged`` from a crash before the swap is garbage, and a
        stale aside whose bucket DOES exist is a crash after swap-in
        (the epoch will replay; drop it)."""
        Path, fs = self._fs(spark)
        staged = Path(self.snapshot_dir + "__staged")
        if fs.exists(staged):
            fs.delete(staged, True)
        if self.n_buckets is None:
            snap = Path(self.snapshot_dir)
            old = Path(self.snapshot_dir + "__old")
            if fs.exists(old) and not fs.exists(snap):
                fs.rename(old, snap)
            return
        out = Path(self.out_dir)
        if not fs.exists(out):
            return
        for st in fs.listStatus(out):
            name = st.getPath().getName()
            if not name.startswith("__old_b"):
                continue
            i = int(name[len("__old_b"):])
            bucket = Path(self._bucket_dir(i))
            if fs.exists(bucket):
                fs.delete(st.getPath(), True)
            else:
                fs.rename(st.getPath(), bucket)

    def init_snapshot(self, base: DataFrame) -> None:
        """Seed the snapshot with the base table (version column
        included) — the bootstrap load before the change stream runs.
        Bucketed mode lays the seed out as ``__bucket=i`` partition
        dirs so the first epoch already swaps per-bucket."""
        if self.n_buckets is None:
            base.write.mode("overwrite").parquet(self.snapshot_dir)
        else:
            # repartition by bucket before the partitioned write: without
            # it every upstream task opens a file in every bucket dir it
            # holds rows for (tasks × buckets small files — measured 512
            # file creates for a 32-partition seed into 16 buckets);
            # with it each bucket is one task writing one right-sized
            # file (guide §6 output sizing — at deployment scale a
            # few-GB bucket per file; shard wider via
            # spark.sql.files.maxRecordsPerFile if buckets outgrow that)
            base.withColumn("__bucket", self._bucket_expr()).repartition(
                "__bucket"
            ).write.mode("overwrite").option(
                "maxRecordsPerFile", _CDC_MAX_RECORDS_PER_FILE
            ).partitionBy("__bucket").parquet(
                self.snapshot_dir
            )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        self._heal(spark)
        if self.n_buckets is None:
            self._apply_monolithic(spark, batch_df)
        else:
            self._apply_bucketed(spark, batch_df)

    def _apply_monolithic(self, spark: SparkSession, batch_df: DataFrame) -> None:
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

    def _apply_bucketed(self, spark: SparkSession, batch_df: DataFrame) -> None:
        """The epoch cost is proportional to the buckets the batch
        TOUCHES, never to snapshot size: read touched buckets, merge,
        stage partitioned-by-bucket, swap each touched bucket with the
        same rename-aside the monolithic path uses. A bucket emptied by
        deletes legitimately ends the epoch absent (staged has no dir
        for it) — readers treat a missing bucket as empty."""
        Path, fs = self._fs(spark)
        touched = sorted(
            r["__b"]
            for r in batch_df.select(
                self._bucket_expr().alias("__b")
            ).distinct().collect()
        )
        paths = [
            p for p in (self._bucket_dir(i) for i in touched)
            if fs.exists(Path(p))
        ]
        data_cols = [c for c in batch_df.columns if c != self.op_col]
        if paths:
            current = spark.read.parquet(*paths)
        else:
            current = spark.createDataFrame(
                [], batch_df.select(*data_cols).schema
            )
        merged = merge_snapshot(
            current,
            batch_df.select(*current.columns, self.op_col),
            self.key,
            self.version,
            op_col=self.op_col,
        )
        staged_root = self.snapshot_dir + "__staged"
        # same tasks×buckets small-file avoidance as init_snapshot: the
        # epoch-sized merge output shuffles once by bucket so each
        # touched bucket is staged as one file, not one per merge task
        merged.withColumn("__bucket", self._bucket_expr()).repartition(
            "__bucket"
        ).write.mode("overwrite").option(
            "maxRecordsPerFile", _CDC_MAX_RECORDS_PER_FILE
        ).partitionBy("__bucket").parquet(staged_root)
        for i in touched:
            old = Path(self._old_dir(i))
            if fs.exists(old):
                fs.delete(old, True)
            bucket = Path(self._bucket_dir(i))
            staged_b = Path(os.path.join(staged_root, f"__bucket={i}"))
            had_old = fs.exists(bucket)
            if had_old and not fs.rename(bucket, old):
                raise IOError(f"cdc swap: rename-aside of bucket {i} failed")
            if fs.exists(staged_b):
                if not fs.rename(staged_b, bucket):
                    if had_old:
                        fs.rename(old, bucket)  # restore readability
                    raise IOError(
                        f"cdc swap: swap-in of bucket {i} failed; restored"
                    )
            if had_old:
                fs.delete(old, True)
        fs.delete(Path(staged_root), True)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        self._heal(spark)
        df = spark.read.parquet(self.snapshot_dir)
        if self.n_buckets is not None:
            # partition discovery surfaces the bucket dirs as a
            # `__bucket` column — derivable from the key, drop it
            df = df.drop("__bucket")
        return df


def run_cdc_stream(
    spark: SparkSession,
    base: DataFrame,
    changes_dir: str,
    out_dir: str,
    key: str,
    version: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    n_buckets: int | None = None,
) -> "CdcUpsertSink":
    """Drain a file-drop changelog directory into a maintained snapshot
    (availableNow trigger — each changelog file is one micro-batch, the
    multi-epoch shape the replay/restart pytests exercise). Seeds the
    snapshot from ``base`` only when no snapshot exists yet, so a
    RESTART resumes the maintained state instead of resetting it."""
    sink = CdcUpsertSink(
        out_dir, key=key, version=version, n_buckets=n_buckets
    )
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
_Q159_CLEANUP_REGISTERED = False


def q159_cdc_stream_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q135's changelog applied as a STREAM — updates and deletes land
    as separate micro-batches through the foreachBatch upsert (bucketed
    snapshot, n_buckets=16 — each epoch rewrites only the buckets its
    keys hash into), then the maintained snapshot is rolled up exactly
    like the batch twin, so q135's oracle SQL hash-checks the streaming
    path end-to-end (the kappa-architecture parity contract, same as
    q38/q101/q147). The work dir is a deterministic per-process path
    cleaned EAGERLY on entry, so repeated registry/bench runs in one
    session never accumulate snapshot-sized temp dirs."""
    import atexit
    import shutil

    from ..operators.cdc import _orders_changelog, snapshot_rollup
    from ..session import scratch_dir_base
    from ..sources.parquet import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn("__v", F.lit(1))
    changelog = _orders_changelog(orders)
    # per-run throwaway work (changes drop, snapshot, checkpoint) on the
    # fast scratch base (tmpfs where present — session.scratch_dir_base)
    work = os.path.join(
        scratch_dir_base(), f"cdc_stream_q159_{os.getpid()}"
    )
    shutil.rmtree(work, ignore_errors=True)
    global _Q159_CLEANUP_REGISTERED
    if not _Q159_CLEANUP_REGISTERED:
        atexit.register(shutil.rmtree, work, ignore_errors=True)
        _Q159_CLEANUP_REGISTERED = True
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
        n_buckets=16,
    )
    return snapshot_rollup(sink.snapshot(spark))
