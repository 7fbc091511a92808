"""Exactly-once streaming export: a ``foreachBatch`` parquet sink whose
commit is idempotent under micro-batch re-delivery, audited by the same
content-addressed shard manifest the batch export ships (q68,
``operators/packing.shard_manifest``).

Structured Streaming guarantees ``foreachBatch`` is invoked
at-least-once per epoch — after a crash between the user write and the
checkpoint commit, the SAME batch_id is re-delivered with the SAME data
(the file/Kafka sources replay deterministically from the checkpointed
offsets). Exactly-once therefore reduces to making the write a pure
function of ``batch_id`` (the pattern the Spark docs themselves
recommend for foreachBatch sinks):

- batch data lands under ``out_dir/batch_id=<id>/`` with
  ``mode("overwrite")`` — a replay rewrites the same directory to the
  same content instead of appending a duplicate;
- the batch's shard-manifest DELTA lands under
  ``manifest/batch_id=<id>/`` the same way. Every manifest column is a
  commutative monoid (count/sum/min/max), so the cumulative manifest of
  the whole export is a groupBy-merge of the per-batch deltas — and
  because shard membership is ``md5(id) % n_shards`` (append-stable),
  that merged manifest is IDENTICAL to re-deriving ``shard_manifest``
  over all exported rows, which is the replay test's oracle.

Scale/deployment notes: single-writer semantics (one streaming query
owns ``out_dir``) — concurrent writers need an ACID table format
underneath, same caveat as every directory-layout sink; per-batch
directories keep the overwrite blast radius to one epoch; shard
membership is a pure function of the id, so downstream consumers can
subscribe to a shard without reshuffling history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.packing import shard_manifest
from ..operators.sampling import hash_bucket_expr

MANIFEST_SUBDIR = "_manifest"
AUDIT_SUBDIR = "_audit"
DATA_SUBDIR = "data"


class ExactlyOnceShardSink:
    """``foreachBatch`` target: idempotent sharded parquet writer with a
    per-batch manifest delta. Safe to call again with the same
    ``batch_id`` (crash-replay): both writes overwrite to identical
    content."""

    def __init__(
        self,
        out_dir: str,
        n_shards: int = 32,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.out_dir = out_dir
        self.n_shards = n_shards
        self.id_col = id_col
        self.text_col = text_col

    def data_dir(self, batch_id: int | None = None) -> str:
        base = os.path.join(self.out_dir, DATA_SUBDIR)
        return base if batch_id is None else os.path.join(
            base, f"batch_id={batch_id}"
        )

    def manifest_dir(self, batch_id: int | None = None) -> str:
        base = os.path.join(self.out_dir, MANIFEST_SUBDIR)
        return base if batch_id is None else os.path.join(
            base, f"batch_id={batch_id}"
        )

    def audit_dir(self, batch_id: int | None = None) -> str:
        base = os.path.join(self.out_dir, AUDIT_SUBDIR)
        return base if batch_id is None else os.path.join(
            base, f"batch_id={batch_id}"
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch fires with 0-row batches (no-new-data trigger,
        # watermark-advance epochs, restart of a drained stream); an
        # empty write leaves a _SUCCESS-only directory whose read-back
        # cannot infer a schema and would kill the query
        if batch_df.isEmpty():
            return
        # the data write rides the observed-write audit: df.observe
        # metrics are captured DURING the write pass (zero extra scan),
        # on a re-homed child session (audited_write's
        # ObservationManager-serialization workaround — foreachBatch's
        # micro-batch session must stay Java-serializable for the
        # streaming checkpointer). strict=False: the export is a sink,
        # not a quality gate — violations are recorded per batch, not
        # thrown mid-stream.
        from ..sources.audited_write import write_parquet_audited

        audit = write_parquet_audited(
            batch_df.withColumn(
                "shard",
                hash_bucket_expr(F.col(self.id_col), self.n_shards).cast(
                    "int"
                ),
            ),
            self.data_dir(batch_id),
            id_col=self.id_col,
            text_col=self.text_col,
            strict=False,
            partition_by=["shard"],
        )
        # persist the per-batch audit idempotently (same overwrite-by-
        # batch_id contract as the data and manifest deltas, so a
        # replayed epoch rewrites an identical audit row)
        spark = batch_df.sparkSession
        spark.createDataFrame(
            [
                (
                    int(audit.n_rows),
                    int(audit.total_chars),
                    int(audit.null_ids),
                    int(audit.empty_texts),
                    audit.min_id,
                    audit.max_id,
                )
            ],
            "n_rows long, total_chars long, null_ids long, "
            "empty_texts long, min_id long, max_id long",
        ).coalesce(1).write.mode("overwrite").parquet(
            self.audit_dir(batch_id)
        )
        # the delta is derived from the rows just WRITTEN (read-back),
        # so a manifest row can never describe data that didn't land
        delta = shard_manifest(
            spark.read.parquet(self.data_dir(batch_id)),
            self.n_shards,
            self.id_col,
            self.text_col,
        )
        delta.write.mode("overwrite").parquet(self.manifest_dir(batch_id))


def export_stream(
    stream_df: DataFrame,
    out_dir: str,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Run the exactly-once sharded export over a streaming frame until
    the currently-available data is drained (``availableNow``)."""
    sink = ExactlyOnceShardSink(out_dir, n_shards, id_col, text_col)
    return (
        stream_df.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )


def exported_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Cumulative manifest of everything exported so far: merge the
    per-batch deltas shard-by-shard (pure monoid merge — no data
    re-read). Matches ``shard_manifest`` over the full exported data
    exactly; the replay pytest pins that equality."""
    deltas = spark.read.option("basePath", os.path.join(out_dir, MANIFEST_SUBDIR)).parquet(
        os.path.join(out_dir, MANIFEST_SUBDIR, "batch_id=*")
    )
    return (
        deltas.groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_chars").alias("total_chars"),
            F.min("min_doc_id").alias("min_doc_id"),
            F.max("max_doc_id").alias("max_doc_id"),
            F.sum("content_checksum").alias("content_checksum"),
        )
        .orderBy("shard")
    )


def exported_audit(spark: SparkSession, out_dir: str) -> DataFrame:
    """Cumulative observed-write audit: merge the per-batch df.observe
    metrics (every column a commutative monoid, same merge law as the
    manifest). Equals an independent recount over ``exported_data`` —
    the zero-extra-scan validation the pytest pins across a
    crash-replay."""
    audits = spark.read.option(
        "basePath", os.path.join(out_dir, AUDIT_SUBDIR)
    ).parquet(os.path.join(out_dir, AUDIT_SUBDIR, "batch_id=*"))
    return audits.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("total_chars").alias("total_chars"),
        F.sum("null_ids").alias("null_ids"),
        F.sum("empty_texts").alias("empty_texts"),
        F.min("min_id").alias("min_id"),
        F.max("max_id").alias("max_id"),
    )


def exported_data(spark: SparkSession, out_dir: str) -> DataFrame:
    """All exported rows across batches (shard is a partition column)."""
    return spark.read.option(
        "basePath", os.path.join(out_dir, DATA_SUBDIR)
    ).parquet(os.path.join(out_dir, DATA_SUBDIR, "batch_id=*"))
