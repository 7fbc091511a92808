"""Streaming corpus curation — the quality gate as a Structured
Streaming pass over a document file-drop directory (kappa contract: the
SAME ``gopher_signals`` builder the batch q76 path uses, so batch and
stream can never drift).

Real deployment shape: documents land as parquet files in a drop
directory (or a Kafka topic with the same schema); the gate is a
STATELESS projection, so it needs no watermark, scales linearly, and
its output stream feeds the exactly-once sharded export
(streaming/export.py) or a downstream curation funnel.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import (
    GOPHER_Q76_MAX_WORDS,
    GOPHER_Q76_MIN_WORDS,
    GOPHER_Q76_STOPWORDS,
    gopher_signals,
)

_STAGE_DIRS: dict[str, str] = {}


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (same staged
    symlink layout as ``events.read_events_stream``)."""
    stage = _STAGE_DIRS.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="documents_stream_")
        os.symlink(
            os.path.join(sf_dir, "documents.parquet"),
            os.path.join(stage, "documents.parquet"),
        )
        _STAGE_DIRS[sf_dir] = stage
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
    schema = (
        spark.read.parquet(os.path.join(stage, "documents.parquet")).schema
    )
    return spark.readStream.schema(schema).format("parquet").load(stage)


def quality_gate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Gopher gate with the q76 thresholds — one stateless
    projection per micro-batch, append-mode safe."""
    return gopher_signals(
        read_documents_stream(spark, sf_dir),
        min_words=GOPHER_Q76_MIN_WORDS,
        max_words=GOPHER_Q76_MAX_WORDS,
        stopwords=GOPHER_Q76_STOPWORDS,
    )


def quality_gate_to_memory(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "doc_quality_stream",
    timeout_s: int = 120,
) -> DataFrame:
    """Drain the gate stream into a memory sink (append mode — the op
    is stateless) and return the sink contents."""
    q = (
        quality_gate_stream(spark, sf_dir)
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


def curated_export_stream(
    spark: SparkSession, sf_dir: str, out_dir: str, n_shards: int = 8
):
    """The full streaming curation loop in ONE query: file-drop source →
    inline Gopher pass filter (payload kept) → exactly-once sharded
    export with content-addressed manifest. Returns the StreamingQuery;
    survivors land partitioned by shard under ``out_dir`` and the
    merged manifest equals the batch shard_manifest over the same
    survivor set (pytest pins both)."""
    from ..operators.text import gopher_passes_expr
    from .export import export_stream

    survivors = read_documents_stream(spark, sf_dir).where(
        gopher_passes_expr(
            min_words=GOPHER_Q76_MIN_WORDS,
            max_words=GOPHER_Q76_MAX_WORDS,
            stopwords=GOPHER_Q76_STOPWORDS,
        )
    )
    return export_stream(survivors, out_dir, n_shards=n_shards)


def signature_index_stream(
    spark: SparkSession, sf_dir: str, out_dir: str
):
    """Streaming INDEX MAINTENANCE: documents arriving on the file-drop
    stream get their MinHash signatures computed by the SAME stateless
    builder batch ingest uses (``dedup.minhash_signatures``) and
    appended to a parquet signature index — "ingest is a stream": the
    dedup/ANN index artifacts the batch plane persists once per corpus
    stay current per micro-batch instead of being rebuilt. Stateless
    projection → append mode, exactly-once by Spark's file-sink commit
    log; the parity test pins stream-built == batch-built signatures.
    """
    from ..operators.dedup import minhash_signatures

    sigs = minhash_signatures(read_documents_stream(spark, sf_dir))
    return (
        sigs.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "signatures"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
