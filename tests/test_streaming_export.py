"""Exactly-once streaming export (streaming/export.py): re-delivered
micro-batches must not duplicate data, and the merged per-batch manifest
must equal the batch-side q68 manifest over the same rows."""

from __future__ import annotations

import os

from dbt_nlp_sqlizer_team04_spark.operators.packing import shard_manifest
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
from dbt_nlp_sqlizer_team04_spark.streaming.export import (
    ExactlyOnceShardSink,
    export_stream,
    exported_data,
    exported_manifest,
)

N_SHARDS = 8


def _rows(df):
    return sorted(
        (r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()
    )


def _manifest_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_export(spark, sf_smoke, tmp_path):
    docs = (
        load_table(spark, sf_smoke, "documents").select("doc_id", "text").cache()
    )
    drop = tmp_path / "docs_drop"
    drop.mkdir()
    for m in range(3):  # three files -> three micro-batches
        docs.where(f"doc_id % 3 = {m}").write.parquet(str(drop / f"p{m}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(drop) + "/*")
    )
    out = str(tmp_path / "export")
    q = export_stream(stream, out, n_shards=N_SHARDS)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    return docs, out


def test_streamed_manifest_matches_batch_manifest(spark, sf_smoke, tmp_path):
    """Merging the per-batch manifest deltas must reproduce the q68
    manifest computed directly over the full corpus — counts, char
    volumes, id ranges, AND content checksums."""
    docs, out = _run_export(spark, sf_smoke, tmp_path)
    got = _manifest_rows(exported_manifest(spark, out))
    want = _manifest_rows(shard_manifest(docs, N_SHARDS))
    assert got == want
    assert len(got) > 0
    # every source row landed exactly once
    assert _rows(exported_data(spark, out)) == _rows(docs)


def test_replayed_batch_changes_nothing(spark, sf_smoke, tmp_path):
    """Crash-replay: foreachBatch re-delivers an epoch with the same
    batch_id and data. Re-invoking the sink must leave the exported
    rows AND the cumulative manifest exactly as they were — no
    duplicates, no checksum drift."""
    docs, out = _run_export(spark, sf_smoke, tmp_path)
    before_rows = _rows(exported_data(spark, out))
    before_manifest = _manifest_rows(exported_manifest(spark, out))

    sink = ExactlyOnceShardSink(out, n_shards=N_SHARDS)
    # a real replay re-delivers batch 0's rows FROM THE SOURCE
    # (checkpointed offsets), so materialize them before handing the
    # frame to the sink — reading lazily out of the directory being
    # overwritten would race with the rewrite
    epoch_rows = (
        spark.read.parquet(sink.data_dir(0)).select("doc_id", "text").collect()
    )
    assert len(epoch_rows) > 0  # the replayed epoch is non-trivial
    replay = spark.createDataFrame(epoch_rows, "doc_id long, text string")
    sink(replay, 0)  # same batch_id, same rows — at-least-once delivery

    assert _rows(exported_data(spark, out)) == before_rows
    assert _manifest_rows(exported_manifest(spark, out)) == before_manifest


def test_batches_partition_the_corpus(spark, sf_smoke, tmp_path):
    """Each batch directory holds a disjoint, non-empty slice and the
    union is the corpus (availableNow drained everything)."""
    docs, out = _run_export(spark, sf_smoke, tmp_path)
    data = exported_data(spark, out)
    per_batch = {
        r["batch_id"]: r["n"]
        for r in data.groupBy("batch_id").count().withColumnRenamed("count", "n").collect()
    }
    assert len(per_batch) == 3
    assert all(n > 0 for n in per_batch.values())
    assert sum(per_batch.values()) == docs.count()
    ids = [r["doc_id"] for r in data.select("doc_id").collect()]
    assert len(ids) == len(set(ids))  # disjoint across batches


def test_empty_batch_is_a_noop(spark, sf_smoke, tmp_path):
    """A 0-row epoch must not crash the sink or leave artifacts."""
    docs, out = _run_export(spark, sf_smoke, tmp_path)
    before = _manifest_rows(exported_manifest(spark, out))
    sink = ExactlyOnceShardSink(out, n_shards=N_SHARDS)
    empty = spark.createDataFrame([], "doc_id long, text string")
    sink(empty, 99)
    assert not os.path.exists(sink.data_dir(99))
    assert _manifest_rows(exported_manifest(spark, out)) == before


def test_curated_export_stream_end_to_end(spark, sf_smoke, tmp_path):
    """Gate → exactly-once export composed in one streaming query: the
    exported rows are exactly the batch q76 passers, no duplicates, and
    the merged manifest equals the batch shard_manifest of the same
    survivor set."""
    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.packing import shard_manifest
    from dbt_nlp_sqlizer_team04_spark.operators.text import q76_gopher_quality
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
    from dbt_nlp_sqlizer_team04_spark.streaming.documents import (
        curated_export_stream,
    )
    from dbt_nlp_sqlizer_team04_spark.streaming.export import (
        exported_data,
        exported_manifest,
    )

    out = str(tmp_path / "curated")
    q = curated_export_stream(spark, sf_smoke, out)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    passers = {
        r["doc_id"]
        for r in q76_gopher_quality(spark, sf_smoke)
        .where(F.col("passes") == 1)
        .collect()
    }
    got_ids = [r["doc_id"] for r in exported_data(spark, out).collect()]
    assert sorted(got_ids) == sorted(passers)  # exact set, no dupes

    docs = load_table(spark, sf_smoke, "documents")
    want_manifest = sorted(
        tuple(r)
        for r in shard_manifest(
            docs.where(F.col("doc_id").isin(list(passers))), n_shards=8
        ).collect()
    )
    got_manifest = sorted(
        tuple(r) for r in exported_manifest(spark, out).collect()
    )
    assert got_manifest == want_manifest


def test_checkpoint_restart_processes_only_new_files(spark, sf_smoke, tmp_path):
    """Stop/restart recovery: a second run of the export over the SAME
    checkpoint skips everything already committed — only files dropped
    after the stop are processed, and the cumulative manifest still
    equals the batch-mode manifest over the union."""
    import os

    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.packing import shard_manifest
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
    from dbt_nlp_sqlizer_team04_spark.streaming.export import (
        export_stream,
        exported_manifest,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") < 25)
    second = docs.filter(F.col("doc_id") >= 25)

    drop_dir = str(tmp_path / "drop")
    out_dir = str(tmp_path / "out")
    first.coalesce(1).write.mode("append").parquet(drop_dir)

    def run_once():
        stream = (
            spark.readStream.schema(docs.schema).parquet(drop_dir)
        )
        q = export_stream(stream, out_dir, n_shards=8)
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    run_once()
    batches_after_first = set(os.listdir(os.path.join(out_dir, "data")))

    # drop a second file and RESTART from the same checkpoint
    second.coalesce(1).write.mode("append").parquet(drop_dir)
    run_once()
    batches_after_second = set(os.listdir(os.path.join(out_dir, "data")))

    # the first run's batch directories are untouched; new batches hold
    # ONLY the new file's rows
    new_batches = batches_after_second - batches_after_first
    assert new_batches, "restart must process the newly dropped file"
    new_ids = set()
    for b in new_batches:
        new_ids |= {
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(out_dir, "data", b)
            ).collect()
        }
    assert new_ids == {r["doc_id"] for r in second.collect()}

    # cumulative manifest == batch-mode manifest over everything
    got = {
        r["shard"]: (r["n_docs"], r["total_chars"])
        for r in exported_manifest(spark, out_dir).collect()
    }
    want = {
        r["shard"]: (r["n_docs"], r["total_chars"])
        for r in shard_manifest(docs, 8).collect()
    }
    assert got == want


def test_observed_audit_matches_independent_recount(spark, sf_smoke, tmp_path):
    """The per-batch df.observe audit (captured DURING each micro-batch
    write, zero extra scan) must merge to exactly the metrics an
    independent recount over the exported rows computes — and must stay
    equal across a crash-replay of an epoch, with the manifest equality
    untouched."""
    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.streaming.export import exported_audit

    docs, out = _run_export(spark, sf_smoke, tmp_path)

    def recount():
        return tuple(
            exported_data(spark, out)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.length("text")).alias("total_chars"),
                F.sum(F.col("doc_id").isNull().cast("long")).alias("null_ids"),
                F.sum(
                    (F.coalesce(F.length(F.trim("text")), F.lit(0)) == 0)
                    .cast("long")
                ).alias("empty_texts"),
                F.min("doc_id").alias("min_id"),
                F.max("doc_id").alias("max_id"),
            )
            .collect()[0]
        )

    audit_before = tuple(exported_audit(spark, out).collect()[0])
    assert audit_before == recount()
    assert audit_before[0] == docs.count() and audit_before[2] == 0

    # crash-replay of epoch 0: audit, data, and manifest all unchanged
    sink = ExactlyOnceShardSink(out, n_shards=N_SHARDS)
    epoch_rows = (
        spark.read.parquet(sink.data_dir(0)).select("doc_id", "text").collect()
    )
    manifest_before = _manifest_rows(exported_manifest(spark, out))
    replay = spark.createDataFrame(epoch_rows, "doc_id long, text string")
    sink(replay, 0)
    assert tuple(exported_audit(spark, out).collect()[0]) == audit_before
    assert tuple(exported_audit(spark, out).collect()[0]) == recount()
    assert _manifest_rows(exported_manifest(spark, out)) == manifest_before


def test_dedup_then_export_composition(spark, sf_smoke, tmp_path):
    """ONE streaming query: watermarked slot dedup feeding the
    exactly-once export. A redelivered copy of the whole stream must
    produce (a) no duplicate slots in the exported data, (b) a merged
    manifest EQUAL to the batch twin's (q106 hourly-first slots through
    q68's shard_manifest), and (c) an observed audit equal to the
    recount — all after at-least-once delivery."""
    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        hourly_first_events,
    )
    from dbt_nlp_sqlizer_team04_spark.streaming.events import (
        dedup_export_stream,
        slot_columns,
    )
    from dbt_nlp_sqlizer_team04_spark.streaming.export import exported_audit

    events = load_table(spark, sf_smoke, "events").limit(1000).cache()
    drop = tmp_path / "ev_redelivered"
    raw = events.withColumn("ts", F.unix_micros("ts") * 1000)  # nanos layout
    raw.write.parquet(str(drop / "d0"))
    raw.write.parquet(str(drop / "d1"))  # at-least-once redelivery

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(drop) + "/*")
    )
    out = str(tmp_path / "ev_export")
    q = dedup_export_stream(spark, sf_smoke, out, n_shards=N_SHARDS, stream=stream)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    data = exported_data(spark, out)
    slots = [r["slot_id"] for r in data.select("slot_id").collect()]
    assert len(slots) == len(set(slots))  # no duplicate slots exported

    twin = slot_columns(hourly_first_events(events))
    want = _manifest_rows(
        shard_manifest(twin, N_SHARDS, "slot_id", "slot_key")
    )
    got = _manifest_rows(exported_manifest(spark, out))
    assert got == want

    audit = exported_audit(spark, out).collect()[0]
    assert audit["n_rows"] == len(slots) == twin.count()
    assert audit["null_ids"] == 0
    events.unpersist()
