"""Sequence packing (operators/packing.py): deterministic greedy
assignment of documents to token-budget sequences."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators.packing import pack_sequences
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table


def test_packing_partition_invariant(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = sorted(tuple(r) for r in pack_sequences(docs.repartition(1)).collect())
    b = sorted(tuple(r) for r in pack_sequences(docs.repartition(16)).collect())
    assert a == b and a


def test_packing_respects_capacity(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    out = pack_sequences(docs, capacity=512)
    per_seq = (
        out.groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    # a multi-doc sequence never exceeds capacity; only a single
    # oversized document may
    for r in per_seq:
        assert r["total"] <= 512 or r["n"] == 1
    # every document is assigned exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_packing_oversized_doc_gets_own_sequence(spark):
    rows = [
        (0, "w " * 10),     # 10 tokens
        (8, "w " * 900),    # oversized: alone in its sequence
        (16, "w " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # doc_ids multiples of 8 may share a shard; force one shard to make
    # the greedy order deterministic for the assert
    out = {
        r["doc_id"]: (r["shard"], r["seq_id"])
        for r in pack_sequences(df, capacity=100, n_shards=1).collect()
    }
    assert out[0][1] == 0
    assert out[8][1] == 1     # overflow starts a new sequence
    assert out[16][1] == 2    # oversized seq is closed immediately after


def test_materialize_sequences_consistent_with_packing(spark, sf_smoke):
    from dbt_nlp_sqlizer_team04_spark.operators.packing import (
        materialize_sequences,
        pack_sequences,
    )

    docs = load_table(spark, sf_smoke, "documents")
    packed = pack_sequences(docs)
    seqs = materialize_sequences(docs)
    # doc counts per sequence agree with the assignment
    want = {
        (r["shard"], r["seq_id"]): r["n"]
        for r in packed.groupBy("shard", "seq_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {(r["shard"], r["seq_id"]): r["n_docs"] for r in seqs.collect()}
    assert got == want
    # concatenation is in ascending doc_id order (spot-check one multi-doc seq)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    multi = next(r for r in seqs.collect() if r["n_docs"] > 1)
    members = sorted(
        r["doc_id"]
        for r in packed.where(
            (F.col("shard") == multi["shard"])
            & (F.col("seq_id") == multi["seq_id"])
        ).collect()
    )
    assert multi["text"] == "\n".join(texts[d] for d in members)


def test_chunk_documents_semantics(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.packing import chunk_documents

    text = "abcdefghij" * 12  # 120 chars
    rows = [(1, text), (2, ""), (3, "short")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_chars=50, overlap=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: offsets 0,40,80 (stride 40), each 50 chars except the tail
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [0, 40, 80]
    assert [r["chunk_len"] for r in c1] == [50, 50, 40]
    # consecutive chunks overlap by exactly 10 chars
    assert c1[0]["chunk_text"][40:] == c1[1]["chunk_text"][:10]
    # stride-concatenation reconstructs the original text
    rebuilt = c1[0]["chunk_text"] + "".join(r["chunk_text"][10:] for r in c1[1:])
    assert rebuilt == text
    # empty text yields one empty chunk; short text one full chunk
    assert [(r["chunk_start"], r["chunk_len"]) for r in by_doc[2]] == [(0, 0)]
    assert [(r["chunk_start"], r["chunk_len"]) for r in by_doc[3]] == [(0, 5)]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from dbt_nlp_sqlizer_team04_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=100, overlap=100)


def test_chunk_documents_no_shuffle(spark, sf_smoke):
    """Chunking must plan as a scan-fused flat map — zero Exchange."""
    from dbt_nlp_sqlizer_team04_spark.operators.packing import chunk_documents
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    df = chunk_documents(load_table(spark, sf_smoke, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_shard_manifest_append_stable_and_detects_corruption(spark, sf_smoke):
    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.packing import shard_manifest
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    # cache is unpersisted at the end: a leaked full-table cache entry
    # shadows later plans (it broke q50's column-pruning contract test)
    docs = load_table(spark, sf_smoke, "documents").cache()
    base = {r["shard"]: r for r in shard_manifest(docs).collect()}
    # appending new docs must not move any existing doc between shards:
    # per-shard counts can only grow
    appended = docs.union(
        docs.limit(37).select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        ).select(docs.columns)
    )
    after = {r["shard"]: r for r in shard_manifest(appended).collect()}
    assert all(after[s]["n_docs"] >= base[s]["n_docs"] for s in base)
    assert sum(after[s]["n_docs"] for s in after) == sum(
        base[s]["n_docs"] for s in base
    ) + 37
    # flipping one character changes exactly that doc's shard checksum
    corrupted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 11, F.concat(F.col("text"), F.lit("X"))).otherwise(
            F.col("text")
        ),
    )
    cafter = {r["shard"]: r for r in shard_manifest(corrupted).collect()}
    changed = [
        s for s in base
        if cafter[s]["content_checksum"] != base[s]["content_checksum"]
    ]
    assert len(changed) == 1
    assert all(
        cafter[s]["n_docs"] == base[s]["n_docs"] for s in base
    )
    docs.unpersist()
