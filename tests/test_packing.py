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
