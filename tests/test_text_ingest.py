"""Robust JSONL/CSV ingestion with corrupt-record quarantine
(sources/text_ingest.py): parse what parses, quarantine the rest with
the raw line preserved, never lose or silently drop a record."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from dbt_nlp_sqlizer_team04_spark.sources.text_ingest import (
    ingest_report,
    read_csv_quarantined,
    read_jsonl_quarantined,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _write_jsonl(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_jsonl_good_and_quarantine_split(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    good = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en"})
        for i in range(8)
    ]
    bad = [
        '{"doc_id": 100, "text": "truncated',      # unterminated JSON
        "not json at all",                          # garbage line
        '{"doc_id": "noise", "text": 5, "lang": 3}',  # type violations
    ]
    # interleave so the split can't rely on position
    _write_jsonl(p, good[:4] + bad[:2] + good[4:] + bad[2:])

    g, q, release = read_jsonl_quarantined(spark, str(p), DOC_SCHEMA)
    assert g.columns == ["doc_id", "text", "lang"]
    rows = {r["doc_id"] for r in g.collect()}
    assert rows == set(range(8))
    raw = [r["raw_record"] for r in q.collect()]
    assert len(raw) == 3
    # the raw line is preserved verbatim for replay
    assert any("truncated" in r for r in raw)
    assert "not json at all" in raw

    rep = ingest_report(g, q)
    assert rep == {
        "rows_ingested": 8,
        "rows_quarantined": 3,
        "quarantine_frac": round(3 / 11, 6),
    }
    release()  # unpersists the shared parse; splits stay computable
    # (count() would prune g to the corrupt column alone, which Spark
    # disallows on a raw-text source once the cache is gone — the very
    # restriction the cache exists to satisfy; collect() reads the data
    # columns and stays legal)
    assert len(g.collect()) == 8


def test_jsonl_all_good_zero_quarantine(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    _write_jsonl(
        p, [json.dumps({"doc_id": i, "text": "t", "lang": "en"}) for i in range(5)]
    )
    g, q, release = read_jsonl_quarantined(spark, str(p), DOC_SCHEMA)
    assert g.count() == 5 and q.count() == 0
    assert ingest_report(g, q)["quarantine_frac"] == 0.0
    release()


def test_csv_quarantine_on_malformed_rows(spark, tmp_path):
    p = tmp_path / "docs.csv"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    with open(p, "w") as f:
        f.write("doc_id,n\n")
        f.write("1,10\n")
        f.write("2,notanumber\n")   # type violation → quarantine
        f.write("3,30\n")
    g, q, release = read_csv_quarantined(spark, str(p), schema)
    assert {r["doc_id"] for r in g.collect()} == {1, 3}
    raw = [r["raw_record"] for r in q.collect()]
    assert raw == ["2,notanumber"]
    release()


def test_no_record_lost_or_duplicated(spark, tmp_path):
    """Conservation: every input line lands in exactly one split."""
    p = tmp_path / "mix.jsonl"
    lines = []
    for i in range(50):
        if i % 7 == 0:
            lines.append(f"broken line {i}")
        else:
            lines.append(json.dumps({"doc_id": i, "text": "x", "lang": "en"}))
    _write_jsonl(p, lines)
    g, q, release = read_jsonl_quarantined(spark, str(p), DOC_SCHEMA)
    assert g.count() + q.count() == 50
    assert g.count() == sum(1 for i in range(50) if i % 7 != 0)
    release()
