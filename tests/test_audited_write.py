"""Observed-write audit (sources/audited_write.py): metrics captured
during the single write pass must equal an independent recount of the
written files, and invariant violations must be counted + raised.

Session-isolation regression: this file sorts BEFORE test_classifier,
whose LR model serializes its SparkSession inside a prediction UDF —
if write_parquet_audited ever observes on the CALLER's session again
(materializing the non-serializable observationManager, see the
re-home comment in the module), the classifier test fails with
"Task not serializable: ObservationManager"."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.sources.audited_write import (
    AuditViolation,
    write_parquet_audited,
)
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table


def test_observed_metrics_match_recount(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    out = str(tmp_path / "curated")
    audit = write_parquet_audited(docs, out)

    back = spark.read.parquet(out)
    recount = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).first()
    assert audit.n_rows == recount["n"] > 0
    assert audit.total_chars == recount["chars"]
    assert audit.min_id == recount["lo"]
    assert audit.max_id == recount["hi"]
    assert audit.null_ids == 0
    assert audit.empty_texts == 0


def test_violations_counted_and_raised(spark, tmp_path):
    rows = [(1, "ok"), (None, "no id"), (3, "   "), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "dirty")
    with pytest.raises(AuditViolation) as exc:
        write_parquet_audited(df, out)
    m = exc.value.metrics
    assert m["null_ids"] == 1
    assert m["empty_texts"] == 2  # blank-only and NULL text both count
    # the write itself completed — quarantine, not re-run, is the remedy
    assert spark.read.parquet(out).count() == 4


def test_non_strict_returns_metrics(spark, tmp_path):
    df = spark.createDataFrame([(None, "x")], "doc_id long, text string")
    audit = write_parquet_audited(
        df, str(tmp_path / "lax"), strict=False
    )
    assert audit.null_ids == 1 and audit.n_rows == 1
