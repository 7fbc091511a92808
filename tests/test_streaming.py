"""Structured Streaming events path — the micro-batch result must match
the batch q19 rollup on the same data (kappa parity), with watermarked
state (VERDICT next-round #9's bar)."""

from __future__ import annotations

import pytest

from dbt_nlp_sqlizer_team04_spark.operators.relational import q19_events_hourly
from dbt_nlp_sqlizer_team04_spark.streaming.events import (
    hourly_agg,
    hourly_rollup_stream,
    run_to_memory_sink,
)


def test_stream_matches_batch(spark, sf_smoke):
    batch = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"], r["avg_value"])
        for r in q19_events_hourly(spark, sf_smoke).collect()
    }
    streamed = run_to_memory_sink(spark, sf_smoke, table_name="t_stream_parity")
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"], r["avg_value"])
        for r in streamed.collect()
    }
    assert got == batch
    assert len(got) > 0


def test_stream_plan_is_stateful_with_watermark(spark, sf_smoke):
    df = hourly_rollup_stream(spark, sf_smoke)
    assert df.isStreaming
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "extended"
    )
    assert "watermark" in plan.lower()


def test_hourly_agg_shared_shape(spark, sf_smoke):
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    batch_df = hourly_agg(load_table(spark, sf_smoke, "events"), streaming=False)
    assert batch_df.columns == [
        "hour_start", "event_type", "n_events", "sum_value", "avg_value",
    ]
    assert not batch_df.isStreaming
