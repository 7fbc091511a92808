"""As-of join and sessionization behavior on hand-built fixtures (the
registry entries q44/q45 are oracle-checked against DuckDB ASOF JOIN /
window SQL)."""

from __future__ import annotations

from datetime import datetime

from dbt_nlp_sqlizer_team04_spark.operators.timeseries import asof_join, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basics(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05")),
            (2, "A", _ts("2024-01-01 10:00:00")),  # exactly at a quote
            (3, "A", _ts("2024-01-01 09:59:00")),  # before any quote
            (4, "B", _ts("2024-01-01 10:00:10")),
        ],
        "trade_id int, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:04"), 101.0),
            ("B", _ts("2024-01-01 10:00:09"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )
    out = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", ["px"], tiebreak_col="trade_id"
        ).collect()
    }
    assert out == {1: 101.0, 2: 100.0, 3: None, 4: 50.0}


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),
            (1, _ts("2024-01-01 10:29:59")),  # within 30min gap
            (1, _ts("2024-01-01 11:00:00")),  # 30:01 after → new session
            (2, _ts("2024-01-01 09:00:00")),
        ],
        "user_id int, ts timestamp",
    )
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800).collect()
    by = {(r["user_id"], r["ts"].isoformat()): r["session_id"] for r in s}
    assert by[(1, "2024-01-01T10:00:00")] == 1
    assert by[(1, "2024-01-01T10:29:59")] == 1
    assert by[(1, "2024-01-01T11:00:00")] == 2
    assert by[(2, "2024-01-01T09:00:00")] == 1
