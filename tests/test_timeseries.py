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


def test_sessionize_microsecond_boundary(spark):
    """Events planted at exactly the gap threshold and ±1 µs around it:
    gap == 1800 s stays in-session (strict >), +1 µs starts a new one.
    Guards the Spark-vs-oracle integer-µs boundary agreement (r2 q45)."""
    base = _ts("2024-01-01 10:00:00")
    rows = [
        (1, base),
        (1, _ts("2024-01-01 10:29:59.999999")),  # 1800s - 1µs: same session
        (2, base),
        (2, _ts("2024-01-01 10:30:00")),          # exactly 1800s: same session
        (3, base),
        (3, _ts("2024-01-01 10:30:00.000001")),   # 1800s + 1µs: NEW session
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800)
    from pyspark.sql import functions as F

    n = {
        r["user_id"]: r["n"]
        for r in s.groupBy("user_id").agg(F.max("session_id").alias("n")).collect()
    }
    assert n == {1: 1, 2: 1, 3: 2}


def test_q45_oracle_stays_integer_typed(sf_smoke):
    """The q45 oracle must fetch as integer dtypes through pandas — r2's
    driver failure was DuckDB HUGEINT (windowed sum) widening to float64
    ('56.0' vs '56' in the value hash)."""
    from dbt_nlp_sqlizer_team04_spark.queries import ORACLE_SQL
    from tests.oracle_harness import run_oracle

    _cols, _rows, kinds = run_oracle(sf_smoke, ORACLE_SQL["q45_user_sessions"])
    assert kinds == {"user_id": "i", "n_sessions": "i", "n_events": "i"}


def test_range_join_bands_cover_boundaries(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import range_join_within

    l = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:01:00"))], "lid int, ts timestamp"
    )
    r = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00")),  # exactly -60s (inclusive)
            (11, _ts("2024-01-01 10:02:00")),  # exactly +60s (inclusive)
            (12, _ts("2024-01-01 10:02:01")),  # out of range
            (13, _ts("2024-01-01 09:59:59")),  # out of range
            (14, _ts("2024-01-01 10:01:30")),  # in range, neighbor bucket
        ],
        "rid int, ts timestamp",
    )
    pairs = {p["rid"] for p in range_join_within(l, r, "ts", 60, "lid", "rid").collect()}
    assert pairs == {10, 11, 14}


def test_rollup_cascade_grains_consistent(spark, sf_smoke):
    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import rollup_cascade
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_smoke, "events")
    grains = rollup_cascade(e, "ts", ["event_type"], "value")
    totals = {
        g: df.agg(F.sum("n").alias("n"), F.round(F.sum("sum_v"), 2).alias("s")).collect()[0]
        for g, df in grains.items()
    }
    base = e.agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")).collect()[0]
    for g, t in totals.items():
        assert (t["n"], t["s"]) == (base["n"], base["s"]), g
    # coarser grains must be strictly smaller materializations
    assert grains["day"].count() < grains["hour"].count() < grains["minute"].count()


def test_asof_join_right_tiebreak_deterministic(spark):
    """Two right rows at the same (sym, ts): the carried value must be
    the one with the greatest right_tiebreak_col, deterministically
    (r2 ADVICE: without it F.last picks nondeterministically)."""
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:05"))], "trade_id int, sym string, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0, 7),
            ("A", _ts("2024-01-01 10:00:00"), 200.0, 9),
            ("A", _ts("2024-01-01 10:00:00"), 150.0, 8),
        ],
        "sym string, ts timestamp, px double, seq int",
    )
    for _ in range(3):
        out = asof_join(
            trades, quotes, ["sym"], "ts", ["px"], right_tiebreak_col="seq"
        ).collect()
        assert out[0]["asof_px"] == 200.0  # seq=9 wins every run


def test_native_session_window_boundary_convention(spark):
    """A gap of EXACTLY gap_seconds splits under the native
    session_window (strict `<` containment) but merges under the
    lag-based tier (`> gap` split) — both pinned here so neither can
    silently drift onto the other's convention."""
    from datetime import datetime

    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        sessionize,
        sessionize_native,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, datetime(2024, 1, 1, 0, 30, 0)),                  # +1800s exactly
        (1, datetime(2024, 1, 1, 0, 59, 59, 999999)),         # +1799.999999s
        (1, datetime(2024, 1, 1, 1, 30, 0)),                  # +1800.000001s
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    native = sessionize_native(df, "user_id", "ts", gap_seconds=1800)
    # inclusive containment: events 2 (gap == 1800s exactly) and 3
    # (< 1800s) merge into event 1's session; only event 4 (> 1800s)
    # splits — so both tiers agree on session membership.
    sessions = sorted(
        (r["start_us"], r["n_events"]) for r in native.collect()
    )
    assert [n for _, n in sessions] == [3, 1]
    lagged = sessionize(df, "user_id", "ts", gap_seconds=1800)
    assert lagged.agg({"session_id": "max"}).collect()[0][0] == 2


def test_incremental_rollup_merge_matches_full_recompute(spark):
    """Partial-merge maintenance == from-scratch rebuild, including a
    LATE event landing in an already-rolled-up historical bucket."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        incremental_rollup_merge,
    )

    hist_rows = [
        (datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (datetime(2024, 1, 1, 10, 40), "click", 2.0),
        (datetime(2024, 1, 1, 11, 10), "view", 4.0),
    ]
    new_rows = [
        (datetime(2024, 1, 1, 12, 0), "click", 8.0),   # new bucket
        (datetime(2024, 1, 1, 10, 59), "click", 16.0), # LATE: updates 10:00
        (datetime(2024, 1, 1, 11, 30), "buy", 32.0),   # new group, old bucket
    ]
    schema = "ts timestamp, event_type string, value double"
    hist = spark.createDataFrame(hist_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    existing = (
        hist.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("value").alias("sum_v"))
    )
    merged = incremental_rollup_merge(
        existing, new, "ts", ["event_type"], "value", grain="hour"
    )
    full = (
        hist.unionByName(new)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("value").alias("sum_v"))
    )
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want
    late_bucket = [r for r in got if r[0].hour == 10 and r[1] == "click"]
    assert late_bucket[0][2:] == (3, 19.0)


def test_cohort_retention_cells(spark):
    """Cohort = week of first event; offsets count distinct actives."""
    import datetime as dt

    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        cohort_retention,
    )

    # 2024-01-01 is a Monday
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 2)),   # cohort wk0
            (1, dt.datetime(2024, 1, 10)),  # active wk1
            (2, dt.datetime(2024, 1, 3)),   # cohort wk0, only wk0
            (3, dt.datetime(2024, 1, 9)),   # cohort wk1
        ],
        "user_id long, ts timestamp",
    )
    cells = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert cells == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_event_transitions_hand_computed(spark):
    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        event_transitions,
    )

    rows = [
        # user 1: A -> B -> A   |  user 2: A -> A
        (1, 1, "A", "2024-01-01 10:00:00"),
        (2, 1, "B", "2024-01-01 10:01:00"),
        (3, 1, "A", "2024-01-01 10:02:00"),
        (4, 2, "A", "2024-01-01 09:00:00"),
        (5, 2, "A", "2024-01-01 09:30:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    assert out == {
        ("A", "B"): (1, 0.5),
        ("A", "A"): (1, 0.5),
        ("B", "A"): (1, 1.0),
    }


def test_event_anomalies_planted_outlier(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        event_value_anomalies,
    )

    base = [(i, "A", 10.0 + (i % 3) * 0.1) for i in range(100)]
    rows = base + [(100, "A", 1000.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = event_value_anomalies(df, z=3.0).collect()
    assert [r["event_id"] for r in out] == [100]
    assert out[0]["zscore"] > 3
