"""Sketch accuracy contracts — the approximate tiers the profiler
deploys at corpus scale (HLL distinct counts, t-digest percentiles)
must sit inside their published error bounds against the exact answers
on real test data. At 100 TB the sketches ARE the product; these tests
pin how far they can drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table


def test_hll_distinct_within_rsd(spark, sf_check):
    li = load_table(spark, sf_check, "lineitem")
    for col, rsd in (("l_partkey", 0.05), ("l_orderkey", 0.02)):
        row = li.agg(
            F.countDistinct(col).alias("exact"),
            F.approx_count_distinct(col, rsd=rsd).alias("hll"),
        ).collect()[0]
        # 3 standard relative errors — p(violation) < 1e-3 per column,
        # and the seed is fixed so this is deterministic in practice
        assert abs(row["hll"] - row["exact"]) <= 3 * rsd * row["exact"], (
            col, row["exact"], row["hll"])


def test_approx_percentile_within_rank_error(spark, sf_check):
    o = load_table(spark, sf_check, "orders")
    acc = 1000  # accuracy knob: rank error <= n / acc
    n = o.count()
    got = o.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], acc).alias("a")
    ).collect()[0]["a"]
    vals = [r["o_totalprice"] for r in o.select("o_totalprice").collect()]
    vals.sort()
    for q, approx in zip((0.5, 0.9, 0.99), got):
        # the value returned must be one the data contains, with RANK
        # within n/acc of the true rank (the GK-sketch contract)
        import bisect

        lo = bisect.bisect_left(vals, approx)
        hi = bisect.bisect_right(vals, approx)
        true_rank = q * (n - 1)
        assert lo - n / acc <= true_rank <= hi + n / acc, (q, approx)
        assert vals[0] <= approx <= vals[-1]


def test_count_min_sketch_heavy_hitters_within_eps(spark, sf_check):
    """Count-min heavy-hitter estimates: CMS never undercounts, and
    with depth d / width w the overcount is <= e/w * N with probability
    1 - (1/e)^d — checked against exact counts for the hottest keys."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_check, "orders")
    n = o.count()
    eps, conf = 0.01, 0.99
    sketch_bytes = o.agg(
        F.count_min_sketch(
            F.col("o_orderpriority"), F.lit(eps), F.lit(conf), F.lit(42)
        ).alias("s")
    ).collect()[0]["s"]
    jvm = spark._jvm
    import io

    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        io.BytesIO(bytes(sketch_bytes)).read()
    )
    exact = {
        r["o_orderpriority"]: r["count"]
        for r in o.groupBy("o_orderpriority").count().collect()
    }
    import math

    for key, true_n in exact.items():
        est = sk.estimateCount(key)
        assert est >= true_n  # CMS never undercounts
        assert est <= true_n + math.e * eps * n  # eps-bounded overcount


def test_winsorized_sketch_rank_error(spark, sf_check):
    """q155 (GK-sketch winsorize) vs q144 (exact window twin): the
    approximate clamp bounds must sit within n_type/accuracy RANKS of
    the exact percentile per event type, and the raw means (which no
    sketch touches) must be identical."""
    import bisect

    from dbt_nlp_sqlizer_team04_spark.operators.timeseries import (
        WINSOR_HI,
        WINSOR_LO,
        WINSOR_SKETCH_ACC,
        q144_winsorized_stats,
        q155_winsorized_stats_sketch,
    )

    exact = {r["event_type"]: r for r in q144_winsorized_stats(spark, sf_check).collect()}
    sketch = {r["event_type"]: r for r in q155_winsorized_stats_sketch(spark, sf_check).collect()}
    assert set(exact) == set(sketch)

    events = load_table(spark, sf_check, "events")
    by_type = {
        t: sorted(
            r["value"]
            for r in events.where(F.col("event_type") == t)
            .select("value")
            .collect()
        )
        for t in exact
    }
    for t, ex in exact.items():
        sk = sketch[t]
        assert sk["n"] == ex["n"]
        assert sk["mean_raw"] == ex["mean_raw"]
        vals = by_type[t]
        n = len(vals)
        tol = n / WINSOR_SKETCH_ACC
        for q, col in ((WINSOR_LO, "p01"), (WINSOR_HI, "p99")):
            approx = sk[col]
            lo = bisect.bisect_left(vals, approx)
            hi = bisect.bisect_right(vals, approx)
            true_rank = q * (n - 1)
            assert lo - tol <= true_rank <= hi + tol, (t, col, approx)
        # a rank-bounded clamp can only move the winsorized mean by the
        # displaced tail mass: loose sanity bound, the rank assert above
        # is the real contract
        assert abs(sk["mean_winsorized"] - ex["mean_winsorized"]) <= max(
            0.05 * abs(ex["mean_winsorized"]), 1.0
        ), t


def test_equidepth_sketch_bucket_deviation(spark, sf_check):
    """q156 (GK cut points, no global sort) vs q153 (exact NTILE twin):
    with rank error <= n/acc per cut point, every bucket count deviates
    from the ideal n/10 by at most 2*n/acc (+1 for tile rounding)."""
    from dbt_nlp_sqlizer_team04_spark.operators.relational import (
        EQUIDEPTH_SKETCH_ACC,
        q153_equidepth_histogram,
        q156_equidepth_histogram_sketch,
    )

    exact = q153_equidepth_histogram(spark, sf_check).collect()
    sketch = q156_equidepth_histogram_sketch(spark, sf_check).collect()
    n = sum(r["n"] for r in exact)
    assert sum(r["n"] for r in sketch) == n  # partition of the table
    ideal = n / 10
    tol = 2 * n / EQUIDEPTH_SKETCH_ACC + 1
    counts = {r["decile"]: r["n"] for r in sketch}
    assert set(counts) <= set(range(1, 11))
    for d in range(1, 11):
        assert abs(counts.get(d, 0) - ideal) <= tol, (d, counts.get(d))
    # buckets tile the value range in order, boundaries non-overlapping
    rows = sorted(sketch, key=lambda r: r["decile"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]
