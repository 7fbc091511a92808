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
