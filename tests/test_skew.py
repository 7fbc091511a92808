"""Salting utilities: results must equal the naive plans on skewed data
(90% of rows sharing one key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows: 90% key=0 (hot), the rest spread over 100 keys
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") % 777).alias("v"),
        F.col("id"),
    )
    return df.cache()


def test_salted_distinct_count_matches_naive(spark, skewed):
    naive = {
        r["k"]: r["n_distinct"]
        for r in skewed.groupBy("k")
        .agg(F.countDistinct("v").cast("long").alias("n_distinct"))
        .collect()
    }
    salted = {r["k"]: r["n_distinct"] for r in salted_distinct_count(skewed, "k", "v").collect()}
    assert salted == naive
    assert naive[0] == 777  # the hot key really is hot


def test_salted_join_matches_naive(spark, skewed):
    dim = spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    naive = (
        skewed.join(dim, skewed.k == dim.dk)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(skewed, dim, "k", "dk", fact_unique="id")
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {r["name"]: r["n"] for r in naive.collect()}
    b = {r["name"]: r["n"] for r in salted.collect()}
    assert a == b and a["n0"] == 9000


def test_salted_join_spreads_hot_key(spark, skewed):
    from dbt_nlp_sqlizer_team04_spark.operators.skew import salt_col

    # the hot key's rows must span many salt buckets
    n_buckets = (
        skewed.filter(F.col("k") == 0)
        .select(salt_col(F.col("id")).alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets >= 12  # of 16


def test_analyze_stats_flip_join_to_broadcast(spark):
    """The ANALYZE TABLE → CBO contract: a 1%-selective filter over a
    dim whose RAW size exceeds the broadcast threshold gets a
    SortMergeJoin without statistics, and the IDENTICAL query plans a
    BroadcastHashJoin once column stats let the optimizer see the
    filtered size — the planning decision that separates a 100 TB join
    that ships 1% of a dim from one that shuffles the whole fact table.
    (The profiler's single-pass crawl is this engine's ANALYZE analog;
    cost_gate.py consumes the same CBO stats.)"""
    from pyspark.sql import functions as F

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS cbo_dim_test")
    try:
        dim = spark.range(60_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 100).alias("grp"),
            F.concat(F.lit("x" * 200), F.col("id")).alias("pad"),
        )
        dim.write.mode("overwrite").saveAsTable("cbo_dim_test")
        fact = spark.range(1_000_000).select(
            (F.col("id") % 60_000).alias("k"), F.col("id").alias("val")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))

        def plan():
            d = spark.table("cbo_dim_test").filter(F.col("grp") == 7)
            return (
                fact.join(d, "k")._jdf.queryExecution().executedPlan().toString()
            )

        before = plan()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before
        spark.sql(
            "ANALYZE TABLE cbo_dim_test COMPUTE STATISTICS FOR COLUMNS grp"
        )
        after = plan()
        assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS cbo_dim_test")


def test_hotkey_sketch_vs_exact(spark, sf_check):
    """q165 (CMS + candidate sample, no key shuffle) vs q150 (exact
    counts shuffle): estimates never undercount, overcount <= e*eps*N,
    and every exact top key whose margin over the cutoff exceeds the
    CMS tolerance appears in the sketch's top set."""
    import math

    from dbt_nlp_sqlizer_team04_spark.operators.skew import (
        CMS_EPS,
        q150_hotkey_audit,
        q165_hotkey_sketch,
    )

    exact = {str(r["key"]): r["n"] for r in q150_hotkey_audit(spark, sf_check).collect()}
    sketch = {r["key"]: r["n_est"] for r in q165_hotkey_sketch(spark, sf_check).collect()}
    assert len(sketch) == 10
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    n_total = load_table(spark, sf_check, "lineitem").count()
    tol = math.e * CMS_EPS * n_total
    for k, n in exact.items():
        if k in sketch:
            assert sketch[k] >= n              # CMS never undercounts
            assert sketch[k] <= n + tol        # eps-bounded overcount
    # unambiguous heavy hitters (clear the exact cutoff by > tol) must
    # be found by the sketch path
    cutoff = min(exact.values())
    for k, n in exact.items():
        if n > cutoff + tol:
            assert k in sketch, (k, n)


def test_hotkey_sketch_empty_input(spark):
    """Empty table → clean empty result (no ZeroDivisionError on the
    share computation), same schema as the populated path."""
    from dbt_nlp_sqlizer_team04_spark.operators.skew import hotkey_audit_sketch

    empty = spark.createDataFrame([], "k string, a long, b long")
    out = hotkey_audit_sketch(empty, "k", sample_cols=["a", "b"], top=5)
    assert out.columns == ["key", "n_est", "share_est"]
    assert out.count() == 0
