"""Bucketed-layout co-located joins: the FK join over bucketed tables
must plan with no Exchange (shuffle) on either side, and produce the
same result as the plain-parquet join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.sources.bucketing import (
    bucketed_join_orders_lineitem,
    create_bucketed_tables,
    physical_plan,
)
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_smoke):
    create_bucketed_tables(spark, sf_smoke, buckets=8)
    return spark


def test_bucketed_join_has_no_shuffle(bucketed):
    # force the SMJ plan a fact-fact join takes at scale (broadcast wins
    # at toy SF and bypasses bucketed reads entirely)
    df = bucketed_join_orders_lineitem(bucketed, force_smj=True)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2


def test_bucketed_join_matches_plain(bucketed, sf_smoke):
    spark = bucketed
    b = bucketed_join_orders_lineitem(spark).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    ).collect()[0]
    o = load_table(spark, sf_smoke, "orders")
    l = load_table(spark, sf_smoke, "lineitem")
    p = l.join(o, l.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    ).collect()[0]
    assert (b["n"], b["q"]) == (p["n"], p["q"])


def test_bucket_pruning_on_point_lookup(bucketed):
    spark = bucketed
    # the planner auto-disables bucketed scans when nothing downstream
    # needs the clustering; turn that off to exercise bucket pruning
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        df = spark.table("orders_bucketed").filter(F.col("o_orderkey") == 7)
        plan = physical_plan(df)
        # bucket pruning: only 1 of the 8 buckets is read
        assert "SelectedBucketsCount: 1 out of" in plan, plan
    finally:
        spark.conf.set(key, old)
