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


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_smoke):
    """Catalyst's runtime bloom-filter injection: a selective filter on
    the dim side of a shuffle join plants a BloomFilterMightContain
    probe on the FACT scan, cutting shuffled fact rows before the join
    — at 100 TB this is the difference between shuffling the whole
    fact table and shuffling only rows that can possibly match.
    Thresholds are lowered to make the toy SF eligible; the mechanism
    and plan shape are what's under test."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep the shuffle join
        "spark.sql.adaptive.enabled": "false",  # stable plan text
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_smoke, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        lineitem = load_table(spark, sf_smoke, "lineitem")
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), plan
        with_filter = joined.collect()[0]["n"]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = (
        load_table(spark, sf_smoke, "lineitem")
        .join(
            load_table(spark, sf_smoke, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert with_filter == plain
