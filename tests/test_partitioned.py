"""Date-partitioned layout: directory-level partition pruning contract
(sources/partitioned.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
from dbt_nlp_sqlizer_team04_spark.sources.partitioned import (
    read_partitioned,
    scan_footprint,
    write_date_partitioned,
)


def test_partition_pruning_scans_only_matching_days(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(events, path)

    back = read_partitioned(spark, path)
    n_days = back.select("event_date").distinct().count()
    assert n_days > 3  # the tree really fanned out

    one_day = (
        back.select(F.min("event_date").alias("d")).collect()[0]["d"]
    )
    pruned = back.filter(F.col("event_date") == F.lit(one_day))

    # the predicate lands in PartitionFilters on the scan node
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # the EXECUTED scan touches only the one matching directory, while
    # the unfiltered read touches every day's
    foot = scan_footprint(pruned)
    assert foot["numPartitions"] == 1
    full_foot = scan_footprint(read_partitioned(spark, path))
    assert full_foot["numPartitions"] == n_days
    assert foot["numFiles"] < full_foot["numFiles"]

    # and the data survives the round-trip: per-day counts match the
    # unpartitioned source
    src_count = events.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert pruned.count() == src_count


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE's OptimizeSkewedJoin really engages: a 50k-row hot key joined
    against a small dim, with thresholds forced low enough for the test
    data, re-plans the sort-merge join with skew-split partitions
    (``isSkew = true`` in the final adaptive plan). This is the runtime
    half of the skew story — operators/skew.py's salting is the static
    half for when AQE's split (which only helps SMJ) isn't available."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force SMJ (no broadcast) and make the hot partition "skewed"
        # at test scale
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")

        hot = spark.range(0, 50_000).select(
            (F.col("id") % 3).alias("k"),  # 3 keys -> huge partitions
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        dim = spark.range(0, 3).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("d")
        )
        joined = hot.join(dim, "k")
        # collect() THIS DataFrame: count() spawns its own query
        # execution, leaving joined's adaptive plan un-finalized
        assert len(joined.collect()) == 50_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_schema_evolution_across_partitions(spark, tmp_path):
    """Lake reality: later partitions grow columns. mergeSchema reads
    the union schema, back-fills nulls for old days, and partition
    pruning still works on the evolved tree."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "tree")
    v1 = spark.range(0, 100).select(
        F.col("id").alias("event_id"), F.lit("click").alias("event_type")
    )
    v1.write.parquet(path + "/event_date=2024-01-01")
    v2 = spark.range(100, 200).select(
        F.col("id").alias("event_id"),
        F.lit("view").alias("event_type"),
        F.lit("mobile").alias("device"),  # the new column
    )
    v2.write.parquet(path + "/event_date=2024-01-02")

    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(back.columns) == {"event_id", "event_type", "device", "event_date"}
    old = back.filter(F.col("event_date") == "2024-01-01")
    assert old.count() == 100
    assert old.filter(F.col("device").isNull()).count() == 100
    new = back.filter(F.col("device") == "mobile")
    assert new.count() == 100


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_check, tmp_path):
    """DPP contract: when the partition key arrives through a JOIN (a
    filtered dim picks the dates, not a literal predicate on the fact),
    Catalyst injects a dynamicpruning subquery on the fact scan and the
    executed scan touches only the dim's partitions — the plan shape a
    100 TB star-schema query lives or dies by. DPP needs a REAL
    (statistics-bearing) dim relation with a selective filter; a
    createDataFrame local relation never triggers it, so the dim is
    round-tripped through parquet exactly as a warehouse dim would be.
    (sf_check, not sf_smoke: at the 0.001 smoke scale the planner's
    pruningHasBenefit heuristic rejects DPP — the fact side is too
    small to be worth a pruning subquery — and the scan reads all
    days.)"""
    events = load_table(spark, sf_check, "events")
    path = str(tmp_path / "events_dpp")
    write_date_partitioned(events, path)

    fact = read_partitioned(spark, path)
    all_days = sorted(
        r["event_date"]
        for r in fact.select("event_date").distinct().collect()
    )
    assert len(all_days) > 2
    days = all_days[:2]
    spark.createDataFrame(
        [(d, "keep" if d in days else "drop") for d in all_days],
        "event_date date, tag string",
    ).write.mode("overwrite").parquet(str(tmp_path / "dim"))
    dim = spark.read.parquet(str(tmp_path / "dim")).filter(
        F.col("tag") == "keep"
    )
    joined = fact.join(dim, "event_date").groupBy("tag").agg(
        F.count(F.lit(1)).alias("n")
    )

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()

    # executed FACT scan reads only the two picked days' directories
    # (the final plan hides behind AdaptiveSparkPlan after execution)
    rows = joined.collect()
    ep = joined._jdf.queryExecution().executedPlan()
    if ep.nodeName() == "AdaptiveSparkPlan":
        ep = ep.finalPhysicalPlan()

    def scan_partitions(node, acc):
        # AQE leaves are QueryStage wrappers; descend through .plan()
        name = node.nodeName()
        m = node.metrics()
        if name.startswith("Scan parquet") and m.contains("numPartitions"):
            acc.append(m.apply("numPartitions").value())
        if "QueryStage" in name.replace(" ", ""):
            scan_partitions(node.plan(), acc)
            return acc
        ch = node.children()
        for i in range(ch.size()):
            scan_partitions(ch.apply(i), acc)
        return acc

    # one partitioned scan (the fact); the dim scan carries no
    # partition metric
    assert scan_partitions(ep, []) == [2]

    # and the join result is the honest per-day total
    expected = events.filter(
        F.to_date("ts").isin(days)
    ).count()
    assert {r["tag"]: r["n"] for r in rows} == {"keep": expected}
