"""Small-files census + compaction advisor (sources/compaction.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.sources.compaction import (
    compact_partition,
    compaction_plan,
    layout_stats,
)
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
from dbt_nlp_sqlizer_team04_spark.sources.partitioned import (
    write_date_partitioned,
)


def _walk_census(path):
    out = {}
    for dirpath, _dirs, files in os.walk(path):
        data = [f for f in files if not f.startswith(("_", "."))]
        if data:
            rel = os.path.relpath(dirpath, path)
            rel = "" if rel == "." else rel
            sizes = [os.path.getsize(os.path.join(dirpath, f)) for f in data]
            out[rel] = (len(data), sum(sizes))
    return out


def test_layout_stats_match_filesystem(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "tree")
    # many small files per day: repartition wide BEFORE the partitioned
    # write (the tasks x dates explosion the docstring warns about)
    write_date_partitioned(events.repartition(8), path)

    stats = {s.partition: s for s in layout_stats(spark, path)}
    truth = _walk_census(path)
    assert set(stats) == set(truth)
    for rel, (n, total) in truth.items():
        assert stats[rel].n_files == n
        assert stats[rel].total_bytes == total


def test_compaction_plan_and_rewrite(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "tree")
    write_date_partitioned(events.repartition(8), path)
    before = spark.read.parquet(path)
    n_rows = before.count()
    day_counts = {
        r["event_date"]: r["count"]
        for r in before.groupBy("event_date").count().collect()
    }

    stats = layout_stats(spark, path)
    # tiny target -> every multi-file partition is flagged
    plan = compaction_plan(stats, target_bytes=64 * 1024 * 1024)
    assert plan, "8-file partitions must be flagged against a 1-file target"
    for s, n_target in plan:
        # up to 8 files per day (a task with no rows for a date writes
        # none, so some days land short of 8)
        assert n_target == 1 and 2 < s.n_files <= 8

    victim, n_target = plan[0]
    compact_partition(spark, path, victim.partition, n_target)

    after = {s.partition: s for s in layout_stats(spark, path)}
    assert after[victim.partition].n_files == n_target
    assert after[victim.partition].total_bytes < victim.total_bytes  # fewer footers

    # no rows lost, partition values intact (hive column re-derived)
    back = spark.read.parquet(path)
    assert back.count() == n_rows
    assert {
        r["event_date"]: r["count"]
        for r in back.groupBy("event_date").count().collect()
    } == day_counts
