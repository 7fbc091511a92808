"""CDC operators (operators/cdc.py): latest-wins merge semantics and
SCD2 interval construction on planted change streams."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators.cdc import (
    merge_snapshot,
    scd2_intervals,
)


def test_merge_upsert_delete_and_version_order(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1), (4, "d", 1)],
        "id long, val string, v long",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 2, "U"),   # plain upsert
            (2, "xx", 2, "D"),   # tombstone
            (3, "c2", 3, "U"),   # two change versions: highest wins
            (3, "c1", 2, "U"),
            (5, "e", 2, "U"),    # insert (no base row)
        ],
        "id long, val string, v long, op string",
    )
    out = {r["id"]: r["val"] for r in
           merge_snapshot(base, changes, "id", "v").collect()}
    assert out == {1: "a2", 3: "c2", 4: "d", 5: "e"}  # 2 deleted


def test_merge_same_version_change_beats_base(spark):
    base = spark.createDataFrame([(1, "old", 5)], "id long, val string, v long")
    changes = spark.createDataFrame(
        [(1, "new", 5, "U")], "id long, val string, v long, op string"
    )
    out = merge_snapshot(base, changes, "id", "v").collect()
    assert out[0]["val"] == "new"


def test_merge_single_shuffle_plan(spark):
    base = spark.createDataFrame([(1, "a", 1)], "id long, val string, v long")
    changes = spark.createDataFrame(
        [(1, "b", 2, "U")], "id long, val string, v long, op string"
    )
    plan = (
        merge_snapshot(base, changes, "id", "v")
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") <= 1


def test_scd2_intervals_collapse_and_current(spark):
    ev = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00", "A"),
            (1, "2020-01-01 01:00:00", "A"),   # re-emission: collapsed
            (1, "2020-01-01 02:00:00", "B"),
            (1, "2020-01-01 03:00:00", "A"),   # back to A: NEW interval
            (2, "2020-01-01 00:00:00", "Z"),
        ],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type")
    out = scd2_intervals(ev, ["user_id"], "ts", ["event_type"]).collect()
    u1 = sorted(
        [r for r in out if r["user_id"] == 1], key=lambda r: r["valid_from"]
    )
    assert [r["event_type"] for r in u1] == ["A", "B", "A"]
    # intervals chain: each valid_to == next valid_from; last open
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None and u1[2]["is_current"] == 1
    assert u1[0]["is_current"] == 0
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] == 1


def test_scd2_null_attr_transitions(spark):
    """NULL attribute values are real states: NULL→A and A→NULL are
    changes, NULL→NULL is not (eqNullSafe semantics)."""
    ev = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00", None),
            (1, "2020-01-01 01:00:00", None),   # collapsed
            (1, "2020-01-01 02:00:00", "A"),
            (1, "2020-01-01 03:00:00", None),
        ],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type")
    out = sorted(
        scd2_intervals(ev, ["user_id"], "ts", ["event_type"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["event_type"] for r in out] == [None, "A", None]


# ------------------------------------------------- streaming CDC sink
@pytest.mark.parametrize("n_buckets", [None, 8], ids=["monolithic", "bucketed"])
def test_cdc_stream_matches_batch_replay_and_restart(
    spark, sf_check, tmp_path, n_buckets
):
    """streaming/cdc.py end-to-end, in BOTH snapshot layouts (monolithic
    full-rewrite and key-hash-bucketed): (1) a multi-epoch drain of the
    changelog produces EXACTLY the batch q135 snapshot; (2) re-invoking
    the sink with a re-delivered batch moves nothing (at-least-once
    foreachBatch); (3) a restarted stream over the same checkpoint
    resumes with the snapshot intact."""
    import os

    from dbt_nlp_sqlizer_team04_spark.operators.cdc import (
        _orders_changelog,
        merge_snapshot,
        q135_cdc_merge_snapshot,
        snapshot_rollup,
    )
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
    from dbt_nlp_sqlizer_team04_spark.streaming.cdc import run_cdc_stream

    orders = load_table(spark, sf_check, "orders").withColumn("__v", F.lit(1))
    changelog = _orders_changelog(orders)
    changes_dir = str(tmp_path / "changes")
    changelog.filter(F.col("op") == "U").coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)
    changelog.filter(F.col("op") == "D").coalesce(1).write.mode(
        "append"
    ).parquet(changes_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    sink = run_cdc_stream(
        spark, orders, changes_dir, out_dir,
        key="o_orderkey", version="__v", checkpoint_dir=ckpt,
        n_buckets=n_buckets,
    )
    stream_rollup = [tuple(r) for r in snapshot_rollup(sink.snapshot(spark)).collect()]
    batch_rollup = [tuple(r) for r in q135_cdc_merge_snapshot(spark, sf_check).collect()]
    assert stream_rollup == batch_rollup

    # (2) replay: re-deliver the delete batch straight into the sink
    deletes = spark.read.parquet(changes_dir).filter(F.col("op") == "D")
    before = {r["o_orderkey"]: r for r in sink.snapshot(spark).collect()}
    sink(deletes, batch_id=999)
    after = {r["o_orderkey"]: r for r in sink.snapshot(spark).collect()}
    assert after.keys() == before.keys()
    assert all(tuple(after[k]) == tuple(before[k]) for k in before)

    # ...and replaying the UPDATE batch is equally a no-op
    updates = spark.read.parquet(changes_dir).filter(F.col("op") == "U")
    sink(updates, batch_id=1000)
    again = {r["o_orderkey"]: tuple(r) for r in sink.snapshot(spark).collect()}
    assert again == {k: tuple(v) for k, v in before.items()}

    # (3) restart over the same checkpoint: committed epochs skipped,
    # snapshot unchanged (run_cdc_stream must NOT re-seed from base)
    sink2 = run_cdc_stream(
        spark, orders, changes_dir, out_dir,
        key="o_orderkey", version="__v", checkpoint_dir=ckpt,
        n_buckets=n_buckets,
    )
    restart_rollup = [
        tuple(r) for r in snapshot_rollup(sink2.snapshot(spark)).collect()
    ]
    assert restart_rollup == batch_rollup

    # crash-healing contract: an orphaned aside dir with its snapshot
    # (bucket) missing is renamed back on entry
    snap_dir = sink.snapshot_dir
    if n_buckets is None:
        os.rename(snap_dir, snap_dir + "__old")
        healed = sink.snapshot(spark)
        assert os.path.isdir(snap_dir) and not os.path.isdir(snap_dir + "__old")
    else:
        bucket = next(
            d for d in sorted(os.listdir(snap_dir)) if d.startswith("__bucket=")
        )
        i = int(bucket.split("=")[1])
        os.rename(os.path.join(snap_dir, bucket), sink._old_dir(i))
        healed = sink.snapshot(spark)
        assert os.path.isdir(os.path.join(snap_dir, bucket))
        assert not os.path.isdir(sink._old_dir(i))
    assert [tuple(r) for r in snapshot_rollup(healed).collect()] == batch_rollup


def test_cdc_bucketed_epoch_touches_only_its_buckets(spark, sf_check, tmp_path):
    """The 100 TB contract of the bucketed snapshot: an epoch whose
    batch keys hash into one bucket rewrites ONLY that bucket — every
    other bucket's files stay byte-identical (name, size, mtime)."""
    import os

    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
    from dbt_nlp_sqlizer_team04_spark.streaming.cdc import CdcUpsertSink

    orders = load_table(spark, sf_check, "orders").withColumn("__v", F.lit(1))
    sink = CdcUpsertSink(
        str(tmp_path / "out"), key="o_orderkey", version="__v", n_buckets=8
    )
    sink.init_snapshot(orders)

    # one updated key → exactly one touched bucket
    one = orders.orderBy("o_orderkey").limit(1)
    batch = one.withColumn("__v", F.lit(2)).withColumn(
        "o_totalprice", F.lit(12345.67)
    ).withColumn("op", F.lit("U"))
    [key_row] = one.select(
        "o_orderkey",
        F.pmod(F.xxhash64("o_orderkey"), F.lit(8)).alias("b"),
    ).collect()
    touched = key_row["b"]

    def listing(bucket_dir):
        return sorted(
            (f, os.path.getsize(p), os.path.getmtime(p))
            for f in os.listdir(bucket_dir)
            if not f.startswith(".")
            for p in [os.path.join(bucket_dir, f)]
        )

    before = {
        d: listing(os.path.join(sink.snapshot_dir, d))
        for d in os.listdir(sink.snapshot_dir)
        if d.startswith("__bucket=")
    }
    sink(batch, batch_id=0)
    after = {
        d: listing(os.path.join(sink.snapshot_dir, d))
        for d in os.listdir(sink.snapshot_dir)
        if d.startswith("__bucket=")
    }
    assert set(before) == set(after)
    for d in before:
        if d == f"__bucket={touched}":
            assert before[d] != after[d]
        else:
            assert before[d] == after[d], f"untouched bucket {d} rewritten"

    # and the merge result is the expected upsert
    got = sink.snapshot(spark).filter(
        F.col("o_orderkey") == key_row["o_orderkey"]
    ).collect()
    assert len(got) == 1 and got[0]["o_totalprice"] == 12345.67
    assert sink.snapshot(spark).count() == orders.count()
