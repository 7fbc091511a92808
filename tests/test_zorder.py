"""Z-order layout: the written files' min-max footprints must prune a
2-D box predicate far better than a single-column sort of the same data
into the same file count."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table
from dbt_nlp_sqlizer_team04_spark.sources.zorder import (
    files_overlapping_box,
    write_zordered,
    zvalue_expr,
)


def test_zvalue_interleave_correct(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (21, 10)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zvalue_expr(F.col("a"), F.col("b")).alias("z")).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(21):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): morton(a, b) for a, b in rows}


def test_zorder_layout_prunes_2d_box(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    # a ~1/8 x 1/8 box in the middle of both key domains
    box_o = (lo_o + (hi_o - lo_o) * 3 // 8, lo_o + (hi_o - lo_o) * 4 // 8)
    box_p = (lo_p + (hi_p - lo_p) * 3 // 8, lo_p + (hi_p - lo_p) * 4 // 8)

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    write_zordered(li, zpath, "l_orderkey", "l_partkey", n_files=16)
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    full_o, full_p = (int(lo_o), int(hi_o)), (int(lo_p), int(hi_p))
    za, zt = files_overlapping_box(zpath, "l_orderkey", box_o, "l_partkey", full_p)
    zb, _ = files_overlapping_box(zpath, "l_orderkey", full_o, "l_partkey", box_p)
    z2, _ = files_overlapping_box(zpath, "l_orderkey", box_o, "l_partkey", box_p)
    sa, st = files_overlapping_box(spath, "l_orderkey", box_o, "l_partkey", full_p)
    sb, _ = files_overlapping_box(spath, "l_orderkey", full_o, "l_partkey", box_p)
    assert zt == st == 16
    # the 1-D sort prunes perfectly on its own column and not at all on
    # the other (sb == 16); zorder prunes BOTH dims. The bound carries
    # slack because repartitionByRange SAMPLES its boundaries (no fixed
    # seed exposed), so per-file hit counts jitter a little run to run
    # — observed za in [4, 9] across runs for this fixture.
    assert sb == 16 and sa <= 4
    assert max(za, zb) <= 11, (za, zb)
    assert z2 <= min(za, zb)
    pred = (
        (F.col("l_orderkey").between(*box_o))
        & (F.col("l_partkey").between(*box_p))
    )
    n_z = spark.read.parquet(zpath).filter(pred).count()
    n_s = spark.read.parquet(spath).filter(pred).count()
    assert n_z == n_s == li.filter(pred).count()
