"""Deterministic sampling / split operators (operators/sampling.py).

The contract under test: assignment is a pure function of the key (not
of partitioning, ordering, or a seed), fractions land near their
targets, and the Spark expression agrees bit-for-bit with the DuckDB
twin the oracles use.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
    hash_bucket_sql,
    q50_train_val_test_split,
    q51_stratified_sample,
    split_assign,
    split_case_sql,
    stratified_sample,
)
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table


def test_split_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = split_assign(df.repartition(1), "k").groupBy("split").count()
    b = split_assign(df.repartition(16), "k").groupBy("split").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_fractions_near_targets(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    counts = dict(
        (r["split"], r["count"])
        for r in split_assign(df, "k").groupBy("split").count().collect()
    )
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_split_is_exhaustive_and_disjoint(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    out = split_assign(df, "k")
    assert out.count() == 5000
    assert out.where(~F.col("split").isin("train", "val", "test")).count() == 0


def test_split_matches_duckdb_twin(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    got = sorted(
        (r["k"], r["split"]) for r in split_assign(df, "k").collect()
    )
    want = sorted(
        duckdb.sql(
            f"select k, {split_case_sql('k')} as split "
            "from range(0, 3000) t(k)"
        ).fetchall()
    )
    assert got == want


def test_stratified_sample_deterministic_and_stratified(spark, sf_check):
    docs = load_table(spark, sf_check, "documents")
    kept = stratified_sample(
        docs, "doc_id", fraction=0.2,
        strata_col="source", strata_fractions={"src0": 0.5},
    )
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids1 == ids2 and ids1
    # Kept set must be a subset re-derivable from md5 alone.
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""select doc_id from read_parquet('{sf_check}/documents.parquet')
            where {hash_bucket_sql('doc_id')} <
                  case when source = 'src0' then 500000 else 200000 end"""
        ).fetchall()
    )
    assert ids1 == want


def test_sample_rejects_missing_fraction(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    try:
        stratified_sample(df, "k")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_bad_weights_rejected(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    try:
        split_assign(df, "k", weights=[("a", 0.5), ("b", 0.3)])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_q50_q51_shapes(spark, sf_smoke):
    q50 = q50_train_val_test_split(spark, sf_smoke).collect()
    assert {r["split"] for r in q50} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in q50) == 500
    q51 = q51_stratified_sample(spark, sf_smoke).collect()
    assert all(r["n_kept"] > 0 for r in q51)


def _skewed_corpus(spark):
    """4000 docs over sources of size 3200/600/160/40 — skewed enough
    that sqrt scaling must visibly upweight the tail."""
    return (
        spark.range(4000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 3200, "web")
            .when(F.col("id") < 3800, "books")
            .when(F.col("id") < 3960, "code")
            .otherwise("law")
            .alias("source"),
        )
        .repartition(7)
    )


def test_source_mixing_upweights_rare_sources(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        BUCKETS,
        source_mixing_sample,
    )

    docs = _skewed_corpus(spark)
    kept = source_mixing_sample(docs, "doc_id", "source", 1, 4)
    rates = {
        r["source"]: r["k"] / r["n"]
        for r in kept.groupBy("source")
        .agg(F.count("*").alias("k"), F.first("n_s").alias("n"))
        .collect()
    }
    # keep-rate must be monotone in rarity: law > code > books > web
    assert rates["law"] > rates["code"] > rates["books"] > rates["web"]
    # overall budget ~25% (md5 sampling noise at n=4000 stays well inside ±6%)
    total_kept = kept.count()
    assert 0.19 < total_kept / 4000 < 0.31
    # thresholds must equal the pure-integer recomputation exactly
    import math

    n = {"web": 3200, "books": 600, "code": 160, "law": 40}
    w = {s: math.isqrt(v) for s, v in n.items()}
    T = (4000 * BUCKETS * 1) // (4 * sum(w.values()))
    want = {s: min(BUCKETS, (T * w[s]) // n[s]) for s in n}
    got = {
        r["source"]: r["thresh"]
        for r in kept.select("source", "thresh").distinct().collect()
    }
    assert got == want


def test_source_mixing_partition_invariant_and_oracle_exact(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        source_mixing_sample,
        source_mixing_sql,
    )

    docs = _skewed_corpus(spark)
    a = sorted(r["doc_id"] for r in source_mixing_sample(docs, "doc_id", "source").select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in source_mixing_sample(docs.repartition(31), "doc_id", "source")
        .select("doc_id")
        .collect()
    )
    assert a == b and a
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM (" + source_mixing_sql("doc_id") + ")"
        ).fetchall()
    )
    assert a == want


def test_quality_weighted_sample_tilts_toward_quality(spark, sf_check):
    """Keep rate must increase with quality; the top-quality band is
    kept near-surely and every kept row satisfies its own threshold."""
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        quality_weighted_sample,
    )
    from dbt_nlp_sqlizer_team04_spark.operators.text import quality_score_expr
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    docs = load_table(spark, sf_check, "documents")
    scored = docs.select(
        "doc_id", quality_score_expr(F.col("text")).alias("q")
    ).collect()
    kept = {r["doc_id"] for r in quality_weighted_sample(docs).collect()}
    qs = sorted(scored, key=lambda r: r["q"])
    lo = {r["doc_id"] for r in qs[: len(qs) // 3]}
    hi = {r["doc_id"] for r in qs[-len(qs) // 3:]}
    lo_rate = len(lo & kept) / len(lo)
    hi_rate = len(hi & kept) / len(hi)
    assert hi_rate > lo_rate
    # determinism
    kept2 = {r["doc_id"] for r in quality_weighted_sample(docs).collect()}
    assert kept == kept2


def test_curriculum_order_buckets_and_determinism(spark, sf_check):
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        curriculum_order,
    )

    docs = load_table(spark, sf_check, "documents")
    a = curriculum_order(docs, top=50).collect()
    b = curriculum_order(docs, top=50).collect()
    assert a == b  # deterministic shuffle
    buckets = [r["bucket"] for r in a]
    assert buckets == sorted(buckets, reverse=True)  # high quality first
    for r in a:  # bucket is the equi-width bin of the quality score
        assert r["bucket"] == min(int(r["quality"] * 10), 9)
    # a different seed permutes within buckets but keeps bucket order
    c = curriculum_order(docs, seed=99, top=50).collect()
    assert [r["bucket"] for r in c] == sorted(
        [r["bucket"] for r in c], reverse=True
    )
    assert [r["doc_id"] for r in c] != [r["doc_id"] for r in a]


def test_source_token_budget_boundary_and_cap(spark):
    """Admission is cumulative in md5 order; the boundary doc whose
    cumulative count EQUALS the budget is admitted, the next is not,
    and kept_tokens never exceeds the budget."""
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        source_token_budget,
    )

    # one source, four docs of 4 tokens each -> budget 8 admits exactly
    # the first two docs in md5(doc_id) order, wherever they land
    rows = [
        (i, "tok tok tok tok", "en", "only", 15) for i in range(1, 5)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = source_token_budget(df, budget=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 4 and r["total_tokens"] == 16
    assert r["n_kept"] == 2 and r["kept_tokens"] == 8


def test_source_token_budget_partition_invariant(spark, sf_check):
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        source_token_budget,
    )

    docs = load_table(spark, sf_check, "documents")
    a = source_token_budget(docs.repartition(1)).collect()
    b = source_token_budget(docs.repartition(16)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_selection(spark, sf_smoke):
    """DSIR selection (q196): 20 raw-pool rows, target source excluded,
    ordered by rounded weight desc with doc_id tiebreak; the plan
    broadcasts the bucket-ratio table (no wide join) and keeps the
    hashed-feature projection JVM-side (no Python eval)."""
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        dsir_selection,
    )

    df = dsir_selection(spark, sf_smoke, target_source="src1", k=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 20
    assert all(r["source"] != "src1" for r in rows)
    ws = [r["w"] for r in rows]
    assert ws == sorted(ws, reverse=True)
    # partition-invariance of the weights (pure function of content)
    again = {r["doc_id"]: r["w"]
             for r in dsir_selection(spark, sf_smoke).collect()}
    assert {r["doc_id"]: r["w"] for r in rows} == again
