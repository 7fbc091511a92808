"""BM25 retrieval (q75), Gopher quality rules (q76), int8 quantization
(q77), and k-means clustering (q78) — semantic pins beyond the oracle
hash checks (test_relational_oracle covers those for q75-q77)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators.retrieval import bm25_topk
from dbt_nlp_sqlizer_team04_spark.operators.similarity import (
    _int8_quantize_py,
    cosine_topk,
    int8_codes,
    int8_topk,
    kmeans_clusters,
    kmeans_fit,
)
from dbt_nlp_sqlizer_team04_spark.operators.text import gopher_quality
from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table


# ------------------------------------------------------------------ BM25
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_doc_first(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha alpha alpha beta"),
            (3, "epsilon zeta eta theta"),
            (4, "alpha misc misc misc misc misc misc misc misc misc"),
        ],
    )
    rows = bm25_topk(docs, ("alpha", "beta"), k=10).collect()
    # doc 3 has no query term -> filtered out entirely
    assert [r["doc_id"] for r in rows][0] == 2
    assert 3 not in {r["doc_id"] for r in rows}
    # every score positive and finite
    assert all(r["bm25"] > 0 and math.isfinite(r["bm25"]) for r in rows)


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf=1 for the query term; the shorter doc must score higher
    docs = _docs(
        spark,
        [
            (1, "needle plus a few words"),
            (2, "needle " + "filler " * 40),
            (3, "nothing relevant here at all"),
        ],
    )
    rows = bm25_topk(docs, ("needle",), k=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["bm25"] > rows[1]["bm25"]


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 6 docs, 'common' in all 6: one hit of the
    # rare term must outscore one hit of the common term
    rows_src = [(i, "common filler words here") for i in range(5)]
    rows_src.append((5, "rare common filler here"))
    docs = _docs(spark, rows_src)
    scored = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, ("rare", "common"), k=10).collect()
    }
    assert scored[5] == max(scored.values())


# -------------------------------------------------------- Gopher rules
def test_gopher_rules_each_axis(spark):
    good = "the quick brown fox jumps over a lazy dog near the river bank today"
    rows = {
        r["doc_id"]: r
        for r in gopher_quality(
            spark.createDataFrame(
                [
                    (1, good),                                  # passes
                    (2, "too short"),                           # word count
                    (3, "x " * 20 + "the a"),                   # mean len < 3
                    (4, ("### " * 8) + good),                   # symbol ratio
                    (5, "\n".join(["- bullet line"] * 5)),      # bullets
                    (6, "no required stopwords " + "word " * 10),  # stopwords
                ],
                "doc_id long, text string",
            ),
            min_words=5,
            max_words=50,
            stopwords=("the", "a", "of", "and"),
        ).collect()
    }
    assert rows[1]["passes"] == 1
    assert rows[2]["passes"] == 0 and rows[2]["n_words"] < 5
    assert rows[3]["passes"] == 0 and rows[3]["mean_word_len"] < 3
    assert rows[4]["passes"] == 0 and rows[4]["symbol_ratio"] >= 0.1
    assert rows[5]["passes"] == 0 and rows[5]["bullet_frac"] >= 0.9
    assert rows[6]["passes"] == 0 and rows[6]["stopword_hits"] < 2


def test_gopher_corpus_split_is_nontrivial(spark, sf_check):
    from dbt_nlp_sqlizer_team04_spark.operators.text import q76_gopher_quality

    agg = (
        q76_gopher_quality(spark, sf_check)
        .agg(F.sum("passes").alias("p"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    assert 0 < agg["p"] < agg["n"]  # both branches exercised


# ---------------------------------------------------- int8 quantization
def test_int8_codes_bounded_and_faithful(spark, sf_check):
    emb = load_table(spark, sf_check, "embeddings")
    codes = int8_codes(emb)
    stats = codes.select(
        F.array_max(F.transform("q", F.abs)).alias("mx"),
        F.array_max(F.transform("q", lambda x: F.abs(x - F.round(x)))).alias(
            "frac"
        ),
    ).agg(F.max("mx"), F.max("frac")).first()
    assert stats[0] <= 127.0  # clamp by construction
    assert stats[1] == 0.0  # integer-valued codes


def test_int8_topk_high_fidelity_vs_exact(spark, sf_check):
    emb = load_table(spark, sf_check, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10, exclude_id=0).collect()]
    quant = [
        r["vec_id"]
        for r in int8_topk(int8_codes(emb.where(F.col("vec_id") != 0)), q, k=10).collect()
    ]
    # int8 keeps ~7 bits of mantissa: top-10 overlap must be near-total
    assert len(set(exact) & set(quant)) >= 8


def test_int8_quantize_py_matches_spark_expr(spark):
    vec = [0.5, -0.25, 0.125, 0.0]
    df = spark.createDataFrame([(vec,)], "embedding array<double>")
    spark_codes = list(int8_codes(df.select(F.lit(1).alias("vec_id"), "embedding")).first()["q"])
    assert spark_codes == _int8_quantize_py(vec)


def test_int8_zero_vector_ranks_last(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.8, 0.6])],
        "vec_id long, embedding array<double>",
    )
    rows = int8_topk(int8_codes(df), [1.0, 0.0], k=3).collect()
    assert rows[-1]["vec_id"] == 2 and rows[-1]["q_cos"] == 0.0


# ------------------------------------------------------------- k-means
@pytest.fixture(scope="module")
def planted_blobs(spark):
    # 3 well-separated blobs in 4-D, 20 points each, deterministic grid
    rows = []
    centers = [(10.0, 0.0, 0.0, 0.0), (0.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 0.0)]
    vid = 0
    for b, c in enumerate(centers):
        for i in range(20):
            off = ((i % 5) - 2) * 0.1
            rows.append((vid, b, [c[0] + off, c[1] - off, c[2] + off / 2, off]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<double>"
    ).localCheckpoint()


def test_kmeans_recovers_planted_blobs(planted_blobs):
    out = kmeans_clusters(planted_blobs, k=3, n_iter=6).collect()
    blob = {r["vec_id"]: r["blob"] for r in planted_blobs.collect()}
    # each planted blob maps to exactly one cluster and vice versa
    mapping: dict[int, set[int]] = {}
    for r in out:
        mapping.setdefault(blob[r["vec_id"]], set()).add(r["cluster"])
    assert all(len(cl) == 1 for cl in mapping.values())
    assert len({next(iter(cl)) for cl in mapping.values()}) == 3


def test_kmeans_deterministic(planted_blobs):
    a = [tuple(r) for r in kmeans_clusters(planted_blobs, k=3, n_iter=4).collect()]
    b = [tuple(r) for r in kmeans_clusters(planted_blobs, k=3, n_iter=4).collect()]
    assert a == b


def test_kmeans_inertia_non_increasing(spark, sf_check):
    from dbt_nlp_sqlizer_team04_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_check, "embeddings")

    def inertia(n_iter: int) -> float:
        cents = kmeans_fit(emb, k=8, n_iter=n_iter)
        return kmeans_assign(emb, cents).agg(F.sum("dist2")).first()[0]

    i1, i4 = inertia(1), inertia(4)
    assert i4 <= i1 + 1e-9


# ----------------------------------------------------- bigram LM scoring
def test_bigram_lm_separates_fluent_from_salad(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        bigram_logprob_scores,
    )

    # corpus dominated by one fluent pattern; doc 99 uses the SAME
    # vocabulary in transitions the corpus never makes
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((99, "dog the over fox lazy quick jumps brown the"))
    scores = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in bigram_logprob_scores(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert scores[99] > scores[0]


def test_bigram_lm_short_docs_drop_out(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        bigram_logprob_scores,
    )

    out = bigram_logprob_scores(
        spark.createDataFrame(
            [(1, "solo"), (2, "two tokens here")], "doc_id long, text string"
        )
    ).collect()
    assert [r["doc_id"] for r in out] == [2]


# ------------------------------------------------------ hybrid RRF fusion
def test_rrf_both_lists_beats_single_list(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.retrieval import (
        hybrid_rrf_topk,
    )

    docs = _docs(
        spark,
        [
            (0, "needle alpha beta"),        # in both lists
            (1, "needle gamma delta"),       # lexical only (no vector)
            (2, "unrelated words entirely"), # dense only (via vector)
        ],
    )
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_rrf_topk(docs, vecs, ("needle",), [1.0, 0.0], k=10)
    rows = {r["doc_id"]: r["rrf"] for r in out.collect()}
    # doc 0 appears in both rankings: strictly more fused mass than the
    # single-list docs; single-list docs still present (FULL join)
    assert rows[0] > rows[1] and rows[0] > rows[2]
    assert set(rows) == {0, 1, 2}


def test_rrf_rank_arithmetic(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.retrieval import (
        RRF_K,
        hybrid_rrf_topk,
    )

    docs = _docs(spark, [(0, "needle here")])
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = hybrid_rrf_topk(docs, vecs, ("needle",), [1.0, 0.0], k=5).first()
    assert row["rrf"] == round(2.0 / (RRF_K + 1), 6)


# ------------------------------------------ histogram / per-group top-k
def test_histogram_edges(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.profiler import (
        numeric_histogram,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 5, 10, 10, 10]], "x double"
    )
    rows = {r["bucket"]: r for r in numeric_histogram(df, "x", n_bins=10).collect()}
    # max value clamps into the LAST bucket, not a phantom n_bins bucket
    assert max(rows) == 9 and rows[9]["n"] == 3
    assert sum(r["n"] for r in rows.values()) == 5
    # constant column degenerates to a single zero-width bucket
    const = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    out = numeric_histogram(const, "x", n_bins=10).collect()
    assert len(out) == 1 and out[0]["bucket"] == 0 and out[0]["n"] == 2


def test_per_group_topk_bounds_and_order(spark, sf_check):
    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        per_group_topk,
    )
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    out = per_group_topk(load_table(spark, sf_check, "documents"), k=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r)
    assert all(len(v) <= 3 for v in per.values())
    for rows in per.values():
        quals = [r["quality"] for r in rows]
        assert quals == sorted(quals, reverse=True)
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))


def test_bpe_pair_stats_weighting(spark):
    """Pair weights count OCCURRENCES (vocab tf), not distinct words."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import bpe_pair_stats

    docs = _docs(spark, [(1, "aa aa aa bb"), (2, "aa cc")])
    rows = {r["pair"]: r["weight"] for r in bpe_pair_stats(docs).collect()}
    assert rows["aa"] == 4 and rows["bb"] == 1 and rows["cc"] == 1


def test_kmeans_tiers_agree_on_planted_blobs(planted_blobs):
    """Driver-tier and distributed-tier Lloyd produce the same clusters
    on well-separated data (ties are the only place tiers may differ)."""
    fast = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_clusters(planted_blobs, k=3, n_iter=4).collect()
    }
    dist = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_clusters(
            planted_blobs, k=3, n_iter=4, driver_max_rows=0
        ).collect()
    }
    assert fast == dist


# ------------------------------------------------------------------ MMR
def _mmr_fixture_rows():
    """8 candidates vs query [1,0,0]: ids 1-3 a tight near-duplicate
    cluster at the top of the relevance ranking; ids 4-5 sit on
    OPPOSITE sides of the query axis — decent relevance (~0.71) but low
    similarity to the cluster (~0.62) and to each other (~0.5), so
    their redundancy penalty is well below their relevance; 6-8
    filler. (Candidates merely *scaled back along the query axis* are
    useless here: their similarity to the first pick equals their
    relevance and MMR cannot separate them — the fixture must be
    angularly diverse, not just less relevant.)"""
    import math

    def unit(x, y, z):
        n = math.sqrt(x * x + y * y + z * z)
        return [x / n, y / n, z / n]

    return [
        (1, unit(0.9, 0.10, 0.10)),
        (2, unit(0.9, 0.11, 0.10)),   # ~dup of 1
        (3, unit(0.9, 0.10, 0.11)),   # ~dup of 1
        (4, unit(0.7, -0.7, 0.0)),    # diverse: other side of the axis
        (5, unit(0.7, 0.0, -0.7)),    # diverse: third direction
        (6, unit(0.5, 0.6, 0.6)),
        (7, unit(0.0, 1.0, 0.0)),
        (8, unit(0.0, 0.0, 1.0)),
    ]


def test_mmr_lambda_one_degrades_to_exact_topk(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.similarity import (
        cosine_topk, mmr_topk,
    )

    df = spark.createDataFrame(
        _mmr_fixture_rows(), "vec_id bigint, embedding array<double>"
    )
    q = [1.0, 0.0, 0.0]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=4).collect()]
    mmr = [r["vec_id"] for r in mmr_topk(df, q, k=4, lam=1.0).collect()]
    assert mmr == exact


def test_mmr_diversifies_redundant_cluster(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.similarity import mmr_topk

    df = spark.createDataFrame(
        _mmr_fixture_rows(), "vec_id bigint, embedding array<double>"
    )
    q = [1.0, 0.0, 0.0]
    picked = [r["vec_id"] for r in mmr_topk(df, q, k=3, lam=0.5).collect()]
    # plain top-3 would be exactly the near-duplicate cluster {1,2,3};
    # MMR must keep one cluster member (relevance wins the first slot)
    # and fill the rest with the angularly diverse candidates
    assert picked[0] in {1, 2, 3}
    assert len({1, 2, 3} & set(picked)) == 1
    assert set(picked[1:]) == {4, 5}


def test_mmr_deterministic_and_bounded(spark, sf_check):
    from dbt_nlp_sqlizer_team04_spark.operators.similarity import mmr_topk
    from dbt_nlp_sqlizer_team04_spark.queries import SPARK_QUERIES

    a = [tuple(r) for r in SPARK_QUERIES["q130_mmr_topk"](spark, sf_check).collect()]
    b = [tuple(r) for r in SPARK_QUERIES["q130_mmr_topk"](spark, sf_check).collect()]
    assert a == b
    assert 0 < len(a) <= 10
    ranks = [r[0] for r in a]
    assert ranks == list(range(1, len(a) + 1))
