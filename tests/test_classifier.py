"""Learned quality classifier (operators/classifier.py): weak-label
bootstrap → hashed-BoW logistic model → corpus scoring."""

from __future__ import annotations

from dbt_nlp_sqlizer_team04_spark.operators import classifier as C


def _toy_corpus(spark, n_each: int = 40):
    """Clearly-good prose vs clearly-garbage strings, plus held-out
    variants the heuristic bands never saw verbatim."""
    good = [
        f"the quick brown fox jumps over the lazy dog near the river bank "
        f"while the sun sets slowly behind rolling green hills number {i}."
        for i in range(n_each)
    ]
    bad = [
        f"@@## {{{{{i}}}}} ~~ ||| ### $$$ %%% ^^^ &&& *** ((( ))) __ ++ =="
        for i in range(n_each)
    ]
    rows = [(i, t) for i, t in enumerate(good)] + [
        (1000 + i, t) for i, t in enumerate(bad)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_separation_and_determinism(spark):
    docs = _toy_corpus(spark)
    model = C.train_quality_model(docs)
    scored = {r["doc_id"]: r for r in C.score_quality(model, docs).collect()}
    good_probs = [scored[i]["quality_prob"] for i in range(40)]
    bad_probs = [scored[1000 + i]["quality_prob"] for i in range(40)]
    # every planted-good doc outscores every planted-garbage doc
    assert min(good_probs) > max(bad_probs)
    assert all(scored[i]["predicted_good"] == 1 for i in range(40))
    assert all(scored[1000 + i]["predicted_good"] == 0 for i in range(40))
    # refit on identical input reproduces identical probabilities
    again = {
        r["doc_id"]: r["quality_prob"]
        for r in C.score_quality(C.train_quality_model(docs), docs).collect()
    }
    assert again == {k: v["quality_prob"] for k, v in scored.items()}


def test_registry_entry_scores_whole_corpus(spark, sf_smoke):
    from dbt_nlp_sqlizer_team04_spark.sources.parquet import load_table

    out = C.q73_learned_quality_scores(spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert len(out) == n_docs
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in out)
    assert {r["predicted_good"] for r in out} <= {0, 1}
    # the learned scores must broadly agree with the weak-label bands
    # they were bootstrapped from (>= 80% of confident-band docs)
    docs = load_table(spark, sf_smoke, "documents")
    banded = C._with_weak_labels(docs, "text").where("label is not null")
    joined = {
        r["doc_id"]: int(r["label"]) for r in banded.select("doc_id", "label").collect()
    }
    scored = {r["doc_id"]: r["predicted_good"] for r in out}
    agree = sum(scored[d] == l for d, l in joined.items())
    assert agree / len(joined) >= 0.8
