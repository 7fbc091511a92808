"""Service façade: the reference's endpoint shapes as library verbs
(app/main.py:262-331 generate/run split; routes_models.py:145-318
training lifecycle)."""

from __future__ import annotations

import time

import pytest

from dbt_nlp_sqlizer_team04_spark.service import SQLizerService


@pytest.fixture(scope="module")
def svc(spark, sf_smoke, tmp_path_factory):
    return SQLizerService(
        spark, sf_smoke, model_dir=str(tmp_path_factory.mktemp("svc_models"))
    )


def test_nl2sql_generates_without_executing(svc):
    out = svc.nl2sql("count of orders per orderpriority")
    assert out["ok"] and out["sql"].lower().startswith("select")
    assert "orders" in out["slice"]
    assert "rows" not in out  # generate-only: no execution happened


def test_nl2sql_missing_question(svc):
    assert svc.nl2sql("")["ok"] is False


def test_run_revalidates_and_executes(svc):
    out = svc.run("SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority")
    assert out["ok"] and out["rowcount"] == 5
    assert out["columns"] == ["o_orderpriority", "cnt"]
    # the safety pass runs again on the direct-run path
    bad = svc.run("DROP TABLE orders")
    assert bad["ok"] is False
    big = svc.run("SELECT o_orderkey FROM orders LIMIT 100000000", max_rows=10)
    assert big["ok"] and big["rowcount"] <= 10


def test_ask_full_pipeline(svc):
    out = svc.ask("count of orders per orderpriority")
    assert out["ok"] and out["rowcount"] == 5


def test_train_lifecycle(svc):
    # synchronous first train (use_llm off: deterministic templates)
    r = svc.train(use_llm_for_training=False, background=False)
    sid = r["schema_id"]
    assert r["status"] == "trained"
    assert svc.model_status(sid)["status"] == "trained"
    assert svc.list_models()["models"] == [sid]
    assert svc.get_model(sid)["ok"]
    assert svc.training_progress(sid)["progress"]["percent"] == 100
    # second train short-circuits on the existing artifact
    assert svc.train(background=False)["status"] == "exists"
    # background retrain reaches completion
    r = svc.train(force_retrain=True, use_llm_for_training=False)
    assert r["status"] == "training"
    for _ in range(100):
        if svc.model_status(sid)["status"] == "trained":
            break
        time.sleep(0.1)
    assert svc.model_status(sid)["status"] == "trained"
    # delete
    assert svc.delete_model(sid)["ok"]
    assert svc.model_status(sid)["status"] == "untrained"
    assert svc.delete_model(sid)["ok"] is False


def test_trained_model_improves_linking(svc):
    """After train(), the engine answers the synonym phrasing the fuzzy
    tier cannot (the reference's headline trained-model behavior)."""
    svc.train(use_llm_for_training=False, background=False)
    out = svc.ask("average customer balance per market segment")
    assert out["ok"] and out["rowcount"] == 5
