"""Pipeline-quality parity gate — asserts the engine meets the
reference's own pilot numbers (Report 2 §8 via BASELINE.md:43-45:
execution success >=83%, macro result-F1 >=0.72, unsafe rate 0,
10/10 adversarial probes blocked) on the re-created school/store eval
set, and writes the one-line-readable JSON report the judge consumes
(PIPELINE_PARITY.json at the repo root)."""

from __future__ import annotations

import json
import os

import pytest

REPORT_PATH = os.path.join(os.path.dirname(__file__), "..", "PIPELINE_PARITY.json")


@pytest.fixture(scope="module")
def report(spark, tmp_path_factory):
    from dbt_nlp_sqlizer_team04_spark.plans.parity_eval import run_parity_eval

    root = str(tmp_path_factory.mktemp("parity_fixtures"))
    return run_parity_eval(
        spark, root, out_path=os.path.abspath(REPORT_PATH)
    )


def test_execution_success_meets_baseline(report):
    assert report["success_rate"] >= 0.83, report["per_question"]


def test_macro_f1_meets_baseline(report):
    assert report["macro_f1"] >= 0.72, [
        (r["question"], r["f1"]) for r in report["per_question"]
    ]


def test_unsafe_rate_zero(report):
    assert report["unsafe"] == 0


def test_all_probes_blocked(report):
    assert report["probes_blocked"] == report["probes_total"] == 10, report[
        "probes"
    ]


def test_report_artifact_written(report):
    with open(REPORT_PATH) as f:
        on_disk = json.load(f)
    assert on_disk["n"] == report["n"] == 12
    assert set(on_disk["baseline"]) >= {
        "success_rate", "macro_f1", "unsafe", "probes_blocked",
    }


def test_eval_does_not_leak_views_into_caller_session(report, spark):
    """Regression: the store fixture re-uses the name `orders`; the eval
    must run on a child session so the caller's catalog is untouched (an
    earlier version clobbered the corpus `orders` view and every later
    `orders` SQL in the test session saw the fixture schema). The
    fixture-ONLY names are the leak detectors: none may exist here, and
    if a corpus `orders` view is registered it must still be the corpus
    one."""
    for t in ("students", "courses", "enrollments", "order_items", "items"):
        assert not spark.catalog.tableExists(t), f"fixture view leaked: {t}"
    if spark.catalog.tableExists("orders"):
        assert "o_orderkey" in spark.table("orders").columns


def test_ladder_methods_recorded(report):
    """With the canned LLM double installed, the artifact records WHICH
    ladder tier won per question, and both branches actually ran: the
    even-indexed questions ride the llm candidate, the odd-indexed fall
    back to templates (the double answers only half the set)."""
    methods = [r.get("method") for r in report["per_question"]]
    assert all(m for m in methods)
    assert methods.count("llm") == 6
    assert sum(1 for m in methods if m.startswith("template")) == 6
