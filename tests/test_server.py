"""HTTP transport (server.py): the reference's endpoint table served by
the stdlib binding — every route answered over a real socket with the
service façade's JSON shapes."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from dbt_nlp_sqlizer_team04_spark.server import serve_background
from dbt_nlp_sqlizer_team04_spark.service import SQLizerService


@pytest.fixture(scope="module")
def base_url(spark, sf_smoke, tmp_path_factory):
    svc = SQLizerService(
        spark, sf_smoke, model_dir=str(tmp_path_factory.mktemp("http_models"))
    )
    httpd, _t = serve_background(svc)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _call(base_url, method, path, body=None):
    req = urllib.request.Request(
        base_url + path,
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_healthz(base_url):
    status, out = _call(base_url, "GET", "/healthz")
    assert status == 200
    assert out == {"ok": True, "service": "backend", "message": "healthy"}


def test_connect_test_and_schema_overview(base_url):
    status, out = _call(base_url, "POST", "/connect/test", {})
    assert status == 200 and out["ok"] and out["dialect"] == "spark-sql"
    status, out = _call(base_url, "GET", "/schema/overview")
    assert status == 200 and out["ok"]
    tables = {t["table"]: t for t in out["tables"]}
    assert "orders" in tables and "lineitem" in tables
    cols = {c["name"] for c in tables["orders"]["columns"]}
    assert "o_orderkey" in cols and "o_totalprice" in cols


def test_ai_nl2sql_generate_only(base_url):
    status, out = _call(
        base_url, "POST", "/ai/nl2sql",
        {"question": "count of orders per orderpriority"},
    )
    assert status == 200 and out["ok"]
    assert out["sql"].lower().startswith("select")
    assert "rows" not in out


def test_ai_run_executes_and_guards(base_url):
    status, out = _call(
        base_url, "POST", "/ai/run",
        {"sql": "SELECT o_orderpriority, COUNT(*) AS cnt "
                "FROM orders GROUP BY o_orderpriority"},
    )
    assert status == 200 and out["ok"] and out["rowcount"] == 5
    status, out = _call(base_url, "POST", "/ai/run", {"sql": "DROP TABLE orders"})
    assert status == 400 and not out["ok"]


def test_ai_ask_full_pipeline(base_url):
    status, out = _call(
        base_url, "POST", "/ai/ask",
        {"question": "count of orders per orderpriority"},
    )
    assert status == 200 and out["ok"] and out["rowcount"] == 5


def test_models_lifecycle_over_http(base_url):
    status, out = _call(base_url, "POST", "/models/schema-id", {})
    assert status == 200 and out["ok"] and out["tables_count"] >= 9
    sid = out["schema_id"]
    assert len(sid) == 16

    status, out = _call(base_url, "GET", f"/models/{sid}/status")
    assert status == 200 and out["status"] == "untrained"

    status, out = _call(
        base_url, "POST", "/models/train", {"use_llm_for_training": False}
    )
    assert status == 200 and out["ok"] and out["schema_id"] == sid

    # background training: poll progress until the artifact exists
    import time

    for _ in range(240):
        status, out = _call(base_url, "GET", f"/models/{sid}/progress")
        if status == 200 and out.get("progress", {}).get("percent") == 100:
            break
        time.sleep(0.5)
    assert out["progress"]["percent"] == 100

    status, out = _call(base_url, "GET", "/models/list")
    assert status == 200 and sid in out["models"]
    status, out = _call(base_url, "GET", f"/models/{sid}")
    assert status == 200 and out["model"]["schema_id"] == sid

    status, out = _call(
        base_url, "POST", f"/models/{sid}/query",
        {"question": "average customer balance per market segment"},
    )
    assert status == 200 and out["ok"]
    assert "customer" in out["sql"].lower()
    assert 0 < out["confidence"] <= 1
    assert out["metadata"]["schema_id"] == sid

    status, out = _call(base_url, "DELETE", f"/models/{sid}")
    assert status == 200 and out["ok"]
    status, out = _call(base_url, "GET", f"/models/{sid}")
    assert status == 404


def test_unknown_route_404_and_bad_json_400(base_url):
    status, out = _call(base_url, "GET", "/nope")
    assert status == 404 and not out["ok"]
    req = urllib.request.Request(
        base_url + "/ai/ask", method="POST", data=b"not json",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            status = resp.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
