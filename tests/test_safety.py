"""Safety layer (S1-S6) — mirrors the reference's adversarial probes
(BASELINE.md: 10/10 DDL/WRITE blocked, 10/10 unbounded SELECT bounded)."""

from __future__ import annotations

import pytest

from dbt_nlp_sqlizer_team04_spark.plans.safety import (
    SQLSafetyError,
    enforce_limit,
    ensure_select_only,
    ensure_tables_allowed,
    extract_sql_from_response,
    referenced_tables,
    validate,
    validate_aggregation_requirements,
    validate_query_structure,
)

ADVERSARIAL = [
    "DROP TABLE students",
    "DELETE FROM orders",
    "DELETE all orders",
    "UPDATE customer SET c_name = 'x'",
    "INSERT INTO orders VALUES (1)",
    "TRUNCATE TABLE lineitem",
    "ALTER TABLE orders ADD COLUMN x INT",
    "CREATE TABLE evil (x INT)",
    "MERGE INTO orders USING x ON 1=1",
    "GRANT ALL ON orders TO PUBLIC",
    "SELECT 1; DROP TABLE orders",
    "SELECT * FROM orders; DELETE FROM orders",
]


@pytest.mark.parametrize("sql", ADVERSARIAL)
def test_adversarial_blocked(sql):
    with pytest.raises(SQLSafetyError):
        ensure_select_only(sql)


def test_blocked_keyword_in_string_literal_ok():
    ensure_select_only("SELECT 'please DROP TABLE x' AS note FROM orders")


def test_replace_function_allowed():
    ensure_select_only("SELECT replace(c_name, 'a', 'b') FROM customer")


def test_comment_smuggling_blocked():
    with pytest.raises(SQLSafetyError):
        ensure_select_only("SELECT 1 /* */ ; DROP TABLE x")


def test_cte_and_union_allowed():
    ensure_select_only("WITH x AS (SELECT 1 AS a) SELECT * FROM x")
    ensure_select_only("SELECT c_name FROM customer UNION SELECT s_name FROM supplier")


def test_referenced_tables():
    assert referenced_tables("SELECT * FROM orders JOIN customer ON 1=1") == [
        "customer",
        "orders",
    ]
    # CTE names are not base tables
    assert referenced_tables(
        "WITH x AS (SELECT * FROM orders) SELECT * FROM x JOIN nation ON 1=1"
    ) == ["nation", "orders"]
    # dotted names resolve to the last segment
    assert referenced_tables("SELECT * FROM db.orders") == ["orders"]


def test_allowlist():
    ensure_tables_allowed("SELECT * FROM orders", ["orders", "customer"])
    with pytest.raises(SQLSafetyError):
        ensure_tables_allowed("SELECT * FROM secret", ["orders"])


def test_limit_injection():
    assert enforce_limit("SELECT * FROM orders").endswith("LIMIT 100")
    assert enforce_limit("SELECT * FROM orders LIMIT 5") == "SELECT * FROM orders LIMIT 5"
    # LIMIT inside a subquery does not count as top-level
    out = enforce_limit("SELECT * FROM (SELECT * FROM orders LIMIT 5) t")
    assert out.endswith("LIMIT 100")


def test_extract_sql_from_markdown():
    resp = "Here you go:\n```sql\nSELECT a\nFROM t\n```\nHope that helps!"
    assert extract_sql_from_response(resp) == "SELECT a FROM t"


def test_extract_sql_with_prose():
    resp = "SELECT a FROM t WHERE x = 1;\nThis query filters by x."
    assert extract_sql_from_response(resp) == "SELECT a FROM t WHERE x = 1"


def test_aggregation_requirements():
    validate_aggregation_requirements(
        "average price per category", "SELECT category, AVG(price) FROM t GROUP BY category"
    )
    with pytest.raises(SQLSafetyError):
        validate_aggregation_requirements("average price", "SELECT price FROM t")
    with pytest.raises(SQLSafetyError):
        validate_aggregation_requirements("how many orders", "SELECT * FROM orders")
    # 'totalprice' must NOT trigger the sum requirement (word-boundary fix)
    validate_aggregation_requirements(
        "top orders by totalprice", "SELECT o_orderkey FROM orders ORDER BY o_totalprice"
    )


def test_structure_distinct_required():
    with pytest.raises(SQLSafetyError):
        validate_query_structure("unique segments", "SELECT c_mktsegment FROM customer")
    validate_query_structure("unique segments", "SELECT DISTINCT c_mktsegment FROM customer")


def test_validate_full_gate():
    out = validate(
        "SELECT c_name FROM customer",
        question="show customers",
        allowed_tables=["customer"],
    )
    assert out.endswith("LIMIT 100")


# ---------------------------------------------------------------- round-2
# regression tests for the judge/advisor findings (VERDICT.md, ADVICE.md)

def test_cte_scan_does_not_excuse_select_list_identifiers():
    # ADVICE(high): identifiers after a comma in the SELECT list must NOT
    # be harvested as CTE names (table-allowlist bypass).
    sql = "WITH a AS (SELECT 1) SELECT o_orderkey, secret.x FROM secret"
    assert referenced_tables(sql) == ["secret"]
    with pytest.raises(SQLSafetyError):
        ensure_tables_allowed(sql, ["orders", "customer"])


def test_cte_chain_still_excused():
    sql = (
        "WITH a AS (SELECT * FROM orders), b AS (SELECT * FROM a) "
        "SELECT * FROM b JOIN customer ON 1=1"
    )
    assert referenced_tables(sql) == ["customer", "orders"]


def test_comma_from_list_all_tables_collected():
    sql = "SELECT * FROM orders o, customer c WHERE o.o_custkey = c.c_custkey"
    assert referenced_tables(sql) == ["customer", "orders"]
    with pytest.raises(SQLSafetyError):
        ensure_tables_allowed("SELECT * FROM orders, secret", ["orders"])


def test_enforce_limit_survives_trailing_comment():
    # ADVICE(medium): LIMIT must not be swallowed by a trailing -- comment
    out = enforce_limit("SELECT * FROM orders -- note")
    assert out.endswith("LIMIT 100")
    assert "-- note" not in out.rsplit("LIMIT", 1)[-1]
    out2 = enforce_limit("SELECT * FROM orders; -- note")
    assert out2.endswith("LIMIT 100") and ";" not in out2


def test_enforce_limit_union_branch_gap_closed():
    # VERDICT "What's wrong" #2: LIMIT bound to one union branch must not
    # suppress the outer bound.
    out = enforce_limit("SELECT 1 LIMIT 5 UNION SELECT 2")
    assert out.strip().lower().startswith("select * from (")
    assert out.rstrip().endswith("LIMIT 100")
    # tail LIMIT after the set-op already bounds the whole statement
    assert enforce_limit("SELECT 1 UNION SELECT 2 LIMIT 5").rstrip().endswith("LIMIT 5")


def test_enforce_limit_clamps_oversized_and_all():
    """r2 ADVICE: a pre-existing top-level LIMIT larger than max_rows
    (or LIMIT ALL) must be clamped, not trusted."""
    from dbt_nlp_sqlizer_team04_spark.plans.safety import enforce_limit

    out = enforce_limit("SELECT * FROM orders LIMIT 100000000", max_rows=100)
    assert out.strip().endswith("LIMIT 100") and "__bounded" in out
    out = enforce_limit("SELECT * FROM orders LIMIT ALL", max_rows=100)
    assert out.strip().endswith("LIMIT 100") and "__bounded" in out
    # small limits are left alone
    out = enforce_limit("SELECT * FROM orders LIMIT 5", max_rows=100)
    assert out.strip().endswith("LIMIT 5") and "__bounded" not in out
    # equal to the cap is fine too
    out = enforce_limit("SELECT * FROM orders LIMIT 100", max_rows=100)
    assert "__bounded" not in out
