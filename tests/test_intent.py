"""Intent analyzer (A11) — fixtures mirror FIXTURES.md §6's eval questions."""

from __future__ import annotations

from dbt_nlp_sqlizer_team04_spark.plans.intent import (
    QueryIntent,
    analyze_query_intent,
    build_enhanced_prompt,
)


def test_simple_select():
    a = analyze_query_intent("show me all students")
    assert a.intent == QueryIntent.SIMPLE_SELECT or a.intent == QueryIntent.FILTERED


def test_grouped_aggregation():
    a = analyze_query_intent("Count of students per grade letter")
    assert a.intent == QueryIntent.GROUPED_AGGREGATION
    assert a.agg_func == "COUNT"
    assert "GROUP BY" in a.required_clauses


def test_window_function():
    a = analyze_query_intent("Users along with the average age per company")
    assert a.intent == QueryIntent.WINDOW_FUNCTION
    assert a.agg_func == "AVG"


def test_ranking():
    a = analyze_query_intent("Rank flights by price descending")
    assert QueryIntent.RANKING in a.all_intents
    assert a.sort_desc


def test_distinct():
    a = analyze_query_intent("Unique destination cities")
    assert QueryIntent.DISTINCT in a.all_intents


def test_null_handling():
    a = analyze_query_intent("Records with no value set for gender")
    assert QueryIntent.NULL_HANDLING in a.all_intents


def test_limit_extraction():
    a = analyze_query_intent("Top 5 courses by average score last year")
    assert a.limit_n == 5
    assert a.agg_func == "AVG"
    assert a.sort_desc


def test_date_time():
    a = analyze_query_intent("records created in the last month")
    assert QueryIntent.DATE_TIME in a.all_intents


def test_text_search():
    a = analyze_query_intent("Customers named like '%mall%'")
    assert QueryIntent.TEXT_SEARCH in a.all_intents


def test_union_with_schema():
    a = analyze_query_intent(
        "all customers or suppliers", {"customers": ["id"], "suppliers": ["id"]}
    )
    assert QueryIntent.UNION in a.all_intents


def test_join_via_two_tables():
    a = analyze_query_intent(
        "students and their enrollments",
        {"students": ["id"], "enrollments": ["student_id"]},
    )
    assert QueryIntent.JOIN in a.all_intents


def test_totalprice_no_sum_false_positive():
    a = analyze_query_intent("top 5 orders by totalprice")
    assert a.agg_func != "SUM"


def test_prompt_builder():
    a = analyze_query_intent("count per segment")
    p = build_enhanced_prompt("count per segment", {"customer": ["c_mktsegment"]}, a)
    assert "c_mktsegment" in p and "Intent:" in p


def test_conditional_intent():
    a = analyze_query_intent("categorize orders as big or small")
    assert QueryIntent.CONDITIONAL in a.all_intents
    assert any("CASE WHEN" in f for f in a.required_functions)
