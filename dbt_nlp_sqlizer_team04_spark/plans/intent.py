"""Query-intent analysis — A11 (SURVEY.md §2.A).

Reimplements the reference's 18-class rule-based intent detector
(NLP_SQLizer/backend/app/ai/query_intent.py:13-321) as a table-driven
rules engine: each intent is a declarative rule (keyword set / regex /
predicate) evaluated over the lowercased question; a priority order picks
the primary intent (query_intent.py:291-301 parity). The analysis also
extracts *structured* signals the template generator consumes (detected
aggregate function, LIMIT n, sort direction) — the reference only put
these in prose hints.

Pure function, no Spark dependency; unit-tested against question
fixtures in tests/test_intent.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum


class QueryIntent(str, Enum):
    SIMPLE_SELECT = "simple_select"
    FILTERED = "filtered"
    AGGREGATION = "aggregation"
    GROUPED_AGGREGATION = "grouped_aggregation"
    WINDOW_FUNCTION = "window_function"
    JOIN = "join"
    SORTED = "sorted"
    LIMITED = "limited"
    COMPLEX_FILTER = "complex_filter"
    DATE_TIME = "date_time"
    TEXT_SEARCH = "text_search"
    COMPARISON = "comparison"
    RANKING = "ranking"
    DISTINCT = "distinct"
    NULL_HANDLING = "null_handling"
    CONDITIONAL = "conditional"
    UNION = "union"
    SUBQUERY = "subquery"


@dataclass
class IntentAnalysis:
    intent: QueryIntent
    confidence: float
    all_intents: list[QueryIntent] = field(default_factory=list)
    required_clauses: list[str] = field(default_factory=list)
    required_functions: list[str] = field(default_factory=list)
    hints: list[str] = field(default_factory=list)
    example_sql_pattern: str = ""
    # structured signals (extension over the reference)
    agg_func: str | None = None  # AVG/COUNT/SUM/MAX/MIN
    limit_n: int | None = None
    sort_desc: bool = False


# aggregate-function keyword map (query_intent.py:61-68 keyword sets)
AGG_KEYWORDS: dict[str, tuple[str, ...]] = {
    "AVG": ("average", "avg", "mean"),
    "COUNT": ("count", "how many", "number of", "total number"),
    "SUM": ("sum", "total amount", "total price", "total sales", "total"),
    "MAX": ("max", "maximum", "highest", "largest", "most"),
    "MIN": ("min", "minimum", "lowest", "smallest", "least"),
}

GROUP_KEYWORDS = (
    "grouped by", "group by", "per ", "for each", "each ", "every ",
    "by company", "by category",
    "by month", "by year", "by department", "by type", "by status",
)
WINDOW_KEYWORDS = (
    "along with", "with their", "with the average", "with the total",
    "compared to", "compared with", "same as the average", "alongside",
    "plus the average",
)
JOIN_KEYWORDS = ("and their", "with their", "together")
FILTER_KEYWORDS = (
    "where", "with", "that have", "that are", "which", "whose",
    "greater than", "less than", "equal to", "not equal", "above", "below",
    "over", "under", "between", "in range",
)
COMPLEX_FILTER_KEYWORDS = (
    "and", "or", "both", "either", "neither", "not only", "but also",
    "as well as", "in addition to",
)
SORT_KEYWORDS = (
    "sorted by", "ordered by", "order by", "sort by", "ascending",
    "descending", "asc", "desc", "newest", "oldest", "latest", "earliest",
    "top", "bottom", "highest", "lowest",
)
DESC_KEYWORDS = ("descending", "desc", "newest", "latest", "highest", "top")
LIMIT_KEYWORDS = ("first", "last", "top", "bottom", "limit", "only")
DATE_KEYWORDS = (
    "today", "yesterday", "tomorrow", "this week", "this month", "this year",
    "last week", "last month", "last year", "recent", "recently", "date",
    "time", "when", "after", "before", "since", "until",
)
TEXT_SEARCH_KEYWORDS = (
    "containing", "contains", "like", "matching", "starts with", "ends with",
    "includes", "including", "search", "look for", "named like",
)
COMPARISON_KEYWORDS = (
    "compare", "comparison", "versus", "vs", "difference",
    "greater than the", "less than the", "more than the", "above the",
    "below the",
)
RANKING_KEYWORDS = (
    "rank", "ranking", "ranked", "position", "nth", "top performer",
    "best", "worst",
)
DISTINCT_KEYWORDS = (
    "unique", "distinct", "no duplicates", "unique values", "different values",
)
NULL_KEYWORDS = (
    "null", "empty", "missing", "not set", "no value", "blank", "is null",
    "is not null", "has no", "without",
)
SUBQUERY_KEYWORDS = (
    "that have", "which have", "whose", "where there exists", "that are in",
    "that are not in", "in the list of",
)
# CASE-bucket phrasing. The reference declares the CONDITIONAL intent
# (query_intent.py:30) but never detects it — only its LLM-SQL extractor
# keeps CASE/WHEN/THEN tokens (nl2sql.py:121); detecting AND compiling it
# is template-program parity-plus, same as NULL_HANDLING below.
CONDITIONAL_KEYWORDS = (
    "categorize", "categorise", "classify", "label", "bucket",
    "case when", "if then", "flag as",
)

# primary-intent priority (query_intent.py:291-301 parity, extended to the
# remaining intents in first-detected order)
PRIORITY = (
    QueryIntent.WINDOW_FUNCTION,
    QueryIntent.GROUPED_AGGREGATION,
    QueryIntent.AGGREGATION,
    QueryIntent.JOIN,
    QueryIntent.RANKING,
    QueryIntent.COMPLEX_FILTER,
    QueryIntent.FILTERED,
    QueryIntent.SORTED,
    QueryIntent.LIMITED,
)

EXAMPLE_PATTERNS = {
    QueryIntent.SIMPLE_SELECT: "SELECT * FROM table_name LIMIT 100",
    QueryIntent.FILTERED: "SELECT * FROM table_name WHERE condition LIMIT 100",
    QueryIntent.AGGREGATION: "SELECT {func}(column) FROM table_name LIMIT 100",
    QueryIntent.GROUPED_AGGREGATION: "SELECT group_column, {func}(column) FROM table_name GROUP BY group_column LIMIT 100",
    QueryIntent.WINDOW_FUNCTION: "SELECT column1, column2, {func}(column2) OVER (PARTITION BY group_column) FROM table_name LIMIT 100",
    QueryIntent.JOIN: "SELECT * FROM table1 JOIN table2 ON table1.id = table2.foreign_id LIMIT 100",
    QueryIntent.SORTED: "SELECT * FROM table_name ORDER BY column DESC LIMIT 100",
    QueryIntent.LIMITED: "SELECT * FROM table_name LIMIT 10",
    QueryIntent.COMPLEX_FILTER: "SELECT * FROM table_name WHERE condition1 AND condition2 LIMIT 100",
    QueryIntent.DATE_TIME: "SELECT * FROM table_name WHERE date_column >= '2024-01-01' LIMIT 100",
    QueryIntent.TEXT_SEARCH: "SELECT * FROM table_name WHERE column LIKE '%pattern%' LIMIT 100",
    QueryIntent.COMPARISON: "SELECT * FROM table1 WHERE column > (SELECT AVG(column) FROM table1) LIMIT 100",
    QueryIntent.RANKING: "SELECT *, ROW_NUMBER() OVER (ORDER BY column DESC) as rank FROM table_name LIMIT 100",
    QueryIntent.DISTINCT: "SELECT DISTINCT column FROM table_name LIMIT 100",
    QueryIntent.NULL_HANDLING: "SELECT * FROM table_name WHERE column IS NOT NULL LIMIT 100",
    QueryIntent.CONDITIONAL: "SELECT CASE WHEN column > threshold THEN 'high' ELSE 'low' END AS category, COUNT(*) FROM table_name GROUP BY 1 LIMIT 100",
    QueryIntent.UNION: "SELECT * FROM table1 UNION SELECT * FROM table2 LIMIT 100",
    QueryIntent.SUBQUERY: "SELECT * FROM table_name WHERE id IN (SELECT id FROM other_table WHERE condition) LIMIT 100",
}


def _kw_hit(q: str, kw: str) -> bool:
    """Single alphabetic keywords match on word boundaries (so 'total'
    doesn't fire inside 'totalprice' — an improvement over the
    reference's substring containment); phrases stay substring."""
    if " " in kw or not kw.isalpha():
        return kw in q
    return re.search(rf"\b{re.escape(kw)}\b", q) is not None


def _contains_any(q: str, keywords) -> bool:
    return any(_kw_hit(q, k) for k in keywords)


def analyze_query_intent(
    question: str, schema_context: dict[str, list[str]] | None = None
) -> IntentAnalysis:
    """Detect overlapping intents, pick the primary by priority, and emit
    clause/function requirements + structured signals."""
    q = question.lower()
    intents: list[QueryIntent] = []
    clauses: list[str] = []
    funcs: list[str] = []
    hints: list[str] = []

    # aggregation + which function. Schema-aware disambiguation (an
    # extension over the reference's schema-blind detector): a keyword
    # token that IS a column name of the linked schema ("total" when
    # orders.total exists — the store eval schema, FIXTURES.md §2) is
    # column evidence, not an aggregate verb; "show orders with total
    # over 400" must filter, not SUM. Multi-word keywords ("total
    # amount") and keywords that merely resemble a column
    # ("totalprice") are unaffected.
    col_words: set[str] = set()
    if schema_context:
        for cols in schema_context.values():
            col_words.update(c.lower() for c in cols)
    agg_func = None
    for func, kws in AGG_KEYWORDS.items():
        if _contains_any(q, (k for k in kws if k not in col_words)):
            agg_func = func
            funcs.append(func)
            intents.append(QueryIntent.AGGREGATION)
            break

    needs_group = _contains_any(q, GROUP_KEYWORDS)
    if needs_group:
        intents.append(QueryIntent.GROUPED_AGGREGATION)
        clauses.append("GROUP BY")
        hints.append("Use GROUP BY with the aggregation function")

    if _contains_any(q, WINDOW_KEYWORDS) and agg_func:
        intents.append(QueryIntent.WINDOW_FUNCTION)
        funcs.append("OVER (PARTITION BY ...)")
        hints.append("Use window functions to show rows with aggregates")

    if schema_context:
        mentioned = [t for t in schema_context if t.lower() in q]
        if len(mentioned) >= 2:
            intents.append(QueryIntent.JOIN)
            clauses.append("JOIN")
            hints.append("Multiple tables mentioned - use JOIN")
    if QueryIntent.JOIN not in intents and _contains_any(q, JOIN_KEYWORDS):
        intents.append(QueryIntent.JOIN)
        clauses.append("JOIN")
        hints.append("Question implies joining related data")

    has_filters = _contains_any(q, FILTER_KEYWORDS) or bool(
        re.search(r"\b(greater|less|equal|not)\b", q)
    )
    if has_filters:
        intents.append(QueryIntent.FILTERED)
        clauses.append("WHERE")
        hints.append("Use a WHERE clause for the filter conditions")

    if has_filters and sum(1 for k in COMPLEX_FILTER_KEYWORDS if k in q) >= 2:
        intents.append(QueryIntent.COMPLEX_FILTER)
        hints.append("Multiple filter conditions - combine with AND/OR")

    sort_desc = False
    if _contains_any(q, SORT_KEYWORDS):
        intents.append(QueryIntent.SORTED)
        clauses.append("ORDER BY")
        sort_desc = _contains_any(q, DESC_KEYWORDS)
        hints.append("Use ORDER BY ... DESC" if sort_desc else "Use ORDER BY")

    limit_n = None
    m = re.search(r"\b(?:top|first|last|bottom)\s+(\d+)", q)
    if _contains_any(q, LIMIT_KEYWORDS) or m:
        intents.append(QueryIntent.LIMITED)
        if m:
            limit_n = int(m.group(1))
            hints.append(f"Limit to {limit_n} rows")
        else:
            hints.append("Use a LIMIT clause")

    if _contains_any(q, DATE_KEYWORDS) or re.search(
        r"\d{4}-\d{2}-\d{2}|\d{2}/\d{2}/\d{4}", q
    ):
        intents.append(QueryIntent.DATE_TIME)
        clauses.append("WHERE")
        hints.append("Use date comparisons in WHERE")

    if _contains_any(q, TEXT_SEARCH_KEYWORDS):
        intents.append(QueryIntent.TEXT_SEARCH)
        funcs.append("LIKE or ILIKE")
        hints.append("Use LIKE/ILIKE with % wildcards")

    if _contains_any(q, COMPARISON_KEYWORDS):
        intents.append(QueryIntent.COMPARISON)
        hints.append("May need a subquery or self-join for the comparison")

    if _contains_any(q, RANKING_KEYWORDS):
        intents.append(QueryIntent.RANKING)
        funcs.append("ROW_NUMBER() or RANK()")
        hints.append("Use ROW_NUMBER()/RANK() window functions")

    if _contains_any(q, DISTINCT_KEYWORDS):
        intents.append(QueryIntent.DISTINCT)
        funcs.append("DISTINCT")
        hints.append("Use DISTINCT to remove duplicates")

    if _contains_any(q, NULL_KEYWORDS):
        intents.append(QueryIntent.NULL_HANDLING)
        clauses.append("WHERE")
        hints.append("Use IS NULL / IS NOT NULL")

    if _contains_any(q, CONDITIONAL_KEYWORDS):
        intents.append(QueryIntent.CONDITIONAL)
        funcs.append("CASE WHEN")
        hints.append("Use CASE WHEN ... THEN ... ELSE ... END buckets")

    if schema_context and " or " in f" {q} ":
        tnames = list(schema_context)
        for i, t1 in enumerate(tnames):
            for t2 in tnames[i + 1:]:
                if re.search(
                    rf"\b{re.escape(t1)}\b.*\bor\b.*\b{re.escape(t2)}\b", q
                ) or re.search(rf"\b{re.escape(t2)}\b.*\bor\b.*\b{re.escape(t1)}\b", q):
                    intents.append(QueryIntent.UNION)
                    funcs.append("UNION")
                    hints.append("Multiple tables with OR - may need UNION")
                    break

    if has_filters and _contains_any(q, SUBQUERY_KEYWORDS):
        intents.append(QueryIntent.SUBQUERY)
        hints.append("Complex condition - may need a subquery")

    if not intents:
        primary, confidence = QueryIntent.SIMPLE_SELECT, 0.8
    else:
        primary = intents[0]
        for p in PRIORITY:
            if p in intents:
                primary = p
                break
        confidence = min(0.95, 0.7 + len(intents) * 0.05)

    pattern = EXAMPLE_PATTERNS.get(primary, EXAMPLE_PATTERNS[QueryIntent.SIMPLE_SELECT])
    if "{func}" in pattern:
        pattern = pattern.replace("{func}", agg_func or "AVG")

    return IntentAnalysis(
        intent=primary,
        confidence=confidence,
        all_intents=intents,
        required_clauses=clauses,
        required_functions=funcs,
        hints=hints,
        example_sql_pattern=pattern,
        agg_func=agg_func,
        limit_n=limit_n,
        sort_desc=sort_desc,
    )


def build_enhanced_prompt(
    question: str,
    schema_context: dict[str, list[str]],
    analysis: IntentAnalysis,
) -> str:
    """Prompt builder (query_intent.py:356-379 parity): exact column names,
    intent guidance, example pattern."""
    schema_lines = ["EXACT column names (use these exactly):"]
    for t, cols in schema_context.items():
        schema_lines.append(f"  {t}: {', '.join(cols)}")
    clauses = ", ".join(analysis.required_clauses) or "None"
    funcs = ", ".join(analysis.required_functions) or "None"
    hints = "; ".join(analysis.hints[:3]) or "Standard SELECT"
    return (
        f"Q: {question}\n"
        f"Intent: {analysis.intent.value}. Required: {clauses}. "
        f"Functions: {funcs}. {hints}. Example: {analysis.example_sql_pattern}\n"
        "Schema:\n" + "\n".join(schema_lines) + "\n"
        "CRITICAL: Use exact column names above.\n"
        "Generate SQL only, start with SELECT."
    )
