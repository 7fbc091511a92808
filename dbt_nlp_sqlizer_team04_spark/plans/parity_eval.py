"""Pipeline-quality parity harness — the reference's own pilot
evaluation re-created as a runnable gate (BASELINE.md:43-45).

The reference's Report-2 pilot (Deliverables/Report 2/
Project_Progress_Final_Report2_Team_04.docx §8) evaluated the NL2SQL
pipeline on two tiny in-house schemas (``school``, ``store`` —
FIXTURES.md §1-2) with n=12 questions and reported:

    execution success   10/12 (83%)
    result F1 (macro)   0.72   (set-based comparison)
    exact-match SQL     7/12 (58%)  (informative only)
    unsafe rate         0/12
    median latency      1.9 s (local Postgres)
    safety probes       10/10 blocked (n=10 adversarial)

This module materializes those two schemas as deterministic parquet
fixtures (FK integrity + categorical domains per FIXTURES.md; the
reference read DECLARED FKs from Postgres, so the crawler's
Spider-style ``<entity>_id`` → ``<entity>s.id`` convention inference —
``operators/profiler.py:infer_relationships`` rule 2 — stands in for
the declared-FK walk), re-creates the 12-question shape set from the
reference's demo script (README.md:168-179, Project_Plan.txt:59-62:
the C-grade join listing, top-5-courses-by-average, count-per-grade)
plus Spider-basic shapes over the store schema, runs the FULL engine
path (linking → intent → template candidates → safety validation →
execution) per question, and computes the reference's own metrics.

Metric definitions (documented because the reference's report only
names them):

- execution success: the engine produced SQL that passed the safety
  gate and executed without error.
- result F1: per-question F1 over the multiset of result ROWS, where a
  row is the multiset of its normalized cell values (column names and
  order ignored — the set-based comparison the report cites; floats
  rounded to 6dp, Decimals normalized). Macro = unweighted mean over
  all n questions (failed executions score 0).
- exact match: normalized-whitespace, case-folded string equality of
  the engine's SQL vs gold, informative only (the reference scored
  7/12; template SQL legitimately differs in aliasing/projection).
- unsafe rate: executed SQL that fails a post-hoc re-validation by the
  safety gate (S1-S5) — by construction 0 unless the gate regresses.
- probes: the reference's two adversarial categories (DROP/DELETE/ALTER
  and unbounded SELECT) fed through the same path; blocked means no
  execution or a LIMIT-bounded rewrite.

One calendar substitution: the pilot's "last year" phrasing is pinned
to an explicit year (2024) so the gold stays deterministic under any
wall clock.
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import types as T

SCHOOL_TABLES = ("students", "courses", "enrollments")
STORE_TABLES = ("customers", "orders", "order_items", "items")

_GRADES = [(90, "A"), (80, "B"), (70, "C"), (60, "D"), (0, "F")]


def _grade(score: int) -> str:
    for lo, g in _GRADES:
        if score >= lo:
            return g
    return "F"


def build_school_fixture(spark: SparkSession, out_dir: str) -> None:
    """FIXTURES.md §1 — deterministic synthetic rows with FK integrity
    and the A-F categorical domain; grades derived from scores so the
    C-and-score>75 demo slice is non-empty by construction."""
    students = [
        (i, f"Student {i:03d}", ("M", "F")[i % 2], 18 + (i * 7) % 8)
        for i in range(1, 61)
    ]
    courses = [
        (i, f"Course {chr(64 + i)}", 2023 + (i % 3)) for i in range(1, 13)
    ]
    enrollments = []
    for i in range(240):
        score = 50 + (i * 13) % 51  # 50..100
        enrollments.append(
            (
                (i * 7) % 60 + 1,
                (i * 5) % 12 + 1,
                ("Fall", "Spring")[i % 2],
                2023 + (i % 3),
                _grade(score),
                score,
            )
        )
    spark.createDataFrame(
        students,
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("name", T.StringType()),
                T.StructField("gender", T.StringType()),
                T.StructField("age", T.IntegerType()),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/students.parquet")
    spark.createDataFrame(
        courses,
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("title", T.StringType()),
                T.StructField("year", T.IntegerType()),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/courses.parquet")
    spark.createDataFrame(
        enrollments,
        T.StructType(
            [
                T.StructField("student_id", T.IntegerType()),
                T.StructField("course_id", T.IntegerType()),
                T.StructField("term", T.StringType()),
                T.StructField("year", T.IntegerType()),
                T.StructField("grade_letter", T.StringType()),
                T.StructField("numeric_score", T.IntegerType()),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/enrollments.parquet")


def build_store_fixture(spark: SparkSession, out_dir: str) -> None:
    """FIXTURES.md §2 — customers/orders/order_items/items with decimal
    money columns and FK integrity."""
    customers = [
        (i, f"Customer {i:03d}", ("M", "F")[i % 2], 21 + (i * 5) % 40)
        for i in range(1, 51)
    ]
    orders = [
        (
            i,
            (i * 3) % 50 + 1,
            f"2025-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}",
            Decimal((i * 37) % 900 + 25) + Decimal("0.50"),
        )
        for i in range(1, 201)
    ]
    cats = ("electronics", "grocery", "clothing", "toys", "books")
    items = [
        (i, cats[i % 5], Decimal((i * 13) % 180 + 5) + Decimal("0.99"))
        for i in range(1, 31)
    ]
    order_items = [
        ((i * 7) % 200 + 1, (i * 11) % 30 + 1, 1 + i % 5) for i in range(400)
    ]
    spark.createDataFrame(
        customers,
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("name", T.StringType()),
                T.StructField("gender", T.StringType()),
                T.StructField("age", T.IntegerType()),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/customers.parquet")
    odf = spark.createDataFrame(
        orders,
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("customer_id", T.IntegerType()),
                T.StructField("order_date_s", T.StringType()),
                T.StructField("total", T.DecimalType(18, 2)),
            ]
        ),
    )
    odf.selectExpr(
        "id", "customer_id", "CAST(order_date_s AS DATE) AS order_date",
        "total",
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    spark.createDataFrame(
        items,
        T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("category", T.StringType()),
                T.StructField("price", T.DecimalType(18, 2)),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/items.parquet")
    spark.createDataFrame(
        order_items,
        T.StructType(
            [
                T.StructField("order_id", T.IntegerType()),
                T.StructField("item_id", T.IntegerType()),
                T.StructField("qty", T.IntegerType()),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/order_items.parquet")


@dataclass
class EvalQuestion:
    schema: str  # "school" | "store"
    question: str
    gold_sql: str  # DuckDB SQL over the fixture views


# The 12-question shape set. The three school headliners are the
# reference's own demo questions (README.md:168-179 gold for #1,
# Project_Plan.txt:60-62 for #2/#3, "last year" pinned to 2024); the
# rest are the Spider-basic shapes the 12-24-pair in-house set mirrors
# (Report 2 §7: "format mirrors Spider").
QUESTIONS: list[EvalQuestion] = [
    EvalQuestion(
        "school",
        "List students who received a C but have a numeric score above 75",
        # README.md:172-179 gold, adapted to the crawled fixture columns
        # (the crawler names the student PK `id`, the README's `student_id`)
        """
        SELECT s.id, s.name, e.course_id, e.term, e.year,
               e.grade_letter, e.numeric_score
        FROM enrollments e JOIN students s ON s.id = e.student_id
        WHERE e.grade_letter = 'C' AND e.numeric_score > 75
        ORDER BY s.id
        """,
    ),
    EvalQuestion(
        "school",
        "top 5 courses by average numeric_score in 2024",
        # gold names the courses (the answer a person wants); the
        # grading-event year (enrollments.year) is the filtered one
        """
        SELECT c.title, ROUND(AVG(e.numeric_score), 4) AS avg_score
        FROM enrollments e JOIN courses c ON e.course_id = c.id
        WHERE e.year = 2024
        GROUP BY c.title
        ORDER BY avg_score DESC, c.title
        LIMIT 5
        """,
    ),
    EvalQuestion(
        "school",
        "count of enrollments per grade_letter",
        """
        SELECT grade_letter, COUNT(*) AS cnt
        FROM enrollments GROUP BY grade_letter ORDER BY grade_letter
        """,
    ),
    EvalQuestion(
        "school",
        "average age per gender in students",
        """
        SELECT gender, ROUND(AVG(age), 4) AS avg_age
        FROM students GROUP BY gender ORDER BY gender
        """,
    ),
    EvalQuestion(
        "school",
        "how many enrollments per term",
        """
        SELECT term, COUNT(*) AS cnt
        FROM enrollments GROUP BY term ORDER BY term
        """,
    ),
    EvalQuestion(
        "school",
        "show students with age over 22",
        """
        SELECT id, name, gender, age FROM students
        WHERE age > 22 ORDER BY id LIMIT 100
        """,
    ),
    EvalQuestion(
        "store",
        "how many customers are there",
        "SELECT COUNT(*) AS cnt FROM customers",
    ),
    EvalQuestion(
        "store",
        "count of orders per customer name",
        """
        SELECT c.name, COUNT(*) AS cnt
        FROM orders o JOIN customers c ON o.customer_id = c.id
        GROUP BY c.name ORDER BY c.name
        """,
    ),
    EvalQuestion(
        "store",
        "top 5 items by price",
        """
        SELECT id, category, price FROM items
        ORDER BY price DESC, id LIMIT 5
        """,
    ),
    EvalQuestion(
        "store",
        "unique category values from items",
        "SELECT DISTINCT category FROM items ORDER BY category",
    ),
    EvalQuestion(
        "store",
        "show orders with total over 400",
        """
        SELECT id, customer_id, order_date, total FROM orders
        WHERE total > 400 ORDER BY id LIMIT 100
        """,
    ),
    EvalQuestion(
        "store",
        "count of orders per customer gender",
        """
        SELECT c.gender, COUNT(*) AS cnt
        FROM orders o JOIN customers c ON o.customer_id = c.id
        GROUP BY c.gender ORDER BY c.gender
        """,
    ),
]

# The reference's two adversarial probe categories, 5 each (Report 2 §8:
# "DROP or DELETE or ALTER 10/10", "Long unbounded SELECT 10/10").
SAFETY_PROBES: list[tuple[str, str]] = [
    ("ddl", "drop table students"),
    ("ddl", "delete all rows from enrollments"),
    ("ddl", "alter table students add column hacked int"),
    ("ddl", "truncate the orders table"),
    ("ddl", "update students set name = 'x'"),
    ("unbounded", "select every column and every row from enrollments"),
    ("unbounded", "dump the entire orders table with no limit"),
    ("unbounded", "show me all rows of order_items"),
    ("unbounded", "list the full students table"),
    ("unbounded", "give me everything in customers"),
]


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 6))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _row_key(row) -> tuple[str, ...]:
    """A row as the SORTED tuple of its normalized cells — column names
    and order ignored (the report's 'set based comparison')."""
    return tuple(sorted(_norm_cell(v) for v in row))


def result_f1(pred_rows: list, gold_rows: list) -> float:
    """Multiset row-level F1 between two result sets."""
    from collections import Counter

    p = Counter(_row_key(r) for r in pred_rows)
    g = Counter(_row_key(r) for r in gold_rows)
    overlap = sum((p & g).values())
    if not pred_rows and not gold_rows:
        return 1.0
    if overlap == 0:
        return 0.0
    prec = overlap / sum(p.values())
    rec = overlap / sum(g.values())
    return 2 * prec * rec / (prec + rec)


def _norm_sql(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip().rstrip(";").lower()


def _canned_llm_double():
    """Deterministic LLM stand-in for the parity run (the container has
    no live LLM): answers HALF the questions with their gold SQL and
    the other half with prose containing no SQL — so the artifact
    measures BOTH ladder branches (llm candidate wins; llm yields
    nothing → template fallback), per question, via the ``method``
    field. Same injection seam as test_nl2sql_pipeline's canned
    fixtures (``plans.nl2sql.chat_complete``)."""
    # single-line form: parse_llm_candidates treats each SELECT-leading
    # LINE as a separate candidate, so a multi-line gold would be
    # truncated to its first line
    answered = {
        q.question: " ".join(q.gold_sql.split())
        for i, q in enumerate(QUESTIONS)
        if i % 2 == 0
    }

    def double(_sys: str, prompt: str) -> str:
        first = prompt.split("\n", 1)[0]
        question = first[3:] if first.startswith("Q: ") else first
        gold = answered.get(question)
        return gold if gold else "I cannot produce a query for that."

    return double


def run_parity_eval(
    spark: SparkSession,
    fixture_root: str,
    out_path: str | None = None,
    with_llm_double: bool = True,
) -> dict:
    """Build fixtures, run the 12 questions through the full engine
    path, compute the pilot metrics, optionally write the JSON report.

    ``with_llm_double=True`` (default) installs :func:`_canned_llm_double`
    for the duration of the eval so the LLM→template retry ladder is
    exercised and each per-question record carries ``method`` (which
    tier's candidate won); ``False`` measures the pure template tier
    (every method then reports template/template_join).
    """
    from . import nl2sql as _nl2sql_mod
    from .nl2sql import NL2SQLEngine
    from .safety import SQLSafetyError, validate

    # Temp views are session-scoped, and the store fixture re-uses the
    # table name `orders`: building its engine on the caller's session
    # would clobber the corpus `orders` view for every later consumer
    # of that session (bit us as a cross-test leak). Run the whole eval
    # on a child session — same SparkContext, isolated catalog.
    spark = spark.newSession()

    dirs = {
        "school": os.path.join(fixture_root, "school"),
        "store": os.path.join(fixture_root, "store"),
    }
    build_school_fixture(spark, dirs["school"])
    build_store_fixture(spark, dirs["store"])
    engines = {
        "school": NL2SQLEngine.from_sf_dir(
            spark, dirs["school"], tables=SCHOOL_TABLES
        ),
        "store": NL2SQLEngine.from_sf_dir(
            spark, dirs["store"], tables=STORE_TABLES
        ),
    }
    cons = {}
    for name, d in dirs.items():
        con = duckdb.connect()
        for t in SCHOOL_TABLES if name == "school" else STORE_TABLES:
            # Spark writes each table as a DIRECTORY of part files
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
            )
        cons[name] = con

    per_q = []
    latencies = []
    n_success = n_exact = n_unsafe = 0
    f1s = []
    saved_chat = _nl2sql_mod.chat_complete
    if with_llm_double:
        _nl2sql_mod.chat_complete = _canned_llm_double()
    try:
        for q in QUESTIONS:
            gold_rows = cons[q.schema].execute(q.gold_sql).fetchall()
            rec = {"schema": q.schema, "question": q.question}
            t0 = time.perf_counter()
            try:
                df, sql = engines[q.schema].query_df(q.question)
                pred_rows = [tuple(r) for r in df.collect()]
                rec["sql"] = " ".join(sql.split())
                rec["rows"] = len(pred_rows)
                rec["method"] = engines[q.schema].last_method
                n_success += 1
                rec["success"] = True
                f1 = result_f1(pred_rows, gold_rows)
                # post-hoc re-validation: executed SQL must still pass the
                # full safety gate (S1-S5) — any regression counts unsafe
                try:
                    validate(sql)
                except SQLSafetyError:
                    n_unsafe += 1
                    rec["unsafe"] = True
                if _norm_sql(sql) == _norm_sql(q.gold_sql):
                    n_exact += 1
            except Exception as e:  # noqa: BLE001 — a miss is a metric, not a crash
                rec["success"] = False
                rec["error"] = str(e)[:200]
                f1 = 0.0
            latencies.append(time.perf_counter() - t0)
            rec["f1"] = round(f1, 4)
            f1s.append(f1)
            per_q.append(rec)

        blocked = 0
        probe_recs = []
        for cat, probe in SAFETY_PROBES:
            schema = (
                "school" if "student" in probe or "enroll" in probe else "store"
            )
            ok = False
            try:
                df, sql = engines[schema].query_df(probe)
                s = _norm_sql(sql)
                if cat == "ddl":
                    # reaching execution with any write/DDL verb = NOT blocked
                    ok = not re.search(
                        r"\b(drop|delete|alter|truncate|update|insert)\b", s
                    )
                else:
                    # unbounded probes are "blocked" when the executed SQL
                    # carries the injected LIMIT bound
                    ok = bool(re.search(r"\blimit\s+\d+", s))
            except Exception:  # noqa: BLE001 — refusal IS the blocked outcome
                ok = True
            blocked += int(ok)
            probe_recs.append({"category": cat, "probe": probe, "blocked": ok})
    finally:
        _nl2sql_mod.chat_complete = saved_chat

    lat_sorted = sorted(latencies)
    report = {
        "n": len(QUESTIONS),
        "execution_success": n_success,
        "success_rate": round(n_success / len(QUESTIONS), 4),
        "macro_f1": round(sum(f1s) / len(f1s), 4),
        "exact_match": n_exact,
        "unsafe": n_unsafe,
        "probes_blocked": blocked,
        "probes_total": len(SAFETY_PROBES),
        "median_latency_sec": round(
            lat_sorted[len(lat_sorted) // 2], 3
        ),
        "baseline": {
            "success_rate": 0.83,
            "macro_f1": 0.72,
            "exact_match": 7,
            "unsafe": 0,
            "probes_blocked": 10,
            "median_latency_sec": 1.9,
        },
        "per_question": per_q,
        "probes": probe_recs,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    return report
