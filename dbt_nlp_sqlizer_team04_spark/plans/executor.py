"""Read-only executor with gates — S7-S10 (SURVEY.md §2.B safety table).

Replaces the reference's ``execute_readonly`` (app/ai/nl2sql.py:332-360):
- statement timeout: Postgres ``SET LOCAL statement_timeout`` becomes a
  Spark job-group watchdog — ``setJobGroup`` + timer →
  ``cancelJobGroup`` (S8). Cancellation is cooperative (long codegen
  stages can overshoot), documented gap per SURVEY.md §7.
- row caps: ``df.limit(k)`` before collect (S9; default 100, MAX_ROWS
  500 per README.md:114-117).
- serialization: Decimal→float, date/time→ISO strings (S10,
  nl2sql.py:325-330 parity).
- cost gate on the optimized plan before submission (S7).
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field
from datetime import date, datetime, time
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .cost_gate import DEFAULT_MAX_ESTIMATED_ROWS, cost_gate
from .safety import SQLSafetyError, validate

DEFAULT_LIMIT = 100  # routes_ai.py:134
MAX_ROWS = 500  # README.md:115
DEFAULT_TIMEOUT_MS = 5000  # routes_ai.py:135


@dataclass
class ExecutionResult:
    """(columns, rows) result shape of the reference (nl2sql.py:349-360)
    plus the plan metadata its API returns (routes_ai.py:308-317)."""

    ok: bool
    sql: str
    columns: list[str] = field(default_factory=list)
    rows: list[list[Any]] = field(default_factory=list)
    rowcount: int = 0
    estimated_rows: int | None = None
    estimate_source: str = "none"
    explain: str = ""
    error: str | None = None


def jsonable(v: Any) -> Any:
    """JSON-safe coercion (nl2sql.py:325-330 parity)."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (datetime, date, time)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return [jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: jsonable(x) for k, x in v.items()}
    return v


def collect_with_timeout(
    df: DataFrame, timeout_ms: int = DEFAULT_TIMEOUT_MS
) -> list:
    """Collect under a job-group watchdog (S8)."""
    sc = df.sparkSession.sparkContext
    group = f"sqlizer-{uuid.uuid4().hex[:8]}"
    cancelled = threading.Event()

    def _cancel() -> None:
        cancelled.set()
        try:
            sc.cancelJobGroup(group)
        except Exception:
            pass

    timer = threading.Timer(timeout_ms / 1000.0, _cancel)
    sc.setJobGroup(group, "sqlizer read-only execution", interruptOnCancel=True)
    timer.start()
    try:
        return df.collect()
    except Exception:
        if cancelled.is_set():
            raise SQLSafetyError(f"Query cancelled after {timeout_ms} ms timeout")
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "")


def run_readonly(
    spark: SparkSession,
    sql: str,
    question: str | None = None,
    allowed_tables=None,
    limit: int = DEFAULT_LIMIT,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    max_estimated_rows: int = DEFAULT_MAX_ESTIMATED_ROWS,
    schema_context: dict[str, list[str]] | None = None,
) -> ExecutionResult:
    """The engine's ``run`` verb: validate → plan → cost-gate → execute.

    Mirrors the /ai/run path (app/main.py:298-331): re-validates the SQL,
    injects LIMIT, gates on estimated rows, executes read-only with a
    timeout, returns JSON-safe (columns, rows).
    """
    limit = min(limit, MAX_ROWS)
    try:
        final_sql = validate(
            sql,
            question=question,
            allowed_tables=allowed_tables,
            max_rows=limit,
            schema_context=schema_context,
        )
        df = spark.sql(final_sql)  # lazy — Spark parses, Catalyst optimizes
        est, source = cost_gate(df, max_estimated_rows)
        df = df.limit(limit)
        rows = collect_with_timeout(df, timeout_ms)
        cols = df.columns
        return ExecutionResult(
            ok=True,
            sql=final_sql,
            columns=cols,
            rows=[[jsonable(v) for v in r] for r in rows],
            rowcount=len(rows),
            estimated_rows=est,
            estimate_source=source,
            explain=df._jdf.queryExecution().simpleString(),
        )
    except SQLSafetyError as e:
        return ExecutionResult(ok=False, sql=sql, error=f"safety: {e}")
    except Exception as e:  # parse/analysis/execution errors
        return ExecutionResult(ok=False, sql=sql, error=str(e)[:500])
