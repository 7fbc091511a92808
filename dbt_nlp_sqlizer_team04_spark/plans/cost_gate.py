"""Pre-execution cost gate — S7 (SURVEY.md §2.B safety table).

The reference EXPLAINs the query on the target DB and regexes
``rows=(\\d+)`` out of the plan text, rejecting > 100,000 estimated rows
(app/ai/nl2sql.py:363-374; app/routes_ai.py:279-285). Spark gives us the
typed equivalent: the Catalyst *optimized* logical plan carries
``Statistics(sizeInBytes, rowCount)``. With CBO + collected stats
rowCount is populated; without, we fall back to a sizeInBytes heuristic
(bytes / estimated row width) — the reference's regex gate was equally
approximate, as SURVEY.md §4 notes.

This must *refuse to run* before any job is submitted, so it is a
driver-side decision on the lazy DataFrame, not a Catalyst rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .safety import SQLSafetyError

DEFAULT_MAX_ESTIMATED_ROWS = 100_000  # routes_ai.py:284 threshold


def estimated_row_count(df: DataFrame) -> tuple[int | None, str]:
    """(estimate, source) from the optimized plan's statistics.

    source is 'rowCount' (CBO), 'sizeInBytes' (heuristic), or 'none'.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
    except Exception:
        return None, "none"
    try:
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get())), "rowCount"
    except Exception:
        pass
    try:
        size = int(str(stats.sizeInBytes()))
        # conservative average row width guess; schema-aware refinement:
        width = max(8 * len(df.schema.fields), 16)
        return size // width, "sizeInBytes"
    except Exception:
        return None, "none"


def cost_gate(
    df: DataFrame, max_estimated_rows: int = DEFAULT_MAX_ESTIMATED_ROWS
) -> tuple[int | None, str]:
    """Reject plans whose estimated output exceeds the threshold.

    Returns the estimate for surfacing in responses (the reference returns
    its EXPLAIN text alongside results, routes_ai.py:308-317).
    """
    est, source = estimated_row_count(df)
    if est is not None and est > max_estimated_rows:
        raise SQLSafetyError(
            f"Query rejected by cost gate: estimated {est} rows "
            f"(> {max_estimated_rows}, source={source})"
        )
    return est, source
