"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch the builder brief calls for when built-in streaming
aggregations can't express the semantics (here: per-key RUNNING totals
re-emitted every micro-batch, i.e. a live per-user counter, which
window/session aggs only emit at window close).

Scale shape: state is one (count, sum) pair per active user — O(keys),
not O(events); Arrow batches move each group's micro-batch slice, and
the state store shuffles only on ``user_id``. A TTL (``stateTimeout``)
would bound the key space for unbounded cardinality; the file-replay
tests don't need one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) maintained across
    micro-batches. Input must be a STREAMING DataFrame with ``user_id``
    and ``value`` columns; emits one updated row per user per batch in
    which that user appeared."""
    import pandas as pd  # noqa: PLC0415

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
