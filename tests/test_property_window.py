"""Property-based differential test of $setWindowFields
(operators/documents.set_window_fields): random (accumulator, frame,
sort direction) combos over a fixed partitioned corpus must match a
direct Python reference of the documented semantics — documents-frame
slicing with clamped bounds (empty frames aggregate to NULL, collect
to []), null-skipping aggregates, the sorted $push/$addToSet
determinism convention, $first/$last reading frame endpoints in SORT
order with ignorenulls=False, $shift's lead/lag with a literal
default, and the rank family's tie behavior (documentNumber sweeps
only unique sort keys — row numbering under ties is unspecified on
both engines)."""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    # (id, g, v, t)
    (1, "a", 0.5, 7),
    (2, "a", -3.5, 3),
    (3, "a", None, 3),
    (4, "a", 2.25, 9),
    (5, "a", 4.0, 1),
    (6, "b", 0.0, 2),
    (7, "b", 1.5, 2),
    (8, "b", None, 5),
    (9, "c", -1.0, 4),
]
SCHEMA = "id int, g string, v double, t int"

_LOWS = st.sampled_from(["unbounded", -3, -1, "current"])
_HIGHS = st.sampled_from(["current", 1, 2, "unbounded"])
_ACC = st.sampled_from(["$sum", "$avg", "$min", "$max", "$push",
                        "$addToSet", "$stdDevSamp", "$stdDevPop",
                        "$first", "$last"])


def _bound(tok, i, n, *, lower):
    if tok == "unbounded":
        return 0 if lower else n - 1
    off = 0 if tok == "current" else tok
    return i + off


def _frame(part, i, lo, hi):
    n = len(part)
    a = max(0, _bound(lo, i, n, lower=True))
    b = min(n - 1, _bound(hi, i, n, lower=False))
    return part[a:b + 1] if a <= b else []


def _ref_window(op, frame_rows):
    vs = [r[2] for r in frame_rows if r[2] is not None]
    if op == "$push":
        return sorted(vs)
    if op == "$addToSet":
        return sorted(set(vs))
    if op == "$first":
        return frame_rows[0][2] if frame_rows else None
    if op == "$last":
        return frame_rows[-1][2] if frame_rows else None
    if not vs:
        return None
    return {
        "$sum": sum(vs),
        "$avg": sum(vs) / len(vs),
        "$min": min(vs),
        "$max": max(vs),
        "$stdDevSamp": statistics.stdev(vs) if len(vs) >= 2 else None,
        "$stdDevPop": statistics.pstdev(vs),
    }[op]


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)


@pytest.fixture(scope="module")
def wstore(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


def _parts(direction):
    out: dict = {}
    for r in ROWS:
        out.setdefault(r[1], []).append(r)
    return {
        g: sorted(rs, key=lambda r: r[0], reverse=(direction == -1))
        for g, rs in out.items()
    }


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(acc=_ACC, lo=_LOWS, hi=_HIGHS, direction=st.sampled_from([1, -1]))
def test_window_frame_accumulators_match_reference(
    wstore, acc, lo, hi, direction
):
    out = wstore.aggregate("t", [
        {"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"id": direction},
            "output": {"x": {
                acc: "$v",
                "window": {"documents": [lo, hi]},
            }},
        }},
        {"$sort": {"id": 1}}, {"$limit": 100},
    ]).collect()
    got = {r["id"]: r["x"] for r in out}
    for g, part in _parts(direction).items():
        for i, row in enumerate(part):
            want = _ref_window(acc, _frame(part, i, lo, hi))
            gv = got[row[0]]
            if hasattr(gv, "__iter__"):
                gv = list(gv)
            assert _close(gv, want), (acc, lo, hi, direction, row[0],
                                      gv, want)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(["$rank", "$denseRank", "$shift"]),
    direction=st.sampled_from([1, -1]),
    by=st.sampled_from([-2, -1, 1, 2]),
)
def test_window_rank_and_shift_match_reference(wstore, op, direction, by):
    if op == "$shift":
        spec = {"x": {"$shift": {"output": "$v", "by": by,
                                 "default": -99.0}}}
        sort_by = {"id": direction}
    else:
        # ties on t exercise rank/denseRank gap semantics
        spec = {"x": {op: {}}}
        sort_by = {"t": direction}
    out = wstore.aggregate("t", [
        {"$setWindowFields": {
            "partitionBy": "$g", "sortBy": sort_by, "output": spec,
        }},
        {"$sort": {"id": 1}}, {"$limit": 100},
    ]).collect()
    got = {r["id"]: r["x"] for r in out}
    if op == "$shift":
        for g, part in _parts(direction).items():
            for i, row in enumerate(part):
                j = i + by
                # Mongo's contract (lead/lag's native default): the
                # default fills only positions OUTSIDE the partition;
                # a null value at a valid position stays null
                want = part[j][2] if 0 <= j < len(part) else -99.0
                assert _close(got[row[0]], want), (op, by, direction,
                                                   row[0])
        return
    for g in {r[1] for r in ROWS}:
        rows = [r for r in ROWS if r[1] == g]
        keys = sorted(
            {r[3] for r in rows}, reverse=(direction == -1)
        )
        ordered = sorted(rows, key=lambda r: r[3],
                         reverse=(direction == -1))
        for r in rows:
            before = sum(
                1 for x in rows
                if (x[3] < r[3] if direction == 1 else x[3] > r[3])
            )
            want = (before + 1 if op == "$rank"
                    else keys.index(r[3]) + 1)
            assert got[r[0]] == want, (op, direction, r[0], got[r[0]],
                                       want, ordered)


_RANGE_ACC = st.sampled_from(["$sum", "$avg", "$min", "$max", "$push",
                              "$addToSet", "$stdDevSamp", "$stdDevPop"])
_R_LOWS = st.sampled_from(["unbounded", -4, -2, "current"])
_R_HIGHS = st.sampled_from(["current", 1, 3, "unbounded"])


@settings(
    max_examples=35,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(acc=_RANGE_ACC, lo=_R_LOWS, hi=_R_HIGHS)
def test_window_range_frame_matches_reference(wstore, acc, lo, hi):
    """RANGE frames (r11 — the r10 sweep covered documents-frames
    only): value-based bounds over the single ascending numeric sort
    key t, which carries DUPLICATES, so peer semantics are exercised —
    'current' in a range window spans ALL documents sharing the
    current sortBy value (both engines' contract), and numeric bounds
    select by key distance, not row position. $first/$last are
    deliberately absent: frame endpoints among tied peers are
    unspecified on both engines."""
    out = wstore.aggregate("t", [
        {"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"t": 1},
            "output": {"x": {
                acc: "$v",
                "window": {"range": [lo, hi]},
            }},
        }},
        {"$sort": {"id": 1}}, {"$limit": 100},
    ]).collect()
    got = {r["id"]: r["x"] for r in out}
    parts: dict = {}
    for r in ROWS:
        parts.setdefault(r[1], []).append(r)
    for g, part in parts.items():
        for row in part:
            k = row[3]
            a = float("-inf") if lo == "unbounded" else (
                k if lo == "current" else k + lo)
            b = float("inf") if hi == "unbounded" else (
                k if hi == "current" else k + hi)
            frame_rows = [r for r in part if a <= r[3] <= b]
            want = _ref_window(acc, frame_rows)
            gv = got[row[0]]
            if hasattr(gv, "__iter__"):
                gv = list(gv)
            assert _close(gv, want), (acc, lo, hi, row[0], gv, want)
