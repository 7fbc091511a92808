"""Property-based differential test of the $group accumulator dialect
(operators/documents._acc_to_agg_masked): random accumulator specs over
a fixed corpus must aggregate identically under the compiled Spark
aggregate and a direct Python reference of the documented semantics —
Spark's null-skipping aggregates (a group with no non-null inputs sums
to NULL, the documented divergence from Mongo's 0), sorted
$push/$addToSet (the determinism contract), the $minN/$maxN slices,
exact interpolated $median/$percentile, and the $topN comparator
(sort-key directions with ties falling to the output ascending;
$bottom forms re-reversed into Mongo's order).

Float safety: all values are exact binary fractions, so partial-sum
association cannot diverge; stddev still compares via isclose (Spark's
streaming moments vs statistics' two-pass)."""

from __future__ import annotations

import math
import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    # (id, g, v, s, t)
    (1, "a", 0.5, "x", 7),
    (2, "a", -3.5, "y", 3),
    (3, "a", 2.25, "x", 9),
    (4, "a", None, "z", 1),
    (5, "b", 4.0, None, 2),
    (6, "b", 0.0, "w", 8),
    (7, "c", 1.5, "q", 4),
    (8, "d", None, "r", 6),   # group with NO non-null v
    (9, None, -1.0, "s", 5),  # null group key groups together
]
SCHEMA = "id int, g string, v double, s string, t int"


def _groups():
    out: dict = {}
    for r in ROWS:
        out.setdefault(r[1], []).append(r)
    return out


def _interp_pct(vals, p):
    xs = sorted(vals)
    if not xs:
        return None
    rank = p * (len(xs) - 1)
    lo = int(math.floor(rank))
    hi = int(math.ceil(rank))
    frac = rank - lo
    return xs[lo] + (xs[hi] - xs[lo]) * frac


def _ref_acc(spec, rows):
    (op, arg), = spec.items()
    vs = [r[2] for r in rows if r[2] is not None]
    ss = [r[3] for r in rows if r[3] is not None]
    if op == "$count" or (op == "$sum" and arg == 1):
        return len(rows)
    if op == "$sum":
        return sum(vs) if vs else None
    if op == "$avg":
        return sum(vs) / len(vs) if vs else None
    if op == "$min":
        return min(vs) if vs else None
    if op == "$max":
        return max(vs) if vs else None
    if op == "$push":
        return sorted(vs if arg == "$v" else ss)
    if op == "$addToSet":
        return sorted(set(vs if arg == "$v" else ss))
    if op == "$stdDevSamp":
        return statistics.stdev(vs) if len(vs) >= 2 else None
    if op == "$stdDevPop":
        return statistics.pstdev(vs) if vs else None
    if op == "$minN":
        return sorted(vs)[: arg["n"]]
    if op == "$maxN":
        return sorted(vs, reverse=True)[: arg["n"]]
    if op == "$median":
        return _interp_pct(vs, 0.5)
    if op == "$percentile":
        # Spark's percentile of an empty/all-null group is NULL (not
        # an array of nulls) — the engine's contract
        return [_interp_pct(vs, p) for p in arg["p"]] if vs else None
    if op in ("$topN", "$bottomN", "$top", "$bottom"):
        items = list(arg["sortBy"].items())
        bottom = op in ("$bottomN", "$bottom")
        n = 1 if op in ("$top", "$bottom") else arg["n"]

        def key(r):
            ks = []
            for f, d in items:
                val = {"v": r[2], "t": r[4]}[f]
                d_eff = -d if bottom else d
                ks.append(val if d_eff >= 0 else -val)
            ks.append(r[4])  # output "$t" ascending tiebreak
            return tuple(ks)

        picked = [r[4] for r in sorted(rows, key=key)[:n]]
        if bottom:
            picked.reverse()
        if op in ("$top", "$bottom"):
            return picked[0] if picked else None
        return picked
    raise AssertionError(op)


_ACCS = st.one_of(
    st.sampled_from([
        {"$sum": "$v"}, {"$avg": "$v"}, {"$min": "$v"}, {"$max": "$v"},
        {"$sum": 1}, {"$count": {}},
        {"$push": "$v"}, {"$push": "$s"},
        {"$addToSet": "$v"}, {"$addToSet": "$s"},
        {"$stdDevSamp": "$v"}, {"$stdDevPop": "$v"},
        {"$median": {"input": "$v", "method": "approximate"}},
    ]),
    st.sampled_from([1, 2, 3, 5]).flatmap(
        lambda n: st.sampled_from(["$minN", "$maxN"]).map(
            lambda op: {op: {"input": "$v", "n": n}}
        )
    ),
    st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]),
        min_size=1, max_size=3, unique=True,
    ).map(lambda ps: {"$percentile": {
        "input": "$v", "p": ps, "method": "approximate"}}),
    st.tuples(
        st.sampled_from(["$topN", "$bottomN", "$top", "$bottom"]),
        st.sampled_from([{"t": 1}, {"t": -1}, {"v": 1}, {"v": -1},
                         {"v": 1, "t": -1}]),
        st.sampled_from([1, 2, 3]),
    ).map(lambda t: {
        t[0]: (
            {"output": "$t", "sortBy": t[1]}
            if t[0] in ("$top", "$bottom")
            else {"output": "$t", "sortBy": t[1], "n": t[2]}
        )
    }),
)


@pytest.fixture(scope="module")
def group_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b),
                            rel_tol=1e-9, abs_tol=1e-12)
    return a == b


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(acc=_ACCS)
def test_group_accumulator_matches_reference(group_store, acc):
    # $topN sortBy {v: ...} over rows with null v has murky null
    # ordering on both sides — restrict those specs to non-null v rows
    # via a $match the reference mirrors
    (op, arg), = acc.items()
    needs_v = op in ("$topN", "$bottomN", "$top", "$bottom") and "v" in (
        arg.get("sortBy") or {}
    )
    pipeline = ([{"$match": {"v": {"$exists": True}}}] if needs_v else []) + [
        {"$group": {"_id": "$g", "x": acc}},
    ]
    rows = {
        r["_id"]: r["x"]
        for r in group_store.aggregate("t", pipeline).collect()
    }
    for g, grp_rows in _groups().items():
        if needs_v:
            grp_rows = [r for r in grp_rows if r[2] is not None]
            if not grp_rows:
                assert g not in rows, (acc, g)
                continue
        want = _ref_acc(acc, grp_rows)
        got = rows[g]
        if hasattr(got, "__iter__") and not isinstance(got, str):
            got = list(got)
        assert _close(got, want), (acc, g, got, want)
