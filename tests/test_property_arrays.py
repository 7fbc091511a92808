"""Property-based differential sweep of the ARRAY-LAMBDA dialect
($map / $filter / $reduce / $sortArray / $reverseArray / $slice /
$concatArrays / $range, with $$variable scoping) — the last compiled
expression surface without generative coverage after the r9-r11
sweeps. Random NESTED trees (a $map over a $filter over a $range,
lambda bodies mixing $$this-style vars with OUTER column refs) are
evaluated against a pure-Python environment-passing evaluator.

Contracts pinned: lambda variables resolve through the scoped
resolver with outer fields still visible inside bodies; null arrays
propagate null through every lambda form; $reduce left-folds with
Mongo's $$value/$$this pair; $range is end-exclusive with the
empty-on-inverted-bounds guard; $slice's negative-count tail form;
$sortArray ±1 over scalars; a directed case pins $let shadowing
inside $map (inner binding wins, outer restored)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

ROWS = [
    # (_id, arr, k)
    (1, [3, 1, 4, 1, 5], 2),
    (2, [], 0),
    (3, None, 5),
    (4, [9, -2], 1),
    (5, [0], 7),
    (6, [2, 2, 7, -1], 3),
]
SCHEMA = "_id int, arr array<long>, k long"


def _docs():
    return [{"_id": i, "arr": a, "k": k} for i, a, k in ROWS]


@pytest.fixture(scope="module")
def arr_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


# body expressions over the lambda var $$v (plus outer $k); additive
# growth only — ANSI long arithmetic must never overflow under nesting
_BODY = st.sampled_from([
    "$$v",
    {"$add": ["$$v", 1]},
    {"$add": ["$$v", "$k"]},
    {"$multiply": ["$$v", 3]},
    {"$subtract": [0, "$$v"]},
    {"$cond": [{"$gt": ["$$v", 1]}, "$$v", 0]},
    {"$abs": "$$v"},
])
_COND = st.sampled_from([
    {"$gt": ["$$v", 1]},
    {"$lte": ["$$v", "$k"]},
    {"$eq": [{"$mod": ["$$v", 2]}, 0]},
    {"$ne": ["$$v", 1]},
])

arr_expr = st.deferred(lambda: st.one_of(
    st.just("$arr"),
    st.just([4, 2, 8]),
    st.just({"$range": [0, "$k"]}),
    st.just({"$range": [5, 0, -2]}),
    st.tuples(arr_expr, _BODY).map(
        lambda t: {"$map": {"input": t[0], "as": "v", "in": t[1]}}),
    st.tuples(arr_expr, _COND).map(
        lambda t: {"$filter": {"input": t[0], "as": "v", "cond": t[1]}}),
    st.tuples(arr_expr, st.sampled_from([1, -1])).map(
        lambda t: {"$sortArray": {"input": t[0], "sortBy": t[1]}}),
    # a BARE list operand is an operand LIST (Mongo's parse rule —
    # {$size: [4,2,8]} is a 3-arg error on both engines), so literal
    # arrays wrap in one more list for unary ops
    arr_expr.map(lambda e: {"$reverseArray":
                            [e] if isinstance(e, list) else e}),
    st.tuples(arr_expr, st.sampled_from([2, -2])).map(
        lambda t: {"$slice": list(t)}),
    st.tuples(arr_expr, arr_expr).map(
        lambda t: {"$concatArrays": list(t)}),
))

def _to_this(e):
    """Rewrite the shared $$v bodies onto $reduce's $$this variable."""
    import json as _json

    return _json.loads(_json.dumps(e).replace('"$$v"', '"$$this"'))


out_expr = st.one_of(
    arr_expr,
    arr_expr.map(lambda e: {"$size": [e] if isinstance(e, list) else e}),
    st.tuples(arr_expr, _BODY).map(lambda t: {"$reduce": {
        "input": t[0], "initialValue": 0,
        "in": {"$add": ["$$value", _to_this(t[1])]},
    }}),
)


def _ref_eval(e, doc, env):
    if isinstance(e, str) and e.startswith("$$"):
        return env[e[2:]]
    if isinstance(e, str) and e.startswith("$"):
        return doc.get(e[1:])
    if isinstance(e, list):
        return [_ref_eval(x, doc, env) for x in e]
    if not isinstance(e, dict):
        return e
    (op, arg), = e.items()

    def ev(x):
        return _ref_eval(x, doc, env)

    if op == "$map":
        arr = ev(arg["input"])
        if arr is None:
            return None
        var = arg.get("as", "this")
        return [_ref_eval(arg["in"], doc, {**env, var: x}) for x in arr]
    if op == "$filter":
        arr = ev(arg["input"])
        if arr is None:
            return None
        var = arg.get("as", "this")
        return [x for x in arr
                if _ref_eval(arg["cond"], doc, {**env, var: x}) is True]
    if op == "$reduce":
        arr = ev(arg["input"])
        if arr is None:
            return None
        acc = ev(arg["initialValue"])
        for x in arr:
            acc = _ref_eval(arg["in"], doc,
                            {**env, "value": acc, "this": x})
        return acc
    if op == "$sortArray":
        arr = ev(arg["input"])
        if arr is None:
            return None
        return sorted(arr, reverse=arg["sortBy"] == -1)
    if op == "$reverseArray":
        if isinstance(arg, list) and len(arg) == 1:
            arg = arg[0]  # the unary-op literal-array wrapping
        arr = ev(arg)
        return None if arr is None else list(reversed(arr))
    if op == "$slice":
        arr = ev(arg[0])
        if arr is None:
            return None
        n = arg[1]
        return arr[:n] if n >= 0 else arr[n:]
    if op == "$concatArrays":
        parts = [ev(x) for x in arg]
        if any(p is None for p in parts):
            return None
        return [x for p in parts for x in p]
    if op == "$range":
        a, b = ev(arg[0]), ev(arg[1])
        step = arg[2] if len(arg) == 3 else 1
        return list(range(a, b, step))
    if op == "$size":
        if isinstance(arg, list) and len(arg) == 1:
            arg = arg[0]  # the unary-op literal-array wrapping
        arr = ev(arg)
        return None if arr is None else len(arr)
    if op == "$add":
        xs = [ev(x) for x in arg]
        return None if any(x is None for x in xs) else sum(xs)
    if op == "$subtract":
        a, b = ev(arg[0]), ev(arg[1])
        return None if a is None or b is None else a - b
    if op == "$multiply":
        a, b = ev(arg[0]), ev(arg[1])
        return None if a is None or b is None else a * b
    if op == "$abs":
        v = ev(arg)
        return None if v is None else abs(v)
    if op == "$mod":
        a, b = ev(arg[0]), ev(arg[1])
        if a is None or b is None or b == 0:
            return None
        import math
        return int(math.fmod(a, b))  # Java %: sign of the dividend
    if op == "$cond":
        return ev(arg[1] if ev(arg[0]) is True else arg[2])
    if op in ("$gt", "$gte", "$lt", "$lte"):
        a, b = ev(arg[0]), ev(arg[1])
        if a is None or b is None:
            return None
        return {"$gt": a > b, "$gte": a >= b,
                "$lt": a < b, "$lte": a <= b}[op]
    if op in ("$eq", "$ne"):
        a, b = ev(arg[0]), ev(arg[1])
        same = (a is None and b is None) or (
            a is not None and b is not None and a == b)
        return same if op == "$eq" else not same
    raise AssertionError(op)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=out_expr)
# the r11 judge's failing draw, pinned forever: an int-literal
# initialValue over the bigint column array must WIDEN (Mongo's
# int32 -> long promotion), not throw DATATYPE_MISMATCH
@example(e={"$reduce": {"input": "$arr", "initialValue": 0,
            "in": {"$add": ["$$value", "$$this"]}}})
# the r12 suite's falsifying draw: an INT-literal array whose body
# references a LONG outer column — the accumulator must widen to the
# BODY's type, element type alone is not enough
@example(e={"$reduce": {"input": [4, 2, 8], "initialValue": 0,
            "in": {"$add": ["$$value",
                            {"$add": ["$$this", "$k"]}]}}})
def test_array_lambda_matches_reference(arr_store, e):
    rows = {
        r["_id"]: r["out"]
        for r in arr_store.aggregate(
            "t", [{"$project": {"_id": 1, "out": e}}]).collect()
    }
    for doc in _docs():
        want = _ref_eval(e, doc, {})
        got = rows[doc["_id"]]
        if hasattr(got, "__iter__") and not isinstance(got, str):
            got = list(got)
        assert got == want, (e, doc["_id"], got, want)


def test_let_shadowing_inside_map(arr_store):
    """$let binds $$a; a $map with the SAME var name shadows it inside
    the body and the outer binding is restored after — Mongo's scoping
    rule, pinned through the scoped resolver chain."""
    e = {"$let": {
        "vars": {"a": 100},
        "in": {"$concatArrays": [
            {"$map": {"input": "$arr", "as": "a",
                      "in": {"$add": ["$$a", 1]}}},
            [{"$add": ["$$a", 1]}],  # outer $$a again -> 101
        ]},
    }}
    rows = {
        r["_id"]: r["out"]
        for r in arr_store.aggregate(
            "t", [{"$match": {"_id": 1}},
                  {"$project": {"_id": 1, "out": e}}]).collect()
    }
    assert list(rows[1]) == [4, 2, 5, 2, 6, 101]


def test_reduce_init_widening(spark):
    """The r11 judge find as a directed regression, plus the rest of
    Mongo's promotion ladder: a bare ``initialValue: 0`` (int32
    literal) over long / double / decimal arrays must adopt the
    fold's element type (int32 -> long -> double widening), never
    throw ``DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE``; a typed
    (float) literal over an int array widens the fold to double."""
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("w", spark.createDataFrame(
        [(1, [1, 2, 3], [1.5, 2.5], [4, 5])],
        "_id int, la array<long>, da array<double>, ia array<int>"))
    sum_of = lambda col, init: {"$reduce": {  # noqa: E731
        "input": col, "initialValue": init,
        "in": {"$add": ["$$value", "$$this"]}}}
    row = s.aggregate("w", [{"$project": {
        "_id": 1,
        "s_long": sum_of("$la", 0),
        "s_dbl": sum_of("$da", 0),
        "s_int": sum_of("$ia", 0),
        "s_float_init": sum_of("$ia", 0.5),
    }}]).collect()[0]
    assert row["s_long"] == 6
    assert row["s_dbl"] == 4.0
    assert row["s_int"] == 9
    assert row["s_float_init"] == 9.5


def test_zip_shapes(arr_store):
    """$zip: shortest-length truncation by default, null padding under
    useLongestLength; null input arrays propagate null."""
    rows = {
        r["_id"]: r
        for r in arr_store.aggregate("t", [{"$project": {
            "_id": 1,
            "z": {"$zip": {"inputs": ["$arr", [10, 20]]}},
            "zl": {"$zip": {"inputs": ["$arr", [10, 20]],
                            "useLongestLength": True}},
        }}]).collect()
    }
    assert [list(p) for p in rows[1]["z"]] == [[3, 10], [1, 20]]
    assert [list(p) for p in rows[1]["zl"]] == [
        [3, 10], [1, 20], [4, None], [1, None], [5, None]]
    assert list(rows[2]["z"]) == []
    assert rows[3]["z"] is None
