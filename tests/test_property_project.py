"""Property-based differential sweep of the PROJECTION language
($project / $addFields — the compiled surface with the least
generative coverage after the r9/r10 find/$group/$setWindowFields/NL
sweeps, VERDICT r10 task 4).

Two input spaces:

1. Projection SHAPE: random include/exclusion mixes over a fixed
   corpus vs a pure-Python reference of the documented rules —
   include keeps _id by default (prepended, the C6 _id-first
   convention), {_id: 0} alongside includes is the pymongo-special
   exception, exclusion preserves source order, and any other
   include+exclude mix is the typed error.

2. COMPUTED fields: random typed expression trees over the dialect's
   arithmetic / comparison / boolean / conditional / string / array
   operators vs a pure-Python evaluator of the ENGINE's documented
   semantics — SQL null propagation (the module's contract; $eq is
   null-SAFE, $cmp's null divergence is documented at the operator),
   Kleene $and/$or, $cond's null-condition-takes-else, left-fold
   float association for $add/$multiply (bit-identical to Spark's
   fold, so floats compare exactly), C-style $mod sign (Java % ==
   math.fmod), and Mongo's negative-from-end $arrayElemAt.

The same expression tree is exercised through BOTH $project (computed
form) and $addFields — they ride the same compiler, and the sweep
pins that they stay in lockstep.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    # (_id, a, b, s, arr, sub)
    (1, 3, 2.5, "Ab c", [1, 2, 3], (7, "u")),
    (2, -2, 0.25, "word", [5], (0, "V")),
    (3, 0, None, "", [], (-4, "w")),
    (4, 7, -1.5, None, None, None),
    (5, 1, 0.0, "ZZ top", [2, 2, 9], (3, None)),
]
SCHEMA = (
    "_id int, a long, b double, s string, arr array<long>, "
    "sub struct<x:long, y:string>"
)
FIELDS = ["a", "b", "s", "arr", "sub"]


def _docs():
    out = []
    for _id, a, b, s, arr, sub in ROWS:
        out.append({
            "_id": _id, "a": a, "b": b, "s": s, "arr": arr,
            "sub": None if sub is None else {"x": sub[0], "y": sub[1]},
        })
    return out


@pytest.fixture(scope="module")
def proj_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


# ------------------------------------------------------------ shapes
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    picked=st.lists(st.sampled_from(FIELDS), min_size=1, max_size=4,
                    unique=True),
    mode=st.sampled_from(["include", "include_no_id", "exclude"]),
)
def test_projection_shape_matches_reference(proj_store, picked, mode):
    if mode == "exclude":
        spec = {f: 0 for f in picked}
        want_cols = ["_id"] + [f for f in FIELDS if f not in picked]
    else:
        spec = {f: 1 for f in picked}
        want_cols = list(picked)
        if mode == "include_no_id":
            spec["_id"] = 0
        else:
            want_cols = ["_id"] + want_cols  # _id-first convention
    df = proj_store.aggregate("t", [{"$project": spec}])
    assert df.columns == want_cols, (spec, df.columns)
    got = [r.asDict(recursive=True) for r in df.collect()]
    want = [{c: d[c] for c in want_cols} for d in _docs()]
    key = want_cols[0]
    got.sort(key=lambda d: (d[key] is None, str(d[key])))
    want.sort(key=lambda d: (d[key] is None, str(d[key])))
    for g, w in zip(got, want):
        g = {k: list(v) if isinstance(v, (list, tuple)) and not
             isinstance(v, str) else v for k, v in g.items()}
        assert g == w, (spec, g, w)


def test_projection_mix_is_typed_error(proj_store):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentQueryError,
    )

    with pytest.raises(DocumentQueryError, match="mix"):
        proj_store.aggregate("t", [{"$project": {"a": 1, "b": 0}}])


# ------------------------------------------------- typed expressions
_NUM_LEAF = st.sampled_from(
    ["$a", "$b", "$sub.x", 2, -3, 7, 2.5, 0.5, {"$literal": 4}]
)
_STR_LEAF = st.sampled_from(["$s", "$sub.y", "word", "Ab c", ""])

num_expr = st.deferred(lambda: st.one_of(
    _NUM_LEAF,
    st.tuples(st.sampled_from(["$add", "$multiply"]),
              st.lists(num_expr, min_size=2, max_size=3)).map(
        lambda t: {t[0]: t[1]}),
    st.tuples(num_expr, num_expr).map(lambda t: {"$subtract": list(t)}),
    # non-zero LITERAL divisors: a zero divisor errors on BOTH engines
    # (Mongo "can't $divide by zero"; Spark 4 ANSI ArithmeticException)
    # — pinned by test_divide_by_zero_errors_like_mongo below
    st.tuples(num_expr, st.sampled_from([2, -3, 2.5, 0.5])).map(
        lambda t: {"$divide": list(t)}),
    st.tuples(num_expr, st.sampled_from([2, 3, -3, 2.5])).map(
        lambda t: {"$mod": list(t)}),
    num_expr.map(lambda e: {"$abs": e}),
    num_expr.map(lambda e: {"$floor": e}),
    num_expr.map(lambda e: {"$ceil": e}),
    st.tuples(bool_expr, num_expr, num_expr).map(
        lambda t: {"$cond": list(t)}),
    st.tuples(num_expr, num_expr).map(lambda t: {"$ifNull": list(t)}),
    st.sampled_from([{"$size": "$arr"},
                     {"$strLenCP": "$s"},
                     {"$strLenBytes": "$s"}]),
    st.sampled_from([-4, -1, 0, 1, 2]).map(
        lambda i: {"$arrayElemAt": ["$arr", i]}),
    st.sampled_from(["$a", 2, 9]).map(
        lambda v: {"$indexOfArray": ["$arr", v]}),
    st.tuples(num_expr, num_expr).map(lambda t: {"$cmp": list(t)}),
))

bool_expr = st.deferred(lambda: st.one_of(
    st.tuples(st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"]),
              num_expr, num_expr).map(lambda t: {t[0]: [t[1], t[2]]}),
    st.tuples(st.sampled_from(["$and", "$or"]),
              st.lists(bool_expr, min_size=2, max_size=3)).map(
        lambda t: {t[0]: t[1]}),
    bool_expr.map(lambda e: {"$not": e}),
    st.sampled_from(["$a", 2, 9]).map(lambda v: {"$in": [v, "$arr"]}),
))

str_expr = st.deferred(lambda: st.one_of(
    _STR_LEAF,
    st.lists(str_expr, min_size=2, max_size=3).map(
        lambda xs: {"$concat": xs}),
    str_expr.map(lambda e: {"$toUpper": e}),
    str_expr.map(lambda e: {"$toLower": e}),
    str_expr.map(lambda e: {"$trim": {"input": e}}),
    st.tuples(str_expr, st.sampled_from([0, 1, 2]),
              st.sampled_from([0, 1, 3, 5])).map(
        lambda t: {"$substrCP": list(t)}),
    st.tuples(bool_expr, str_expr, str_expr).map(
        lambda t: {"$cond": list(t)}),
    st.tuples(str_expr, str_expr).map(lambda t: {"$ifNull": list(t)}),
))

any_expr = st.one_of(num_expr, bool_expr, str_expr)


def _path(doc, p):
    cur = doc
    for part in p.split("."):
        if cur is None:
            return None
        cur = cur.get(part)
    return cur


def ref_expr(e, doc):
    """Pure-Python evaluator of the engine's documented semantics."""
    if isinstance(e, str) and e.startswith("$"):
        return _path(doc, e[1:])
    if isinstance(e, list):
        return [ref_expr(x, doc) for x in e]
    if not isinstance(e, dict):
        return e
    (op, arg), = e.items()
    if op == "$literal":
        return arg
    a = [ref_expr(x, doc) for x in arg] if isinstance(arg, list) else None

    def numprop(fn, xs):
        return None if any(x is None for x in xs) else fn(xs)

    if op == "$add":
        return numprop(lambda xs: _foldl(lambda p, x: p + x, xs), a)
    if op == "$multiply":
        return numprop(lambda xs: _foldl(lambda p, x: p * x, xs), a)
    if op == "$subtract":
        return numprop(lambda xs: xs[0] - xs[1], a)
    if op == "$divide":
        if a[0] is None or a[1] is None or a[1] == 0:
            return None
        return a[0] / a[1]
    if op == "$mod":
        # Java % — sign of the dividend (math.fmod's rule, NOT
        # Python's %); long%long stays integral
        if a[0] is None or a[1] is None or a[1] == 0:
            return None
        r = math.fmod(a[0], a[1])
        return int(r) if isinstance(a[0], int) and isinstance(a[1], int) \
            else r
    if op == "$abs":
        v = ref_expr(arg, doc)
        return None if v is None else abs(v)
    if op == "$floor":
        v = ref_expr(arg, doc)
        return None if v is None else math.floor(v)
    if op == "$ceil":
        v = ref_expr(arg, doc)
        return None if v is None else math.ceil(v)
    if op == "$cond":
        return ref_expr(arg[1] if ref_expr(arg[0], doc) is True
                        else arg[2], doc)
    if op == "$ifNull":
        for x in arg:
            v = ref_expr(x, doc)
            if v is not None:
                return v
        return None
    if op == "$size":
        v = ref_expr(arg, doc)
        return None if v is None else len(v)
    if op == "$strLenCP":
        v = ref_expr(arg, doc)
        return None if v is None else len(v)
    if op == "$strLenBytes":
        v = ref_expr(arg, doc)
        return None if v is None else len(v.encode("utf-8"))
    if op == "$arrayElemAt":
        arr, i = a
        if arr is None or i is None:
            return None
        if i >= len(arr) or i < -len(arr):
            return None  # out of range -> null (element_at, ansi off)
        return arr[i]
    if op == "$indexOfArray":
        arr, v = a
        if arr is None:
            return None
        return arr.index(v) if v in arr else -1
    if op == "$cmp":
        # documented divergence: null operand -> null
        if a[0] is None or a[1] is None:
            return None
        return 0 if a[0] == a[1] else (-1 if a[0] < a[1] else 1)
    if op in ("$eq", "$ne"):
        same = (a[0] is None and a[1] is None) or (
            a[0] is not None and a[1] is not None and a[0] == a[1]
        )
        return same if op == "$eq" else not same
    if op in ("$gt", "$gte", "$lt", "$lte"):
        if a[0] is None or a[1] is None:
            return None
        x, y = a
        return {"$gt": x > y, "$gte": x >= y,
                "$lt": x < y, "$lte": x <= y}[op]
    if op in ("$and", "$or"):
        vals = a
        if op == "$and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    if op == "$not":
        v = ref_expr(arg, doc)
        return None if v is None else (not v)
    if op == "$in":
        v, arr = a
        if arr is None or v is None:
            return None
        return any(x is not None and x == v for x in arr)
    if op == "$concat":
        return None if any(x is None for x in a) else "".join(a)
    if op == "$toUpper":
        v = ref_expr(arg, doc)
        return None if v is None else v.upper()
    if op == "$toLower":
        v = ref_expr(arg, doc)
        return None if v is None else v.lower()
    if op == "$trim":
        v = ref_expr(arg["input"], doc)
        return None if v is None else v.strip()
    if op == "$substrCP":
        s, start, n = a
        return None if s is None else s[start:start + n]
    raise AssertionError(op)


def _foldl(fn, xs):
    acc = xs[0]
    for x in xs[1:]:
        acc = fn(acc, x)
    return acc


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list) or isinstance(b, list):
        return (isinstance(a, list) and isinstance(b, list)
                and len(a) == len(b)
                and all(_close(x, y) for x, y in zip(a, b)))
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        if math.isnan(a) if isinstance(a, float) else False:
            return isinstance(b, float) and math.isnan(b)
        return math.isclose(float(a), float(b), rel_tol=1e-9,
                            abs_tol=1e-12)
    return a == b


def test_divide_by_zero_errors_like_mongo(proj_store):
    """A zero divisor is a RUNTIME error on both engines (Mongo:
    "can't $divide by zero"; Spark 4 runs ANSI mode, so the job dies
    with an ArithmeticException) — parity, not a divergence. Pinned so
    a future ANSI-off config change is noticed."""
    import py4j.protocol
    from pyspark.errors.exceptions.captured import ArithmeticException

    with pytest.raises((ArithmeticException,
                        py4j.protocol.Py4JJavaError)):
        proj_store.aggregate("t", [{"$project": {
            "_id": 1, "out": {"$divide": ["$a", 0]}}}]).collect()


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=any_expr, via=st.sampled_from(["$project", "$addFields"]))
def test_computed_field_matches_reference(proj_store, e, via):
    if via == "$project":
        # a BARE number/bool in $project is an include/exclude flag,
        # not an expression (Mongo's rule; $literal is the escape
        # hatch) — $addFields below takes it raw, pinning the split
        if not isinstance(e, (dict, str)):
            e = {"$literal": e}
        pipeline = [{"$project": {"_id": 1, "out": e}}]
    else:
        pipeline = [{"$addFields": {"out": e}},
                    {"$project": {"_id": 1, "out": 1}}]
    rows = {r["_id"]: r["out"]
            for r in proj_store.aggregate("t", pipeline).collect()}
    for doc in _docs():
        want = ref_expr(e, doc)
        got = rows[doc["_id"]]
        if hasattr(got, "__iter__") and not isinstance(got, str):
            got = list(got)
        assert _close(got, want), (e, doc["_id"], got, want)
