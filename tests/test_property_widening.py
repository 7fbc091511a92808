"""Property-based differential sweep of NUMERIC TYPE WIDENING in the
expression dialect (r11 verdict task 6) — the input space where Spark's
strict ANSI type coercion diverges from Mongo's silent int32 → long →
double promotion. Random trees mix int32 literals, float literals, and
int/long/double COLUMNS through $add/$subtract/$multiply/$divide/$mod,
$cond and $switch arms, and $reduce initialValues over typed arrays;
every draw must return the Mongo-widened value (evaluated by a pure
Python reference — Python numerics widen exactly like Mongo's ladder)
or raise the module's typed DocumentQueryError — NEVER a raw
AnalysisException (the r11 $reduce initialValue failure shape, pinned
here as named examples).

Contracts pinned: binary arithmetic widens across literal/column type
mixes; null columns propagate null through every operator; $divide
always returns the double quotient (int/int included); $mod keeps the
sign of the dividend; $cond/$switch arms of different numeric types
coerce to the widened type without changing values; a numeric-literal
$reduce initialValue adopts the fold's element type.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

ROWS = [
    # (_id, i int, l long, d double, la array<long>, da array<double>)
    (1, 3, 40, 2.5, [1, 2, 3], [0.5, 1.5]),
    (2, -7, 9, -0.25, [], [2.0]),
    (3, None, 100, 4.0, None, [1.0, -1.0]),
    (4, 12, None, 0.0, [10], None),
    (5, 0, -3, None, [5, -5], [0.25]),
]
SCHEMA = (
    "_id int, i int, l long, d double, "
    "la array<long>, da array<double>"
)


@pytest.fixture(scope="module")
def num_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


# small operands + shallow trees keep every draw inside long range
# (ANSI overflow would throw on BOTH engines — out of scope here)
_LEAF = st.sampled_from(
    ["$i", "$l", "$d", 0, 1, 7, -3, 0.5, -1.25]
)
# divisors are NONZERO LITERALS only: a zero divisor is a loud error
# on both engines (ANSI parity pinned in test_property_project)
_DIVISOR = st.sampled_from([2, -4, 0.5, 3])

num_expr = st.deferred(lambda: st.one_of(
    _LEAF,
    st.tuples(num_expr, num_expr).map(lambda t: {"$add": list(t)}),
    st.tuples(num_expr, num_expr).map(lambda t: {"$subtract": list(t)}),
    st.tuples(num_expr, num_expr).map(lambda t: {"$multiply": list(t)}),
    st.tuples(num_expr, _DIVISOR).map(lambda t: {"$divide": list(t)}),
    st.tuples(num_expr, _DIVISOR).map(lambda t: {"$mod": list(t)}),
    st.tuples(num_expr, num_expr, num_expr, num_expr).map(
        lambda t: {"$cond": [{"$gt": [t[0], t[1]]}, t[2], t[3]]}),
    st.tuples(num_expr, num_expr, num_expr, num_expr).map(
        lambda t: {"$switch": {
            "branches": [{"case": {"$lte": [t[0], 1]}, "then": t[1]},
                         {"case": {"$gt": [t[0], 1]}, "then": t[2]}],
            "default": t[3]}}),
    # the r11 failure family: numeric-literal initialValue over a
    # TYPED array column, folded with a widening body
    st.tuples(st.sampled_from(["$la", "$da"]),
              st.sampled_from([0, 1, 0.5]), num_expr).map(
        lambda t: {"$reduce": {
            "input": t[0], "initialValue": t[1],
            "in": {"$add": ["$$value", {"$multiply": ["$$this", 1]}]},
        }}),
))


def _ev(e, doc, env):
    """Pure-Python reference: Python's numeric tower IS Mongo's
    widening ladder (int stays exact, any double operand makes the
    result double); null operands propagate null."""
    if isinstance(e, str) and e.startswith("$$"):
        return env[e[2:]]
    if isinstance(e, str) and e.startswith("$"):
        return doc.get(e[1:])
    if not isinstance(e, dict):
        return e
    (op, arg), = e.items()

    def ev(x):
        return _ev(x, doc, env)

    if op in ("$add", "$subtract", "$multiply", "$divide", "$mod"):
        xs = [ev(x) for x in arg]
        if any(x is None for x in xs):
            return None
        a, b = xs
        if op == "$add":
            return a + b
        if op == "$subtract":
            return a - b
        if op == "$multiply":
            return a * b
        if op == "$divide":
            return a / b
        # Java %: sign of the dividend (int and float alike)
        return math.fmod(a, b) if isinstance(a, float) or isinstance(
            b, float) else int(math.fmod(a, b))
    if op in ("$gt", "$gte", "$lt", "$lte"):
        a, b = ev(arg[0]), ev(arg[1])
        if a is None or b is None:
            return None
        return {"$gt": a > b, "$gte": a >= b,
                "$lt": a < b, "$lte": a <= b}[op]
    if op == "$cond":
        return ev(arg[1] if ev(arg[0]) is True else arg[2])
    if op == "$switch":
        for br in arg["branches"]:
            if ev(br["case"]) is True:
                return ev(br["then"])
        return ev(arg["default"])
    if op == "$literal":
        return arg
    if op == "$reduce":
        inp = ev(arg["input"])
        if inp is None:
            return None
        acc = ev(arg["initialValue"])
        for x in inp:
            acc = _ev(arg["in"], doc, {**env, "value": acc, "this": x})
        return acc
    raise AssertionError(op)


def _docs():
    names = ["_id", "i", "l", "d", "la", "da"]
    return [dict(zip(names, r)) for r in ROWS]


def _num_eq(got, want) -> bool:
    if got is None or want is None:
        return got is None and want is None
    if isinstance(got, float) or isinstance(want, float):
        # same IEEE op tree on both sides -> bit-equal, but allow one
        # ulp of slack for the JVM's fused paths
        return (math.isnan(got) and math.isnan(want)) or math.isclose(
            got, want, rel_tol=1e-12, abs_tol=1e-12)
    return got == want


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=num_expr)
# the r11 judge failure shape (int-literal init over a long array)
# plus its double-array / float-init siblings, pinned forever
@example(e={"$reduce": {"input": "$la", "initialValue": 0,
            "in": {"$add": ["$$value", {"$multiply": ["$$this", 1]}]}}})
@example(e={"$reduce": {"input": "$da", "initialValue": 1,
            "in": {"$add": ["$$value", {"$multiply": ["$$this", 1]}]}}})
@example(e={"$reduce": {"input": "$la", "initialValue": 0.5,
            "in": {"$add": ["$$value", {"$multiply": ["$$this", 1]}]}}})
# mixed-type $cond arms (int literal vs long vs double column)
@example(e={"$cond": [{"$gt": ["$i", 0]}, 7, "$d"]})
@example(e={"$switch": {"branches": [
    {"case": {"$lte": ["$l", 1]}, "then": "$i"},
    {"case": {"$gt": ["$l", 1]}, "then": 0.5}], "default": "$l"}})
def test_numeric_widening_matches_reference(num_store, e):
    # a BARE numeric draw is an include/exclude FLAG under Mongo's
    # $project value rules (sweep-confirmed: the engine refuses the
    # mixed projection loudly) — $literal is the documented escape
    # hatch for constant-number outputs
    proj = {"$literal": e} if isinstance(e, (int, float)) else e
    rows = {
        r["_id"]: r["out"]
        for r in num_store.aggregate(
            "t", [{"$project": {"_id": 1, "out": proj}}]).collect()
    }
    for doc in _docs():
        want = _ev(e, doc, {})
        got = rows[doc["_id"]]
        assert _num_eq(got, want), (e, doc["_id"], got, want)
