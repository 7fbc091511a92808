"""Property-based differential test of the Mongo aggregation expression
dialect (operators/documents._expr): random expression trees must
evaluate identically under the compiled Catalyst Column and a direct
Python reference interpreter of the Mongo semantics. The unit tests pin
hand-picked shapes; this sweeps the composition space ($cond over
comparisons over arithmetic over string ops, arbitrary nesting)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ROWS = [
    {"a": 3, "b": 7, "s": "Hello"},
    {"a": -2, "b": 0, "s": "x"},
    {"a": 10, "b": 10, "s": "Spark SQL"},
    {"a": 0, "b": -5, "s": ""},
]


# ---- reference interpreter (Mongo semantics over non-null scalars) ----
def _ref_eval(spec, row):
    if isinstance(spec, str) and spec.startswith("$"):
        return row[spec[1:]]
    if not isinstance(spec, dict):
        return spec
    (op, operands), = spec.items()
    if op == "$cond":
        c, t, e = (_ref_eval(x, row) for x in operands)
        return t if c else e
    args = [
        _ref_eval(x, row)
        for x in (operands if isinstance(operands, list) else [operands])
    ]
    if op == "$eq":
        return args[0] == args[1]
    if op == "$ne":
        return args[0] != args[1]
    if op == "$gt":
        return args[0] > args[1]
    if op == "$gte":
        return args[0] >= args[1]
    if op == "$lt":
        return args[0] < args[1]
    if op == "$lte":
        return args[0] <= args[1]
    if op == "$add":
        return sum(args)
    if op == "$subtract":
        return args[0] - args[1]
    if op == "$multiply":
        out = 1
        for x in args:
            out *= x
        return out
    if op == "$toUpper":
        return args[0].upper()
    if op == "$toLower":
        return args[0].lower()
    if op == "$concat":
        return "".join(args)
    if op == "$strLenCP":
        return len(args[0])
    raise AssertionError(op)


# ---- strategies: typed expression trees ----
def _num(depth: int):
    leaf = st.one_of(
        st.sampled_from(["$a", "$b"]), st.integers(-20, 20)
    )
    if depth <= 0:
        return leaf
    sub = _num(depth - 1)
    return st.one_of(
        leaf,
        st.builds(lambda x, y: {"$add": [x, y]}, sub, sub),
        st.builds(lambda x, y: {"$subtract": [x, y]}, sub, sub),
        st.builds(lambda x, y: {"$multiply": [x, y]}, sub, sub),
        st.builds(lambda s: {"$strLenCP": [s]}, _strng(depth - 1)),
        st.builds(
            lambda c, t, e: {"$cond": [c, t, e]},
            _boolean(depth - 1), sub, sub,
        ),
    )


def _strng(depth: int):
    leaf = st.one_of(
        st.just("$s"),
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
            max_size=5,
        ),
    )
    if depth <= 0:
        return leaf
    sub = _strng(depth - 1)
    return st.one_of(
        leaf,
        st.builds(lambda x: {"$toUpper": [x]}, sub),
        st.builds(lambda x: {"$toLower": [x]}, sub),
        st.builds(lambda x, y: {"$concat": [x, y]}, sub, sub),
    )


def _boolean(depth: int):
    n = _num(max(depth - 1, 0))
    ops = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])
    return st.builds(lambda o, x, y: {o: [x, y]}, ops, n, n)


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(
        [(r["a"], r["b"], r["s"]) for r in ROWS],
        "a long, b long, s string",
    ).cache()


@settings(max_examples=25, deadline=None)
@given(spec=_num(3))
def test_expr_dialect_matches_reference(spark, fixture_df, spec):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import _ref

    got = [
        r["out"]
        for r in fixture_df.select(
            "a", _ref(spec).alias("out")
        ).orderBy("a").collect()
    ]
    want = [
        _ref_eval(spec, row) for row in sorted(ROWS, key=lambda r: r["a"])
    ]
    assert got == want, spec
