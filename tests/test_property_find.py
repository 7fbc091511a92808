"""Property-based differential test of the find/$match QUERY language
(operators/documents.filter_condition): random filter documents must
select exactly the rows a direct Python reference interpreter of the
compiled semantics selects — including the three-valued (Kleene) null
logic Spark evaluates and the null-safe negations the module documents
($ne/$nin/$not match null fields; $nor counts a null sub-condition as
no-match; a comparison on a null field is no-match).

The r9 expression-dialect sweep found a real rendering bug; the query
language is the other compiled input surface, swept here the same way.
Runtime-pinned semantics the reference mirrors: size(null) = null,
exists(null) = null, array_contains(null, v) = null, and Spark's % is
Java-truncating (-7 % 3 = -1)."""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    {"id": 1, "a": 3, "v": 1.5, "s": "alpha", "arr": [1, 2, 3]},
    {"id": 2, "a": -7, "v": 0.0, "s": "Beta", "arr": []},
    {"id": 3, "a": None, "v": 2.5, "s": None, "arr": [2, 2]},
    {"id": 4, "a": 10, "v": None, "s": "gamma ray", "arr": None},
    {"id": 5, "a": 0, "v": -3.25, "s": "alpha beta", "arr": [5]},
    {"id": 6, "a": 3, "v": 9.75, "s": "", "arr": [1]},
    {"id": 7, "a": -1, "v": None, "s": "delta", "arr": [3, 4, 5]},
    {"id": 8, "a": None, "v": 0.5, "s": "Alpha", "arr": None},
]

SCHEMA = "id int, a int, v double, s string, arr array<int>"


# --------------------------- reference interpreter (Kleene 3-valued)
def _and3(vals):
    if any(v is False for v in vals):
        return False
    if any(v is None for v in vals):
        return None
    return True


def _or3(vals):
    if any(v is True for v in vals):
        return True
    if any(v is None for v in vals):
        return None
    return False


def _java_mod(a: int, d: int) -> int:
    return int(math.fmod(a, d))


def _leaf(op, fv, val):
    if op == "$eq":
        return None if fv is None else fv == val
    if op == "$ne":  # NOT eqNullSafe — always boolean
        return not (fv == val if fv is not None else val is None)
    if op in ("$gt", "$gte", "$lt", "$lte"):
        if fv is None:
            return None
        return {"$gt": fv > val, "$gte": fv >= val,
                "$lt": fv < val, "$lte": fv <= val}[op]
    if op == "$in":
        return None if fv is None else fv in val
    if op == "$nin":  # coalesce(~isin, True)
        return True if fv is None else fv not in val
    if op == "$regex":
        return None if fv is None else re.search(val, fv) is not None
    if op == "$exists":
        return (fv is not None) if val else (fv is None)
    if op == "$all":
        return None if fv is None else all(x in fv for x in val)
    if op == "$size":
        return None if fv is None else len(fv) == val
    if op == "$mod":
        return None if fv is None else _java_mod(fv, val[0]) == val[1]
    if op == "$elemMatch":
        if fv is None:
            return None
        return any(
            _and3([_leaf(o, x, v) for o, v in val.items()]) is True
            for x in fv
        )
    raise AssertionError(op)


def _field_ref(field, spec, row):
    fv = row[field]
    if isinstance(spec, dict):
        out = []
        for op, val in spec.items():
            if op == "$not":  # ~coalesce(inner, False): boolean
                out.append(_field_ref(field, val, row) is not True)
            else:
                out.append(_leaf(op, fv, val))
        return _and3(out)
    return None if fv is None else fv == spec


def _filter_ref(flt, row):
    out = []
    for key, spec in flt.items():
        if key == "$and":
            out.append(_and3([_filter_ref(s, row) for s in spec]))
        elif key == "$or":
            out.append(_or3([_filter_ref(s, row) for s in spec]))
        elif key == "$nor":  # AND of NOT coalesce(sub, False): boolean
            out.append(
                _and3([_filter_ref(s, row) is not True for s in spec])
            )
        else:
            out.append(_field_ref(key, spec, row))
    return _and3(out) if out else True


# ----------------------------------------------------- filter strategy
_INTS = st.sampled_from([-7, -1, 0, 1, 2, 3, 5, 10])
_FLOATS = st.sampled_from([-3.25, 0.0, 0.5, 1.5, 2.5, 9.75])
_STRS = st.sampled_from(["alpha", "Beta", "gamma ray", "", "delta"])
_PATTERNS = st.sampled_from(
    ["alpha", "^al", "a$", "[abg]", "a.*a", "beta|delta", "^$"]
)
_CMP = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])


def _num_leaf():
    return st.one_of(
        st.tuples(st.just("a"), _CMP, _INTS),
        st.tuples(st.just("v"), _CMP, _FLOATS),
    ).map(lambda t: {t[0]: {t[1]: t[2]}})


def _special_leaf():
    return st.one_of(
        st.tuples(_STRS,).map(lambda t: {"s": t[0]}),
        _PATTERNS.map(lambda p: {"s": {"$regex": p}}),
        st.lists(_INTS, min_size=1, max_size=3, unique=True).map(
            lambda v: {"a": {"$in": v}}
        ),
        st.lists(_INTS, min_size=1, max_size=3, unique=True).map(
            lambda v: {"a": {"$nin": v}}
        ),
        st.sampled_from(["a", "v", "s", "arr"]).flatmap(
            lambda f: st.booleans().map(
                lambda b: {f: {"$exists": b}}
            )
        ),
        st.lists(st.sampled_from([1, 2, 3, 5]), min_size=1,
                 max_size=2, unique=True).map(
            lambda v: {"arr": {"$all": v}}
        ),
        st.sampled_from([0, 1, 2, 3]).map(
            lambda n: {"arr": {"$size": n}}
        ),
        st.tuples(st.sampled_from([2, 3, 5]),
                  st.sampled_from([-1, 0, 1, 2])).map(
            lambda t: {"a": {"$mod": [t[0], t[1]]}}
        ),
        st.tuples(_CMP, st.sampled_from([1, 2, 3, 4])).map(
            lambda t: {"arr": {"$elemMatch": {t[0]: t[1]}}}
        ),
        _CMP.flatmap(
            lambda op: _INTS.map(
                lambda v: {"a": {"$not": {op: v}}}
            )
        ),
    )


def _leaves():
    return st.one_of(_num_leaf(), _special_leaf())


def _filters(depth: int = 2):
    if depth == 0:
        return _leaves()
    sub = _filters(depth - 1)
    return st.one_of(
        _leaves(),
        st.sampled_from(["$and", "$or", "$nor"]).flatmap(
            lambda op: st.lists(sub, min_size=1, max_size=3).map(
                lambda fs: {op: fs}
            )
        ),
        # field-dict with two ops (Kleene AND within one field)
        st.tuples(_CMP, _INTS, _CMP, _INTS).map(
            lambda t: {"a": {t[0]: t[1], t[2]: t[3]}}
        ),
    )


@pytest.fixture(scope="module")
def find_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(
        [tuple(r[k] for k in ("id", "a", "v", "s", "arr")) for r in ROWS],
        SCHEMA,
    ))
    return s


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(flt=_filters())
def test_find_filter_matches_reference(find_store, flt):
    got = sorted(
        r["id"]
        for r in find_store.find("t", flt, {"id": 1}, limit=1000).collect()
    )
    want = sorted(r["id"] for r in ROWS if _filter_ref(flt, r) is True)
    assert got == want, flt
