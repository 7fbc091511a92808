"""Property-based differential sweep of the SET-expression dialect
(r12): random $setUnion/$setIntersection/$setDifference/$setEquals/
$setIsSubset/$anyElementTrue/$allElementsTrue draws over arrays with
duplicates, zeros, and NULL ELEMENTS vs pure-Python set references.

Contracts pinned: set outputs are DETERMINISTICALLY SORTED, nulls
last (the engine's documented strengthening of Mongo's unspecified
order); null elements are set members that compare equal (Spark's
set-function null equality — Mongo agrees); Mongo TRUTHINESS for the
element-predicate pair — null and 0 elements are FALSY, so
$anyElementTrue([null]) is false and $allElementsTrue([0]) is false,
never a three-valued null; a NULL ARRAY propagates null (the
dialect's uniform null contract — Mongo errors there, documented
divergence)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

ROWS = [
    # (_id, la, lb)
    (1, [1, 2, 2, 3], [2, 3, 4]),
    (2, [], [1]),
    (3, None, [1, 2]),
    (4, [5, 5], []),
    (5, [1, None, 2], [None, 3]),
    (6, [0, 1], [1, 0]),
    (7, [0, 0], [None]),
]
SCHEMA = "_id int, la array<int>, lb array<int>"


@pytest.fixture(scope="module")
def set_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


def _key(x):
    return (x is None, x if x is not None else 0)


def _set(xs):
    seen, out = set(), []
    for x in xs:
        k = ("\0null" if x is None else x)
        if k not in seen:
            seen.add(k)
            out.append(x)
    return out


def _truthy(x):
    return x is not None and x != 0


_CASE = st.sampled_from([
    "union", "intersection", "difference", "equals", "subset",
    "any", "all",
])


def _build(kind):
    if kind == "union":
        return ({"$setUnion": ["$la", "$lb"]},
                lambda a, b: sorted(_set(a + b), key=_key))
    if kind == "intersection":
        return ({"$setIntersection": ["$la", "$lb"]},
                lambda a, b: sorted(
                    [x for x in _set(a) if any(
                        (x is None and y is None) or x == y for y in b)],
                    key=_key))
    if kind == "difference":
        return ({"$setDifference": ["$la", "$lb"]},
                lambda a, b: sorted(
                    [x for x in _set(a) if not any(
                        (x is None and y is None) or x == y for y in b)],
                    key=_key))
    if kind == "equals":
        return ({"$setEquals": ["$la", "$lb"]},
                lambda a, b: {repr(x) for x in a} == {repr(x) for x in b})
    if kind == "subset":
        return ({"$setIsSubset": ["$la", "$lb"]},
                lambda a, b: {repr(x) for x in a} <= {repr(x) for x in b})
    if kind == "any":
        return ({"$anyElementTrue": [["$la"]]},
                None)  # handled below — operates on la alone
    if kind == "all":
        return ({"$allElementsTrue": [["$la"]]}, None)
    raise AssertionError(kind)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(kind=_CASE)
@example(kind="any")    # [null] must be false (Mongo falsy null)
@example(kind="all")    # [0] must be false, never 3VL null
@example(kind="union")  # dedup + deterministic sort, nulls last
def test_set_ops_match_reference(set_store, kind):
    if kind in ("any", "all"):
        spec = {"$anyElementTrue" if kind == "any"
                else "$allElementsTrue": "$la"}
        rows = {
            r["_id"]: r["out"]
            for r in set_store.aggregate(
                "t", [{"$project": {"_id": 1, "out": spec}}]).collect()
        }
        for _id, la, _lb in ROWS:
            got = rows[_id]
            if la is None:
                assert got is None, (kind, _id, got)
                continue
            want = (any(_truthy(x) for x in la) if kind == "any"
                    else all(_truthy(x) for x in la))
            assert got == want, (kind, _id, got, want)
        return
    spec, ref = _build(kind)
    rows = {
        r["_id"]: r["out"]
        for r in set_store.aggregate(
            "t", [{"$project": {"_id": 1, "out": spec}}]).collect()
    }
    for _id, la, lb in ROWS:
        got = rows[_id]
        if la is None or lb is None:
            assert got is None, (kind, _id, got)
            continue
        want = ref(la, lb)
        if hasattr(got, "__iter__") and not isinstance(got, (str, bool)):
            got = list(got)
        assert got == want, (kind, _id, got, want)
