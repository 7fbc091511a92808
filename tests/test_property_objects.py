"""Property-based sweep of the OBJECT/map expression dialect (r12):
random key/value entry lists (duplicate keys included) through
$arrayToObject / $objectToArray / $mergeObjects / $getField, checked
against dict references and ALGEBRAIC LAWS rather than entry-order
assumptions (map entry order is an engine detail; Mongo documents
last-value-wins for duplicates and later-wins for merge).

Contracts pinned: $arrayToObject duplicate keys are LAST-value-wins
(Spark's default map_from_entries would throw — the engine filters
superseded entries); the objectToArray∘arrayToObject round-trip
preserves the deduplicated entry SET; $mergeObjects is dict-union
with later-wins; $getField reads a map key (absent → null); a null
operand propagates null through every op."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

_KEYS = ["a", "b", "c", "dd"]
_ENTRIES = st.lists(
    st.tuples(st.sampled_from(_KEYS), st.integers(-5, 99)),
    min_size=0, max_size=6,
)


@pytest.fixture(scope="module")
def obj_spark(spark):
    return spark


def _frame(spark, kvs_a, kvs_b):
    return spark.createDataFrame(
        [(1, [{"k": k, "v": v} for k, v in kvs_a],
          [{"k": k, "v": v} for k, v in kvs_b])],
        "_id int, ka array<struct<k string, v int>>, "
        "kb array<struct<k string, v int>>",
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(kvs_a=_ENTRIES, kvs_b=_ENTRIES)
@example(kvs_a=[("a", 1), ("b", 2), ("a", 3)], kvs_b=[])  # dup: last wins
@example(kvs_a=[("a", 1)], kvs_b=[("a", 9), ("c", 7)])    # merge later-wins
def test_object_ops_match_reference(obj_spark, kvs_a, kvs_b):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(obj_spark)
    s.register("t", _frame(obj_spark, kvs_a, kvs_b))
    row = s.aggregate("t", [{"$project": {
        "_id": 1,
        "obj_a": {"$arrayToObject": "$ka"},
        "rt": {"$objectToArray": {"$arrayToObject": "$ka"}},
        "merged": {"$mergeObjects": [
            {"$arrayToObject": "$ka"}, {"$arrayToObject": "$kb"}]},
        "got_a": {"$getField": {
            "field": "a", "input": {"$arrayToObject": "$ka"}}},
    }}]).collect()[0]
    want_a = dict(kvs_a)   # Python dict IS last-value-wins
    want_b = dict(kvs_b)
    assert dict(row["obj_a"] or {}) == want_a
    # round-trip preserves the deduplicated entry SET
    assert {(e["k"], e["v"]) for e in row["rt"]} == set(want_a.items())
    assert dict(row["merged"] or {}) == {**want_a, **want_b}
    assert row["got_a"] == want_a.get("a")


def test_object_null_propagation(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(
        [(1, None)], "_id int, ka array<struct<k string, v int>>"))
    row = s.aggregate("t", [{"$project": {
        "obj": {"$arrayToObject": "$ka"},
        "arr": {"$objectToArray": {"$arrayToObject": "$ka"}},
        "g": {"$getField": {"field": "a",
                            "input": {"$arrayToObject": "$ka"}}},
    }}]).collect()[0]
    assert row["obj"] is None and row["arr"] is None and row["g"] is None
