"""Connected-components dup-cluster resolution (operators/dedup.py).

The oracle test (test_relational_oracle) covers q60 end-to-end against
DuckDB's recursive CTE; these tests pin the graph algorithm itself on
adversarial shapes the corpus data doesn't produce.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators.dedup import (
    connected_components,
    dup_clusters,
)

# connected_components picks its tier by edge count: driver union-find
# under the bound, distributed label propagation above. 0 forces the
# distributed tier; the default exercises the driver tier.
TIERS = pytest.mark.parametrize(
    "max_edges", [2_000_000, 0], ids=["driver", "distributed"]
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@TIERS
def test_chain_propagates_multi_hop(spark, max_edges):
    """A 13-node path needs the min label to travel 12 hops — exercises
    the iteration loop well past one round."""
    pairs = [(i, i + 1) for i in range(12)]
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, pairs), driver_max_edges=max_edges
        ).collect()
    }
    assert got == {i: 0 for i in range(13)}


@TIERS
def test_random_graph_matches_union_find(spark, max_edges):
    rng = random.Random(60)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _union_find(pairs)
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, pairs), driver_max_edges=max_edges
        ).collect()
    }
    assert got == want


def test_tiers_agree_label_for_label(spark):
    """The adaptive cutover must be invisible: both tiers produce the
    identical (id, component) labeling on the same graph."""
    rng = random.Random(61)
    pairs = [(rng.randrange(300), rng.randrange(300)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = _pairs_df(spark, pairs)
    fast = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert fast == dist


def test_empty_pairs_all_singletons(spark):
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    out = dup_clusters(docs, _pairs_df(spark, [])).collect()
    assert [r["component"] for r in out] == [0, 1, 2, 3, 4]
    assert all(r["cluster_size"] == 1 and r["is_canonical"] == 1 for r in out)


def test_dup_clusters_canonical_is_min_id(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    out = dup_clusters(docs, _pairs_df(spark, [(1, 4), (4, 5), (2, 3)]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[5]["component"] == 1 and rows[5]["cluster_size"] == 3
    assert [d for d, r in rows.items() if r["is_canonical"] == 1] == [0, 1, 2]
    # delete list = non-canonical rows only
    assert {d for d, r in rows.items() if r["is_canonical"] == 0} == {3, 4, 5}
