"""Property-based differential sweep of $graphLookup (r11): random
(connectFrom scalar/array × connectTo scalar/array × startWith
scalar/array × maxDepth × depthField × restrictSearchWithMatch)
specs over a seeded CYCLIC directed graph vs a pure-Python BFS.

Contracts pinned: a foreign doc is emitted ONCE at its FIRST
discovery depth (depth 0 = the first lookup) even when array
connect-to fields make it reachable through several nodes; the next
frontier is the matches' connectFrom values anti-joined against the
visited node set (termination on cycles without maxDepth); maxDepth
bounds rounds inclusively; restrictSearchWithMatch filters the
foreign side BEFORE the walk (excluded docs neither match nor relay);
unmatched local rows keep the empty-array contract; the result array
is order-insensitive (compared as a set) with depthField riding each
doc when requested.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

N = 14
F_DOCS = [
    {
        "nid": i,
        "nxt": (i * 3 + 1) % N,
        "links": sorted({(i + 1) % N, ((i * 5 + 2) % N) + 100}),
        "aliases": [i, i + 100],
        "grp": "a" if i % 3 else "b",
        "val": i * 10,
    }
    for i in range(N)
]
L_ROWS = [
    (1, 0, [2, 103]),
    (2, 5, []),
    (3, 999, [7]),   # scalar start matches nothing
]


@pytest.fixture(scope="module")
def gl_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("l", spark.createDataFrame(
        L_ROWS, "_id int, s long, sarr array<long>"))
    s.register("g", spark.createDataFrame(
        [(d["nid"], d["nxt"], d["links"], d["aliases"], d["grp"],
          d["val"]) for d in F_DOCS],
        "nid long, nxt long, links array<long>, aliases array<long>, "
        "grp string, val long"))
    return s


_SPEC = st.tuples(
    st.sampled_from(["$s", "$sarr"]),
    st.sampled_from(["nxt", "links"]),
    st.sampled_from(["nid", "aliases"]),
    st.sampled_from([0, 1, 2, 3, None]),
    st.booleans(),                       # depthField?
    st.sampled_from([None, {"grp": "a"}]),
)


def _ref_bfs(start_vals, cfrom, cto, max_depth, restrict):
    docs = [d for d in F_DOCS
            if restrict is None or d["grp"] == restrict["grp"]]

    def to_vals(d):
        v = d[cto]
        return v if isinstance(v, list) else [v]

    def from_vals(d):
        v = d[cfrom]
        return v if isinstance(v, list) else [v]

    emitted: dict[int, int] = {}
    frontier = set(start_vals)
    visited = set(frontier)
    depth = 0
    while frontier and (max_depth is None or depth <= max_depth):
        matched = [d for d in docs if set(to_vals(d)) & frontier]
        for d in matched:
            emitted.setdefault(d["nid"], depth)
        nxt = {v for d in matched for v in from_vals(d)} - visited
        visited |= nxt
        frontier = nxt
        depth += 1
    return emitted


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_SPEC)
def test_graphlookup_matches_reference(gl_store, spec):
    start, cfrom, cto, max_depth, want_depth, restrict = spec
    gspec: dict = {
        "from": "g", "startWith": start, "connectFromField": cfrom,
        "connectToField": cto, "as": "out",
    }
    if max_depth is not None:
        gspec["maxDepth"] = max_depth
    if want_depth:
        gspec["depthField"] = "d"
    if restrict is not None:
        gspec["restrictSearchWithMatch"] = restrict
    rows = {
        r["_id"]: [m.asDict() for m in r["out"]]
        for r in gl_store.aggregate(
            "l", [{"$graphLookup": gspec}]).collect()
    }
    for _id, s, sarr in L_ROWS:
        seeds = [s] if start == "$s" else list(sarr)
        want = _ref_bfs(seeds, cfrom, cto, max_depth, restrict)
        got = rows[_id]
        got_ids = {m["nid"] for m in got}
        assert got_ids == set(want), (gspec, _id, got_ids, set(want))
        assert len(got) == len(got_ids), (gspec, _id, "duplicate docs")
        if want_depth:
            for m in got:
                assert m["d"] == want[m["nid"]], (gspec, _id, m)
        # payload carries the full foreign doc
        by_id = {d["nid"]: d for d in F_DOCS}
        for m in got:
            src = by_id[m["nid"]]
            assert m["val"] == src["val"] and m["grp"] == src["grp"]
            assert list(m["links"]) == src["links"]
