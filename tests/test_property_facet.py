"""Property-based differential sweep of $facet and $bucket (r11 —
the single-scan GROUPING SETS translation and the CASE-chain
histogram): random facet dictionaries (1-3 facets × optional $match
prelude × group key × per-facet accumulator subsets) and random
bucket specs (boundaries × groupBy × default) vs pure-Python
references.

Contracts pinned:
- $facet: each facet aggregates ONLY its prelude's matching rows
  (groups whose rows all fail the prelude are dropped — the masked
  single-scan translation must equal Mongo's sub-pipeline-per-facet
  semantics); facets may declare DIFFERENT accumulator sets and the
  flattened long form carries the union of alias columns with NULL
  where a facet doesn't define one; null-skipping accumulator
  semantics ride through the masks.
- $bucket: [b_i, b_{i+1}) half-open buckets labelled by the LOWER
  boundary's string form; out-of-range AND null groupBy values land
  in 'default'; boundaries must be strictly increasing (typed error).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    # (_id, g, h, v, w)
    (1, "a", "x", 1.0, 5),
    (2, "a", "y", None, 3),
    (3, "b", "x", 2.0, 9),
    (4, "b", "y", 4.0, 1),
    (5, "a", "x", -2.5, 0),
    (6, "c", "y", None, 7),
    (7, "b", "x", 0.5, 12),
]
SCHEMA = "_id int, g string, h string, v double, w long"
_ACCS = {
    "n": {"$sum": 1},
    "sv": {"$sum": "$v"},
    "av": {"$avg": "$v"},
    "mn": {"$min": "$w"},
    "mx": {"$max": "$w"},
}
_PRELUDES = [None, {"w": {"$gte": 3}}, {"g": "a"}, {"v": {"$ne": None}}]


def _docs():
    return [dict(zip(["_id", "g", "h", "v", "w"], r)) for r in ROWS]


def _matches(doc, prelude):
    if prelude is None:
        return True
    if "w" in prelude:
        return doc["w"] >= prelude["w"]["$gte"]
    if "g" in prelude:
        return doc["g"] == prelude["g"]
    return doc["v"] is not None  # {"v": {"$ne": None}}


def _acc_val(alias, rows):
    vs = [d["v"] for d in rows if d["v"] is not None]
    ws = [d["w"] for d in rows]
    if alias == "n":
        return len(rows)
    if alias == "sv":
        return sum(vs) if vs else None
    if alias == "av":
        return sum(vs) / len(vs) if vs else None
    if alias == "mn":
        return min(ws)
    return max(ws)


@pytest.fixture(scope="module")
def fb_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


# group keys must be DISTINCT fields across facets — the single-scan
# GROUPING SETS translation's documented loud refusal (pinned below)
_FACET = st.lists(
    st.tuples(
        st.sampled_from(range(len(_PRELUDES))),
        st.lists(st.sampled_from(sorted(_ACCS)), min_size=1,
                 max_size=3, unique=True),
    ),
    min_size=1, max_size=2,
).map(lambda fs: [(pi, key, aliases) for (pi, aliases), key in
                  zip(fs, ["$g", "$h"])])


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(facets=_FACET)
def test_facet_matches_reference(fb_store, facets):
    spec = {}
    for i, (pi, key, aliases) in enumerate(facets):
        sub = []
        if _PRELUDES[pi] is not None:
            sub.append({"$match": _PRELUDES[pi]})
        sub.append({"$group": {"_id": key,
                               **{a: _ACCS[a] for a in aliases}}})
        spec[f"f{i}"] = sub
    got = {
        (r["facet"], r["_id"]): r.asDict()
        for r in fb_store.aggregate("t", [{"$facet": spec}]).collect()
    }
    want_keys = set()
    for i, (pi, key, aliases) in enumerate(facets):
        matched = [d for d in _docs() if _matches(d, _PRELUDES[pi])]
        groups: dict = {}
        for d in matched:
            groups.setdefault(d[key[1:]], []).append(d)
        for gk, ds in groups.items():
            rk = (f"f{i}", gk)
            want_keys.add(rk)
            assert rk in got, (spec, rk, sorted(got))
            row = got[rk]
            for a in aliases:
                w = _acc_val(a, ds)
                gv = row[a]
                if w is None or gv is None:
                    assert w is None and gv is None, (spec, rk, a, gv, w)
                else:
                    assert math.isclose(float(gv), float(w),
                                        rel_tol=1e-9), (spec, rk, a)
            for a in set(row) - {"facet", "_id", *aliases}:
                assert row[a] is None, (spec, rk, a, row[a])
    assert set(got) == want_keys, (spec, set(got) ^ want_keys)


_BUCKET = st.tuples(
    st.lists(st.sampled_from([0, 2, 4, 7, 10]), min_size=2,
             max_size=4, unique=True).map(sorted),
    st.sampled_from(["$w", "$v"]),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_BUCKET)
def test_bucket_matches_reference(fb_store, spec):
    bounds, group_by = spec
    got = {
        r["_id"]: (r["n"], r["tv"])
        for r in fb_store.aggregate("t", [{"$bucket": {
            "groupBy": group_by, "boundaries": bounds,
            "default": "other",
            "output": {"n": {"$sum": 1}, "tv": {"$sum": "$v"}},
        }}]).collect()
    }
    buckets: dict = {}
    for d in _docs():
        x = d[group_by[1:]]
        label = "other"
        if x is not None:
            for lo, hi in zip(bounds, bounds[1:]):
                if lo <= x < hi:
                    label = str(lo)
                    break
        buckets.setdefault(label, []).append(d)
    want = {}
    for label, ds in buckets.items():
        vs = [d["v"] for d in ds if d["v"] is not None]
        want[label] = (len(ds), sum(vs) if vs else None)
    assert set(got) == set(want), (spec, set(got) ^ set(want))
    for label, (n, tv) in want.items():
        gn, gtv = got[label]
        assert gn == n, (spec, label)
        if tv is None or gtv is None:
            assert tv is None and gtv is None, (spec, label)
        else:
            assert math.isclose(gtv, tv, rel_tol=1e-9), (spec, label)


def test_facet_duplicate_key_is_typed_error(fb_store):
    """Two facets grouping the SAME field would merge their grouping
    sets — the single-scan translation refuses loudly instead of
    silently conflating them."""
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentQueryError,
    )

    with pytest.raises(DocumentQueryError, match="distinct fields"):
        fb_store.aggregate("t", [{"$facet": {
            "f0": [{"$group": {"_id": "$g", "n": {"$sum": 1}}}],
            "f1": [{"$group": {"_id": "$g", "m": {"$sum": 1}}}],
        }}])


def test_bucket_boundary_guards(fb_store):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentQueryError,
    )

    with pytest.raises(DocumentQueryError, match="boundaries"):
        fb_store.aggregate("t", [{"$bucket": {
            "groupBy": "$w", "boundaries": [4, 4, 8],
            "default": "other", "output": {"n": {"$sum": 1}}}}])
    with pytest.raises(DocumentQueryError, match="default"):
        fb_store.aggregate("t", [{"$bucket": {
            "groupBy": "$w", "boundaries": [0, 100],
            "output": {"n": {"$sum": 1}}}}])
