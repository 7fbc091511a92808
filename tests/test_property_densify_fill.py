"""Property-based differential sweep of $densify and $fill (r11 —
continuing the sweep program over the last intricate compiled
surfaces): random (bounds-form × step × partitioning) densify specs
and (method × partition × sort-direction) fill specs over a fixed
gappy corpus vs pure-Python references.

Contracts pinned:
- $densify: literal bounds are HALF-OPEN [lo, hi) while
  partition/full bounds are inclusive min..max; the spine anchors at
  the partition (or global/literal) lo and steps on-grid; existing
  documents — on- OR off-grid — pass through untouched; generated
  docs carry partition keys + the axis field and nulls elsewhere;
  rows with a null axis value pass through and never seed spine
  points; 'full' gives EVERY partition the global span.
- $fill: value → coalesce; locf follows the sortBy direction
  (descending locf pulls from the sort-order predecessor, i.e. the
  larger key); linear interpolates between the bracketing non-null
  neighbours on the ascending numeric key with leading/trailing nulls
  kept null (and integer outputs promoted to double — the documented
  dtype divergence).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = [
    # (_id, g, x, v)
    (1, "a", 0, 1.0),
    (2, "a", 2, None),
    (3, "a", 3, 4.0),
    (4, "a", 7, None),
    (5, "a", 9, 2.0),
    (6, "a", None, 8.0),   # null axis: passes through, seeds nothing
    (7, "b", 1, None),
    (8, "b", 4, 5.0),
    (9, "b", 5, None),
]
SCHEMA = "_id int, g string, x long, v double"


@pytest.fixture(scope="module")
def df_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


# ------------------------------------------------------------ densify
_DENSIFY = st.tuples(
    st.sampled_from([1, 2, 3]),
    st.sampled_from([
        ("partition", True),          # needs partitionByFields
        ("full", True), ("full", False),
        ([0, 6], True), ([0, 6], False),
        ([2, 9], True), ([1, 8], False),
    ]),
)


def _ref_densify(step, bounds, parts):
    docs = [dict(zip(["_id", "g", "x", "v"], r)) for r in ROWS]
    groups: dict = {}
    for d in docs:
        key = d["g"] if parts else None
        groups.setdefault(key, []).append(d)
    xs_all = [d["x"] for d in docs if d["x"] is not None]
    out = list(docs)  # originals pass through untouched
    for key, ds in groups.items():
        xs = {d["x"] for d in ds if d["x"] is not None}
        if isinstance(bounds, list):
            lo, hi = bounds
            pts = range(lo, hi, step)           # half-open literal
        elif bounds == "full":
            lo, hi = min(xs_all), max(xs_all)
            pts = range(lo, hi + 1, step)       # inclusive
        else:  # partition
            if not xs:
                continue
            lo, hi = min(xs), max(xs)
            pts = range(lo, hi + 1, step)
        for p in pts:
            if p not in xs:
                out.append({"_id": None, "g": key if parts else None,
                            "x": p, "v": None})
    return sorted(
        (tuple((d[c] if d[c] is not None else "~") for c in
               ("g", "x", "_id", "v")) for d in out),
        key=str,
    )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_DENSIFY)
def test_densify_matches_reference(df_store, spec):
    step, (bounds, parted) = spec
    dspec = {"field": "x", "range": {"step": step, "bounds": bounds}}
    if parted:
        dspec["partitionByFields"] = ["g"]
    got = df_store.aggregate("t", [{"$densify": dspec},
                                   {"$limit": 10_000}]).collect()
    canon = sorted(
        (tuple((r[c] if r[c] is not None else "~") for c in
               ("g", "x", "_id", "v")) for r in got),
        key=str,
    )
    assert canon == _ref_densify(step, bounds, parted), dspec


def test_densify_partition_bounds_need_partitions(df_store):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentQueryError,
    )

    with pytest.raises(DocumentQueryError, match="partitionByFields"):
        df_store.aggregate("t", [{"$densify": {
            "field": "x", "range": {"step": 1, "bounds": "partition"}}}])


# --------------------------------------------------------------- fill
_FILL = st.tuples(
    st.sampled_from(["locf_asc", "locf_desc", "linear", "value"]),
    st.booleans(),  # partitioned by g?
)


def _ref_fill(method, parted):
    docs = [dict(zip(["_id", "g", "x", "v"], r)) for r in ROWS
            if r[2] is not None]  # fixture filters null-x rows for sort
    groups: dict = {}
    for d in docs:
        groups.setdefault(d["g"] if parted else None, []).append(d)
    out = {}
    for _key, ds in groups.items():
        if method == "value":
            for d in ds:
                out[d["_id"]] = d["v"] if d["v"] is not None else -1.5
            continue
        ds = sorted(ds, key=lambda d: d["x"],
                    reverse=(method == "locf_desc"))
        if method.startswith("locf"):
            last = None
            for d in ds:
                if d["v"] is not None:
                    last = d["v"]
                out[d["_id"]] = d["v"] if d["v"] is not None else last
            continue
        # linear over ascending x
        for i, d in enumerate(ds):
            if d["v"] is not None:
                out[d["_id"]] = d["v"]
                continue
            prev = next((ds[j] for j in range(i - 1, -1, -1)
                         if ds[j]["v"] is not None), None)
            nxt = next((ds[j] for j in range(i + 1, len(ds))
                        if ds[j]["v"] is not None), None)
            if prev is None or nxt is None:
                out[d["_id"]] = None  # leading/trailing stay null
            else:
                frac = (d["x"] - prev["x"]) / (nxt["x"] - prev["x"])
                out[d["_id"]] = prev["v"] + (nxt["v"] - prev["v"]) * frac
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_FILL)
def test_fill_matches_reference(df_store, spec):
    method, parted = spec
    if method == "value":
        output = {"v": {"value": -1.5}}
        fspec: dict = {"output": output}
    else:
        output = {"v": {"method":
                        "linear" if method == "linear" else "locf"}}
        fspec = {"sortBy": {"x": -1 if method == "locf_desc" else 1},
                 "output": output}
    if parted:
        fspec["partitionBy"] = "$g"
    got = {
        r["_id"]: r["v"]
        for r in df_store.aggregate(
            "t", [{"$match": {"x": {"$ne": None}}},
                  {"$fill": fspec}]).collect()
    }
    want = _ref_fill(method, parted)
    assert set(got) == set(want)
    for _id, w in want.items():
        g = got[_id]
        if w is None or g is None:
            assert g is None and w is None, (spec, _id, g, w)
        else:
            assert abs(g - w) < 1e-9, (spec, _id, g, w)
