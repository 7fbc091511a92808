"""Property-based differential sweep of the four $lookup forms
(VERDICT r10 task 5): random (form × correlation condition × trailing
$sort/$limit/$project/$group) combos over a seeded two-collection
corpus vs a pure-Python join reference.

Contracts pinned:
- EMPTY-ARRAY: a local row with no matches gets [], never null — on
  every form (the payload struct is built pre-join, so a left-join
  miss nulls it and collect_list drops it).
- NULL KEYS: the plain and concise forms join with null-SAFE equality
  (Mongo matches a null/missing localField against null-foreignField
  rows); a null key is a real join key, not a dropped row.
- ORDER: a correlated $sort/$limit sub-pipeline yields the sorted,
  limited array EXACTLY (unique sort keys in the corpus make the
  order total); the uncorrelated pipeline form preserves the
  sub-pipeline's $sort order for every local row; an UNSORTED match
  array has no order contract and compares as a multiset.
- $group TAIL: {_id: None} yields ONE aggregate doc per local row
  (empty array on zero matches — $group over zero docs emits no doc);
  keyed {_id: "$k"} yields per-key docs sorted by _id with Spark's
  null-skipping accumulator semantics, a null foreign key forming its
  own real group.
- Include-only $project narrows the payload struct to the projected
  fields in spec order.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

L_ROWS = [
    # (_id, k, v, tag)
    (1, 1, 10, "a"),
    (2, 2, 5, "b"),
    (3, None, 7, "c"),
    (4, 9, 3, "d"),   # k with no foreign match
    (5, 1, 2, "e"),   # duplicate local key
    (6, 4, 0, "f"),
]
L_SCHEMA = "_id int, k long, v long, tag string"
F_ROWS = [
    # (fid, k, w, name) — fid and w UNIQUE so sorted orders are total
    (10, 1, 4, "p"),
    (11, 1, 8, "q"),
    (12, 2, 1, "r"),
    (13, None, 6, "s"),  # null foreign key
    (14, 3, 9, "t"),     # foreign key with no local row
    (15, 2, 11, "u"),
    (16, 4, 2, "v"),
    (17, 1, 13, "w"),
]
F_SCHEMA = "fid int, k long, w long, name string"
F_COLS = ["fid", "k", "w", "name"]


def _ldocs():
    return [dict(zip(["_id", "k", "v", "tag"], r)) for r in L_ROWS]


def _fdocs():
    return [dict(zip(F_COLS, r)) for r in F_ROWS]


@pytest.fixture(scope="module")
def lk_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("l", spark.createDataFrame(L_ROWS, L_SCHEMA))
    s.register("f", spark.createDataFrame(F_ROWS, F_SCHEMA))
    return s


# --------------------------------------------------------- descriptor
_EXTRA_CONDS = st.lists(
    st.tuples(
        st.sampled_from(["$gt", "$gte", "$lt", "$eq"]),
        st.sampled_from(["w", "fid"]),
        st.sampled_from(["$$lv", "$$lk", 4, 8]),
    ),
    min_size=0, max_size=2,
)

_TRAILING = st.one_of(
    st.none(),
    st.tuples(
        st.sampled_from([1, -1]),
        st.sampled_from([1, 2, 3]),
        st.sampled_from([None, ["fid", "w"], ["name"], ["w", "k"]]),
    ).map(lambda t: ("sortlimit", *t)),
    st.sampled_from([("group", False), ("group", True)]),
)

_DESCRIPTOR = st.one_of(
    st.just(("plain",)),
    st.tuples(st.just("uncorrelated"),
              st.sampled_from([1, 2, 4]),
              st.sampled_from(["sortlimit", "group"])),
    st.tuples(st.sampled_from(["let", "concise"]),
              _EXTRA_CONDS, _TRAILING),
)


def _build_spec(desc):
    form = desc[0]
    if form == "plain":
        return {"from": "f", "localField": "k", "foreignField": "k",
                "as": "m"}
    if form == "uncorrelated":
        _, ge, tail = desc
        pipe = [{"$match": {"k": {"$gte": ge}}}]
        if tail == "sortlimit":
            pipe += [{"$sort": {"w": -1}}, {"$limit": 3}]
        else:
            pipe += [{"$group": {"_id": None, "t": {"$sum": "$w"},
                                 "n": {"$sum": 1}}}]
        return {"from": "f", "pipeline": pipe, "as": "m"}
    _, conds, trailing = desc
    expr_conds = [{op: [f"${ff}", rhs]} for op, ff, rhs in conds]
    pipe: list = []
    if form == "let":
        # correlation REQUIRES a $match $expr — the equality conjunct
        expr_conds = [{"$eq": ["$k", "$$lk"]}] + expr_conds
    if expr_conds:
        cond = expr_conds[0] if len(expr_conds) == 1 else {
            "$and": expr_conds}
        pipe.append({"$match": {"$expr": cond}})
    if trailing is not None and trailing[0] == "group":
        keyed = trailing[1]
        pipe.append({"$group": {
            "_id": "$k" if keyed else None,
            "t": {"$sum": "$w"}, "n": {"$sum": 1},
            "mx": {"$max": "$w"},
        }})
    elif trailing is not None:
        _, d, n, proj = trailing
        pipe.append({"$sort": {"w": d}})
        pipe.append({"$limit": n})
        if proj:
            pipe.append({"$project": {c: 1 for c in proj}})
    spec = {"from": "f", "pipeline": pipe, "as": "m"}
    if form == "let":
        spec["let"] = {"lk": "$k", "lv": "$v"}
    else:
        spec["localField"] = "k"
        spec["foreignField"] = "k"
        if conds:  # extra conds still need let vars when referenced
            spec["let"] = {"lk": "$k", "lv": "$v"}
    return spec


def _nullsafe_eq(a, b):
    return (a is None and b is None) or (
        a is not None and b is not None and a == b
    )


def _cond_holds(op, fval, rhs):
    if op == "$eq":
        return _nullsafe_eq(fval, rhs)
    if fval is None or rhs is None:
        return False  # null comparison filters the row ($match 3VL)
    return {"$gt": fval > rhs, "$gte": fval >= rhs,
            "$lt": fval < rhs}[op]


def _ref_rows(desc):
    """Pure-Python evaluation → {local _id: array value}."""
    form = desc[0]
    out = {}
    if form == "uncorrelated":
        _, ge, tail = desc
        matches = [f for f in _fdocs()
                   if f["k"] is not None and f["k"] >= ge]
        if tail == "sortlimit":
            arr = sorted(matches, key=lambda f: -f["w"])[:3]
        else:
            ws = [f["w"] for f in matches]
            arr = [{"_id": None, "t": sum(ws) if ws else None,
                    "n": len(matches)}] if matches else []
        return {ld["_id"]: arr for ld in _ldocs()}
    for ld in _ldocs():
        if form == "plain":
            matches = [f for f in _fdocs()
                       if _nullsafe_eq(f["k"], ld["k"])]
            out[ld["_id"]] = matches
            continue
        _, conds, trailing = desc
        binding = {"$$lk": ld["k"], "$$lv": ld["v"]}
        matches = []
        for f in _fdocs():
            ok = True
            if form == "concise" or form == "let":
                ok = _nullsafe_eq(f["k"], ld["k"])
            for op, ff, rhs in conds:
                rhs_v = binding.get(rhs, rhs)
                ok = ok and _cond_holds(op, f[ff], rhs_v)
            if ok:
                matches.append(f)
        if trailing is not None and trailing[0] == "group":
            keyed = trailing[1]
            if not matches:
                out[ld["_id"]] = []
            elif not keyed:
                ws = [f["w"] for f in matches]
                out[ld["_id"]] = [{"_id": None, "t": sum(ws),
                                   "n": len(matches), "mx": max(ws)}]
            else:
                groups: dict = {}
                for f in matches:
                    groups.setdefault(f["k"], []).append(f)
                docs = [
                    {"_id": k, "t": sum(f["w"] for f in fs),
                     "n": len(fs), "mx": max(f["w"] for f in fs)}
                    for k, fs in groups.items()
                ]
                # dialect convention: sorted by _id, nulls FIRST
                # (Spark ascending null ordering)
                docs.sort(key=lambda d: (d["_id"] is not None,
                                         d["_id"] or 0))
                out[ld["_id"]] = docs
        elif trailing is not None:
            _, d, n, proj = trailing
            arr = sorted(matches, key=lambda f: d * f["w"])[:n]
            if proj:
                arr = [{c: f[c] for c in proj} for f in arr]
            out[ld["_id"]] = arr
        else:
            out[ld["_id"]] = matches
    return out


def _canon(arr, ordered):
    xs = [dict(sorted(d.items())) for d in arr]
    if not ordered:
        xs.sort(key=lambda d: str(d))
    return xs


@settings(
    max_examples=35,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(desc=_DESCRIPTOR)
def test_lookup_matches_reference(lk_store, desc):
    spec = _build_spec(desc)
    got = {
        r["_id"]: [m.asDict(recursive=True) for m in r["m"]]
        for r in lk_store.aggregate("l", [{"$lookup": spec}]).collect()
    }
    want = _ref_rows(desc)
    # order is contractual only when the sub-pipeline sorted or
    # grouped ($group tails sort keyed docs by _id)
    form = desc[0]
    ordered = (
        (form == "uncorrelated")
        or (form in ("let", "concise") and desc[2] is not None)
    )
    assert set(got) == set(want)
    for _id in want:
        g, w = _canon(got[_id], ordered), _canon(want[_id], ordered)
        assert g == w, (spec, _id, g, w)
