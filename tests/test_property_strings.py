"""Property-based differential sweep of the STRING dialect's
code-point contracts (r12): $substrCP / $indexOfCP / $strLenCP /
$split / $replaceOne / $replaceAll / $concat / $toUpper / $toLower /
$trim-chars over a corpus that includes ASTRAL-plane text (U+1F600 —
a UTF-16 implementation counts it as 2 positions and fails here),
accents, sharp-s case folding, empty strings, and nulls, vs a pure
Python evaluator (Python strings ARE code-point sequences — the
independent reference for Mongo's CP contract).

Contracts pinned: 0-based $substrCP with out-of-range start → '';
$indexOfCP -1-when-absent with the engine's documented end-bound
(the whole match lies within [start, end) — search the end-length
prefix); $split keeps interior empties and returns the whole string
when the delimiter is absent; $replaceOne splices the FIRST
occurrence only, $replaceAll every one, both literal (non-regex);
null propagates through every operator.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

ROWS = [
    (1, "hello world"),
    (2, "ABC-def-ABC"),
    (3, "a\U0001f600b\U0001f600c"),  # astral: CP offsets differ from UTF-16
    (4, ""),
    (5, " x  y "),
    (6, "héllo ß"),
    (7, None),
    (8, "aaa"),
]
SCHEMA = "_id int, s string"


@pytest.fixture(scope="module")
def str_store(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


_NEEDLES = ["a", "A", "\U0001f600", "-", "l", "x", " ", "aa"]
_CASE = st.one_of(
    st.tuples(st.just("substr"), st.integers(0, 6), st.integers(0, 4)),
    st.tuples(st.just("indexof"), st.sampled_from(_NEEDLES),
              st.integers(0, 4), st.sampled_from([None, 1, 3, 5, 8])),
    st.tuples(st.just("len")),
    st.tuples(st.just("split"), st.sampled_from(["-", " ", "\U0001f600"])),
    st.tuples(st.just("replace_one"), st.sampled_from(_NEEDLES),
              st.sampled_from(["_", "XY", ""])),
    st.tuples(st.just("replace_all"), st.sampled_from(_NEEDLES),
              st.sampled_from(["_", "XY", ""])),
    st.tuples(st.just("concat"), st.sampled_from(["+", "\U0001f600"])),
    st.tuples(st.just("upper")),
    st.tuples(st.just("lower")),
    st.tuples(st.just("trim"), st.sampled_from([" ", "aA ", "-c"])),
)


def _build(case):
    """(spec over $s, pure-Python reference) for one draw."""
    kind = case[0]
    if kind == "substr":
        _, start, length = case
        return ({"$substrCP": ["$s", start, length]},
                lambda s: s[start:start + length])
    if kind == "indexof":
        _, needle, start, end = case
        spec = ["$s", needle, start] + ([end] if end is not None else [])
        if end is None:
            spec = ["$s", needle, start]
        return ({"$indexOfCP": spec},
                lambda s: (s[:end] if end is not None else s).find(
                    needle, start))
    if kind == "len":
        return ({"$strLenCP": "$s"}, len)
    if kind == "split":
        _, delim = case
        return ({"$split": ["$s", delim]}, lambda s: s.split(delim))
    if kind == "replace_one":
        _, find, repl = case
        if not find:
            find = "a"
        return ({"$replaceOne": {"input": "$s", "find": find,
                                 "replacement": repl}},
                lambda s: s.replace(find, repl, 1))
    if kind == "replace_all":
        _, find, repl = case
        if not find:
            find = "a"
        return ({"$replaceAll": {"input": "$s", "find": find,
                                 "replacement": repl}},
                lambda s: s.replace(find, repl))
    if kind == "concat":
        _, mid = case
        return ({"$concat": ["$s", mid, "$s"]},
                lambda s: s + mid + s)
    if kind == "upper":
        return ({"$toUpper": "$s"}, lambda s: s.upper())
    if kind == "lower":
        return ({"$toLower": "$s"}, lambda s: s.lower())
    if kind == "trim":
        _, chars = case
        return ({"$trim": {"input": "$s", "chars": chars}},
                lambda s: s.strip(chars))
    raise AssertionError(kind)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_CASE)
@example(case=("substr", 2, 2))       # astral row: CP slice, not UTF-16
@example(case=("indexof", "\U0001f600", 2, None))  # CP offset of emoji
@example(case=("indexof", "l", 0, 3))  # end-bounded prefix search
@example(case=("len",))                # astral len 5, not 7
@example(case=("replace_one", "\U0001f600", "_"))
def test_string_cp_matches_reference(str_store, case):
    spec, ref = _build(case)
    rows = {
        r["_id"]: r["out"]
        for r in str_store.aggregate(
            "t", [{"$project": {"_id": 1, "out": spec}}]).collect()
    }
    for _id, s in ROWS:
        got = rows[_id]
        if s is None:
            assert got is None, (case, _id, got)
            continue
        want = ref(s)
        if isinstance(got, list) or (
                hasattr(got, "__iter__") and not isinstance(got, str)):
            got = list(got)
        assert got == want, (case, _id, got, want)
