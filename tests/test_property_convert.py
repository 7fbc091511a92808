"""Property-based differential sweep of ``$convert`` (r12 — the
general form of the $toX family, Mongo 4.0): random (input column ×
target type × onError/onNull presence) draws over the supported
conversion matrix vs a pure-Python reference. Contracts pinned:
truncation-toward-zero for float→int/long; numeric→bool is x != 0;
numeric→string uses the engine's render; to:"date" accepts BOTH
date-strings (parse) and numerics (MILLIS since epoch — Mongo's
convention, where a bare Spark cast would read seconds); onError
substitutes for conversion FAILURES only; null input is never a
failure and follows onNull (default null) — the $dateFromString
precedence contract; Mongo's numeric type codes alias the names;
unsupported targets and malformed specs are loud typed errors, and
the no-onError path errors loudly on unconvertible input (Mongo
parity) instead of going silently null.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from dbt_nlp_sqlizer_team04_spark.operators.documents import (
    DocumentQueryError,
    DocumentStore,
)

ROWS = [
    # (_id, i, l, d, s_num, s_date, b, ms)
    (1, 3, 40, 2.9, "12", "2020-03-04 05:06:07", True, 1577836800000),
    (2, -7, 9, -2.9, "-3", "1999-12-31 23:59:59", False, 0),
    (3, None, 100, 0.0, "2.5", "2001-01-01 00:00:00", None, 86400000),
    (4, 12, None, None, None, None, True, None),
    (5, 0, -3, 7.0, "0", "2020-02-29 12:00:00", False, 951782400000),
]
SCHEMA = ("_id int, i int, l long, d double, s_num string, "
          "s_date string, b boolean, ms long")


@pytest.fixture(scope="module")
def conv_store(spark):
    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(ROWS, SCHEMA))
    return s


def _docs():
    names = ["_id", "i", "l", "d", "s_num", "s_date", "b", "ms"]
    return [dict(zip(names, r)) for r in ROWS]


# the deterministic, Mongo-faithful (input, to) matrix; unconvertible
# combos without onError are loud by contract and pinned separately
_CASES = st.sampled_from([
    (col, to)
    for col in ("$i", "$l", "$d", "$s_num")
    for to in ("double", "int", "long", "string", "bool", "decimal")
] + [("$b", "int"), ("$b", "long"), ("$b", "double"), ("$b", "string")])
_ON_ERROR = st.sampled_from([None, -99, 0.5, "bad"])
_ON_NULL = st.sampled_from([None, -1, "missing", True])


def _fb_ok(fb, to) -> bool:
    """A literal fallback is valid iff it sits in the target's type
    family (the single-typed-column contract; sweep-found r12)."""
    if fb is None:
        return True
    if to == "date":
        # no scalar literal is timestamp-typed: the engine rejects ALL
        # literal fallbacks for to:'date' (r13 advice fix — a string
        # literal previously slipped through and silently re-typed the
        # whole column under when()-coercion); expression fallbacks
        # ({"$toDate": ...}) remain the supported form
        return False
    if to == "string":
        return isinstance(fb, str)
    if to == "bool":
        return isinstance(fb, bool)
    return isinstance(fb, (int, float)) and not isinstance(fb, bool)


FAIL = object()  # a per-row conversion failure (onError's domain)


def _ref_convert(v, to):
    if v is None:
        return None
    if isinstance(v, str):
        if to == "string":
            return v
        if to in ("double", "decimal"):
            try:
                return float(v)
            except ValueError:
                return FAIL
        if to in ("int", "long"):
            # Mongo rejects non-integer strings ('2.5' -> error, not
            # truncation) — ANSI Spark's cast table agrees (the sweep
            # first falsified the opposite assumption; the ENGINE was
            # right and this reference was fixed)
            try:
                return int(v)
            except ValueError:
                return FAIL
        if to == "bool":
            # documented divergence: Spark's boolean-string table
            # ('0'/'1'/'true'/'false' convert; Mongo rejects all)
            m = {"0": False, "1": True, "true": True, "false": False}
            return m.get(v.lower(), FAIL)
        raise AssertionError(to)
    if to == "double":
        return float(v)
    if to in ("int", "long"):
        return int(v)  # truncation toward zero
    if to == "decimal":
        # decimal(38,10) comes back as Decimal; compare as float
        return float(v)
    if to == "string":
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if to == "bool":
        if isinstance(v, bool):
            return v
        return v != 0
    raise AssertionError(to)


def _eq(got, want):
    if got is None or want is None:
        return got is None and want is None
    if isinstance(want, float) and not isinstance(want, (bool, str)):
        return abs(float(got) - want) < 1e-9
    return got == want


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_CASES, on_error=_ON_ERROR, on_null=_ON_NULL)
@example(case=("$d", "int"), on_error=None, on_null=None)   # truncation
@example(case=("$s_num", "long"), on_error=-99, on_null=-1)
@example(case=("$b", "double"), on_error=None, on_null=None)
# the sweep's falsifying draws, pinned: a fallback literal outside
# the target family must be the typed single-typed-column error —
# never a runtime CAST_INVALID_INPUT (string+double), an analysis
# crash (int+bool), or a silent column re-type (int+string)
@example(case=("$i", "double"), on_error=None, on_null="missing")
@example(case=("$s_num", "bool"), on_error=None, on_null=-1)
@example(case=("$i", "string"), on_error=None, on_null=-1)
@example(case=("$i", "string"), on_error=-99, on_null="missing")
def test_convert_matches_reference(conv_store, case, on_error, on_null):
    col, to = case
    spec = {"input": col, "to": to}
    if on_error is not None:
        spec["onError"] = on_error
    if on_null is not None:
        spec["onNull"] = on_null
    # sweep-found (r12): a fallback literal outside the target's type
    # family used to runtime-crash (string + numeric target), die in
    # analysis (int + bool target), or SILENTLY RE-TYPE the column
    # (int + string target) — now one loud typed error
    if not (_fb_ok(on_error, to) and _fb_ok(on_null, to)):
        with pytest.raises(DocumentQueryError, match="single-typed"):
            conv_store.aggregate(
                "t", [{"$project": {"out": {"$convert": spec}}}])
        return
    wants = {}
    for doc in _docs():
        v = doc[col[1:]]
        want = _ref_convert(v, to)
        if v is None and on_null is not None:
            want = on_null
        elif want is FAIL:
            want = on_error  # None only when the loud path is expected
        wants[doc["_id"]] = want
    df = conv_store.aggregate(
        "t", [{"$project": {"_id": 1, "out": {"$convert": spec}}}])
    if on_error is None and any(
        _ref_convert(d[col[1:]], to) is FAIL for d in _docs()
    ):
        # Mongo parity: an unconvertible row without onError is a
        # LOUD runtime error, never a silent null
        with pytest.raises(Exception):
            df.collect()
        return
    rows = {r["_id"]: r["out"] for r in df.collect()}
    for _id, want in wants.items():
        got = rows[_id]
        assert _eq(got, want), (spec, _id, got, want)


def test_convert_date_semantics(conv_store):
    """to:"date" parses date-strings AND reads numerics as MILLIS
    since epoch (Mongo's convention — a bare Spark cast would read
    seconds); the UTC session clock makes values exact."""
    rows = {
        r["_id"]: r
        for r in conv_store.aggregate("t", [{"$project": {
            "_id": 1,
            "from_ms": {"$convert": {"input": "$ms", "to": "date"}},
            "from_str": {"$convert": {"input": "$s_date", "to": 9}},
        }}]).collect()
    }
    assert rows[1]["from_ms"] == datetime.datetime(2020, 1, 1)
    assert rows[3]["from_ms"] == datetime.datetime(1970, 1, 2)
    assert rows[1]["from_str"] == datetime.datetime(2020, 3, 4, 5, 6, 7)
    assert rows[4]["from_ms"] is None and rows[4]["from_str"] is None


def test_convert_error_contracts(conv_store, spark):
    """Typed errors for malformed specs and unsupported targets; LOUD
    runtime error (Mongo parity) for unconvertible input without
    onError — both the ANSI cast path and the date-cascade path; the
    numeric code aliases map exactly; onNull precedence for null
    input even when onError is present."""
    s = DocumentStore(spark)
    s.register("w", spark.createDataFrame(
        [(1, "x"), (2, None)], "_id int, bad string"))
    with pytest.raises(DocumentQueryError, match="Bad \\$convert"):
        s.aggregate("w", [{"$project": {"o": {"$convert": {"to": "int"}}}}])
    with pytest.raises(DocumentQueryError, match="bad 'to'"):
        s.aggregate("w", [{"$project": {"o": {"$convert": {
            "input": "$bad", "to": "objectId"}}}}])
    with pytest.raises(DocumentQueryError, match="bad 'to'"):
        s.aggregate("w", [{"$project": {"o": {"$convert": {
            "input": "$bad", "to": 7}}}}])  # code 7 = objectId
    # loud on unconvertible input without onError (ANSI cast throws)
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|NumberFormat"):
        s.aggregate("w", [{"$project": {"o": {"$convert": {
            "input": "$bad", "to": "int"}}}}]).collect()
    # loud on unparseable date input without onError (cascade path)
    with pytest.raises(Exception, match="USER_RAISED_EXCEPTION"):
        s.aggregate("w", [{"$project": {"o": {"$convert": {
            "input": "$bad", "to": "date"}}}}]).collect()
    # onError recovers BOTH paths; null input follows onNull instead
    rows = {
        r["_id"]: r
        for r in s.aggregate("w", [{"$project": {
            "_id": 1,
            "as_int": {"$convert": {"input": "$bad", "to": "int",
                                    "onError": -99, "onNull": -1}},
            "as_date": {"$convert": {
                "input": "$bad", "to": "date",
                "onError": {"$convert": {"input": 0, "to": "date"}}}},
        }}]).collect()
    }
    assert rows[1]["as_int"] == -99
    assert rows[2]["as_int"] == -1
    assert rows[1]["as_date"] == datetime.datetime(1970, 1, 1)
    assert rows[2]["as_date"] is None
    # $toBool/$toDecimal shorthands exist (Mongo's $convert aliases)
    got = s.aggregate("w", [
        {"$match": {"_id": 1}},
        {"$project": {"tb": {"$toBool": {"$literal": 1}},
                      "td": {"$toDecimal": {"$literal": 2.5}}}},
    ]).collect()[0]
    assert got["tb"] is True and float(got["td"]) == 2.5


def test_convert_date_literal_fallback_rejected(conv_store):
    """r13 advice fix: to:'date' yields a TIMESTAMP column, so a bare
    string (or numeric) onError/onNull literal — previously accepted by
    the guard — would silently re-type the whole column under
    when()-coercion. Both are now a typed compile-time error; an
    expression fallback still works."""
    for fb in ("1999-01-01", -1, True):
        for key in ("onError", "onNull"):
            with pytest.raises(DocumentQueryError, match="does not match"):
                conv_store.aggregate("t", [{"$project": {"o": {"$convert": {
                    "input": "$s_date", "to": "date", key: fb}}}}])
    # the supported form: an expression fallback of the target type
    rows = conv_store.aggregate("t", [{"$project": {"o": {"$convert": {
        "input": "$s_num", "to": "date",
        "onError": {"$convert": {"input": 0, "to": "date"}}}}}}]).collect()
    assert len(rows) > 0


def test_q201_plan_contract(spark, sf_smoke):
    """q201's $convert projection stays ONE UDF-free codegen stage
    over a pushed-filter scan with a rank-limited top-k — the q198
    plan contract extended to the conversion dialect."""
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        q201_doc_convert_dialect,
    )

    df = q201_doc_convert_dialect(spark, sf_smoke)
    plan = df._jdf.queryExecution().toString().split(
        "== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
        "PushedFilters: [")[1].split("]")[0]
