"""Seeded differential sweep of the DATE/TIME expression subdialect
(r11 — the sweep program's next input space after find/$group/
$setWindowFields/projection/$lookup): 400 random timestamps plus the
calendar traps (ISO week-year edges around Jan 1 / Dec 31, Feb 29,
month ends for add-clamping) evaluated through every date operator in
ONE Spark job, row-wise equal to independent Python datetime
references:

- part extractors ($year…$second, $dayOfWeek Sunday=1, $dayOfYear,
  $millisecond) vs datetime fields;
- the ISO trio ($isoWeek/$isoDayOfWeek/$isoWeekYear) vs
  datetime.isocalendar() — the engine's Thursday identity must equal
  the stdlib's ISO calendar on the year-boundary dates;
- Mongo's $week vs strftime('%U') — the independent formulation of
  "Sunday-start, days before the first Sunday are week 0";
- $dateTrunc over every unit × startOfWeek variants (day-or-coarser
  → DATE, finer → TIMESTAMP, the documented type split);
- $dateDiff as unit BOUNDARY CROSSINGS for every unit (the sweep's
  contract; the span-based hour/minute arithmetic it replaced
  undercounted 10:59→11:01 as zero hours);
- $dateAdd/$dateSubtract with calendar month/quarter/year clamping
  (Jan 31 + 1 month = Feb 28/29) vs a clamped Python reference;
- $dateToString piece-wise %-rendering vs strftime;
- a $dateFromString round-trip at second grain.
"""

from __future__ import annotations

import calendar
import datetime as dt
import random

import pytest

SOW_PY = {"sunday": 6, "monday": 0, "wednesday": 2, "saturday": 5}


def _mk_rows():
    rng = random.Random(20260816)
    rows = []
    for y in range(2014, 2027):  # ISO week-year edges
        rows.append(dt.datetime(y, 1, 1, 0, 0, 0))
        rows.append(dt.datetime(y, 12, 31, 23, 59, 59))
    rows += [
        dt.datetime(2024, 2, 29, 12, 0, 0),          # leap day
        dt.datetime(2024, 1, 31, 8, 30, 15, 250000),  # clamp source
        dt.datetime(2023, 3, 31, 23, 0, 0),
        dt.datetime(2023, 8, 31, 0, 0, 1),
        dt.datetime(2024, 10, 31, 10, 59, 59),
    ]
    while len(rows) < 400:
        rows.append(dt.datetime(
            rng.randrange(1971, 2035), rng.randrange(1, 13),
            rng.randrange(1, 29), rng.randrange(0, 24),
            rng.randrange(0, 60), rng.randrange(0, 60),
            rng.randrange(0, 1000) * 1000,
        ))
    anchor = dt.datetime(2020, 6, 15, 10, 30, 0)
    return [(i, t, anchor) for i, t in enumerate(rows)]


def _trunc(t: dt.datetime, unit: str, sow: str = "sunday"):
    if unit == "year":
        return dt.date(t.year, 1, 1)
    if unit == "quarter":
        return dt.date(t.year, 3 * ((t.month - 1) // 3) + 1, 1)
    if unit == "month":
        return dt.date(t.year, t.month, 1)
    if unit == "week":
        d = t.date()
        return d - dt.timedelta(days=(d.weekday() - SOW_PY[sow]) % 7)
    if unit == "day":
        return t.date()
    if unit == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return t.replace(second=0, microsecond=0)
    raise AssertionError(unit)


def _add_months(t: dt.datetime, n: int) -> dt.datetime:
    y, m = divmod((t.year * 12 + t.month - 1) + n, 12)
    day = min(t.day, calendar.monthrange(y, m + 1)[1])
    return t.replace(year=y, month=m + 1, day=day)


def _diff(a: dt.datetime, b: dt.datetime, unit: str) -> int:
    """Unit boundary crossings — truncate both ends, then count."""
    if unit == "year":
        return b.year - a.year
    if unit == "month":
        return (b.year - a.year) * 12 + (b.month - a.month)
    if unit == "week":
        return (_trunc(b, "week") - _trunc(a, "week")).days // 7
    if unit == "day":
        return (b.date() - a.date()).days
    secs = {"hour": 3600, "minute": 60, "second": 1}[unit]
    ta = _trunc(a, unit) if unit != "second" else a.replace(microsecond=0)
    tb = _trunc(b, unit) if unit != "second" else b.replace(microsecond=0)
    return round((tb - ta).total_seconds()) // secs


@pytest.fixture(scope="module")
def date_rows(spark):
    from dbt_nlp_sqlizer_team04_spark.operators.documents import (
        DocumentStore,
    )

    rows = _mk_rows()
    s = DocumentStore(spark)
    s.register("t", spark.createDataFrame(
        rows, "i int, ts timestamp, anchor timestamp"))
    fields = {
        "y": {"$year": "$ts"}, "mo": {"$month": "$ts"},
        "dom": {"$dayOfMonth": "$ts"}, "h": {"$hour": "$ts"},
        "mi": {"$minute": "$ts"}, "se": {"$second": "$ts"},
        "dow": {"$dayOfWeek": "$ts"}, "doy": {"$dayOfYear": "$ts"},
        "iw": {"$isoWeek": "$ts"}, "idow": {"$isoDayOfWeek": "$ts"},
        "iwy": {"$isoWeekYear": "$ts"}, "wk": {"$week": "$ts"},
        "ms": {"$millisecond": "$ts"},
        **{
            f"tr_{u}": {"$dateTrunc": {"date": "$ts", "unit": u}}
            for u in ("year", "quarter", "month", "week", "day",
                      "hour", "minute")
        },
        **{
            f"trw_{sow}": {"$dateTrunc": {
                "date": "$ts", "unit": "week", "startOfWeek": sow}}
            for sow in ("monday", "wednesday", "saturday")
        },
        **{
            f"dd_{u}": {"$dateDiff": {
                "startDate": "$anchor", "endDate": "$ts", "unit": u}}
            for u in ("year", "month", "week", "day", "hour",
                      "minute", "second")
        },
        "add_m": {"$dateAdd": {"startDate": "$ts", "unit": "month",
                               "amount": 1}},
        "add_m7": {"$dateAdd": {"startDate": "$ts", "unit": "month",
                                "amount": 7}},
        "add_q": {"$dateAdd": {"startDate": "$ts", "unit": "quarter",
                               "amount": 1}},
        "add_y": {"$dateAdd": {"startDate": "$ts", "unit": "year",
                               "amount": 3}},
        "sub_d": {"$dateSubtract": {"startDate": "$ts", "unit": "day",
                                    "amount": 40}},
        "add_h": {"$dateAdd": {"startDate": "$ts", "unit": "hour",
                               "amount": 26}},
        "add_w": {"$dateAdd": {"startDate": "$ts", "unit": "week",
                               "amount": 2}},
        "fmt1": {"$dateToString": {"date": "$ts",
                                   "format": "%Y-%m-%d"}},
        "fmt2": {"$dateToString": {"date": "$ts",
                                   "format": "%d/%m/%Y %H:%M:%S"}},
        "fmt3": {"$dateToString": {"date": "$ts",
                                   "format": "day %j of %Y"}},
        "rt": {"$dateFromString": {"dateString": {"$dateToString": {
            "date": "$ts", "format": "%Y-%m-%d %H:%M:%S"}}}},
    }
    out = {r["i"]: r for r in s.aggregate(
        "t", [{"$addFields": fields}, {"$limit": 1000}]).collect()}
    return rows, out


def test_date_parts_match_stdlib(date_rows):
    rows, out = date_rows
    for i, t, _a in rows:
        r = out[i]
        iso = t.isocalendar()
        assert r["y"] == t.year and r["mo"] == t.month, i
        assert r["dom"] == t.day and r["h"] == t.hour, i
        assert r["mi"] == t.minute and r["se"] == t.second, i
        assert r["dow"] == (t.isoweekday() % 7) + 1, (i, t)
        assert r["doy"] == t.timetuple().tm_yday, i
        assert r["iw"] == iso[1] and r["idow"] == iso[2], (i, t)
        assert r["iwy"] == iso[0], (i, t)
        assert r["wk"] == int(t.strftime("%U")), (i, t)
        assert r["ms"] == t.microsecond // 1000, (i, t)


def test_date_trunc_matches_reference(date_rows):
    rows, out = date_rows
    for i, t, _a in rows:
        r = out[i]
        for u in ("year", "quarter", "month", "week", "day"):
            assert r[f"tr_{u}"] == _trunc(t, u), (i, t, u)
            assert isinstance(r[f"tr_{u}"], dt.date), u
        for u in ("hour", "minute"):
            assert r[f"tr_{u}"] == _trunc(t, u), (i, t, u)
        for sow in ("monday", "wednesday", "saturday"):
            assert r[f"trw_{sow}"] == _trunc(t, "week", sow), (i, t, sow)


def test_date_diff_counts_boundaries(date_rows):
    rows, out = date_rows
    for i, t, a in rows:
        r = out[i]
        for u in ("year", "month", "week", "day", "hour", "minute",
                  "second"):
            assert r[f"dd_{u}"] == _diff(a, t, u), (i, t, u, r[f"dd_{u}"])


def test_date_add_clamps_calendar(date_rows):
    rows, out = date_rows
    for i, t, _a in rows:
        r = out[i]
        assert r["add_m"] == _add_months(t, 1), (i, t)
        assert r["add_m7"] == _add_months(t, 7), (i, t)
        assert r["add_q"] == _add_months(t, 3), (i, t)
        assert r["add_y"] == _add_months(t, 36), (i, t)
        assert r["sub_d"] == t - dt.timedelta(days=40), (i, t)
        assert r["add_h"] == t + dt.timedelta(hours=26), (i, t)
        assert r["add_w"] == t + dt.timedelta(weeks=2), (i, t)


def test_date_to_string_matches_strftime(date_rows):
    rows, out = date_rows
    for i, t, _a in rows:
        r = out[i]
        assert r["fmt1"] == t.strftime("%Y-%m-%d"), i
        assert r["fmt2"] == t.strftime("%d/%m/%Y %H:%M:%S"), i
        assert r["fmt3"] == t.strftime("day %j of %Y"), i
        assert r["rt"] == t.replace(microsecond=0), (i, t)
