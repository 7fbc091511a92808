"""Property-based checks (hypothesis) for the safety layer — the one
component that faces adversarial input. Mirrors the reference's
adversarial-probe posture (BASELINE.md: 10/10 blocked) with generated
inputs instead of a fixed list."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_nlp_sqlizer_team04_spark.plans.safety import (
    SQLSafetyError,
    enforce_limit,
    ensure_select_only,
    referenced_tables,
    tokenize,
)

IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
WRITE_VERBS = ("INSERT", "UPDATE", "DELETE", "DROP", "CREATE", "ALTER",
               "TRUNCATE", "MERGE", "GRANT")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenizer_never_crashes_unexpectedly(s):
    # any input either tokenizes or raises the typed SQLSafetyError —
    # no other exception may escape
    try:
        tokenize(s)
    except SQLSafetyError:
        pass


@settings(max_examples=100, deadline=None)
@given(verb=st.sampled_from(WRITE_VERBS), tbl=IDENT, tail=st.text(max_size=40))
def test_write_verbs_always_blocked(verb, tbl, tail):
    for sql in (f"{verb} {tbl} {tail}", f"SELECT 1; {verb} {tbl}"):
        try:
            ensure_select_only(sql)
            raise AssertionError(f"not blocked: {sql!r}")
        except SQLSafetyError:
            pass


@settings(max_examples=100, deadline=None)
@given(tbl=IDENT, col=IDENT, n=st.integers(1, 10_000))
def test_enforce_limit_always_bounds(tbl, col, n):
    sql = f"SELECT {col} FROM {tbl}"
    out = enforce_limit(sql, max_rows=n)
    assert out.rstrip().endswith(f"LIMIT {n}")
    # idempotent: a bounded statement is not re-bounded
    assert enforce_limit(out, max_rows=n) == out


@settings(max_examples=100, deadline=None)
@given(tbl=IDENT, col=IDENT)
def test_referenced_tables_finds_from_table(tbl, col):
    sql = f"SELECT {col} FROM {tbl}"
    refs = referenced_tables(sql)
    assert tbl.lower() in refs


@settings(max_examples=100, deadline=None)
@given(evil=IDENT, cte=IDENT)
def test_cte_never_excuses_noncte_tables(evil, cte):
    # whatever the identifiers, a table in FROM position that is not a
    # WITH-prologue CTE must always be reported
    sql = f"WITH {cte} AS (SELECT 1) SELECT x FROM {evil}"
    refs = referenced_tables(sql)
    if evil.lower() != cte.lower():
        assert evil.lower() in refs
