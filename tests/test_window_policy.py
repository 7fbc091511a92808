"""Window-rotation automation guard (r5 verdict task 9): the driver's
correctness gate only sees the FIRST 50 registry entries per round, so
coverage debt — entries never driver-confirmed, or not re-confirmed for
many rounds — must be visible MECHANICALLY, not by judge archaeology.

The ledger is ``tests/driver_manifest.json``:

    {"round": <current round>,
     "entries": {name: {"added": r, "last_green": r | null}, ...}}

regenerated each round from the CORRECTNESS_r*.json history (the
update recipe lives in this file's test docstrings). The rule enforced
here: an entry may not wait more than ``MAX_WAIT`` rounds past its last
checkpoint (driver-green round, or the round it was added) unless it
either holds a seat in the CURRENT window or appears in ``PLANNED``
with a not-yet-overdue target round. ``PLANNED`` is the policy
comment at queries.py's window made machine-checkable — when its target
round arrives, the entry MUST be seated (or already green), or this
test fails the build.
"""

from __future__ import annotations

import json
import os

MANIFEST = os.path.join(os.path.dirname(__file__), "driver_manifest.json")
MAX_WAIT = 3

# The r8+ window plan (mirrors the policy comment at queries.py's
# _R8_WINDOW). The round-8 window seats every target-8 entry plus the
# nl01-nl22 slice of the r4 re-confirmation wave; what did not fit
# takes round-9/10 targets below. When a target round arrives and the
# entry is neither driver-green nor seated, test_no_overdue_entries
# fails the build.
PLANNED: dict[str, int] = {
    # round-7 additions still owed a first driver seat (split r8/r9 at
    # land time; the r8 half is seated in _R8_WINDOW)
    **{k: 9 for k in (
        "q172_doc_graph_lookup", "q173_doc_bucket_auto",
        "nl57_doc_running_total", "nl58_doc_daily_gapfill",
        "q174_doc_sample", "q175_doc_trailing_window",
        "nl59_doc_equal_buckets", "q176_ann_ivfpq_topk",
        "nl60_doc_sample", "q177_doc_lookup_topn", "q178_doc_lookup_group",
    )},
    # round-8 additions — "additions rotate in within two rounds" made
    # machine-checkable at land time
    **{k: 9 for k in (
        "q179_doc_graph_lookup_array", "q180_doc_window_stats",
        "q181_doc_lookup_group_keyed", "q182_unigram_lm_vocab",
        "q183_unigram_encode_stats", "nl61_doc_union",
        "q184_doc_expr_dialect",
    )},
    # late-r8 additions (landed after the r8 window was frozen) — the
    # two-round rotation contract gives them round-10 targets
    **{k: 10 for k in (
        "q185_doc_window_rates", "q186_doc_ema",
        "nl62_doc_rate_of_change", "q187_doc_selection_accs",
        "nl63_doc_percentile", "q188_doc_window_nselect",
        "q189_doc_window_fill", "q190_doc_group_first_last",
        "nl64_doc_latest_per_group",
        "q191_wordpiece_merges", "q192_wordpiece_encode_stats",
        "nl65_doc_topn_per_group",
    )},
    # the r4 re-confirmation wave that came due at round 8 but did not
    # fit the 50-seat window behind the 28 mandatory target-8 seats:
    # 22 of 49 are seated (nl01-nl22, _R8_WINDOW); the remainder takes
    # round-9 targets (22 — leaving ~11 r9 seats for the r5 wave that
    # comes due there) and round-10 targets (5)
    **{k: 9 for k in (
        "nl23_priority_with_most_orders",
        "q38_events_stream_rollup", "q52_ngram_jaccard_pairs",
        "q56_sequence_packing", "q58_materialized_sequences",
        "q59_contamination_check", "q60_dup_clusters",
        "q61_corpus_funnel", "q64_incremental_rollup",
        "q70_incremental_dedup", "q71_vocab_head",
        "q72_unigram_doc_scores", "q75_bm25_topk",
        "q76_gopher_quality", "q77_int8_quant_topk",
        "q79_bigram_doc_scores", "q80_hybrid_rrf_topk",
        "q81_price_histogram", "q82_best_docs_per_source",
        "q83_local_supplier_volume", "q84_media_decode_rollup",
        "q85_dataset_diff",
    )},
    **{k: 10 for k in (
        "q86_bpe_pair_stats", "q87_conversion_funnel",
        "q88_cohort_retention", "q90_lineitem_correlations",
        "q91_custkey_skew",
    )},
}


def _load():
    with open(MANIFEST) as f:
        m = json.load(f)
    from dbt_nlp_sqlizer_team04_spark.queries import SPARK_QUERIES

    window = list(SPARK_QUERIES)[:50]
    return m["round"], m["entries"], set(window), set(SPARK_QUERIES)


def test_manifest_covers_registry():
    """Every registry entry has a ledger row (a new query must land with
    its added-round recorded), and the ledger carries no ghosts."""
    _rnd, entries, _window, registry = _load()
    missing = registry - set(entries)
    ghosts = set(entries) - registry
    assert not missing, f"entries missing from driver_manifest.json: {sorted(missing)}"
    assert not ghosts, f"ledger rows for removed entries: {sorted(ghosts)}"


def test_no_entry_waits_past_max_without_seat_or_plan():
    """An entry whose last checkpoint (driver-green, or added) is more
    than MAX_WAIT rounds old must be in the current window or carry a
    PLANNED target — re-confirmation debt can be deferred, never
    silent."""
    rnd, entries, window, _registry = _load()
    violations = []
    for name, v in entries.items():
        waited = rnd - max(v["last_green"] or 0, v["added"])
        if waited > MAX_WAIT and name not in window and name not in PLANNED:
            violations.append((name, waited))
    assert not violations, f"unplanned window debt: {sorted(violations)}"


def test_no_overdue_entries():
    """A PLANNED deferral comes due: when its target round arrives, the
    entry must be driver-green by then or hold a seat NOW."""
    rnd, entries, window, _registry = _load()
    overdue = []
    for name, target in PLANNED.items():
        if name not in entries:
            continue  # covered by test_manifest_covers_registry
        green = entries[name]["last_green"]
        if rnd >= target and not (green and green >= target - 1) and name not in window:
            overdue.append((name, target))
    assert not overdue, f"planned seats now overdue: {sorted(overdue)}"


def test_window_is_exactly_the_declared_list():
    """The first 50 registry keys ARE the explicit window list — the
    dict reordering did what the policy comment says."""
    from dbt_nlp_sqlizer_team04_spark.queries import _R8_WINDOW, SPARK_QUERIES

    assert list(SPARK_QUERIES)[:50] == _R8_WINDOW


def test_differential_ledger_consistency():
    """The three places a differential entry is declared stay in sync:
    every DIFFERENTIAL reference targets a registry entry whose
    ORACLE_SQL is None (the driver sees rows-only), and the
    driver-manifest row carries the 'oracle: differential' annotation —
    so a future promotion (or removal) can't silently desync the
    ledger the judge reads."""
    import tests.oracle_harness as oh
    from dbt_nlp_sqlizer_team04_spark.queries import ORACLE_SQL, SPARK_QUERIES

    with open(MANIFEST) as f:
        entries = json.load(f)["entries"]
    diff = set(oh.DIFFERENTIAL)
    assert diff <= set(SPARK_QUERIES), diff - set(SPARK_QUERIES)
    for name in diff:
        assert ORACLE_SQL.get(name) is None, (
            f"{name} has BOTH a SQL oracle and a differential reference"
        )
        assert entries[name].get("oracle") == "differential", (
            f"{name} missing the manifest 'oracle: differential' note"
        )
    annotated = {
        n for n, v in entries.items() if v.get("oracle") == "differential"
    }
    assert annotated == diff, (
        f"manifest/DIFFERENTIAL drift: {annotated ^ diff}"
    )
