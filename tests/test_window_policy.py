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

# The r9+ window plan (mirrors the policy comment at queries.py's
# _R9_WINDOW). The round-9 window seats every target-9 entry plus the
# oldest slice (added r2) of the r5 re-confirmation wave; what did not
# fit takes round-10/11 targets below. When a target round arrives and
# the entry is neither driver-green nor seated, test_no_overdue_entries
# fails the build.
PLANNED: dict[str, int] = {
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
    # the r4-wave tail deferred r8 -> r10 (did not fit behind the 28
    # mandatory r8 seats, nor the 40 mandatory r9 seats)
    **{k: 10 for k in (
        "q86_bpe_pair_stats", "q87_conversion_funnel",
        "q88_cohort_retention", "q90_lineitem_correlations",
        "q91_custkey_skew",
    )},
    # the r5 re-confirmation wave that came due at round 9 (50 entries
    # reach wait > MAX_WAIT there) but did not fit the 50-seat window
    # behind the 40 mandatory target-9 seats: the 10 oldest (added r2)
    # are seated (_R9_WINDOW); the remainder takes round-10 targets
    # (33 — exactly filling the round-10 window behind its 17 standing
    # seats above) and round-11 targets (7)
    **{k: 10 for k in (
        "q50_train_val_test_split", "q51_stratified_sample",
        "q53_cosine_near_dup_pairs", "q54_pii_scrub_stats",
        "q55_session_window_details", "q57_repetition_quality",
        "q62_source_mixing", "q66_doc_chunks",
        "q68_shard_manifest", "q69_sliding_rollup",
        "q74_segment_dedup", "q93_binational_volume",
        "q94_returned_items", "q95_order_count_distribution",
        "q96_large_quantity_orders", "q97_market_share",
        "q98_idle_rich_customers", "q99_dup_span_stats",
        "q100_curriculum_order", "q101_enriched_events",
        "q102_cosine_range", "q103_event_transitions",
        "q104_label_profile", "q105_event_anomalies",
        "q106_hourly_first_events", "q107_knn_graph",
        "q108_mutual_knn_clusters", "q109_rolling_user_value",
        "q111_incremental_profile", "q112_term_pmi",
        "q114_doc_lookup_rollup", "q117_window_zoo",
        "q118_grouping_sets",
    )},
    **{k: 11 for k in (
        "q119_corpus_report", "q120_bpe_encode_stats",
        "q121_promo_revenue_share", "q122_top_suppliers",
        "q123_small_quantity_revenue",
        "nl45_customers_acctbal_recorded", "nl46_orders_big_or_small",
    )},
    # round-9 additions — the two-round rotation contract gives them
    # round-11 targets (round 10 is already full)
    **{k: 11 for k in (
        "q193_doc_expr_dialect2", "q194_doc_group_first_last_n",
        "nl66_doc_ancestors", "nl67_doc_ema", "q195_doc_expr_dialect3",
        "nl68_doc_latest_n_per_group", "nl69_doc_descendants",
        "q196_dsir_selection", "q197_rep_ngram_char_fractions",
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
    from dbt_nlp_sqlizer_team04_spark.queries import _R9_WINDOW, SPARK_QUERIES

    assert list(SPARK_QUERIES)[:50] == _R9_WINDOW


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
