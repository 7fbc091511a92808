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

# The r10+ window plan (mirrors the policy comment at queries.py's
# _R10_WINDOW). The round-10 window seats exactly the 50 target-10
# entries written r8/r9 (now removed from this table — seating
# discharges the plan); the cp=6 re-confirmation wave (50 entries,
# last driver-green r6) comes due at round 10 with a full window, so
# it takes the round-11/12 targets below. When a target round arrives
# and the entry is neither driver-green nor seated,
# test_no_overdue_entries fails the build.
PLANNED: dict[str, int] = {
    # the r5 re-confirmation stragglers deferred r9 -> r11 (did not
    # fit the r10 window behind its 17 standing seats)
    **{k: 11 for k in (
        "q119_corpus_report", "q120_bpe_encode_stats",
        "q121_promo_revenue_share", "q122_top_suppliers",
        "q123_small_quantity_revenue",
        "nl45_customers_acctbal_recorded", "nl46_orders_big_or_small",
    )},
    # round-9 additions — the two-round rotation contract gives them
    # round-11 targets (round 10 was already full)
    **{k: 11 for k in (
        "q193_doc_expr_dialect2", "q194_doc_group_first_last_n",
        "nl66_doc_ancestors", "nl67_doc_ema", "q195_doc_expr_dialect3",
        "nl68_doc_latest_n_per_group", "nl69_doc_descendants",
        "q196_dsir_selection", "q197_rep_ngram_char_fractions",
    )},
    # the cp=6 re-confirmation wave due at round 10 (wait reaches 4 >
    # MAX_WAIT) — the r10 window is full, so the oldest 34 (added
    # r2/r5) take round-11 targets, exactly filling the r11 window
    # behind the 16 standing target-11 seats above
    **{k: 11 for k in (
        "q24_ann_lsh_topk", "q28_near_dup_minhash",
        "q29_simhash_fingerprints", "q32_lang_id_dist",
        "q39_media_decode_stats", "q40_media_embedding_topk",
        "q43_ann_ivf_topk",
        "nl47_doc_facet_breakdown", "nl48_orders_facet_breakdown",
        "nl49_month_over_month_revenue", "nl50_running_monthly_revenue",
        "nl51_totalprice_histogram", "nl52_doc_length_histogram",
        "nl53_pct_urgent_orders",
        "q124_knn_graph_ivf", "q125_min_cost_supplier",
        "q126_sole_returner_suppliers", "q127_part_volume_suppliers",
        "q128_expectation_suite", "q129_measure_unpivot",
        "q130_mmr_topk", "q131_lateral_topn", "q132_doc_facet",
        "q133_token_entropy", "q134_doc_expectations",
        "q135_cdc_merge_snapshot", "q136_scd2_intervals",
        "q137_disjunctive_revenue", "q138_priority_order_check",
        "q139_filtered_cosine_topk", "q140_canonical_selection",
        "q141_source_overlap", "q142_source_token_budget",
        "q143_doc_length_buckets",
    )},
    # ... and the youngest 16 of the cp=6 wave take round-12 targets
    # (the r11 window is now fully spoken for). NOTE for the r11
    # rotation: the cp=7 wave (50 entries, last green r7) comes due at
    # round 11 and must take target-12+ entries then; with these 16
    # already at target-12, expect the cp=7 overflow to spread into
    # round 13 explicitly.
    # round-10 additions — the two-round rotation contract gives them
    # round-12 targets (rounds 10 and 11 are already full)
    **{k: 12 for k in (
        "q198_doc_expr_dialect4", "nl70_doc_monthly_grain",
        "nl71_doc_regex_predicate", "q199_ann_binary_hamming_topk",
        "nl72_doc_distinct_count", "nl73_doc_pct_share",
    )},
    **{k: 12 for k in (
        "q144_winsorized_stats", "q145_drift_psi",
        "q146_label_centroids", "q147_stream_drift",
        "q148_forecast_revenue", "q149_top_sources",
        "q150_hotkey_audit", "q151_variant_props_rollup",
        "q152_month_spine_rollup", "q153_equidepth_histogram",
        "q154_doc_lang_ratio",
        "q155_winsorized_stats_sketch", "q156_equidepth_histogram_sketch",
        "q157_doc_lookup_pipeline", "q158_doc_facet_prefiltered",
        "q159_cdc_stream_snapshot",
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
    from dbt_nlp_sqlizer_team04_spark.queries import _R10_WINDOW, SPARK_QUERIES

    assert list(SPARK_QUERIES)[:50] == _R10_WINDOW


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
