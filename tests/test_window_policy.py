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

# The r11+ window plan (mirrors the policy comment at queries.py's
# _R11_WINDOW). The round-11 window seats exactly the 50 target-11
# entries written r9/r10 (now removed from this table — seating
# discharges the plan); the cp=7 re-confirmation wave (50 entries,
# last driver-green r7) comes due at round 11 with a full window, so
# it takes the round-12/13 targets below. When a target round arrives
# and the entry is neither driver-green nor seated,
# test_no_overdue_entries fails the build.
PLANNED: dict[str, int] = {
    # round-10 additions — the two-round rotation contract gives them
    # round-12 targets (rounds 10 and 11 were already full)
    **{k: 12 for k in (
        "q198_doc_expr_dialect4", "nl70_doc_monthly_grain",
        "nl71_doc_regex_predicate", "q199_ann_binary_hamming_topk",
        "nl72_doc_distinct_count", "nl73_doc_pct_share",
    )},
    # the youngest 16 of the cp=6 wave (planned r10, standing)
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
    # the cp=7 re-confirmation wave due at round 11 (wait reaches 4 >
    # MAX_WAIT) — the r11 window is full, so the oldest 28 (added
    # r1-r4) take round-12 targets, exactly filling the r12 window
    # behind the 22 standing target-12 seats above ...
    **{k: 12 for k in (
        "q02_filter_topn", "q04_like_search", "q05_null_handling",
        "q06_date_rollup", "q09_distinct_segments", "q10_union_names",
        "q13_case_when", "q18_categorical_domain",
        "q20_events_json_props", "q21_pivot_status",
        "q26_exact_dup_groups", "q31_quality_by_source",
        "q34_doc_fingerprints", "q35_doc_find", "q37_doc_find_or_regex",
        "q63_semantic_dedup", "q65_ann_pq_topk", "q67_chunk_retrieval",
        "nl24_distinct_customers_in_orders", "nl25_most_recent_orders",
        "nl26_pct_orders_per_status", "nl27_customers_without_orders",
        "nl28_doc_top5_longest", "nl29_nations_with_min_customers",
        "nl30_rich_segments", "nl31_events_per_day",
        "nl32_minmax_balance_per_segment", "nl33_customer_share_per_nation",
    )},
    # ... and the youngest 22 (added r4/r6) take round-13 targets (the
    # r12 window is now fully spoken for). NOTE for the r12 rotation:
    # the cp=8 wave (entries last green r8) comes due at round 12 and
    # must take target-13+ entries then; with these 22 already at
    # target-13, expect the cp=8 overflow to spread into round 14
    # explicitly.
    # round-11 additions — the two-round rotation contract gives them
    # round-13 targets (rounds 11 and 12 are already full)
    **{k: 13 for k in (
        "q200_doc_documents_stage", "nl74_doc_pct_share_filtered",
    )},
    **{k: 13 for k in (
        "nl34_orders_before_1997", "nl35_cheapest_orders",
        "nl36_richest_nation", "nl37_doc_events_before_date",
        "nl38_big_building_segments", "nl39_top3_nations_by_customers",
        "nl40_top5_parts_by_price", "nl41_above_avg_orders",
        "nl42_union_names_like", "nl43_customers_with_nation_avg",
        "nl44_rank_orders_by_price", "nl54_totalprice_deciles",
        "q73_learned_quality_scores", "q78_kmeans_clusters",
        "q89_neardup_pagerank", "q92_quality_weighted_sample",
        "q110_bpe_merges", "q113_salted_segment_sales",
        "q115_frame_sample_rollup", "q116_resize_rollup",
        "q164_token_coverage", "q166_edit_distance_pairs",
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
    from dbt_nlp_sqlizer_team04_spark.queries import _R11_WINDOW, SPARK_QUERIES

    assert list(SPARK_QUERIES)[:50] == _R11_WINDOW


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
