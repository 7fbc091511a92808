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

# The r12+ window plan (mirrors the policy comment at queries.py's
# _R12_WINDOW). The round-12 window seats the 48 target-12 entries
# written r10/r11 (now removed from this table — seating discharges
# the plan) plus the q194/q195 canon-fix re-seats; the two displaced
# target-12 entries (nl72/nl73) slip to round 13 below. The cp=8
# re-confirmation wave (50 entries, last driver-green r8) comes due
# at round 12 with a full window, so it takes the round-13/14 targets
# below. When a target round arrives and the entry is neither
# driver-green nor seated, test_no_overdue_entries fails the build.
PLANNED: dict[str, int] = {
    # the two target-12 seats displaced by the q194/q195 re-seats
    # (r11 verdict task 1) — explicit slip to round 13
    **{k: 13 for k in (
        "nl72_doc_distinct_count", "nl73_doc_pct_share",
    )},
    # the youngest 22 of the cp=7 wave (planned r11, standing)
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
    # round-11 additions — the two-round rotation contract gives them
    # round-13 targets (rounds 11 and 12 are already full)
    **{k: 13 for k in (
        "q200_doc_documents_stage", "nl74_doc_pct_share_filtered",
    )},
    # round-12 additions — the two-round rotation contract gives them
    # round-14 targets (rounds 12 and 13 are already full)
    **{k: 14 for k in (
        "nl75_doc_having_count", "q201_doc_convert_dialect",
        "nl76_doc_having_measure", "q202_doc_set_object_dialect",
    )},
    # the cp=8 re-confirmation wave due at round 12 (wait reaches 4 >
    # MAX_WAIT) — the r12 window is full, so the oldest 24 (added
    # r1/r2) take round-13 targets, exactly filling the r13 window
    # behind the 26 standing target-13 seats above ...
    **{k: 13 for k in (
        "q01_pricing_summary", "q03_top_revenue_orders",
        "q07_window_partition_avg", "q08_rank_orders",
        "q11_scalar_subquery", "q12_cte_nation_sales",
        "q14_group_having", "q15_exists_semi", "q16_not_exists_anti",
        "q17_profile_stats", "q19_events_hourly",
        "q22_rollup_region_nation",
        "nl01_count_per_priority", "nl02_avg_balance_per_segment",
        "nl03_distinct_segments",
        "nl04_doc_count_per_type", "nl05_sum_price_per_status",
        "nl06_top5_orders", "nl07_max_balance_per_nation",
        "nl08_count_parts_per_brand", "nl09_trained_balance_by_segment",
        "nl10_trained_count_per_priority",
        "q41_intersect_nations", "q42_except_unordered_parts",
    )},
    # ... and the youngest 26 (added r2-r7) take round-14 targets (the
    # r13 window is now fully spoken for). NOTE for the r13 rotation:
    # the cp=9 wave (entries last green r9, 52 entries) comes due at
    # round 13 and must take target-14+ entries then; with these 26
    # already at target-14, expect the cp=9 overflow to spread into
    # round 15 explicitly.
    **{k: 14 for k in (
        "q48_cube_status_priority", "q49_price_percentiles",
        "nl11_trained_doc_avg_chars", "nl12_count_customers_per_region",
        "nl13_orders_per_month", "nl14_building_customers_per_nation",
        "nl15_big_orders_per_priority", "nl16_orders_1995_per_priority",
        "nl17_customers_name_contains", "nl18_doc_regex_count_per_lang",
        "nl19_orders_per_status_and_priority",
        "nl20_midrange_orders_per_priority",
        "nl21_orders_count_and_avg_per_priority",
        "nl22_top3_segments_by_avg_balance",
        "q160_nation_profit", "q161_important_parts",
        "q162_ship_delay_priority", "q163_supplier_count_by_part",
        "q165_hotkey_sketch", "q167_doc_pagination",
        "nl55_doc_pagination", "nl56_doc_lookup_counts",
        "q168_doc_lookup_correlated", "q169_doc_union_with",
        "q170_doc_window_fields", "q171_doc_densify_fill",
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
    from dbt_nlp_sqlizer_team04_spark.queries import _R12_WINDOW, SPARK_QUERIES

    assert list(SPARK_QUERIES)[:50] == _R12_WINDOW


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
