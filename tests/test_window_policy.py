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

# The r7 window plan (mirrors the policy comment at queries.py's
# _R6_WINDOW): the remaining never-checked tail plus the oldest
# re-confirmation debt. If round 7 arrives and these are neither
# driver-green nor seated, test_no_overdue_entries fails.
PLANNED: dict[str, int] = {
    # never driver-checked, added r4 — planned r7 seats
    **{k: 7 for k in (
        "nl24_distinct_customers_in_orders", "nl25_most_recent_orders",
        "nl26_pct_orders_per_status", "nl27_customers_without_orders",
        "nl28_doc_top5_longest", "nl29_nations_with_min_customers",
        "nl30_rich_segments", "nl31_events_per_day",
        "nl32_minmax_balance_per_segment", "nl33_customer_share_per_nation",
        "nl34_orders_before_1997", "nl35_cheapest_orders",
        "nl36_richest_nation", "nl37_doc_events_before_date",
        "nl38_big_building_segments", "nl39_top3_nations_by_customers",
        "nl40_top5_parts_by_price", "nl41_above_avg_orders",
        "nl42_union_names_like", "nl43_customers_with_nation_avg",
        "nl44_rank_orders_by_price",
        "q92_quality_weighted_sample", "q113_salted_segment_sales",
        "q115_frame_sample_rollup", "q116_resize_rollup",
        # rows-only never-checked (recall/fixture pytests carry them
        # locally; the driver seat proves err-free execution)
        "q63_semantic_dedup", "q65_ann_pq_topk", "q67_chunk_retrieval",
        "q73_learned_quality_scores", "q78_kmeans_clusters",
        "q89_neardup_pagerank", "q110_bpe_merges",
    )},
    # oldest re-confirmation debt (last green r2) — planned r7 seats
    **{k: 7 for k in (
        "q02_filter_topn", "q04_like_search", "q05_null_handling",
        "q06_date_rollup", "q09_distinct_segments", "q10_union_names",
        "q13_case_when", "q18_categorical_domain", "q20_events_json_props",
        "q21_pivot_status", "q26_exact_dup_groups", "q31_quality_by_source",
        "q34_doc_fingerprints", "q35_doc_find", "q37_doc_find_or_regex",
    )},
    # seat-count arithmetic: 32 never-checked + 19 r2-debt = 51 > 50
    # window slots, and round 7 will add its own entries — the four
    # set-operation/percentile r2 entries (all covered by the identical
    # q-shape smoke every round) take round-8 targets instead
    **{k: 8 for k in (
        "q41_intersect_nations", "q42_except_unordered_parts",
        "q48_cube_status_priority", "q49_price_percentiles",
    )},
    # r6 additions that didn't fit the r7 window (3 seats went to
    # q164/q166/nl54) — policy at queries.py says additions rotate in
    # within two rounds, so these take machine-checked round-8 targets
    **{k: 8 for k in (
        "q160_nation_profit", "q161_important_parts",
        "q162_ship_delay_priority", "q163_supplier_count_by_part",
        "q165_hotkey_sketch", "q167_doc_pagination",
    )},
    # second-oldest re-confirmation debt (last green r3, waited past
    # MAX_WAIT at round 7 while the r7 window seats the r2/never tail)
    **{k: 8 for k in (
        "q01_pricing_summary", "q03_top_revenue_orders",
        "q07_window_partition_avg", "q08_rank_orders",
        "q11_scalar_subquery", "q12_cte_nation_sales",
        "q14_group_having", "q15_exists_semi", "q16_not_exists_anti",
        "q17_profile_stats", "q19_events_hourly",
        "q22_rollup_region_nation",
    )},
    # round-7 additions — the policy comment's "additions rotate in
    # within two rounds" made machine-checkable at land time (split
    # r8/r9 so neither window starves the debt seats above)
    **{k: 8 for k in (
        "q168_doc_lookup_correlated", "q169_doc_union_with",
        "q170_doc_window_fields", "q171_doc_densify_fill",
        "nl55_doc_pagination", "nl56_doc_lookup_counts",
    )},
    **{k: 9 for k in (
        "q172_doc_graph_lookup", "q173_doc_bucket_auto",
        "nl57_doc_running_total", "nl58_doc_daily_gapfill",
        "q174_doc_sample", "q175_doc_trailing_window",
        "nl59_doc_equal_buckets", "q176_ann_ivfpq_topk",
        "nl60_doc_sample", "q177_doc_lookup_topn", "q178_doc_lookup_group",
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
    from dbt_nlp_sqlizer_team04_spark.queries import _R7_WINDOW, SPARK_QUERIES

    assert list(SPARK_QUERIES)[:50] == _R7_WINDOW
