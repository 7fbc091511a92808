"""Build-vs-execute split profiler (guide §1: measure first).

For each headline query, times DataFrame *construction*
(`fn(spark, sf_dir)` — driver-side python + py4j plan building) apart
from *execution* (`collect()`), min-of-N each, fresh DataFrame per run.
Writes a JSON report so round docs can cite the split.

Usage: python tools/profile_build.py [--only q184,nl73,...] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, ingest  # noqa: E402
from dbt_nlp_sqlizer_team04_spark.queries import SPARK_QUERIES  # noqa: E402
from dbt_nlp_sqlizer_team04_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/build_profile.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-build")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(10).collect()
    ingest(spark, sf_dir)

    names = [n for n in HEADLINE if n in SPARK_QUERIES]
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        names = [n for n in names if any(n.startswith(p) for p in pats)]

    report: dict[str, dict] = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        try:
            fn(spark, sf_dir).collect()  # warm plan+codegen once
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            continue
        builds, execs = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        report[name] = {
            "build_min": round(min(builds), 4),
            "exec_min": round(min(execs), 4),
            "build_p50": round(sorted(builds)[len(builds) // 2], 4),
        }
        print(
            f"{name:40s} build {min(builds):6.3f}  exec {min(execs):6.3f}",
            flush=True,
        )
    tot_b = sum(v.get("build_min", 0) for v in report.values())
    tot_e = sum(v.get("exec_min", 0) for v in report.values())
    print(f"TOTAL build {tot_b:.2f}s exec {tot_e:.2f}s over {len(report)}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
