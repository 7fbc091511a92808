"""Dump .explain('formatted') for the given queries into plans/<tag>/.

Usage:
  PYTHONPATH=<tree> python tools/dump_plans.py --tag r14 --suffix after \
      --queries q166_edit_distance_pairs,q52_ngram_jaccard_pairs
The judge cannot run Spark; these files are the evidence plan claims
are checked against. Streaming entries dump the plan of the RESULT
frame their registry fn returns (the batch scoring/rollup half).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.environ.get("DUMP_TREE", os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", required=True)  # before | after
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out-root", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bench import ingest
    from dbt_nlp_sqlizer_team04_spark.queries import SPARK_QUERIES
    from dbt_nlp_sqlizer_team04_spark.session import get_spark

    spark = get_spark("dump-plans")
    ingest(spark, args.sf)
    out_root = args.out_root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_root, exist_ok=True)
    for name in args.queries.split(","):
        name = name.strip()
        if not name:
            continue
        df = SPARK_QUERIES[name](spark, args.sf)
        txt = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
                "formatted"
            )
        )
        path = os.path.join(out_root, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)


if __name__ == "__main__":
    main()
