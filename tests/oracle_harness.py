"""Local replica of the driver's correctness gate: run each Spark query
and its DuckDB oracle at a given SF, compare row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from dbt_nlp_sqlizer_team04_spark.sources.parquet import TABLES, table_path


def _norm_cell(v: Any) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def run_oracle(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(spark, sf_dir: str, name: str, fn, oracle: str | None) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = {"name": name, "spark_rows": len(s_rows)}
    if oracle is None:
        res["status"] = "rows-only"
        return res
    o_cols, o_rows = run_oracle(sf_dir, oracle)
    nsc, nsr = normalize(s_cols, s_rows)
    noc, nor = normalize(o_cols, o_rows)
    res["oracle_rows"] = len(o_rows)
    if nsc != noc:
        res["status"] = "SCHEMA-MISMATCH"
        res["detail"] = f"spark={nsc} oracle={noc}"
    elif len(nsr) != len(nor):
        res["status"] = "ROWCOUNT-MISMATCH"
    elif nsr != nor:
        res["status"] = "VALUE-MISMATCH"
        diffs = [(a, b) for a, b in zip(nsr, nor) if a != b][:3]
        res["detail"] = str(diffs)
    else:
        res["status"] = "OK"
    return res


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    from dbt_nlp_sqlizer_team04_spark.queries import ORACLE_SQL, SPARK_QUERIES
    from dbt_nlp_sqlizer_team04_spark.session import get_spark

    spark = get_spark("oracle-harness")
    failures = 0
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            r = compare(spark, sf_dir, name, fn, ORACLE_SQL.get(name))
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "detail": str(e)[:300]}
        if r["status"] not in ("OK", "rows-only"):
            failures += 1
        print(f"{r['status']:18s} {name:32s} rows={r.get('spark_rows','?')}"
              + (f" detail={r['detail']}" if "detail" in r else ""))
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    import sys

    sys.exit(1 if main(only=sys.argv[1:] or None) else 0)
