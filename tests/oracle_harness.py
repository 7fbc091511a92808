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


def run_oracle(
    sf_dir: str, sql: str
) -> tuple[list[str], list[tuple], dict[str, str]]:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # Re-fetch through pandas to capture the dtype the driver's comparison
    # sees: DuckDB HUGEINT (e.g. windowed sum of ints) widens to float64
    # there, turning 56 into 56.0 and breaking value hashes even though
    # fetchall() returns ints. Kinds: i=int, f=float, O=object/str.
    kinds = {c: str(d.kind) for c, d in con.execute(sql).fetchdf().dtypes.items()}
    return cols, rows, kinds


def _dtype_kind_diffs(spark_schema, oracle_kinds: dict[str, str]) -> list[str]:
    """int-vs-float kind clashes between the Spark schema and the oracle's
    pandas dtypes — the exact shape of the r2 q45 driver failure."""
    numeric = {
        "long": "i", "integer": "i", "int": "i", "short": "i", "byte": "i",
        "double": "f", "float": "f",
    }
    diffs = []
    for f in spark_schema.fields:
        s_kind = numeric.get(f.dataType.typeName())
        o_kind = oracle_kinds.get(f.name)
        if s_kind and o_kind in ("i", "f") and s_kind != o_kind:
            diffs.append(f"{f.name}: spark={s_kind} oracle={o_kind}")
    return diffs


def compare(spark, sf_dir: str, name: str, fn, oracle: str | None) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = {"name": name, "spark_rows": len(s_rows)}
    if oracle is None:
        res["status"] = "rows-only"
        return res
    o_cols, o_rows, o_kinds = run_oracle(sf_dir, oracle)
    nsc, nsr = normalize(s_cols, s_rows)
    noc, nor = normalize(o_cols, o_rows)
    res["oracle_rows"] = len(o_rows)
    kind_diffs = _dtype_kind_diffs(sdf.schema, o_kinds)
    if kind_diffs:
        res["status"] = "DTYPE-MISMATCH"
        res["detail"] = str(kind_diffs)
    elif nsc != noc:
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
