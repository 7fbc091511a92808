"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(fast smoke of the driver's sf0.01 gate; the harness main() runs sf0.01).
"""

from __future__ import annotations

import pytest

from dbt_nlp_sqlizer_team04_spark.queries import ORACLE_SQL, SPARK_QUERIES

from .oracle_harness import compare

NAMES = sorted(SPARK_QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_smoke, name):
    res = compare(spark, sf_smoke, name, SPARK_QUERIES[name], ORACLE_SQL.get(name))
    assert res["status"] in ("OK", "rows-only"), res


def test_entry_runs(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


def test_registry_consistency():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
