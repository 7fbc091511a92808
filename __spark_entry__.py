"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-style pricing summary) on
sf0.001. ``queries()`` / ``oracle_sql()`` — the full operator registry
from ``dbt_nlp_sqlizer_team04_spark.queries`` (SURVEY.md §2 coverage).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_nlp_sqlizer_team04_spark.queries import ORACLE_SQL, SPARK_QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["q01_pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {k: v for k, v in ORACLE_SQL.items() if v is not None}
