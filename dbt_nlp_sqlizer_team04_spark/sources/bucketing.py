"""Bucketed-table layout for shuffle-free FK joins — the 100 TB
co-location strategy the per-operator scale notes reference.

Plain parquet reads hash-shuffle both sides of every equi-join. Writing
fact tables bucketed on their join key (``DataFrameWriter.bucketBy`` +
``saveAsTable``) records the bucket spec in the catalog, and Catalyst
then plans bucket-local SortMergeJoins with NO Exchange on either side
— at 100 TB that removes the dominant cost of q03/q12-style plans
(lineitem ⨝ orders moves ~the whole fact table otherwise).

Usage is one-time at ingest:

    create_bucketed_tables(spark, sf_dir, buckets=32)
    joined = bucketed_join_orders_lineitem(spark)   # plan has no Exchange

Notes:
- both sides must be bucketed on the same key with the SAME bucket
  count, and ``spark.sql.sources.bucketing.enabled`` (default true);
- bucket pruning also applies to point predicates on the bucket key;
- on a real lake this is the table layout (or liquid clustering /
  Iceberg bucket partition transforms); local saveAsTable lands in the
  session's warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .parquet import load_table

BUCKET_TABLES = {
    "orders_bucketed": ("orders", "o_orderkey"),
    "lineitem_bucketed": ("lineitem", "l_orderkey"),
}


def create_bucketed_tables(
    spark: SparkSession, sf_dir: str, buckets: int = 32, overwrite: bool = True
) -> list[str]:
    """Write orders/lineitem bucketed+sorted on the orderkey FK."""
    import os
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    created = []
    for table_name, (src, key) in BUCKET_TABLES.items():
        if overwrite:
            spark.sql(f"DROP TABLE IF EXISTS {table_name}")
            # DROP removes the catalog entry; a stale location from a
            # previous session would still block saveAsTable
            loc = os.path.join(warehouse, table_name)
            if os.path.exists(loc):
                shutil.rmtree(loc)
        (
            load_table(spark, sf_dir, src)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(table_name)
        )
        created.append(table_name)
    return created


def bucketed_join_orders_lineitem(
    spark: SparkSession, force_smj: bool = False
) -> DataFrame:
    """FK join over the bucketed layout — Catalyst plans it without a
    shuffle on either side (asserted in tests via the physical plan).

    At toy scale the planner prefers broadcasting the small side (and
    disables bucketed reads); ``force_smj`` adds a MERGE hint to get the
    plan a 100 TB fact-fact join would take, where bucketing removes
    both Exchanges.
    """
    o = spark.table("orders_bucketed")
    l = spark.table("lineitem_bucketed")
    if force_smj:
        o = o.hint("merge")
    return l.join(o, l.l_orderkey == o.o_orderkey)


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
