"""Change-data-capture operators: latest-wins merge snapshots and SCD2
validity intervals — the ingestion patterns that keep a 100 TB corpus
*current* (the reference queries live databases, NLP_SQLizer/backend/
app/ai/nl2sql.py:14-21, so freshness is the DB's problem; a
parquet-backed engine has to merge change streams itself).

Spark-first shapes:
- MERGE (upsert+delete) without a table format: union base+changelog,
  ONE window rank per key by version, keep the winner, drop tombstones.
  A single shuffle on the merge key — the same plan Delta/Iceberg
  MERGE compiles to for full-snapshot rewrites, minus the transaction
  log. At scale the shuffle is the unavoidable cost; partition-pruned
  variants only rewrite touched partitions (see sources/compaction.py
  for the per-partition swap machinery this would compose with).
- SCD2: each key's ordered change history becomes [valid_from,
  valid_to) rows via ONE lead() window — the type-2 dimension build.
  Same single shuffle; the open interval's NULL valid_to is the
  current row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    version: str,
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins merged snapshot of ``base`` + ``changes``.

    ``changes`` carries ``op_col`` ∈ {'U','D'} (upsert/delete) and the
    same data columns as ``base``; ``version`` orders competing rows
    (base rows rank below every change at equal version via a tier
    column, so a same-version change wins deterministically). Exactly
    ONE shuffle on the key; the window never needs a second pass.

    Ties beyond (version, tier) are broken by the key itself being
    unique per tier — base is a snapshot (one row/key) and a changelog
    with duplicate (key, version) rows is malformed input upstream
    dedup (q106 shape) removes.
    """
    b = base.withColumn(op_col, F.lit("U")).withColumn("__tier", F.lit(0))
    c = changes.select(*base.columns, op_col).withColumn(
        "__tier", F.lit(1)
    )
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc(), F.col("__tier").desc()
    )
    return (
        b.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", "__tier", op_col)
    )


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each key's ordered
    change rows become ``[valid_from, valid_to)`` intervals via ONE
    lead() window (NULL valid_to = the currently-valid row, flagged
    ``is_current``). Consecutive rows with UNCHANGED attributes are
    collapsed first (a change feed often re-emits identical state) —
    a lag() comparison inside the same window partitioning, so the
    collapse costs no extra shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1
    kept = (
        changes.withColumn("__keep", first | changed)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        kept.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("int")
        )
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


# ------------------------------------------------------ registry entries
def _orders_changelog(orders: DataFrame) -> DataFrame:
    """Deterministic synthetic changelog over the orders snapshot (the
    SAME derivation the DuckDB oracle spells out): every o_orderkey %
    10 == 3 gets a repriced upsert at version 2, every % 20 == 7 a
    tombstone at version 2."""
    upd = (
        orders.filter(F.col("o_orderkey") % 10 == 3)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2))
        .withColumn("__v", F.lit(2))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        orders.filter(F.col("o_orderkey") % 20 == 7)
        .withColumn("__v", F.lit(2))
        .withColumn("op", F.lit("D"))
    )
    return upd.unionByName(dele)


def snapshot_rollup(merged: DataFrame) -> DataFrame:
    """Per-status rollup of a merged orders snapshot — gate-sized
    output in which every merged row still feeds the hash. Shared by
    the batch merge (q135) and its streaming twin (q159,
    ``streaming/cdc.py``) so both hash against the same oracle."""
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,6)")).cast(
                    "double"
                ),
                2,
            ).alias("total_price"),
            F.sum((F.col("o_orderkey") % 10 == 3).cast("long")).alias(
                "n_repriced"
            ),
        )
        .orderBy("o_orderstatus")
    )


def q135_cdc_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged orders snapshot after a synthetic changelog (10% repriced,
    5% deleted) — per-status rollup of the result so the output is
    gate-sized while every merged row still feeds the hash."""
    o = load_table(spark, sf_dir, "orders").withColumn("__v", F.lit(1))
    merged = merge_snapshot(o, _orders_changelog(o), "o_orderkey", "__v")
    return snapshot_rollup(merged)


CDC_MERGE_ORACLE_SQL = """
    WITH merged AS (
      SELECT * FROM orders
      WHERE o_orderkey % 20 <> 7           -- tombstones
    ), repriced AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 3
                  THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM merged
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2)
               AS total_price,
           sum(CASE WHEN o_orderkey % 10 = 3 THEN 1 ELSE 0 END)::bigint AS n_repriced
    FROM repriced
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


def q136_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history over each user's event-type stream: intervals of
    constant event_type per user (consecutive re-emissions collapsed),
    summarized per user so the output is gate-sized: interval count,
    current type, span seconds."""
    ev = load_table(spark, sf_dir, "events")
    # one event per (user, ts), min type winning — makes the per-user
    # ordering total so both engines build identical intervals even if
    # a regenerated corpus carries timestamp ties
    one = ev.groupBy("user_id", "ts").agg(
        F.min("event_type").alias("event_type")
    )
    hist = scd2_intervals(one, ["user_id"], "ts", ["event_type"])
    return (
        hist.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.max(F.when(F.col("is_current") == 1, F.col("event_type"))).alias(
                "current_type"
            ),
            F.sum(
                F.unix_micros(F.col("valid_to"))
                - F.unix_micros(F.col("valid_from"))
            ).alias("closed_span_us"),
        )
        .orderBy("user_id")
    )


SCD2_ORACLE_SQL = """
    WITH one AS (
      SELECT user_id, ts, min(event_type) AS event_type
      FROM events GROUP BY user_id, ts
    ), ordered AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                 AS prev_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM one
    ), kept AS (
      SELECT user_id, ts, event_type FROM ordered
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
    ), iv AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      FROM kept
    )
    SELECT user_id,
           count(*) AS n_intervals,
           max(CASE WHEN valid_to IS NULL THEN event_type END)
               AS current_type,
           sum(epoch_us(valid_to) - epoch_us(valid_from))::bigint AS closed_span_us
    FROM iv
    GROUP BY user_id
    ORDER BY user_id
"""
