"""Relational operator surface — SURVEY.md §2.B (B1-B17).

The reference *generates and validates* this SQL surface and ships it to
PostgreSQL (NLP_SQLizer/backend/app/ai/nl2sql.py:65-76 system prompt;
app/ai/query_intent.py:324-353 per-intent patterns; app/ai/nl2sql.py:178-278
validators). Here each operator is executed natively by Spark as a
declarative DataFrame/Spark SQL plan so Catalyst does pushdown, pruning,
join selection and AQE does runtime re-planning.

Every builder takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/aliases exactly match the DuckDB oracle SQL registered in
``queries.py`` (the driver hash-compares values under sorted column
names).

Determinism rules used throughout (so Spark and the oracle agree bit-for-bit):
- float aggregates are ``round()``-ed (2dp for money sums, 4dp for avgs) —
  parallel summation order differs between engines in the low bits;
- every LIMIT is preceded by a total ORDER BY with a unique tie-break key;
- timestamps in output are formatted to strings to dodge tz/precision drift.

Scale notes are given per operator; the general ones:
- nation/region/supplier are broadcast-size at any SF — Catalyst already
  broadcasts under the 10MB threshold, AQE converts to broadcast at runtime
  when post-filter size shrinks;
- groupBy aggregations are partial (map-side combine) automatically;
- global windows (ORDER BY without PARTITION BY) are pre-trimmed with
  TakeOrderedAndProject where the query allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- B7/B8/B11
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style grouped aggregation (B7 agg functions, B8 GROUP BY,
    B11 ORDER BY) — the aggregation surface enforced by the reference's
    validator (app/ai/nl2sql.py:178-214, app/ai/query_intent.py:61-91).

    Scale: single shuffle on (l_returnflag, l_linestatus) — 6 groups, so
    partial aggregation collapses ~all rows map-side; filter + 7-column
    projection push down to the parquet scan.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------------------ B1/B2/B11/B12
def q02_filter_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicates (=, BETWEEN, IN) + ORDER BY + LIMIT —
    B1/B2/B11/B12 (FILTERED/COMPLEX_FILTER intents,
    app/ai/query_intent.py:123-146; LIMIT injection nl2sql.py:299-306).

    Scale: filter and 4-column projection reach the parquet reader
    (PushedFilters); ORDER BY+LIMIT plans as TakeOrderedAndProject —
    no global sort materialization.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(50000, 100000)
            & F.col("o_orderstatus").isin("O", "F")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------- B6/B7/B8/B11/B12
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style 3-way FK join + grouped agg + top-N — the explicit
    JOIN..ON surface the reference enforces (app/ai/nl2sql.py:70,231-245;
    FK-join template inference.py:236-244).

    Scale: the filtered customer side shrinks ~5x (one mktsegment) — AQE
    re-plans the orders⨝customer join to broadcast when the build side
    fits; lineitem joins orders on its natural key so bucketing both on
    orderkey would make it shuffle-free on a real cluster.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ----------------------------------------------------------------------- B3
def q04_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text match LIKE/ILIKE with wildcards — B3 (TEXT_SEARCH intent,
    app/ai/query_intent.py:197-207).

    Scale: LIKE '%..%' can't push to parquet min/max stats but stays in
    whole-stage codegen; for selective prefixes Spark pushes StringStartsWith.
    """
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").ilike("%red%") | F.col("p_name").like("%blue%"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


# ------------------------------------------------------------------- B4/B6
def q05_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL predicate over an outer join — B4 (NULL_HANDLING intent,
    app/ai/query_intent.py:244-254): customers with no pending ('P') order.

    Scale: the pending-orders side is filtered then distinct-ed before the
    join (small build side → broadcast); equivalently expressible as
    left_anti (q16) which Spark turns into a broadcast anti join.
    """
    c = _t(spark, sf_dir, "customer")
    pending = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(pending, c.c_custkey == pending.o_custkey, "left")
        .filter(F.col("o_custkey").isNull())
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ------------------------------------------------------------------- B5/B8
def q06_date_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range filter + month truncation rollup — B5 (DATE_TIME intent,
    app/ai/query_intent.py:183-195).

    Scale: the shipdate range predicate pushes down to parquet row-group
    min/max pruning; on a date-partitioned lake layout this is partition
    pruning (reads 1/7 of the table here).
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM").alias(
                "ship_month"
            )
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_month")
    )


# ----------------------------------------------------------------------- B9
def q07_window_partition_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows alongside a partitioned window aggregate — B9 (WINDOW_FUNCTION
    intent "along with/compared to", app/ai/query_intent.py:93-104;
    AVG() OVER (PARTITION BY ...) pattern inference.py:171-178).

    Scale: one shuffle on the partition key; no global sort. Skewed
    partition keys would engage AQE skew handling.
    """
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.round(F.avg("c_acctbal").over(w), 4).alias("nation_avg_bal"),
    ).orderBy("c_custkey")


# ----------------------------------------------------------- B10/B11/B12
def q08_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows RANK()/ROW_NUMBER() OVER (ORDER BY ...) — B10
    (RANKING intent, app/ai/query_intent.py:221-230).

    Scale: a bare ``Window.orderBy`` sorts the ENTIRE table on one
    partition. Instead we pre-trim with orderBy+limit — Spark plans it as
    TakeOrderedAndProject (each partition keeps its local top-50, the
    driver merges) — and rank only the 50-row slice. Global ranks survive
    the trim: rank() counts rows with strictly greater price, and every
    such row sorts ahead of the slice member in (price DESC, orderkey)
    order, so it is already inside the slice; boundary ties outside the
    slice never affect in-slice ranks. The window runs partitionBy(lit)
    over the trimmed slice — a deliberate single 50-row partition, with
    no WindowExec "moving all data to a single partition" hazard.
    """
    o = _t(spark, sf_dir, "orders")
    top = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )
    # partition key that is 0 everywhere but NOT foldable: a literal
    # lit(0) gets constant-folded out of the window spec and WindowExec
    # then warns about (and plans) a global single-partition sort again.
    one = F.col("o_orderkey") * F.lit(0)
    return top.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank()
        .over(Window.partitionBy(one).orderBy(F.desc("o_totalprice")))
        .alias("price_rank"),
        F.row_number()
        .over(Window.partitionBy(one).orderBy(F.desc("o_totalprice"), "o_orderkey"))
        .alias("rn"),
    ).orderBy("rn")


# ---------------------------------------------------------------------- B13
def q09_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — B13 (DISTINCT intent, app/ai/query_intent.py:233-242;
    enforced at nl2sql.py:269-278).

    Scale: distinct on a low-cardinality column is a partial-agg shuffle of
    ~#distinct rows per partition, not the data size.
    """
    return (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .orderBy("segment")
    )


# ---------------------------------------------------------------------- B14
def q10_union_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier names — B14 (UNION intent,
    app/ai/query_intent.py:257-272; sg.exp.Union admitted nl2sql.py:288).
    SQL UNION == df.union().distinct(); UNION ALL == df.union().
    """
    c = _t(spark, sf_dir, "customer").select(F.col("c_name").alias("name"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    return c.union(s).distinct().orderBy("name")


# ---------------------------------------------------------------------- B15
def q11_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery comparison — B15 (COMPARISON intent,
    app/ai/query_intent.py:274-283): orders above the average total price.
    Runs through spark.sql so Catalyst's subquery machinery is exercised.

    Scale: the scalar subquery is an independent 1-row agg broadcast into
    the filter — two scans of orders; at scale you'd cache or pre-compute
    the aggregate (the profiler's stats store covers this).
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


# ------------------------------------------------------------------ B16/B6
def q12_cte_nation_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE (WITH) over a 3-way join — B16 (sg.exp.With admitted,
    app/ai/nl2sql.py:288).

    Scale: nation (25 rows) broadcasts; orders⨝customer shuffles on the FK
    key — bucketing both by custkey makes it co-located.
    """
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(
        """
        WITH nation_sales AS (
          SELECT n_name, sum(o_totalprice) AS ts, count(*) AS n_orders
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT n_name, round(ts, 2) AS total_sales, n_orders
        FROM nation_sales
        ORDER BY total_sales DESC, n_name
        """
    )


# ---------------------------------------------------------------------- B17
def q13_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation — B17 (keyword admitted by the SQL
    extractor, app/ai/nl2sql.py:121).
    """
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return (
        o.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------------- B7/B8
def q14_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING — grouped aggregation with a post-agg filter
    (GROUPED_AGGREGATION intent, app/ai/query_intent.py:78-91).
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .filter(F.col("n_items") > 10)
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------- B15
def q15_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left-semi join — B15 (SUBQUERY intent,
    app/ai/query_intent.py:209-219): customers with ≥1 urgent order.

    Scale: left_semi avoids materializing the join multiplicity; Spark
    plans broadcast-semi when the filtered side is small.
    """
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------- B15
def q16_not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti join: parts never shipped in quantity ≥ 49."""
    p = _t(spark, sf_dir, "part")
    big = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        p.join(big, p.p_partkey == big.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# ------------------------------------------------------------- A3/A5/A7
def q17_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiler-style single-pass stats (row count A3, distinct count A5,
    min/max/avg A7 — app/schema/crawler.py:200-271) batched into ONE
    aggregation pass, unlike the reference's one-query-per-stat crawl.

    Scale: exact COUNT(DISTINCT) shuffles; the profiler proper
    (operators/profiler.py) uses approx_count_distinct — here exact is kept
    because the oracle must match bit-for-bit.
    """
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------- A6
def q18_categorical_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical domain enumeration — SELECT DISTINCT c ORDER BY c LIMIT
    100 when distinct count is small (app/schema/crawler.py:248-252).
    """
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("value"))
        .distinct()
        .orderBy("value")
        .limit(100)
    )


# ------------------------------------------------------- B5/B7/B8 (events)
def q19_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (hourly) aggregation over the events table — the
    batch equivalent of the Structured Streaming path (SURVEY.md §2.D);
    streaming/events.py runs the same plan with readStream + watermark.

    Scale: single shuffle on (hour, event_type); on a real stream this is
    incremental state, here date_trunc keeps it a plain groupBy.
    """
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-cents arithmetic: values are 2-decimal, so the cent
            # sum is an exact integer and the average is an integer
            # HALF-UP division — double avg() lands EXACTLY on round-4
            # ties (e.g. sum/32 = x.xxx75) where Spark's BigDecimal and
            # DuckDB's float-multiply round() disagree (found by the
            # sf0.1 oracle sweep; 3/3600 rows flipped)
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("__cents"),
        )
        .select(
            "hour_start",
            "event_type",
            "n_events",
            F.round(F.col("__cents") / 100.0, 2).alias("sum_value"),
            (
                F.expr("(__cents * 100 + n_events div 2) div n_events")
                / 10000.0
            ).alias("avg_value"),
        )
        .orderBy("hour_start", "event_type")
    )


# ----------------------------------------------------- semi-structured JSON
def q20_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column — the Mongo-analog
    semi-structured path (nested values stored as JSON strings, mirroring
    app/ai/nl2mongo.py:220-222's flattening).
    """
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select((k % 10).alias("k_mod"), "value")
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("k_mod")
    )


# ------------------------------------------------------------------ pivot
def q21_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (CASE WHEN inside SUM) — the
    portable form of df.groupBy().pivot(); B7/B17 combination.
    """
    o = _t(spark, sf_dir, "orders")

    def status_total(s: str):
        return F.round(
            F.sum(F.when(F.col("o_orderstatus") == s, F.col("o_totalprice")).otherwise(0.0)),
            2,
        )

    return (
        o.groupBy("o_orderpriority")
        .agg(
            status_total("O").alias("open_total"),
            status_total("F").alias("fulfilled_total"),
            status_total("P").alias("pending_total"),
        )
        .orderBy("o_orderpriority")
    )


# ----------------------------------------------------------------- rollup
def q22_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP over the region→nation hierarchy — beyond the
    reference's generated surface (SURVEY.md §2.D notes grouping sets as
    absent there), native in Spark and required of a complete engine.

    Scale: rollup = grouping-sets expansion before the shuffle; broadcast
    joins for the two dim tables keep it one fact-table pass.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


# ------------------------------------------------------------ set ops (§2.D)
def q41_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — set-op beyond the reference's generated surface
    (SURVEY.md §2.D: admitted by the S1 gate's Union kind, executed
    natively). Nations having BOTH customers and suppliers.

    Scale: INTERSECT plans as a left-semi join over distinct keys —
    shuffle carries only the small distinct sets.
    """
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


def q42_except_unordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — parts never shipped in a high-quantity (≥ 49) lineitem:
    the set-op twin of q16's NOT EXISTS, planned as an anti join over
    distinct keys (non-empty at every test SF, unlike parts-with-no-
    lineitem which is empty above sf0.001)."""
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    l = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select(F.col("l_partkey").alias("partkey"))
    )
    # subtract = EXCEPT DISTINCT → a single left-anti join (p_partkey is
    # unique, so ALL vs DISTINCT semantics coincide); exceptAll would
    # plan the generic union+count algorithm with three exchanges
    return p.subtract(l).orderBy("partkey")


# -------------------------------------------------------- §2.D extensions
def q48_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all four grouping-set combinations
    in one pass (SURVEY.md §2.D: grouping sets never generated by the
    reference, native in Spark). Partial aggregation expands grouping
    ids map-side; one shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q49_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per order status (B7 extension).

    Scale note: exact percentiles sort each group's values — the
    profiler-grade alternative is approx_percentile (t-digest sketch,
    map-side mergeable); exact is kept here because the oracle must
    match bit-for-bit.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


# -------------------------------------------------------------- Q5 analog
def q83_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style SIX-table star join (region→nation→supplier ⨝
    lineitem ⨝ orders ⨝ customer with the local-supplier co-nation
    predicate) — the widest join shape the generated-SQL surface can
    produce, and the canonical join-ordering test.

    Scale: region/nation/supplier form a dimension chain that filters
    to ONE region before touching facts — Catalyst collapses it into
    broadcast hash joins (asserted by the plan contract), so the only
    shuffles are the two fact-fact joins (lineitem⨝orders on orderkey,
    +customer on custkey) and the final 25-key aggregate. Bucketing
    lineitem+orders on orderkey makes the big join shuffle-free on a
    real cluster (sources/bucketing.py).
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ------------------------------------------------- r4 TPC-H join analogs
def q93_binational_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bi-national shipping volume: revenue shipped
    between supplier nation NATION_3 and customer nation NATION_7 (both
    directions), by year. The nation table is joined TWICE under
    different roles — the alias-resolution shape the generated-SQL
    surface's multi-join validator must admit.

    Scale: both nation sides broadcast; the disjunctive nation-pair
    predicate is applied AFTER the dimension joins but Catalyst pushes
    the per-side ``isin`` prefilters into the supplier/customer scans
    (each side can only match one of two nations), so the fact shuffles
    carry ~2/25ths of the rows. One 4-group aggregate at the end.
    """
    n_pair = ("NATION_3", "NATION_7")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    ).filter(F.col("supp_nation").isin(*n_pair))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    ).filter(F.col("cust_nation").isin(*n_pair))
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q94_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item report: top customers by lost
    revenue from RETURNED lineitems in a one-quarter order window.

    Scale: the orderdate window filter is pushed to the orders scan and
    l_returnflag='R' to the lineitem scan before either shuffle; the
    final TOP-20 is TakeOrderedAndProject after a customer-grain
    aggregate (nation broadcast).
    """
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        # exact-cents sum (q19's convention): the per-item discounted
        # price is rounded to cents BEFORE summing, so both engines add
        # identical integers — a raw double sum can land within an ulp
        # of the .xx5 rounding boundary and flip the 2dp digit
        # (observed: 307843.595 at sf0.01)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("__cents")
        )
        .select(
            "c_custkey", "c_name",
            F.round("c_acctbal", 2).alias("acctbal"), "n_name",
            F.round(F.col("__cents") / 100.0, 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q95_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer distribution: how many customers placed
    exactly k orders, INCLUDING the zero-order customers (LEFT join +
    count of the nullable side — the outer-join/count-null semantics
    the reference's validator admits via LEFT JOIN).

    Scale: two aggregates — per-customer count (shuffle on custkey,
    map-side partial) then the tiny histogram aggregate; no windows.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


def q96_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume orders: orders whose total lineitem
    quantity exceeds 300, with customer attribution — the
    aggregate-HAVING-as-join-input shape (the inner GROUP BY feeds a
    fact-fact join).

    Scale: the quantity rollup reduces lineitem to order grain BEFORE
    joining orders/customer, so the expensive join sees only the
    having-survivors; top-100 via TakeOrderedAndProject.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"), "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(100)
    )


def q97_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style market share: of all revenue delivered to ASIA
    customers, the fraction supplied by NATION_5, per order year —
    conditional aggregation (CASE inside SUM) over the six-table star.

    Scale: same broadcast-dimension star as q83; the share division
    happens on the 2-row yearly aggregate.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_c = _t(spark, sf_dir, "nation")  # customer-side nation (region scoped)
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == n_c.n_nationkey)
        .join(F.broadcast(r), n_c.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q98_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style global-sales-opportunity: customers with an
    above-average positive balance and NO orders in the corpus's final
    year (the synthetic data has complete FK coverage, so the original
    never-ordered predicate is empty at every SF — the lapsed-customer
    variant keeps the same scalar-subquery + anti-join + aggregate
    shape non-hollow), rolled up by market segment.

    Scale: the scalar average is a broadcast 1-row aggregate; the anti
    join's date filter pushes to the orders scan before the distinct
    custkey side is built; final 5-row aggregate.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


def q121_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion effect: per ship month of 1996, the
    percentage of lineitem revenue coming from PROMO-type parts — a
    conditional-aggregate ratio over a fact⨝dim join.

    Scale: the part dimension broadcasts with only (p_partkey, p_type)
    read; the 1996 ship-date range pushes to the lineitem scan; both
    the promo and total sums ride ONE aggregate (no second pass, no
    join of two aggregates). Exact-cents trick: revenue terms are
    summed as DECIMAL so the promo/total division is engine-identical.
    """
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo_sum = F.sum(
        F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(
            F.lit(0).cast("decimal(30,6)")
        )
    )
    total_sum = F.sum(rev_dec)
    # both sums are EXACT decimals; convert once to double and divide
    # there (decimal/decimal scale rules differ between engines)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * promo_sum.cast("double")
                / total_sum.cast("double"),
                4,
            ).alias("promo_share"),
            F.round(total_sum.cast("double"), 2).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


def q122_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: suppliers whose 1996-H1 shipped
    revenue equals the MAXIMUM per-supplier revenue — the aggregate-of-
    aggregate (scalar max over a grouped sum) shape Q15 expresses with
    a view.

    Scale: one revenue aggregate per supplier (date filter pushed to
    the fact scan), the 1-row max broadcasts back onto it, and the
    supplier dimension broadcasts for the name join. Revenue compared
    at exact DECIMAL cents so "equals the max" can't be lost to float
    summation order.
    """
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    per_supp = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_rev"))
    )
    mx = per_supp.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


def q123_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity-order revenue: yearly average
    revenue from lineitems whose quantity is below 50% of the average
    quantity FOR THAT PART — the correlated aggregate subquery Catalyst
    de-correlates into an aggregate + join.

    Scale: the per-part threshold is a WINDOW over the part key —
    ``sum/count OVER (PARTITION BY l_partkey)`` — so the fact table is
    scanned and the broadcast-dim join executed exactly ONCE (the
    aggregate+self-join de-correlation would consume the join twice:
    once for the threshold aggregate, once for the probe); the single
    shuffle on l_partkey serves the window directly. The "below half
    the part's average" compare is done in INTEGERS (2·qty·n < Σqty —
    quantities are integral) so the boundary can't flip on float
    summation order, and the revenue sum rides DECIMAL before the
    single final division.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    l = _t(spark, sf_dir, "lineitem")
    promo_items = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        promo_items.withColumn(
            "sum_qty", F.sum(F.col("l_quantity").cast("long")).over(w)
        )
        .withColumn("n_q", F.count(F.lit(1)).over(w))
        .filter(
            F.col("l_quantity").cast("long") * 2 * F.col("n_q")
            < F.col("sum_qty")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly"),
        )
    )


# -------------------------------------------------- window-function zoo
def q117_window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the window-function surface in one statement: LAG
    with default, LEAD, FIRST_VALUE over a running frame, LAST_VALUE
    over the full partition frame, CUME_DIST and NTILE — per-customer
    order history, limited to the busiest customers so the output stays
    gate-sized.

    Scale: one shuffle on o_custkey serves every window (same
    partitioning, one Sort); the busiest-customer prefilter is a
    semi-join against a 10-row broadcast aggregate.
    """
    o = _t(spark, sf_dir, "orders")
    top_custs = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "o_custkey")
        .limit(10)
        .select("o_custkey")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.join(F.broadcast(top_custs), "o_custkey")
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("price"),
            F.round(F.lag("o_totalprice", 1, 0.0).over(w), 2).alias(
                "prev_price"
            ),
            F.round(F.lead("o_totalprice", 1, 0.0).over(w), 2).alias(
                "next_price"
            ),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.last("o_totalprice").over(w_all), 2).alias(
                "last_price"
            ),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_ZOO_ORACLE_SQL = """
    WITH top_custs AS (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey ORDER BY count(*) DESC, o_custkey LIMIT 10
    )
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS price,
           round(coalesce(lag(o_totalprice, 1) OVER w, 0.0), 2)
               AS prev_price,
           round(coalesce(lead(o_totalprice, 1) OVER w, 0.0), 2)
               AS next_price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                 2) AS last_price,
           round(cume_dist() OVER w, 6) AS cd,
           ntile(4) OVER w AS quartile
    FROM orders SEMI JOIN top_custs USING (o_custkey)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
"""


def q118_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a GROUPING() discriminator — the
    general form behind ROLLUP (q22) and CUBE (q48): an arbitrary
    subset lattice ((status, priority), (status), ()) in ONE pass, the
    grouping id distinguishing which level each output row belongs to.

    Scale: identical execution to rollup/cube — map-side Expand over
    the requested sets, one shuffle; cheaper than 3 separate aggregates
    unioned because the scan runs once.
    """
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT)    AS g_status,
               CAST(grouping(o_orderpriority) AS INT)  AS g_priority,
               count(*)                                AS n_orders,
               round(sum(o_totalprice), 2)             AS total
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderstatus, o_orderpriority), (o_orderstatus), ()
        )
        ORDER BY g_status, g_priority,
                 o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


GROUPING_SETS_ORACLE_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT)    AS g_status,
           CAST(grouping(o_orderpriority) AS INT)  AS g_priority,
           count(*)                                AS n_orders,
           round(sum(o_totalprice), 2)             AS total
    FROM orders
    GROUP BY GROUPING SETS (
      (o_orderstatus, o_orderpriority), (o_orderstatus), ()
    )
    ORDER BY g_status, g_priority,
             o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# ------------------------------------------- TPC-H Q2/Q20/Q21 analogs (r5)
def q125_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier: for every LARGE part, the
    EUROPE supplier(s) whose observed unit price equals the MINIMUM unit
    price any EUROPE supplier charged for that part — the correlated
    scalar-min subquery Q2 writes per part. (The corpus has no partsupp
    table; the lineitem history IS the observed supply-cost relation:
    unit cost = Σ extendedprice / Σ quantity per (part, supplier).)

    Scale: the region-scoped supplier dimension broadcasts onto the
    fact scan, so only EUROPE rows survive map-side; ONE shuffle builds
    the (part, supplier) cost grain with map-side combine, and the
    per-part min is a window over that already-aggregated grain (its
    shuffle carries part×supplier rows, not lineitems) — the classic
    de-correlation Catalyst would produce from the subquery form, hand
    (de)clared so the fact table is scanned once. Determinism: both
    cost sums ride DECIMAL, the division happens once in IEEE double
    (identical operands → identical quotient in any engine), and the
    min-equality compares those exact doubles.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE").select(
        "p_partkey", "p_name"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    costs = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double"),
                4,
            ).alias("unit_cost")
        )
    )
    min_cost = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        costs.withColumn("min_cost", min_cost)
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name", "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


Q125_ORACLE_SQL = """
    WITH costs AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             s.s_acctbal, n.n_name,
             round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                   / CAST(sum(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE),
                   4) AS unit_cost
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'LARGE'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT round(s_acctbal, 2) AS s_acctbal,
           s_name, n_name, p_partkey, p_name, unit_cost
    FROM costs c
    WHERE unit_cost = (SELECT min(unit_cost) FROM costs c2
                       WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
"""


def q126_sole_returner_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style sole-failer: NATION_3 suppliers who, in orders
    involving MORE THAN ONE supplier, were the ONLY supplier whose item
    came back returned (``l_returnflag = 'R'``) — Q21's
    EXISTS(another supplier) AND NOT EXISTS(another failing supplier)
    double-correlation, counted per supplier. (The corpus carries no
    commit/receipt dates, so "kept waiting" maps to "returned".)

    Scale: the two correlated self-joins de-correlate into a TWO-LEVEL
    aggregate over ONE lineitem scan — (order, supplier) grain first
    (map-side combine collapses each order's lines per supplier;
    ``has_r`` = did this supplier return), then an order-partitioned
    WINDOW over that compacted grain where ``count(*)`` IS the
    distinct-supplier count and ``sum(has_r)`` the distinct-returner
    count; the sole returner of a qualifying order is its own per_os
    row (``has_r = 1``), so no probe back into the fact table is ever
    needed (the r5 review's second lineitem scan is gone) and
    ``numwait`` is a plain count of qualifying rows per supplier. This
    also avoids the double ``count(DISTINCT ...)`` form, whose
    single-pass plan Expands every lineitem row ×2 before the shuffle.
    The window input is the aggregate output — orders × suppliers
    rows, a fraction of lineitem — and the nation-scoped supplier
    dimension broadcasts. The oracle SQL keeps the literal
    EXISTS/NOT-EXISTS form as written proof of the equivalence.
    """
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    w = Window.partitionBy("l_orderkey")
    sole_returners = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_ret", F.sum("has_r").over(w))
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("n_ret") == 1)
            & (F.col("has_r") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        sole_returners.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q126_ORACLE_SQL = """
    SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


def q127_part_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style volume suppliers: suppliers who shipped more
    than 45 units of SOME single SMALL-type part during 1997 — the
    nested ``IN (SELECT ... GROUP BY ... HAVING sum(...))`` membership
    chain (part-list IN feeding a grouped-HAVING IN feeding the outer
    supplier list).

    Scale: the SMALL part list broadcasts as a semi-join onto the
    date-pruned fact scan (both predicates reach the parquet reader);
    the (supplier, part) quantity rollup is one slim-key shuffle with
    map-side combine; the surviving supplier keys form a distinct set
    that semi-joins the supplier dimension. No row ever travels with
    more than 3 columns.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select(
        "p_partkey"
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    volume_supps = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 45)
        .select("l_suppkey")
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(volume_supps, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q127_ORACLE_SQL = """
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
        AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 45
    )
    ORDER BY s_name
"""


def q129_measure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via the native ``DataFrame.unpivot`` (UNPIVOT):
    monthly lineitem measure sums pivoted into (month, measure, value)
    rows — the long format every per-metric training monitor and
    plotting/export surface wants, produced WITHOUT a UNION of
    re-scans.

    Scale: ONE aggregate pass builds the wide 12-row result; unpivot is
    a zero-shuffle Expand over those 12 rows (contrast the naive
    3-branch UNION ALL the oracle SQL spells out, which scans the fact
    table three times at 100 TB).
    """
    wide = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        )
    )
    return wide.unpivot(
        ids=["ship_month"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("ship_month", "measure")


Q129_ORACLE_SQL = """
    WITH wide AS (
      SELECT month(l_shipdate)              AS ship_month,
             round(sum(l_quantity), 2)      AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(sum(l_discount), 2)      AS sum_disc
      FROM lineitem
      WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      GROUP BY 1
    )
    SELECT ship_month, measure, value FROM (
      SELECT ship_month, 'sum_qty'   AS measure, sum_qty   AS value FROM wide
      UNION ALL
      SELECT ship_month, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT ship_month, 'sum_disc',  sum_disc  FROM wide
    ) ORDER BY ship_month, measure
"""


_LATERAL_TOPN_SQL = """
    SELECT n.n_name, t.o_orderkey, round(t.o_totalprice, 2) AS totalprice
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 3
    ) t
    ORDER BY n.n_name, totalprice DESC, t.o_orderkey
"""


def q131_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with per-row ORDER BY + LIMIT:
    the top-3 orders for EACH nation, written as the lateral subquery a
    SQL user reaches for (and many NL2SQL generators emit) instead of
    the window-rank rewrite. The SAME SQL text runs on both engines —
    this entry pins that Spark's lateral-join de-correlation (Catalyst
    rewrites the per-row LIMIT into a rank window under the hood, not a
    per-nation re-scan) is value-identical to DuckDB's lateral
    execution.

    Scale: check the plan, not the syntax — Spark executes ONE
    customer⨝orders join + ONE rank window partitioned by nation (25
    partitions), never 25 correlated executions; the nation table
    broadcasts.
    """
    register_views(spark, sf_dir, ("nation", "customer", "orders"))
    return spark.sql(_LATERAL_TOPN_SQL)


Q131_ORACLE_SQL = _LATERAL_TOPN_SQL


def q137_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive predicate revenue: lineitem⨝part
    revenue where ANY of three (brand, size-range, quantity-range)
    conjunct branches holds — the OR-of-ANDs shape that punishes naive
    planners (a per-branch UNION re-scans the fact table three times;
    a cross-join with post-filter is worse).

    Scale: ONE equi-join on p_partkey carries the whole disjunction as
    its join filter; the common sub-predicates (quantity ≥ 1, size ≥ 1)
    are implied per branch so Catalyst can push a weakened conjunct
    (quantity ≤ 36, the loosest upper bound) to the lineitem scan. The
    part dimension broadcasts.
    """
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    branch1 = (br == "Brand#1") & sz.between(1, 5) & q.between(1, 11)
    branch2 = (br == "Brand#2") & sz.between(1, 10) & q.between(10, 20)
    branch3 = (br == "Brand#3") & sz.between(1, 15) & q.between(20, 36)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(branch1 | branch2 | branch3)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
        .orderBy("p_brand")
    )


Q137_ORACLE_SQL = """
    SELECT p_brand,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 36)
    GROUP BY p_brand
    ORDER BY p_brand
"""


def q138_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style order-priority check: 1996 orders that have AT
    LEAST ONE lineitem shipped after mid-year, counted per priority —
    the date-scoped EXISTS whose efficient plan is a SEMI join (each
    order contributes once no matter how many lineitems qualify).

    Scale: both date filters push to their scans; the semi join
    shuffles only (orderkey) pairs and short-circuits per key — an
    inner join + distinct would shuffle every qualifying lineitem.
    """
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    late = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1996-07-01"
    ).select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q138_ORACLE_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= '1996-07-01')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


def q148_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style forecasting revenue change: one filtered scan,
    one global aggregate — the canonical predicate-pushdown benchmark
    (no join at all; the entire query is scan efficiency).

    Scale: all three predicates (ship year, discount band, quantity
    cap) reach the parquet scan as PushedFilters, so row groups outside
    the year are skipped on min-max stats alone; the aggregate is a
    map-side partial sum with a 1-row exchange. The discount×price
    product is summed as decimal(30,6) for cross-engine exactness.
    """
    l = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(30,6)"
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
    )


Q148_ORACLE_SQL = """
    SELECT count(*) AS n_items,
           round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6)))::DOUBLE, 2)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
"""


def q151_variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: the JSON
    column is parsed ONCE (``parse_json`` in a projection) and every
    extraction reads the binary variant (``variant_get``) — the
    parse-once/extract-many contract that replaces N repeated
    ``get_json_object`` string parses (q20's shape) with one. At 100 TB
    the difference is N-1 full JSON parses of every row.

    Missing paths go through ``try_variant_get`` (NULL, not an error) —
    the schema-drift-tolerant read a landing zone needs.
    """
    from ..sources.parquet import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "int")
    missing = F.try_variant_get("v", "$.absent", "int")
    return (
        e.select(
            "event_type",
            k.alias("k"),
            missing.alias("absent"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("k").alias("n_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.sum((F.col("k") % 2).cast("int")).alias("n_odd"),
            F.count("absent").alias("n_absent"),
        )
        .orderBy("event_type")
    )


Q151_ORACLE_SQL = """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS n_k,
           round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k,
           sum(CAST(json_extract(props, '$.k') AS INT) % 2)::BIGINT AS n_odd,
           count(json_extract(props, '$.absent')) AS n_absent
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


def q152_month_spine_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly order rollup via a RECURSIVE month spine
    (Spark 4 WITH RECURSIVE): the spine enumerates every calendar month
    between the corpus bounds, so months with ZERO orders appear as
    explicit 0 rows — the reporting contract a plain GROUP BY silently
    violates (its empty months just vanish; see the planted-gap
    pytest). The recursion is acyclic and bounded by the data's own
    max month (UNION ALL + monotone step — Spark does not yet support
    UNION-distinct recursion), and the spine is months-sized, so the
    recursive part is metadata-scale no matter how big the fact table;
    the counts side is one ordinary aggregate.

    The corpus bounds are pre-computed ONCE (a slim min/max aggregate,
    the same planner-side bounded action q156's cut-point collect
    documents) and inlined as date literals: written as correlated
    scalar subqueries inside the recursion, Spark re-evaluates the
    ``max(o_orderdate)`` subquery at EVERY recursive step — ~80 fact
    scans for an 80-month spine (measured 11.7 s at sf0.1 vs 0.5 s with
    literals; DuckDB caches the subquery, so only Spark paid it).
    """
    from ..sources.parquet import register_views

    register_views(spark, sf_dir)
    lo, hi = spark.sql(
        "SELECT CAST(min(o_orderdate) AS DATE), "
        "CAST(max(o_orderdate) AS DATE) FROM orders"
    ).collect()[0]
    if lo is None or hi is None:  # empty/all-NULL corpus: empty spine
        return spark.createDataFrame([], "month_key string, cnt bigint")
    return spark.sql(
        f"""
        WITH RECURSIVE spine(m) AS (
          SELECT date_trunc('month', DATE '{lo.isoformat()}')
          UNION ALL
          SELECT add_months(m, 1) FROM spine
          WHERE m < date_trunc('month', DATE '{hi.isoformat()}')
        ), c AS (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS month_key,
                 COUNT(*) AS n
          FROM orders GROUP BY month_key
        )
        SELECT date_format(spine.m, 'yyyy-MM') AS month_key,
               COALESCE(c.n, 0) AS cnt
        FROM spine LEFT JOIN c ON date_format(spine.m, 'yyyy-MM') = c.month_key
        ORDER BY month_key
        """
    )


Q152_ORACLE_SQL = """
    WITH RECURSIVE spine(m) AS (
      SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM spine
      WHERE m < date_trunc('month', (SELECT max(o_orderdate) FROM orders))
    ), c AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_key,
             count(*) AS n
      FROM orders GROUP BY month_key
    )
    SELECT strftime(spine.m, '%Y-%m') AS month_key,
           coalesce(c.n, 0)::BIGINT AS cnt
    FROM spine LEFT JOIN c ON strftime(spine.m, '%Y-%m') = c.month_key
    ORDER BY month_key
"""


def q153_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH decile histogram of order totalprice: NTILE(10) over
    a unique (value, key) order splits the table into ten equal-count
    buckets and reports each bucket's boundaries — the complement of
    q143's equi-WIDTH buckets (equi-depth adapts to the distribution;
    it is how engines build height-balanced stats histograms).

    The tie order is pinned by the unique o_orderkey so both engines
    assign identical tiles. One window shuffle (unpartitioned by
    necessity — a global ranking; the window carries only the two
    ranking columns) + a ten-row aggregate. At 100 TB you'd run the
    GK-sketch twin instead (q156_equidepth_histogram_sketch — one
    merged approx_percentile aggregate, no global sort); this exact
    form is that tier's oracle, and test_sketches.py pins the twin's
    per-bucket count deviation against the rank bound.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


Q153_ORACLE_SQL = """
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, count(*) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM t GROUP BY decile ORDER BY decile
"""


# Rank error of the equi-depth sketch cut points: <= n / ACC rows each.
# With ACC=1000 and 10 buckets, every bucket count sits within
# 2 * n/1000 of the ideal n/10 — the pytest contract.
EQUIDEPTH_SKETCH_ACC = 1000


def q156_equidepth_histogram_sketch(
    spark: SparkSession, sf_dir: str, n_buckets: int = 10,
    accuracy: int = EQUIDEPTH_SKETCH_ACC,
) -> DataFrame:
    """Sketch tier of q153's equi-depth histogram — the 100 TB path its
    docstring promises. Instead of NTILE's global sort (a single-reducer
    ranking no cluster survives at corpus scale), the nine interior cut
    points come from ONE map-side-combinable ``percentile_approx``
    aggregate (Spark's Greenwald–Khanna sketch: rank error
    <= n/accuracy, associatively merged across partitions), and bucket
    assignment is a broadcast of the 9-value cut array into a codegen
    projection over a second slim scan. Two scans, zero sorts, shuffles
    carry only partial aggregates.

    Buckets are left-closed on the cut points (value < cut_i → bucket
    i), so every bucket count deviates from n/n_buckets by at most
    2·n/accuracy — pinned against the exact q153 twin in
    test_sketches.py. Rows-only registry entry: DuckDB has no
    bit-identical GK sketch to hash against.
    """
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = o.agg(
        F.percentile_approx(
            "o_totalprice",
            F.array(*[F.lit(q) for q in qs]),
            F.lit(accuracy),
        ).alias("cuts")
    )
    # 9 values on the driver is metadata-scale; at 100 TB this is the
    # same bounded collect every histogram planner performs. NULL cuts
    # (empty/all-NULL column) degrade to a single bucket of nothing.
    cut_vals = cuts.collect()[0]["cuts"] or []
    bucket = F.lit(1)
    for c in cut_vals:
        bucket = bucket + F.when(F.col("o_totalprice") >= F.lit(c), 1).otherwise(0)
    return (
        o.withColumn("decile", bucket)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------- r6 analogs
# The last four TPC-H shapes expressible on this corpus's columns
# (there is no partsupp table, no l_shipmode/commit/receipt dates —
# each analog's docstring names the substitution). With these, every
# TPC-H query whose inputs exist in the schema has an analog in the
# registry: Q1-Q22 minus nothing.


def q160_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit: revenue from 'red' parts per
    (supplier nation, order year). Substitution: the corpus has no
    partsupp.ps_supplycost, so profit = revenue (the join/aggregation
    shape — a fact scan against THREE dimensions plus the orders date
    source — is what Q9 exercises).

    Scale: part (name-filtered), supplier and nation all broadcast —
    the only shuffle is lineitem⋈orders on orderkey (two fact-sized
    sides, the unavoidable one) followed by a partial-aggregated
    groupBy on (nation, year). Decimal-exact revenue sum.
    """
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(30,6)")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q160_ORACLE_SQL = """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(30,6)))::DOUBLE, 2) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
"""


def q161_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock: parts whose total revenue
    exceeds 1.1× the average per-part revenue — the GROUP BY + HAVING
    sum > (scalar subquery over the same aggregate) shape.
    Substitution: no partsupp, so "value held" is lineitem revenue.

    Scale: Q11's trap is computing the threshold with a SECOND fact
    scan; here the per-part aggregate is computed ONCE and the global
    threshold derives from that part-grain frame (a parts-sized
    intermediate, not the fact table) via a 1-row broadcast cross join.
    AQE reuses the aggregate's shuffle for both consumers
    (ReusedExchange, asserted on the executed plan in
    test_relational_oracle.py), so lineitem is scanned once at runtime
    even though the static plan prints the subtree twice.
    """
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(30,6)")
    per_part = l.groupBy("l_partkey").agg(F.sum(rev).alias("value"))
    # localCheckpoint would also work; reusing the lazy frame twice is
    # fine because BOTH consumers sit above the same aggregate — Spark
    # reuses the exchange (ReusedExchange in the plan), so lineitem is
    # still scanned once
    thresh = per_part.agg(
        (F.avg(F.col("value").cast("double")) * 1.1).alias("__t")
    )
    return (
        per_part.crossJoin(F.broadcast(thresh))
        .filter(F.col("value").cast("double") > F.col("__t"))
        .select(
            "l_partkey",
            F.round(F.col("value").cast("double"), 2).alias("value"),
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


Q161_ORACLE_SQL = """
    WITH per_part AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                 AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(value::DOUBLE, 2) AS value
    FROM per_part
    WHERE value::DOUBLE > (SELECT avg(value::DOUBLE) * 1.1 FROM per_part)
    ORDER BY value DESC, l_partkey
"""


def q162_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style shipping-mode audit: per delay band (shipped
    within 30 days of the order vs later), how many line items belong
    to critical-priority orders vs not — Q12's CASE-sum-over-join
    shape. Substitution: the corpus has no l_shipmode/commit/receipt
    dates, so the grouping key is the ship-delay band and "late" is
    ship minus order date.

    Scale: one equi-join shuffle (lineitem⋈orders on orderkey, both
    sides slim projections), the band is a codegen date_diff CASE, the
    CASE-sums ride map-side partial aggregation into a 2-row result.
    """
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 30
    # coalesce: a NULL priority must count as normal (the oracle's CASE
    # ELSE branch), not vanish from sum() as a NULL boolean would
    crit = F.coalesce(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(False)
    )
    return (
        l.join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(
            F.when(late, F.lit("late")).otherwise(F.lit("on_time"))
            .alias("delay_band")
        )
        .agg(
            F.sum(crit.cast("long")).alias("critical_count"),
            F.sum((~crit).cast("long")).alias("normal_count"),
        )
        .orderBy("delay_band")
    )


Q162_ORACLE_SQL = """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30
                THEN 'late' ELSE 'on_time' END AS delay_band,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS critical_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS normal_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY delay_band
    ORDER BY delay_band
"""


def q163_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style parts/supplier relationship: how many distinct
    suppliers have shipped each (brand, type, size) combination,
    excluding one brand, one type prefix, and "complaint" suppliers
    (NOT IN subquery — substituted as negative account balance, the
    corpus's only supplier-quality signal).

    Scale: the exclusion list is dimension-sized (collected once,
    broadcast as an anti-join), part broadcasts into the fact scan, and
    the countDistinct runs on the (brand, type, size, suppkey)
    pre-deduplicated grain — one Expand-free distinct aggregate.
    """
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#2")
            & ~F.col("p_type").like("ECONOMY%")
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("__bad"))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("__bad"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


Q163_ORACLE_SQL = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type NOT LIKE 'ECONOMY%'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""
