"""Skew mitigation — salting utilities for the hot-key cases AQE can't
fix (builder-brief scale requirement; no reference analog).

AQE's skew-join splitting (enabled in session.py) handles most joins at
runtime, but two shapes still bottleneck on one reducer at 100 TB:

- aggregations with per-group state that partial aggregation can't
  collapse (collect_list / countDistinct on a hot key) — one reducer
  owns the whole hot group;
- broadcast-ineligible joins where one fact key holds a double-digit
  percentage of rows.

Both are fixed by salting: spread the hot key over N sub-keys, do the
heavy work per (key, salt), then combine. Everything below is pure
DataFrame ops, and each utility is equality-tested against its naive
counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_col(unique_col: Column, n: int = DEFAULT_SALTS) -> Column:
    """Deterministic salt in [0, n) derived from any high-cardinality
    column (deterministic > rand(): retries/speculative tasks stay
    consistent and tests are reproducible)."""
    return F.pmod(F.xxhash64(unique_col), F.lit(n)).cast("int")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n: int = DEFAULT_SALTS
) -> DataFrame:
    """countDistinct(value) per key via two-phase salting.

    Phase 1 shuffles on (key, salt(value)) — the hot key's values spread
    over n reducers, each computing a partial distinct set; because the
    salt is derived FROM the value, a value lands in exactly one salt
    bucket and partial distinct counts add up exactly.
    """
    partial = (
        df.select(F.col(key), F.col(value), salt_col(F.col(value), n).alias("__salt"))
        .groupBy(key, "__salt")
        .agg(F.countDistinct(value).alias("__dc"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("__dc").cast("long").alias("n_distinct"))
        .orderBy(key)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n: int = DEFAULT_SALTS,
    fact_unique: str | None = None,
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a salt derived from a
    unique column (row spread), the dim side is replicated n times with
    every salt value, and the join runs on (key, salt) — the hot key's
    rows land on n reducers instead of one.

    Dim replication costs n× a (small) dim — the standard trade. Output
    columns match ``fact.join(dim, fact_key == dim_key)``.
    """
    uniq = F.col(fact_unique) if fact_unique else F.monotonically_increasing_id()
    f = fact.withColumn("__salt", salt_col(uniq, n))
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n)])))
    out = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"])
    )
    return out.drop("__salt")


def q113_salted_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable salting demo: orders ⨝ customer through the
    salted join, rolled up per market segment — the oracle is the PLAIN
    SQL join, because salting must be semantically invisible (it only
    moves rows across reducers). Registry twin of the pytest-only
    equivalence asserts, so the skew substrate is externally verified
    too.

    Scale note: the dim side here (customer) is replicated n× — at real
    skew you salt the HOT side's partner; the demo keys on o_custkey
    exactly as a hot-customer workload would (q91 is the diagnosis
    input that picks n).
    """
    from ..sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(
        o, c, "o_custkey", "c_custkey", n=8, fact_unique="o_orderkey"
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("total_sales"),
        )
        .orderBy("c_mktsegment")
    )


SALTED_SEGMENT_ORACLE_SQL = """
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total_sales
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


# ------------------------------------------------- join-key skew audit
def hotkey_audit(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """Pre-flight join-key distribution audit: the top keys by row
    count with their share of the table and their skew factor (count ÷
    mean count per key) — the report that decides, BEFORE a 100 TB
    join launches, whether the key needs salting (skew.py), an AQE
    skew split, or is safe as-is.

    Plan shape: ONE shuffle builds the per-key counts (map-side
    combine); the key-grain frame then feeds (a) a 1-row global
    aggregate (broadcast back) and (b) a TakeOrderedAndProject top-N —
    neither re-scans the fact table. At 100 TB the counts frame is
    keys-sized; nothing driver-side but the top-N rows.
    """
    freq = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = freq.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        freq.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total_rows"), 6).alias("share"),
            F.round(
                F.col("n") / (F.col("total_rows") / F.col("n_keys")), 4
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(top)
    )


def q150_hotkey_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key audit of lineitem's supplier join key (oracle-checked)."""
    from ..sources.parquet import load_table

    return hotkey_audit(
        load_table(spark, sf_dir, "lineitem"), "l_suppkey", top=10
    )


HOTKEY_ORACLE_SQL = """
    WITH freq AS (
      SELECT l_suppkey AS key, count(*) AS n
      FROM lineitem GROUP BY l_suppkey
    ), t AS (
      SELECT sum(n) AS total_rows, count(*) AS n_keys FROM freq
    )
    SELECT key, n,
           round(n / t.total_rows, 6) AS share,
           round(n / (t.total_rows / t.n_keys), 4) AS skew_factor
    FROM freq, t
    ORDER BY n DESC, key
    LIMIT 10
"""


# -------------------------------------- heavy hitters without a shuffle
CMS_EPS, CMS_CONF, CMS_SEED = 1e-4, 0.99, 42


def hotkey_audit_sketch(
    df: DataFrame,
    key_col: str,
    sample_cols: list[str],
    top: int = 10,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONF,
    sample_mod: int = 100,
) -> DataFrame:
    """Sketch tier of :func:`hotkey_audit` — heavy hitters WITHOUT the
    per-key counts shuffle. The exact audit's one shuffle is keys-sized
    and usually fine; at 100 TB with a high-cardinality key (billions of
    distinct values) even the counts exchange is worth skipping, and
    this is the standard count-min + candidate-sample recipe for that:

    - ONE map-side-combinable aggregate builds a count-min sketch over
      the key column (sketches merge associatively across partitions —
      nothing keyed ever shuffles) plus the exact total row count;
    - candidates come from a deterministic ~1/sample_mod row sample
      (xxhash64 of ``sample_cols`` — reproducible across retries, unlike
      rand()), counted within the sample only (a sample-sized shuffle);
      any key holding >= a few×sample_mod rows appears in the sample
      with overwhelming probability, so true heavy hitters can't hide;
    - each candidate is probed against the sketch on the driver for its
      CORRECTED full-table estimate, and the top-N by estimate ship.

    Accuracy contract (pinned vs the exact twin in test_skew.py): CMS
    never undercounts, and overcounts by <= e·eps·N with probability
    ``confidence`` — at eps=1e-4 that is <=0.03% of the table per key.
    Driver memory: width ceil(e/eps)=27183 × depth 5 longs ≈ 1.1 MB —
    the sketch is the only thing collected besides the top rows. Keys
    probe as strings (CMS hashes by runtime type; a Python int would
    arrive as Integer and miss the Long buckets).

    Scan count: the sketch pass and the candidate-sample pass are TWO
    actions, so the slim (key, hash) projection — ~16 bytes/row, the
    only columns either pass reads — is persisted MEMORY_AND_DISK
    between them: the fact table's full columns are scanned ONCE, and
    the second pass reads the cached projection (spilling to local
    disk at 100 TB rather than re-reading the source). The sample
    count genuinely cannot fold into the sketch aggregate: the sample
    pass needs a per-key groupBy on ~1/sample_mod of the rows, while
    the whole point of the sketch pass is that nothing keyed shuffles.
    """
    from pyspark import StorageLevel

    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.xxhash64(*[F.col(c) for c in sample_cols]).alias("__h"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        agg = keyed.agg(
            F.count_min_sketch(
                F.col("key"), F.lit(eps), F.lit(confidence), F.lit(CMS_SEED)
            ).alias("s"),
            F.count(F.lit(1)).alias("total"),
        ).collect()[0]
        total = agg["total"]
        spark = df.sparkSession
        if total == 0:
            # empty input: no candidates, no shares to compute (and
            # n/total below would divide by zero) — clean empty result
            return spark.createDataFrame(
                [], "key string, n_est long, share_est double"
            )
        jvm = spark._jvm  # noqa: SLF001
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(agg["s"]))
        )
        candidates = [
            r["key"]
            for r in keyed.filter(F.pmod(F.col("__h"), sample_mod) == 0)
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_sample"))
            .orderBy(F.desc("n_sample"), "key")
            .limit(top * 5)
            .collect()
        ]
    finally:
        keyed.unpersist()
    est = sorted(
        ((k, int(sk.estimateCount(k))) for k in candidates),
        key=lambda kv: (-kv[1], kv[0]),
    )[:top]
    return spark.createDataFrame(
        [(k, n, round(n / total, 6)) for k, n in est],
        "key string, n_est long, share_est double",
    )


def q165_hotkey_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS heavy-hitter tier over lineitem's supplier key (rows-only:
    q150 is the exact oracle; the never-undercount / eps-bounded
    overcount contract is pinned in test_skew.py)."""
    from ..sources.parquet import load_table

    return hotkey_audit_sketch(
        load_table(spark, sf_dir, "lineitem"),
        "l_suppkey",
        sample_cols=["l_orderkey", "l_linenumber"],
        top=10,
    )
