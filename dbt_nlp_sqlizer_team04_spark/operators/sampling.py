"""Deterministic sampling / split operators — builder-brief extension
for LLM training-data pipelines (no reference analog; SURVEY.md §2.D —
the reference delegates all row selection to Postgres/Mongo and has no
dataset-splitting notion).

A training corpus needs reproducible train/val/test assignment and
stratified subsampling that (a) never shuffles, (b) is stable across
runs, cluster sizes, and partitionings, and (c) can be re-derived by any
other engine auditing the corpus.  All operators here key off
``md5(key)`` — a content-addressed bucket in [0, BUCKETS) computed as a
pure JVM projection (``conv(substring(md5(k),1,8),16,10) % BUCKETS``),
so at 100 TB the split is a narrow map over the scan with zero shuffle
and zero state, and DuckDB/Postgres reproduce it bit-for-bit from the
same expression (the oracle for q50/q51 does exactly that).

Why md5 and not ``xxhash64``/``rand``: Spark's xxhash64 has no DuckDB
analog (see the rows-only q24/q28 precedent), and ``rand`` is seed- and
partitioning-dependent.  md5 is in every engine and the 8-hex-char
prefix (32 bits) is plenty of resolution for million-bucket splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table

# Bucket space for hash assignment.  2^32 hash values fold onto 1e6
# buckets; the fold bias is < 0.025% per bucket — negligible against
# the ±1/sqrt(n) sampling noise of any real stratum.
BUCKETS = 1_000_000


def hash_bucket_expr(key: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of ``key``.

    Pure whole-stage-codegen expression; the DuckDB twin is
    ``('0x' || substr(md5(k::varchar), 1, 8))::bigint % buckets``.
    """
    hex8 = F.substring(F.md5(key.cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("bigint") % buckets).alias("bucket")


def hash_bucket_sql(key_sql: str, buckets: int = BUCKETS) -> str:
    """DuckDB-side twin of :func:`hash_bucket_expr` (oracle building)."""
    return f"(('0x' || substr(md5(({key_sql})::varchar), 1, 8))::bigint % {buckets})"


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: list[tuple[str, float]] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test ``split`` column.

    ``weights`` is an ordered list of (name, fraction); fractions must
    sum to 1.  A row's split is decided solely by ``md5(key)`` — stable
    under repartitioning, appends, and engine changes.  No shuffle: the
    assignment is a projection fused into the scan.
    """
    weights = weights or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket_expr(F.col(key_col))
    expr: Column | None = None
    acc = 0.0
    # CASE WHEN bucket < t1 THEN name1 WHEN bucket < t2 ... ELSE last.
    for name, w in weights[:-1]:
        acc += w
        cond = bucket < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def split_case_sql(
    key_sql: str, weights: list[tuple[str, float]] | None = None
) -> str:
    """DuckDB CASE expression mirroring :func:`split_assign`."""
    weights = weights or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    b = hash_bucket_sql(key_sql)
    parts = ["CASE"]
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        parts.append(f"WHEN {b} < {int(round(acc * BUCKETS))} THEN '{name}'")
    parts.append(f"ELSE '{weights[-1][0]}' END")
    return " ".join(parts)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | None = None,
    strata_col: str | None = None,
    strata_fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic (md5-keyed) sample; optionally per-stratum rates.

    With ``fraction`` alone: keep rows whose bucket < fraction·BUCKETS —
    a uniform, reproducible sample with no shuffle and no seed state.
    With ``strata_col`` + ``strata_fractions``: per-stratum thresholds
    via a literal map lookup (still a pure projection).  Unlisted strata
    fall back to ``fraction`` (or 0.0 — dropped — when not given).

    Unlike ``df.sample``, the selection is content-addressed: re-running
    on a re-partitioned or appended corpus keeps the same rows, which is
    what corpus reproducibility audits need.
    """
    bucket = hash_bucket_expr(F.col(key_col))
    if strata_col is None:
        if fraction is None:
            raise ValueError("fraction required when strata_col is None")
        return df.where(bucket < int(round(fraction * BUCKETS)))
    strata_fractions = strata_fractions or {}
    default = int(round((fraction or 0.0) * BUCKETS))
    mapping: list[Column] = []
    for k, v in sorted(strata_fractions.items()):
        mapping.extend([F.lit(k), F.lit(int(round(v * BUCKETS)))])
    thresh = (
        F.coalesce(
            F.create_map(*mapping)[F.col(strata_col)], F.lit(default)
        )
        if mapping
        else F.lit(default)
    )
    return df.where(bucket < thresh)


# ----------------------------------------------------------------- queries
def q50_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus split audit: per-split doc count and exact char volume.

    Oracle-checked — DuckDB re-derives the identical assignment from the
    shared md5-bucket expression.  Plan shape: scan → project(split) →
    partial agg → 3-group exchange; at 100 TB the only shuffled rows are
    the per-partition partials.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        split_assign(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


def q51_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic 20% sample (src0 boosted to 50%), audited
    as per-source kept-row counts + exact char volume. Oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "doc_id",
        fraction=0.2,
        strata_col="source",
        strata_fractions={"src0": 0.5},
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


def source_mixing_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    budget_num: int = 1,
    budget_den: int = 4,
) -> DataFrame:
    """Temperature-weighted source mixing (sqrt scaling, α = 0.5).

    Training corpora are never sampled uniformly: rare sources are
    upweighted so the mixture follows ``p_s ∝ n_s^α`` with α < 1 (the
    multilingual-sampling recipe popularized by mBERT/XLM-style
    pipelines).  This operator keeps a deterministic, content-addressed
    subsample of ``budget_num/budget_den`` of the corpus whose source
    distribution follows α = 0.5.

    Exactness contract: every quantity is integer arithmetic so DuckDB
    reproduces the selection bit-for-bit —

    - weight ``w_s = floor(sqrt(n_s))`` (IEEE sqrt of an exact int64 is
      identical across engines for n < 2^52);
    - ``T = (N · BUCKETS · budget_num) div (budget_den · Σw)``;
    - per-source keep threshold ``t_s = min(BUCKETS, (T · w_s) div n_s)``;
    - keep row iff ``md5-bucket(key) < t_s``.

    Float ``pow``/rounding never enters, so there is no last-ulp
    threshold flip between engines.  (At extreme corpus sizes the
    intermediate products need DECIMAL widening — at 1e11 docs
    ``N·BUCKETS`` is 1e17, still inside int64.)

    Plan shape at 100 TB: one scan computes per-source counts (partial
    agg, #sources rows shuffled), the tiny rate table cross-joins the
    1-row Σw and broadcast-joins back to the corpus, and the keep
    decision is a pure projection fused into the second scan — no
    corpus-sized shuffle anywhere.
    """
    from pyspark.sql.functions import broadcast

    counts = df.groupBy(source_col).agg(F.count("*").alias("n_s"))
    counts = counts.withColumn(
        "w_s", F.floor(F.sqrt(F.col("n_s").cast("double"))).cast("bigint")
    )
    totals = counts.agg(
        F.sum("n_s").alias("n_total"), F.sum("w_s").alias("w_total")
    )
    rates = counts.crossJoin(broadcast(totals)).withColumn(
        "thresh",
        F.least(
            F.lit(BUCKETS).cast("bigint"),
            F.expr(
                f"((n_total * {BUCKETS} * {int(budget_num)}) div"
                f" ({int(budget_den)} * w_total) * w_s) div n_s"
            ),
        ),
    )
    bucket = hash_bucket_expr(F.col(key_col))
    return (
        df.join(broadcast(rates.select(source_col, "n_s", "thresh")), source_col)
        .where(bucket < F.col("thresh"))
    )


def source_mixing_sql(
    key_sql: str,
    source_sql: str = "source",
    table: str = "documents",
    budget_num: int = 1,
    budget_den: int = 4,
) -> str:
    """DuckDB twin of :func:`source_mixing_sample` (same integer math)."""
    return f"""
        WITH c AS (
          SELECT {source_sql} AS src, count(*)::bigint AS n_s,
                 floor(sqrt(count(*)::double))::bigint AS w_s
          FROM {table} GROUP BY 1
        ), t AS (
          SELECT sum(n_s)::bigint AS n_total, sum(w_s)::bigint AS w_total FROM c
        ), r AS (
          SELECT src, n_s,
                 least({BUCKETS}::bigint,
                       ((n_total * {BUCKETS} * {int(budget_num)})
                        // ({int(budget_den)} * w_total) * w_s) // n_s) AS thresh
          FROM c, t
        )
        SELECT d.*, r.n_s, r.thresh
        FROM {table} d JOIN r ON d.{source_sql} = r.src
        WHERE {hash_bucket_sql(key_sql)} < r.thresh
    """


def q62_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing audit: per-source corpus size, kept count, kept share.

    Oracle-checked — DuckDB re-derives the identical integer thresholds
    and md5 selection. ``keep_per_million`` (exact integer) exposes the
    upweighting: rare sources keep a larger fraction than big ones.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = source_mixing_sample(docs, "doc_id", "source")
    return (
        kept.groupBy("source")
        .agg(
            F.first("n_s").alias("n_total"),
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        # integer div, not `/` + cast: double division can round up
        # across an integer boundary where DuckDB's `//` floors
        .withColumn(
            "keep_per_million", F.expr(f"(n_kept * {BUCKETS}) div n_total")
        )
        .orderBy("source")
    )


# ------------------------------------------- per-group quality top-k
def per_group_topk(
    df: DataFrame,
    k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Best-k documents per group by the deterministic quality score —
    the "curated head" selection a fine-tuning pipeline runs after
    scoring (keep the k best examples of every source/domain instead of
    a global cut that would drop whole domains).

    One partitioned window (shuffle keyed on the group column; no
    global sort, no single-partition window) over the scored
    projection; ranking uses the ROUNDED score plus the id tiebreak, so
    both engines rank identically.
    """
    from pyspark.sql import Window

    from .text import quality_score_expr

    w = Window.partitionBy(group_col).orderBy(
        F.desc("quality"), F.col(id_col)
    )
    return (
        df.select(
            group_col, id_col, quality_score_expr(F.col(text_col)).alias("quality")
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy(group_col, "rk")
    )


def q82_best_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 quality documents per source (oracle-checked: DuckDB
    reproduces the quality expression and the windowed rank)."""
    from ..sources.parquet import load_table

    return per_group_topk(load_table(spark, sf_dir, "documents"), k=5)


# ------------------------------------------ quality-weighted sampling
def quality_weighted_sample(
    df: DataFrame,
    alpha: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic quality-proportional subsampling: keep document i
    iff ``md5_bucket(id)/BUCKETS < (q_i / q_max)^alpha`` — high-quality
    docs survive (almost) surely, low-quality ones proportionally to
    their score, ``alpha`` sharpening the skew. The soft complement to
    the hard Gopher gate (q76): no document class is zeroed out, the
    corpus just tilts toward quality (the mixing rationale of q62
    applied to a continuous score).

    Engine-exact by construction: normalization uses the corpus MAX
    (order-independent, unlike a mean whose partial-sum order varies),
    so both engines derive bit-identical keep thresholds, and the keep
    decision compares them to the exact integer md5 bucket.
    """
    from .text import quality_score_expr

    scored = df.select(
        F.col(id_col),
        quality_score_expr(F.col(text_col)).alias("quality"),
    )
    qmax = scored.agg(F.max("quality").alias("__qmax"))
    keep_p = F.pow(F.col("quality") / F.col("__qmax"), F.lit(alpha))
    return (
        scored.crossJoin(F.broadcast(qmax))
        .where(
            hash_bucket_expr(F.col(id_col).cast("string")) / BUCKETS < keep_p
        )
        .select(id_col, "quality", F.round(keep_p, 6).alias("keep_p"))
        # presentational sort: a global orderBy would range-sample this
        # plan (re-running the quality scan); sample-sized output sorts
        # in one partition
        .repartition(1)
        .sortWithinPartitions(id_col)
    )


def q92_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-tilted deterministic subsample of the corpus
    (oracle-checked)."""
    return quality_weighted_sample(load_table(spark, sf_dir, "documents", spread=True))


def quality_weighted_oracle_sql(alpha: float = 2.0) -> str:
    """DuckDB twin of :func:`quality_weighted_sample` (same quality
    expression as the q31/q82 oracles, max normalization, md5 bucket)."""
    return f"""
        WITH s AS (
          SELECT doc_id,
                 round(least(len(string_split_regex(trim(lower(text)), '\\s+')) / 50.0, 1.0) * 0.5
                       + (1.0 - (length(text)
                              - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                             / greatest(length(text), 1)) * 0.3
                       + len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                         x -> list_contains(['the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'was', 'for', 'on', 'with', 'as', 'at', 'by', 'this', 'from'], x)))
                             / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1) * 0.2, 6)
                     AS quality
          FROM documents
        ), mx AS (SELECT max(quality) AS qmax FROM s)
        SELECT doc_id, quality,
               round(pow(quality / qmax, {alpha}), 6) AS keep_p
        FROM s, mx
        WHERE ('0x' || substr(md5(doc_id::varchar), 1, 8))::bigint % 1000000
                 / 1000000.0 < pow(quality / qmax, {alpha})
        ORDER BY doc_id
    """


# ------------------------------------------------ curriculum training order
CURRICULUM_BINS = 10
CURRICULUM_SEED = 17


def curriculum_order(
    df: DataFrame,
    n_bins: int = CURRICULUM_BINS,
    seed: int = CURRICULUM_SEED,
    top: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum training order: documents binned by quality into
    ``n_bins`` equi-WIDTH buckets (quality is bounded [0,1]), consumed
    highest-quality-bucket first, with a deterministic seeded shuffle
    WITHIN each bucket — the data-ordering stage of a training pipeline
    (quality curriculum + reproducible epoch shuffle in one pass).

    Scale: equi-width binning (not NTILE) on purpose — NTILE is a
    GLOBAL single-partition window sort, a non-starter at corpus scale,
    while ``floor(q*n)`` and the md5 shuffle key are pure map-side
    expressions; the only cost is the final top-N
    (TakeOrderedAndProject; a full epoch materialization would instead
    write sorted-within-shard by (bucket, shuffle_key)).
    """
    from .text import quality_score_expr

    q = quality_score_expr(F.col(text_col))
    bucket = F.least(
        F.floor(q * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    shuffle_key = F.md5(F.concat_ws("-", F.lit(str(seed)), F.col(id_col)))
    return (
        df.select(
            F.col(id_col),
            bucket.alias("bucket"),
            q.alias("quality"),
            shuffle_key.alias("shuffle_key"),
        )
        .orderBy(F.desc("bucket"), "shuffle_key", id_col)
        .limit(top)
    )


def q100_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head of the curriculum-ordered training stream (oracle-checked)."""
    return curriculum_order(load_table(spark, sf_dir, "documents", spread=True))


def curriculum_oracle_sql(
    n_bins: int = CURRICULUM_BINS,
    seed: int = CURRICULUM_SEED,
    top: int = 50,
) -> str:
    """DuckDB twin of :func:`curriculum_order` (same quality expression
    as the q31/q82/q92 oracles)."""
    return f"""
        WITH s AS (
          SELECT doc_id,
                 round(least(len(string_split_regex(trim(lower(text)), '\\s+')) / 50.0, 1.0) * 0.5
                       + (1.0 - (length(text)
                              - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                             / greatest(length(text), 1)) * 0.3
                       + len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                         x -> list_contains(['the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'was', 'for', 'on', 'with', 'as', 'at', 'by', 'this', 'from'], x)))
                             / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1) * 0.2, 6)
                     AS quality
          FROM documents
        )
        SELECT doc_id,
               least(CAST(floor(quality * {n_bins}) AS INT), {n_bins - 1})
                   AS bucket,
               quality,
               md5('{seed}-' || doc_id::varchar) AS shuffle_key
        FROM s
        ORDER BY bucket DESC, shuffle_key, doc_id
        LIMIT {top}
    """


# ----------------------------------------- per-source token-budget cap
TOKEN_BUDGET = 2000


def source_token_budget(
    df: DataFrame,
    budget: int = TOKEN_BUDGET,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source TOKEN-budget cap: admit documents (in a deterministic
    md5-shuffled order) while the source's cumulative whitespace-token
    count stays within ``budget``, and report per-source admission
    stats.  This is the contract a training-mix plan actually speaks —
    "at most N tokens from each domain" — where q82's per-group top-k
    caps DOCUMENT counts and so over-admits verbose domains.

    Plan shape: one window shuffle keyed on the source (cumulative sum
    in md5 order — the md5 key makes the admission order a reproducible
    shuffle, not a quality rank, so the cap is an unbiased sample of
    the domain) followed by a groupBy on the SAME key, which reuses the
    window's hash partitioning (no second exchange).  At 100 TB domains
    are many and individually small relative to the cluster, so the
    per-source window never concentrates; a mega-domain would be
    pre-split by the salting substrate (skew.py) before this runs.
    """
    from pyspark.sql import Window

    from .dedup import tokens_expr

    toks = F.size(tokens_expr(F.col(text_col)))
    order_key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = df.select(
        F.col(group_col), F.col(id_col), toks.alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    kept = F.col("cum") <= F.lit(budget)
    return (
        scored.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
        )
        .orderBy(group_col)
    )


def q142_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source admission stats under a 2000-token budget
    (oracle-checked cumulative-window twin)."""
    return source_token_budget(load_table(spark, sf_dir, "documents"))


def source_token_budget_sql(budget: int = TOKEN_BUDGET) -> str:
    """DuckDB twin of :func:`source_token_budget` — same md5 admission
    order, same cumulative-sum boundary (ties impossible: doc_id is the
    final order key, so RANGE vs ROWS framing agree)."""
    return f"""
        WITH t AS (
          SELECT source, doc_id,
                 len(string_split_regex(trim(lower(text)), '\\s+'))
                     AS n_tokens,
                 substr(md5(doc_id::varchar), 1, 8) AS rk
          FROM documents
        ), c AS (
          SELECT source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY rk, doc_id) AS cum
          FROM t
        )
        SELECT source,
               count(*) AS n_docs,
               sum(n_tokens)::BIGINT AS total_tokens,
               sum(CASE WHEN cum <= {budget} THEN 1 ELSE 0 END)::BIGINT
                   AS n_kept,
               sum(CASE WHEN cum <= {budget} THEN n_tokens ELSE 0 END)::BIGINT
                   AS kept_tokens
        FROM c
        GROUP BY source
        ORDER BY source
    """


# --------------------------------------------------------------- DSIR
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
# arXiv:2302.03169): score each RAW-pool document by the hashed-n-gram
# bag log-likelihood ratio between a small TARGET corpus and the raw
# pool, then keep the highest-weight documents.  The published recipe
# is exactly this shape — unigram+bigram features hashed into B
# buckets, two multinomial distributions estimated with add-one
# smoothing, per-document importance = Σ_features log(p_target/p_raw).
DSIR_BUCKETS = 1024


def dsir_features(text: Column) -> Column:
    """Hashed unigram+bigram bag (array of bucket ids in
    [0, DSIR_BUCKETS)): lowercase, split on non-alphanumerics, pair
    adjacent words, xxhash64 → pmod.  Pure projection — at 100 TB this
    is a narrow map inside the scan stage, no shuffle."""
    w = F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != ""
    )
    n1 = F.greatest(F.size(w) - F.lit(1), F.lit(0))
    bi = F.zip_with(
        F.slice(w, 1, n1),
        F.slice(w, 2, n1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.transform(
        F.concat(w, bi),
        lambda t: F.pmod(F.xxhash64(t), F.lit(DSIR_BUCKETS)).cast("int"),
    )


def dsir_selection(
    spark: SparkSession,
    sf_dir: str,
    target_source: str = "src1",
    k: int = 20,
) -> DataFrame:
    """DSIR document selection: target = the ``target_source`` slice of
    the documents corpus, raw pool = every other document; return the
    top-``k`` raw documents by importance weight.

    Spark shape (scales to 100 TB):
    - ONE explode of the hashed feature bag feeds BOTH distribution
      estimates (map-side-combinable groupBy over ≤ B buckets each) and
      the scoring join — the corpus is scanned once for counts, once
      for scoring;
    - the per-bucket log-ratio table is ≤ B rows, built with two
      1-row total aggregates (metadata-bounded driver reads, same class
      as the IVF centroid collects) and broadcast onto the feature
      stream — the scoring pass is scan → broadcast hash join →
      per-doc partial sum, no wide shuffle beyond the doc_id regroup;
    - the final top-k is a rank-limited sort on k rows.

    Rows-only to the driver (xxhash64 has no DuckDB analog — the q28
    precedent); the harness value-checks it DIFFERENTIALLY against a
    pure-Python xxh64 + math.log replay of the published recipe.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    feats = docs.select(
        "doc_id",
        "source",
        F.explode(dsir_features(F.col("text"))).alias("b"),
    )
    is_target = F.col("source") == target_source
    # persist the ≤B-row counts aggregate: the totals read below AND
    # the scoring join both consume it — without the cache each job
    # would re-run the corpus-token-sized explode+aggregate subtree
    # (3 corpus scans instead of 2; measured ~0.7 s at sf0.1, a full
    # re-scan at 100 TB)
    counts = feats.groupBy("b").agg(
        F.count(F.when(is_target, 1)).alias("ct"),
        F.count(F.when(~is_target, 1)).alias("cr"),
    ).persist()
    totals = counts.agg(F.sum("ct"), F.sum("cr")).collect()[0]
    n_t, n_r = int(totals[0] or 0), int(totals[1] or 0)
    spine = spark.range(DSIR_BUCKETS).select(
        F.col("id").cast("int").alias("b")
    )
    ratios = (
        spine.join(counts, "b", "left")
        .select(
            "b",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                      / F.lit(float(n_t + DSIR_BUCKETS)))
                - F.log((F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(n_r + DSIR_BUCKETS)))
            ).alias("w_b"),
        )
    )
    scored = (
        feats.filter(~is_target)
        .join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_b").alias("w"),
        )
    )
    # a raw document whose feature bag is EMPTY (no alphanumeric
    # character) vanishes in the explode; re-anchor on the raw doc base
    # so it scores w=0.0 / n_feats=0 — which outranks negative-weight
    # docs, matching the differential replay's behavior. Same doc_id
    # key as the scoring regroup, so no new partitioning is introduced.
    raw_docs = docs.filter(F.col("source") != target_source).select(
        "doc_id", "source"
    )
    scored = raw_docs.join(scored, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce(F.col("w"), F.lit(0.0)).alias("w"),
    )
    return (
        scored.select(
            "doc_id", "source", "n_feats", F.round("w", 6).alias("w")
        )
        .orderBy(F.desc("w"), "doc_id")
        .limit(k)
    )


def q196_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling selection (arXiv:2302.03169) — top-20
    raw-pool documents most target-like under hashed unigram+bigram
    log-likelihood ratios (target = source 'src1')."""
    return dsir_selection(spark, sf_dir, target_source="src1", k=20)
