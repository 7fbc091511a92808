"""Corpus curation funnel — the end-to-end composition a training-data
pipeline actually runs over raw documents (builder-brief extension; no
reference analog — the reference's nearest concept is the multi-stage
validation ladder in NLP_SQLizer/backend/app/routes_ai.py:173-317).

Stage order follows the published pre-training recipes (lang filter →
quality → repetition → dedup → benchmark decontamination), reported as
cumulative survivor counts so each stage's marginal cost is visible.

Scale shape: every per-document signal (language, quality score,
bigram-repetition ratio, normalized content hash, shingle set) is
computed in ONE projection over the corpus — no per-stage rescans of
the text. The only non-projection work is (a) a window min over the
16-byte content hash for canonical selection (one shuffle of slim
keys) and (b) the decontamination sweep, which broadcasts the tiny
probe shingle sets and joins them against the same projected grams
column. The final report is a single partial-aggregated count row,
unpivoted driver-free with ``stack``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .dedup import (
    bind,
    contamination_check,
    content_hash,
    normalized_text,
    shingles_expr,
    tokens_expr,
)
from .text import quality_score_expr

DUP_FRAC_MAX = 0.2      # Gopher-style duplicate-bigram ceiling
QUALITY_MIN = 0.5
CONTAM_MIN_OVERLAP = 5


def repetition_pass_expr(text_col: Column, max_dup_frac: float = DUP_FRAC_MAX) -> Column:
    """True when the duplicated-bigram fraction is at or under the
    ceiling. Pure array expressions (no explode): dup_frac needs only
    ``1 - distinct/total`` over the bigram list, so ``array_distinct``
    replaces q57's (doc, gram) shuffle entirely. Docs with no bigrams
    (< 2 tokens) carry no repetition evidence and pass."""

    def bigrams(ts: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(ts) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ts, i), F.element_at(ts, i + 1)),
        )
        return F.when(F.size(ts) >= 2, grams).otherwise(
            F.array().cast("array<string>")
        )

    def frac_ok(g: Column) -> Column:
        return (F.size(g) == 0) | (
            F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g)
            <= F.lit(max_dup_frac)
        )

    return bind(bind(tokens_expr(text_col), bigrams), frac_ok)


def corpus_funnel(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = QUALITY_MIN,
    max_dup_frac: float = DUP_FRAC_MAX,
    min_overlap: int = CONTAM_MIN_OVERLAP,
    n_probes: int = 3,
    probe_sets: DataFrame | None = None,
) -> DataFrame:
    """Cumulative-survival report ``(stage_idx, stage, n_kept)`` for the
    five-stage curation funnel. Canonical selection and contamination
    are evaluated against the FULL corpus (not the stage survivors) so
    each flag is independent of stage order and the report stays
    reproducible under reordering; the cumulative conjunction imposes
    the pipeline order at report time only.

    ``probe_sets`` (an ``(id, grams)`` frame) lets the caller supply the
    benchmark probes from the ingest-persisted shingle table (the q52/
    q59 story); when omitted, probes are the first ``n_probes`` corpus
    docs' inline-derived shingle sets.
    """
    t = F.col("text")
    base = docs.select(
        "doc_id",
        (F.col("lang") == lang).alias("f_lang"),
        (quality_score_expr(t) >= F.lit(min_quality)).alias("f_quality"),
        repetition_pass_expr(t, max_dup_frac).alias("f_rep"),
        content_hash(normalized_text(t)).alias("__h"),
        shingles_expr(t).alias("__grams"),
    )
    base = base.withColumn(
        "f_canon",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("__h")),
    )
    sets = base.select(F.col("doc_id").alias("id"), F.col("__grams").alias("grams"))
    if probe_sets is None:
        probe_sets = sets.where(F.col("id") < n_probes)
    dirty = (
        contamination_check(sets, probe_sets, min_overlap)
        .select("doc_id")
        .distinct()
        .withColumn("f_dirty", F.lit(True))
    )
    flags = base.join(F.broadcast(dirty), "doc_id", "left").withColumn(
        "f_clean", F.col("f_dirty").isNull()
    )

    def kept(*fs: str) -> Column:
        keep = F.lit(True)
        for f in fs:
            keep = keep & F.col(f)
        return F.sum(keep.cast("int")).cast("long")

    counts = flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        kept("f_lang").alias("n_lang"),
        kept("f_lang", "f_quality").alias("n_quality"),
        kept("f_lang", "f_quality", "f_rep").alias("n_rep"),
        kept("f_lang", "f_quality", "f_rep", "f_canon").alias("n_canon"),
        kept("f_lang", "f_quality", "f_rep", "f_canon", "f_clean").alias("n_clean"),
    )
    return counts.select(
        F.expr(
            "stack(6, "
            "0, 'total', n_total, "
            "1, 'lang', n_lang, "
            "2, 'quality', n_quality, "
            "3, 'repetition', n_rep, "
            "4, 'exact_dedup', n_canon, "
            "5, 'decontaminated', n_clean) AS (stage_idx, stage, n_kept)"
        )
    ).orderBy("stage_idx")


def q61_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-stage curation funnel over ``documents`` (oracle: DuckDB
    CTE chain over the identical signal definitions). Probe shingles
    come from the ingest-persisted shingle table — the same artifact
    q52/q59 query — not an inline re-derivation."""
    from .dedup import ngram_table_for

    probes = spark.table(ngram_table_for(spark, sf_dir)).where(
        F.col("id") < 3
    )
    return corpus_funnel(
        load_table(spark, sf_dir, "documents", spread=True), probe_sets=probes
    )


# -------------------------------------------------- event conversion funnel
def conversion_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-sequence conversion funnel: a user advances to stage i
    only with an event of that type STRICTLY AFTER their first
    qualifying stage-(i-1) event — the standard product-analytics
    funnel (not mere per-type presence, which over-counts users who
    purchased before ever viewing).

    Plan: one per-stage chain of (filter → user-keyed min-ts aggregate
    → equi-join to the previous stage's frontier). Every shuffle keys
    on the user column, so on a cluster all stages reuse one
    partitioning; per-stage state is one timestamp per surviving user.
    The result is ``stages``-many 1-row aggregates unioned — constant
    output at any scale.
    """
    frontier = None
    rows = []
    for i, stage in enumerate(stages):
        ev = events.where(F.col(type_col) == stage)
        if frontier is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        else:
            cur = (
                ev.join(
                    frontier.withColumnRenamed("t", "t_prev"), user_col
                )
                .where(F.col(ts_col) > F.col("t_prev"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t"))
            )
        frontier = cur
        rows.append(
            cur.agg(
                F.lit(i + 1).alias("stage_no"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage_no")


def q87_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase strict-sequence funnel (oracle-checked)."""
    return conversion_funnel(load_table(spark, sf_dir, "events"))


def conversion_funnel_oracle_sql(
    stages: tuple[str, ...] = ("view", "click", "purchase")
) -> str:
    """DuckDB twin of :func:`conversion_funnel`."""
    ctes = []
    prev = None
    for i, stage in enumerate(stages):
        name = f"s{i}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{stage}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                f"JOIN {prev} ON e.user_id = {prev}.user_id "
                f"AND e.ts > {prev}.t "
                f"WHERE e.event_type = '{stage}' GROUP BY e.user_id)"
            )
        prev = name
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage_no, '{stage}' AS stage, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        for i, stage in enumerate(stages)
    )
    return f"WITH {', '.join(ctes)} {selects} ORDER BY stage_no"
