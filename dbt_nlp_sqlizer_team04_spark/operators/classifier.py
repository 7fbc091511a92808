"""Learned document-quality classifier — the fastText-style "model-based
quality filter" stage of a pretraining data pipeline (CCNet/GPT-3-style
filtering, both published), built entirely from Spark ML primitives:

    tokens → HashingTF (2^14 hashed bag-of-words) → IDF → LogisticRegression

Training uses WEAK labels derived from the heuristic quality score the
engine already ships (``text.quality_score_expr``): clearly-good docs
(top band) against clearly-bad ones (bottom band), with the ambiguous
middle left unlabeled — the standard bootstrap when no human labels
exist. The trained model then scores EVERY document with a calibrated
probability, which is a strictly richer signal than the heuristic alone
(it generalizes lexical patterns the hand rules never mention).

Scale shape: the whole pipeline is Spark ML's JVM-side estimators —
tokenization/hashing/IDF/LR all run distributed with no Python in the
loop; the fitted model is a broadcast-sized vector (2^14 weights).
Training on a bounded labeled subset (the bands) and scoring the full
corpus is exactly how this deploys at 100 TB: ``fit`` over a sampled
slice, ``transform`` as one map-shaped pass.

Rows-only in the registry (q73): an iterative LBFGS fit has no DuckDB
twin — pytest pins planted-separation, determinism, and agreement with
the weak labels instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .text import quality_score_expr

HASH_DIM = 1 << 14
# weak-label bands: bottom/top corpus quantiles of the heuristic score,
# so the bands adapt to any corpus's score distribution instead of
# assuming fixed absolute cutoffs
BAD_Q = 0.3
GOOD_Q = 0.7


def _with_weak_labels(df: DataFrame, text_col: str) -> DataFrame:
    lo, hi = (
        df.select(quality_score_expr(F.col(text_col)).alias("__q"))
        .approxQuantile("__q", [BAD_Q, GOOD_Q], 0.001)
    )
    q = quality_score_expr(F.col(text_col))
    if lo >= hi:
        # a modal score straddling both quantiles would otherwise label
        # the entire modal mass confident-good; strict comparisons keep
        # the mode unlabeled (ambiguous), preserving a two-sided band
        return df.withColumn(
            "label",
            F.when(q > F.lit(hi), 1.0).when(q < F.lit(lo), 0.0),
        )
    return df.withColumn(
        "label",
        F.when(q >= F.lit(hi), 1.0).when(q <= F.lit(lo), 0.0),
    )


def train_quality_model(df: DataFrame, text_col: str = "text"):
    """Fit the hashed-BoW logistic model on the confident label bands.
    Returns the fitted PipelineModel (deterministic: hashing and LBFGS
    carry no random state for a fixed input)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    labeled = _with_weak_labels(df, text_col).where(F.col("label").isNotNull())
    n_classes = labeled.select("label").distinct().count()
    if n_classes < 2:
        raise ValueError(
            "quality-score distribution is degenerate (single-class weak "
            "labels); a learned filter cannot be bootstrapped from it"
        )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+"
            ),
            HashingTF(
                inputCol="__toks", outputCol="__tf", numFeatures=HASH_DIM
            ),
            IDF(inputCol="__tf", outputCol="__feat"),
            LogisticRegression(
                featuresCol="__feat", labelCol="label", maxIter=20, regParam=0.01
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(model, df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Score every document: (id, quality_prob, predicted_good) — the
    delete list is ``predicted_good = 0``."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
        F.col("prediction").cast("int").alias("predicted_good"),
    ).orderBy(id_col)


_QMODEL_CACHE: dict = {}


def quality_model_for(spark: SparkSession, sf_dir: str):
    """Per-corpus fitted model, persisted in the warehouse beside the
    index tables (same adopt-or-build contract as
    ``dedup.minhash_table_for``; the fingerprinted tag invalidates on
    corpus regeneration or recipe bumps)."""
    import os

    from pyspark.ml import PipelineModel

    from .dedup import _sf_tag

    key = (id(spark), sf_dir)
    if key not in _QMODEL_CACHE:
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        path = os.path.join(warehouse, f"quality_model_{_sf_tag(sf_dir)}")
        if os.path.isdir(path):
            _QMODEL_CACHE[key] = PipelineModel.load(path)
        else:
            model = train_quality_model(load_table(spark, sf_dir, "documents"))
            model.write().overwrite().save(path)
            _QMODEL_CACHE[key] = model
    return _QMODEL_CACHE[key]


def q73_learned_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality probability per document (rows-only: iterative
    LBFGS has no DuckDB analog; pytest pins separation on planted
    good/garbage docs, determinism, and weak-label agreement). The
    model fits ONCE PER CORPUS and persists via ``PipelineModel.save``
    — later processes adopt it like the other ingest artifacts."""
    docs = load_table(spark, sf_dir, "documents")
    return score_quality(quality_model_for(spark, sf_dir), docs)
