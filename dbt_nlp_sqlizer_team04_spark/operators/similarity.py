"""Vector similarity search — A13 at engine scale + builder-brief ANN.

The reference's headline path encodes a question and ranks schema
elements by cosine similarity, top-20 over a few hundred vectors
(NLP_SQLizer/backend/app/models/inference.py:70-118). This module is the
data-scale generalization over an ``array<float>`` embedding column
(testdata ``embeddings.parquet``: vec_id, embedding float[64], label):

- ``cosine_topk`` — exact brute-force top-k: JVM-side dot product via
  ``F.zip_with`` + ``F.aggregate`` (whole-stage codegen, no Python in
  the loop), then ``orderBy().limit(k)`` = TakeOrderedAndProject. This
  is the correctness baseline; it scans everything but never shuffles
  more than k rows per partition.
- ``with_lsh_signature`` / ``ann_topk_lsh`` — the 100 TB path: random
  hyperplane (sign) LSH. Each vector gets ``n_bands`` banded bucket ids
  computed from deterministic seeded hyperplanes; a query only scores
  vectors sharing at least one band bucket (partition-prunable bucket
  join, never an all-pairs scan), then re-ranks candidates exactly.
- ``similar_pairs_blocked`` — exact pairwise cosine ≥ threshold within
  a blocking key (here ``label``): the blocked-join pattern that stands
  in for IVF cells / LSH buckets when a natural partition exists.
- ``similar_pairs_lsh`` — pairwise near-neighbors via banded bucket
  self-join: explode band ids, equi-join on bucket (pairs ONLY within
  buckets), distinct, exact cosine re-check.

All vector math is done in ``double`` to keep parity with the DuckDB
oracle (``list_cosine_similarity`` over DOUBLE[]).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table


def _sorted_pairs(df: DataFrame, *cols: str) -> DataFrame:
    """Size-guarded single-partition pair sort (dedup's helper; local
    import keeps the module import-order-free)."""
    from .dedup import sorted_pair_output

    return sorted_pair_output(df, *cols)

EMBED_DIM = 64
LSH_BITS = 16
LSH_BANDS = 4
LSH_SEED = 42


# --------------------------------------------------------------- cosine
def dot_expr(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, built-ins only.
    Zero-norm inputs (e.g. an out-of-vocabulary text encoding) define
    cosine as 0.0 instead of tripping ANSI divide-by-zero; the
    denominator is bound once via the let-trick, not recomputed."""
    from .dedup import bind

    d = dot_expr(a, b)
    return bind(
        norm_expr(a) * norm_expr(b),
        lambda nn: F.when(nn > 0, d / nn).otherwise(F.lit(0.0)),
    )


def normalized_expr(a: Column) -> Column:
    """L2-normalize an array<double> column; the norm is bound once (a
    plain reference would recompute the aggregate per element)."""
    from .dedup import bind

    return bind(
        norm_expr(a),
        lambda nrm: F.transform(
            a, lambda x: F.when(nrm > 0, x / nrm).otherwise(F.lit(0.0))
        ),
    )


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col


def _vector_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine vs a fixed query vector.

    Plan shape: parquet scan (only id+embedding columns read) →
    per-row cosine in codegen → TakeOrderedAndProject(k). No shuffle of
    the data; each partition contributes its local top-k.
    """
    emb = _as_double(emb_col)
    out = df
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != F.lit(exclude_id))
    cos = cosine_expr(emb, _vector_lit(query_vec))
    return (
        out.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def filtered_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    predicate: Column,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
    carry_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Metadata-FILTERED exact top-k: vector search restricted to rows
    matching a relational predicate (the "filtered ANN" contract every
    production vector store exposes — search only `label = 7`, only
    `lang = 'en'`, only this tenant).

    Plan shape: the predicate is applied BEFORE the cosine so Catalyst
    pushes it into the parquet scan (PushedFilters) — the expensive
    per-row vector math runs only on survivors, then
    TakeOrderedAndProject(k) as in :func:`cosine_topk`. This pre-filter
    strategy is exact and is the right call whenever the predicate is
    selective; at 100 TB with a LOOSE predicate you'd instead intersect
    IVF cells with a partition-pruned metadata index and post-filter the
    shortlist (the q43 cells compose directly: add the predicate to the
    in-cell scorer).
    """
    emb = _as_double(emb_col)
    out = df.filter(predicate)
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != F.lit(exclude_id))
    cos = cosine_expr(emb, _vector_lit(query_vec))
    carried = [F.col(c) for c in carry_cols if c in df.columns]
    return (
        out.select(
            F.col(id_col), *carried, F.round(cos, 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def cosine_range_search(
    df: DataFrame,
    query_vec: list[float],
    threshold: float = 0.2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine RANGE search: every vector within ``threshold`` of
    the query — the set-retrieval complement of :func:`cosine_topk`
    (recall-oriented: "everything at least this similar", the contract
    a dedup sweep or a positive-pair miner needs, where top-k's fixed
    k silently truncates dense neighborhoods).

    Plan shape: scan (id+embedding only) → codegen cosine → filter —
    embarrassingly parallel, NO global ordering step at all (top-k pays
    a TakeOrderedAndProject; a range search doesn't have to). The
    threshold compares the 6dp-ROUNDED cosine so the keep/drop decision
    is engine-exact at the boundary (q25's convention). Ordering of the
    (small) result is for the oracle hash only.
    """
    emb = _as_double(emb_col)
    out = df
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != F.lit(exclude_id))
    cos = F.round(cosine_expr(emb, _vector_lit(query_vec)), 6)
    return (
        out.select(F.col(id_col), cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy(F.desc("cosine"), id_col)
    )


def q102_cosine_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vectors with cosine >= 0.2 of vec_id=0 (oracle-checked)."""
    q = _query_vector(spark, sf_dir, 0)
    return cosine_range_search(
        load_table(spark, sf_dir, "embeddings"), q, threshold=0.2, exclude_id=0
    )


# ------------------------------------------------------------------ LSH
def hyperplanes(
    dim: int = EMBED_DIM, n_bits: int = LSH_BITS, seed: int = LSH_SEED
) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes shared by build and query side."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def signature_bits(vec: list[float], planes: list[list[float]]) -> list[int]:
    """Driver-side signature of one query vector (same math as the plan)."""
    return [
        1 if sum(x * y for x, y in zip(vec, hp)) >= 0.0 else 0 for hp in planes
    ]


def band_hashes(bits: list[int], n_bands: int = LSH_BANDS) -> list[int]:
    """Fold sign bits into per-band bucket ids, namespaced by band index."""
    per = len(bits) // n_bands
    out = []
    for b in range(n_bands):
        h = b
        for bit in bits[b * per : (b + 1) * per]:
            h = h * 2 + bit
        out.append(h)
    return out


def with_lsh_signature(
    df: DataFrame,
    emb_col: str = "embedding",
    n_bits: int = LSH_BITS,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
    dim: int = EMBED_DIM,
    out_col: str = "bands",
) -> DataFrame:
    """Add an ``array<int>`` column of banded LSH bucket ids.

    Pure column expressions (one dot product per hyperplane) — at scale
    this is computed once at ingest and persisted/bucketed on, so ANN
    queries become partition-pruned bucket lookups.
    """
    emb = _as_double(emb_col)
    bits = [
        (dot_expr(emb, _vector_lit(hp)) >= 0).cast("int")
        for hp in hyperplanes(dim, n_bits, seed)
    ]
    per = n_bits // n_bands
    bands = []
    for b in range(n_bands):
        h: Column = F.lit(b)
        for bit in bits[b * per : (b + 1) * per]:
            h = h * F.lit(2) + bit
        bands.append(h)
    return df.withColumn(out_col, F.array(*bands))


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
    n_bits: int = LSH_BITS,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
) -> DataFrame:
    """Approximate top-k: score ONLY vectors sharing ≥1 LSH band bucket
    with the query, then re-rank those candidates exactly.

    The candidate filter is ``arrays_overlap`` against the query's band
    ids — with the signature persisted and bucketed, this is the
    scan-k-buckets plan, not a full scan.
    """
    planes = hyperplanes(len(query_vec), n_bits, seed)
    qbands = band_hashes(signature_bits(query_vec, planes), n_bands)
    sig = with_lsh_signature(
        df, emb_col, n_bits=n_bits, n_bands=n_bands, seed=seed, dim=len(query_vec)
    )
    cand = sig.filter(
        F.arrays_overlap(F.col("bands"), F.array(*[F.lit(b) for b in qbands]))
    )
    if exclude_id is not None:
        cand = cand.filter(F.col(id_col) != F.lit(exclude_id))
    cos = cosine_expr(_as_double(emb_col), _vector_lit(query_vec))
    return (
        cand.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def similar_pairs_blocked(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.25,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact pairwise cosine ≥ threshold WITHIN a blocking key.

    The join is an equi-join on the block key — Catalyst shuffles both
    sides on ``block_col`` once and compares only co-bucketed rows;
    there is no all-pairs cross join anywhere in the plan. Vectors are
    L2-normalized per ROW before the join, so the per-pair work is one
    dot product instead of dot + two norms (3× on the quadratic stage).
    """
    normed = df.select(
        F.col(block_col).alias("b"),
        F.col(id_col).alias("id"),
        normalized_expr(_as_double(emb_col)).alias("e"),
    )
    left = normed.select("b", F.col("id").alias("id_a"), F.col("e").alias("ea"))
    right = normed.select("b", F.col("id").alias("id_b"), F.col("e").alias("eb"))
    return (
        left.join(right, "b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("b").alias(block_col),
            "id_a",
            "id_b",
            F.round(dot_expr(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def similar_pairs_blocked_vectorized(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.25,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Blocked pairwise cosine via per-block numpy matmul
    (``applyInPandas``) — the documented exception to the built-ins-only
    rule: the quadratic pair stage is a dense matrix product, which
    interpreted higher-order functions evaluate element-by-element
    (~6-9 s at sf0.1) while one Arrow-batched BLAS matmul does it in
    milliseconds. Each block must fit an executor's memory — at 100 TB
    block keys are chosen (or salted / IVF-split) to keep blocks
    bounded, which the pure-expression variant above does not need.

    Results are identical to ``similar_pairs_blocked`` (same rounding,
    same DuckDB oracle).
    """
    import pandas as pd  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    # the block key keeps its incoming type (string labels, longs, ...);
    # hardcoding int here breaks any non-int32 key at the Arrow boundary
    block_type = df.schema[block_col].dataType.simpleString()
    out_schema = f"{block_col} {block_type}, id_a long, id_b long, cosine double"

    def block_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sim = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        cos = np.round(sim[iu], 6)
        keep = cos >= threshold
        a, b = ids[iu[0][keep]], ids[iu[1][keep]]
        return pd.DataFrame(
            {
                block_col: pdf[block_col].iloc[0],
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cosine": cos[keep],
            }
        )

    return (
        df.select(block_col, id_col, emb_col)
        .groupBy(block_col)
        .applyInPandas(block_pairs, out_schema)
        .orderBy("id_a", "id_b")
    )


def similar_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = LSH_BITS,
    n_bands: int = LSH_BANDS,
    seed: int = LSH_SEED,
) -> DataFrame:
    """Near-neighbor pairs via banded bucket self-join: explode band ids,
    equi-join on the bucket (pairs exist only inside buckets), distinct,
    exact cosine re-check ≥ threshold. The 100 TB pattern: pair count is
    bounded by bucket occupancy, never n² — and the bucket join moves
    only (bucket, id) rows; vectors are fetched back by id equi-joins
    for the surviving candidates only."""
    sig = with_lsh_signature(df, emb_col, n_bits=n_bits, n_bands=n_bands, seed=seed)
    ex = sig.select(F.col(id_col), F.explode("bands").alias("bkt"))
    l = ex.select(F.col("bkt"), F.col(id_col).alias("id_a"))
    r = ex.select(F.col("bkt"), F.col(id_col).alias("id_b"))
    cand = (
        l.join(r, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vec = df.select(F.col(id_col), _as_double(emb_col).alias("e"))
    va = vec.select(F.col(id_col).alias("id_a"), F.col("e").alias("ea"))
    vb = vec.select(F.col(id_col).alias("id_b"), F.col("e").alias("eb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------------------------ IVF
def ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_probe_assign: int = 1,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) index: k-means cells over the corpus.

    Returns (assignments DataFrame with ``probe_rank``/``cell`` columns,
    centroid list). At scale the assignment is computed once at ingest
    and the table is written partitioned/bucketed BY ``cell`` — a query
    then reads only the probed cells (partition pruning), which is the
    IVF win over LSH's row-filter candidate test. Seeded k-means keeps
    the index deterministic for tests.

    ``n_probe_assign`` > 1 writes each vector into its N nearest cells
    (``probe_rank`` 0 = nearest; the multi-assignment analog of FAISS's
    query-side multi-probe): consumers that need the corpus exactly once
    filter ``probe_rank = 0``; consumers doing IN-CELL pair generation
    (SemDeDup) read all ranks so near-dup pairs split across a cell
    boundary still co-occur somewhere. Storage and Σ|cell|² pair cost
    scale linearly with N — N=2 is the recall/cost sweet spot the
    SemDeDup follow-ups use.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(emb_col),
        array_to_vector(F.col(emb_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="features", predictionCol="cell"
    ).fit(feat)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    if n_probe_assign <= 1:
        assigned = model.transform(feat).select(
            id_col, emb_col, F.lit(0).alias("probe_rank"), "cell"
        )
        return assigned, centroids

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    n_assign = min(n_probe_assign, len(centroids))
    cmat = np.asarray(centroids, dtype=np.float64)          # (k, d) — tiny
    c_sq = (cmat * cmat).sum(axis=1)
    id_type = df.schema[id_col].dataType.simpleString()
    emb_type = df.schema[emb_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {emb_col} {emb_type}, probe_rank int, cell int"

    def assign(batches):
        # one BLAS matmul per Arrow batch: squared Euclidean to every
        # centroid, stable argsort → N nearest cells per vector
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cmat.T) + c_sq[None, :]
            order = np.argsort(d2, axis=1, kind="stable")[:, :n_assign]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_assign),
                    emb_col: [v for v in pdf[emb_col] for _ in range(n_assign)],
                    "probe_rank": np.tile(
                        np.arange(n_assign, dtype=np.int32), len(pdf)
                    ),
                    "cell": order.ravel().astype(np.int32),
                }
            )

    assigned = df.select(id_col, emb_col).mapInPandas(assign, out_schema)
    return assigned, centroids


def create_ivf_table(
    spark: SparkSession,
    df: DataFrame,
    table_name: str = "embeddings_ivf",
    n_cells: int = 16,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    overwrite: bool = True,
    n_probe_assign: int = 1,
) -> str:
    """ONE-TIME ingest step: fit the IVF index and persist the cell
    assignments as a table PARTITIONED BY ``cell`` (plus a tiny
    ``<name>_centroids`` side table). Queries then read only the probed
    cell partitions — the same layout move ``sources/bucketing.py`` makes
    for FK joins. At 100 TB this is the difference between an ANN query
    scanning n_probe/n_cells of the corpus and scanning all of it (or,
    worse, re-running k-means per query)."""
    import os
    import shutil

    if overwrite:
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for t in (table_name, f"{table_name}_centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = os.path.join(warehouse, t)
            if os.path.exists(loc):
                shutil.rmtree(loc)
    assigned, centroids = ivf_index(
        df, n_cells, seed, id_col, emb_col, n_probe_assign
    )
    (
        assigned.repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{table_name}_centroids")
    return table_name


def _rank_cells(query_vec: list[float], centroids: dict[int, list[float]]) -> list[int]:
    """Driver-side cell ranking by centroid cosine (n_cells-sized)."""

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    return sorted(centroids, key=lambda i: -cos(query_vec, centroids[i]))


def _topk_in_cells(
    cand: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    emb_col: str,
    exclude_id: int | None,
) -> DataFrame:
    if exclude_id is not None:
        cand = cand.filter(F.col(id_col) != F.lit(exclude_id))
    c = cosine_expr(_as_double(emb_col), _vector_lit(query_vec))
    return (
        cand.select(F.col(id_col), F.round(c, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ivf_topk_prebuilt(
    spark: SparkSession,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 6,
    table_name: str = "embeddings_ivf",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k against a PERSISTED IVF table (see
    ``create_ivf_table``). No k-means in the query path: the centroid
    side table is a metadata-sized collect, and ``cell IN (probed)``
    prunes to n_probe partition directories (PartitionFilters in the
    plan — asserted in tests)."""
    centroids = {
        r["cell"]: list(r["centroid"])
        for r in spark.table(f"{table_name}_centroids").collect()
    }
    probe = _rank_cells(query_vec, centroids)[:n_probe]
    cand = spark.table(table_name).filter(F.col("cell").isin(probe))
    if "probe_rank" in cand.columns:
        # a multi-assigned table repeats vectors across cells; the ANN
        # candidate set wants each vector at most once
        cand = cand.filter(F.col("probe_rank") == 0)
    return _topk_in_cells(cand, query_vec, k, id_col, emb_col, exclude_id)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 6,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
    seed: int = LSH_SEED,
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF over an in-memory index. Pass ``index``
    (the ``ivf_index`` output) to reuse a prebuilt one; building it here
    is a TEST convenience only — production uses ``create_ivf_table`` +
    ``ivf_topk_prebuilt`` so no query ever pays the k-means fit."""
    assigned, centroids = index if index is not None else ivf_index(
        df, n_cells, seed, id_col, emb_col
    )
    probe = _rank_cells(query_vec, dict(enumerate(centroids)))[:n_probe]
    cand = assigned.filter(F.col("cell").isin(probe))
    return _topk_in_cells(cand, query_vec, k, id_col, emb_col, exclude_id)


# ----------------------------------------------------- registry queries
# ------------------------------- exact all-pairs cosine (block-cross plan)
def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """EXACT corpus-wide cosine ≥ threshold pairs — the embedding-space
    near-duplicate detector of the dedup family (builder brief). Unlike
    ``similar_pairs_blocked`` it needs no pre-existing blocking key and
    misses nothing, unlike the LSH/IVF tiers.

    Plan: the O(n²) pair space is tiled into (n_blocks² + n_blocks)/2
    block-cross tasks. Each vector lands in block ``id % n_blocks``; a
    broadcast task table (bi ≤ bj) replicates every row to its ~B tasks,
    and a cogrouped Arrow stage runs ONE float64 BLAS matmul per tile.
    Replication cost is O(n·B) rows shuffled against O(n²) pair work —
    at 100 TB pick B ≈ sqrt(desired parallelism) so each tile fits
    executor memory; the all-pairs product itself never materializes as
    Spark rows, only tile-local numpy. Cosines are rounded to 6 before
    the threshold compare, same convention as the q25 oracle.
    """
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    spark = df.sparkSession
    if n_blocks is None:
        # Size tiles to ~1k vectors a side: big enough that the BLAS
        # matmul dominates the per-task Arrow/Python overhead, small
        # enough that a tile (2 × 1k × dim float64) stays far inside
        # executor memory. Result is provably invariant to the choice
        # (pytest pins it); only the task graph changes. The count is a
        # parquet-metadata job, not a scan.
        n = df.count()
        n_blocks = max(1, min(64, math.ceil(n / 1000)))
    src = df.select(
        F.col(id_col).alias("id"),
        _as_double(emb_col).alias("e"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    tasks = spark.createDataFrame(
        [(bi, bj) for bi in range(n_blocks) for bj in range(bi, n_blocks)],
        "bi int, bj int",
    )
    left = (
        src.alias("sl")
        .join(F.broadcast(tasks.alias("tl")), F.col("sl.blk") == F.col("tl.bi"))
        .select(
            F.col("tl.bi").alias("bi"), F.col("tl.bj").alias("bj"),
            F.col("sl.id").alias("id"), F.col("sl.e").alias("e"),
        )
    )
    right = (
        src.alias("sr")
        .join(F.broadcast(tasks.alias("tr")), F.col("sr.blk") == F.col("tr.bj"))
        .select(
            F.col("tr.bi").alias("bi"), F.col("tr.bj").alias("bj"),
            F.col("sr.id").alias("id"), F.col("sr.e").alias("e"),
        )
    )

    def tile(l: "pd.DataFrame", r: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if l.empty or r.empty:
            return empty
        ida = l["id"].to_numpy()
        idb = r["id"].to_numpy()
        ma = np.asarray([np.asarray(v, dtype=np.float64) for v in l["e"]])
        mb = np.asarray([np.asarray(v, dtype=np.float64) for v in r["e"]])
        for m in (ma, mb):
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m /= norms[:, None]
        cos = np.round(ma @ mb.T, 6)
        same_block = int(l["bi"].iloc[0]) == int(l["bj"].iloc[0])
        mask = cos >= threshold
        if same_block:
            mask &= ida[:, None] < idb[None, :]
        ia, jb = np.nonzero(mask)
        if not len(ia):
            return empty
        a, b = ida[ia], idb[jb]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b),
             "id_b": np.maximum(a, b),
             "cosine": cos[ia, jb]}
        )

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(tile, "id_a long, id_b long, cosine double")
        # survivors are pair-sized (≪ corpus): one-partition sort gives
        # the same deterministic global order as orderBy WITHOUT the
        # range-partitioner sampling pass — orderBy's bounds sampling
        # sits directly above the tile stage, so it re-runs every
        # cogroup matmul a second time (the q52 convention);
        # sorted_pair_output guards the size assumption in-plan
        .transform(lambda d: _sorted_pairs(d, "id_a", "id_b"))
    )


def cosine_near_dup_pairs_expr(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Pure-expression twin of :func:`cosine_near_dup_pairs` (self-join
    + zip_with dot). Exists to cross-check the Arrow tile path in
    pytest; quadratic row materialization makes it the wrong shape for
    large corpora."""
    normed = df.select(
        F.col(id_col).alias("id"), normalized_expr(_as_double(emb_col)).alias("e")
    )
    a = normed.select(F.col("id").alias("id_a"), F.col("e").alias("ea"))
    b = normed.select(F.col("id").alias("id_b"), F.col("e").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot_expr(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch the fixed query vector (one row — metadata-sized collect)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .collect()[0]
    )
    return list(row["e"])


def q23_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec_id=0 (A13 analog at data
    scale; oracle: DuckDB list_cosine_similarity)."""
    q = _query_vector(spark, sf_dir, 0)
    return cosine_topk(
        load_table(spark, sf_dir, "embeddings"), q, k=10, exclude_id=0
    )


def q139_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors of vec_id=0 among label-7 vectors only — the
    metadata-filtered vector search contract (oracle: DuckDB
    list_cosine_similarity under the same WHERE)."""
    q = _query_vector(spark, sf_dir, 0)
    return filtered_cosine_topk(
        load_table(spark, sf_dir, "embeddings"),
        q,
        predicate=F.col("label") == 7,
        k=10,
        exclude_id=0,
    )


def q24_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 of vec_id=0 (rows-only check; the
    pytest asserts recall vs the exact baseline)."""
    q = _query_vector(spark, sf_dir, 0)
    return ann_topk_lsh(
        load_table(spark, sf_dir, "embeddings"), q, k=10, exclude_id=0
    )


_IVF_TABLE_CACHE: dict = {}


def ivf_table_for(
    spark: SparkSession, sf_dir: str, n_probe_assign: int = 1
) -> str:
    """Per-(session, corpus, N-probe) persisted IVF table name, built on
    first use — shared by q43, q63, and bench ingest. The name is per-sf
    (``dedup._sf_tag``): one fixed name across sf_dirs lets a warm-up
    at a small SF DROP+rewrite the table the big-SF query then reads;
    the multi-assigned variant gets its own ``_pN`` name for the same
    reason."""
    from .dedup import _sf_tag, reuse_persisted_table

    key = (id(spark), sf_dir, n_probe_assign)
    if key not in _IVF_TABLE_CACHE:
        suffix = f"_p{n_probe_assign}" if n_probe_assign > 1 else ""
        name = f"embeddings_ivf{suffix}_{_sf_tag(sf_dir)}"
        # both the cell table and its centroids side table must exist
        # for adoption — a half-built pair falls through to a rebuild
        if not (
            reuse_persisted_table(spark, name)
            and reuse_persisted_table(spark, f"{name}_centroids")
        ):
            create_ivf_table(
                spark,
                load_table(spark, sf_dir, "embeddings"),
                table_name=name,
                n_probe_assign=n_probe_assign,
            )
        _IVF_TABLE_CACHE[key] = name
    return _IVF_TABLE_CACHE[key]


def q43_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell approximate top-10 of vec_id=0 (rows-only; pytest
    asserts recall vs the exact baseline and cell pruning).

    Runs against the PERSISTED cell-partitioned index — built once per
    (session, sf) the way ingest would build it once per corpus; the
    query itself contains no k-means fit."""
    q = _query_vector(spark, sf_dir, 0)
    return ivf_topk_prebuilt(spark, q, k=10, exclude_id=0,
                             table_name=ivf_table_for(spark, sf_dir))


def q25_sim_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-blocked exact pairwise cosine ≥ 0.25 (oracle-checked).
    Uses the vectorized per-block matmul path; the pure-expression
    variant (``similar_pairs_blocked``) computes identical results and
    is cross-checked in pytest."""
    return similar_pairs_blocked_vectorized(
        load_table(spark, sf_dir, "embeddings"), threshold=0.25
    )


def q53_cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide cosine ≥ 0.4 near-dup pairs via the block-cross
    tile plan (oracle: DuckDB all-pairs list_cosine_similarity)."""
    return cosine_near_dup_pairs(load_table(spark, sf_dir, "embeddings"))


def semantic_dedup(
    spark: SparkSession,
    df: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    ivf_table: str | None = None,
    n_probe_assign: int = 2,
) -> DataFrame:
    """SemDeDup-style embedding-space dedup (Abbas et al. 2023,
    arXiv:2303.09540): k-means cells over the corpus, exact pairwise
    cosine ≥ ``threshold`` WITHIN each cell, transitive closure of the
    pair list, keep the minimum-id survivor per cluster.

    Returns ``(id, cell, component, cluster_size, is_canonical)`` for
    every input vector; ``is_canonical = 0`` is the semantic delete
    list.

    Scale shape — every stage reuses an operator whose 100 TB story is
    already established:
    - cell assignment comes from the PERSISTED IVF table when
      ``ivf_table`` is given (``create_ivf_table`` at ingest; no
      k-means in this call), falling back to an in-query seeded fit
      for tests/small corpora;
    - the quadratic stage is ``similar_pairs_blocked_vectorized`` on
      the cell key — one shuffle, pairs bounded by Σ|cell|², never
      corpus², and one BLAS matmul per cell instead of an interpreted
      per-pair dot (IVF cells are bounded by construction, which is
      exactly the vectorized variant's precondition); the paper's point
      is that k-means blocking makes in-cell quadratic work affordable;
    - cluster resolution is ``dedup.dup_clusters`` (min-label
      propagation over the pair list — pair-sized, not corpus-sized).

    Known method tradeoff (inherent to SemDeDup, documented in the
    paper): with single assignment, near-dup pairs split across two
    cells are never compared. ``n_probe_assign=2`` (default) writes
    each vector into its TWO nearest cells, so a boundary pair is only
    missed when NEITHER side's second-nearest cell reaches the other —
    the recall pytest measures both modes against the exact corpus-wide
    pair set rather than pretending the gap away. Pair generation reads
    every rank (×N rows through the quadratic stage, deduped after);
    the per-vector output keeps only the primary (rank-0) cell.
    """
    from .dedup import dup_clusters

    if ivf_table is not None:
        assigned = spark.table(ivf_table).select(
            id_col, emb_col, "probe_rank", "cell"
        )
    else:
        assigned, _ = ivf_index(
            df, n_cells, seed, id_col, emb_col, n_probe_assign
        )
    pairs = (
        similar_pairs_blocked_vectorized(
            assigned, "cell", threshold, id_col, emb_col
        )
        .select("id_a", "id_b")
        .distinct()  # a pair co-resident in two shared cells counts once
    )
    clusters = dup_clusters(df.select(id_col), pairs, id_col=id_col)
    return (
        assigned.where(F.col("probe_rank") == 0)
        .select(id_col, "cell")
        .join(clusters, id_col)
        .orderBy(id_col)
    )


def pq_train(
    df: DataFrame,
    m: int = 16,
    k: int = 16,
    seed: int = LSH_SEED,
    emb_col: str = "embedding",
    sample_n: int = 4096,
) -> list:
    """Product-quantization codebooks (Jégou et al. 2011, IEEE TPAMI
    33(1)): split the (L2-normalized) vector into ``m`` subvectors and
    k-means each subspace to ``k`` centroids.

    Training runs driver-side on a BOUNDED sample — codebooks are
    metadata, a few KB; the corpus-sized stages are encode/search
    below. The sample is content-addressed (top-n by md5 of the id,
    TakeOrderedAndProject) rather than ``limit``, which would take the
    first scan partitions and fit codebooks on a position-biased slice.
    Seeded Lloyd iterations keep the index deterministic for tests.
    Returns ``codebooks[m][k][dim/m]``.
    """
    import numpy as np

    rows = (
        df.select(F.col(emb_col), F.md5(F.col("vec_id").cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample_n)
        .select(emb_col)
        .collect()
    )
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1), 1e-12)[:, None]
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(25):  # Lloyd
            d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        books.append(cent.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed PQ encoding: ``(id, codes array<int>)`` — m 4-bit
    codes replace dim float32s (64-dim → 16 bytes, 16×). Arrow-batched
    ``mapInPandas`` with one numpy distance matrix per subspace per
    batch; at 100 TB this is the one-time ingest pass whose output is
    the RAM-resident scan table ADC search reads instead of the raw
    vectors.
    """
    import numpy as np
    import pandas as pd

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]

    def encode(batches):
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            x /= np.maximum(np.linalg.norm(x, axis=1), 1e-12)[:, None]
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin drops ||x||²
                d = -2.0 * (xs @ books[j].T) + (books[j] ** 2).sum(axis=1)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return df.select(id_col, emb_col).mapInPandas(
        encode, f"{id_col} long, codes array<int>"
    )


def pq_topk(
    codes_df: DataFrame,
    raw_df: DataFrame,
    codebooks: list,
    query_vec: list,
    k: int = 10,
    refine: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC search + exact re-rank: score every code row against the
    query's per-subspace lookup table (asymmetric distance — the query
    stays full-precision), shortlist ``refine`` candidates, then rescore
    ONLY the shortlist with exact cosine against the raw vectors.

    The scale shape: the scan touches m-byte codes (16 B/vector instead
    of 256 B), the LUT is m×k doubles broadcast as a literal, and the
    exact re-rank joins a ``refine``-sized id list back to the raw
    table — the standard PQ + refine pipeline, so recall is set by the
    shortlist size, not by quantization distortion.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    # lut[j][c] = q_j · c — ADC inner product accumulates per subspace
    lut = np.stack(
        [books[j] @ q[j * sub : (j + 1) * sub] for j in range(m)]
    )

    def score(batches):
        for pdf in batches:
            codes = np.asarray([np.asarray(c) for c in pdf["codes"]])
            s = lut[np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "adc_score": s})

    scored = codes_df.mapInPandas(score, f"{id_col} long, adc_score double")
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != F.lit(exclude_id))
    shortlist = scored.orderBy(F.desc("adc_score"), id_col).limit(refine)
    exact = raw_df.join(shortlist.select(id_col), id_col).select(
        F.col(id_col),
        F.round(cosine_expr(_as_double(emb_col), _vector_lit(list(map(float, q)))), 6).alias(
            "cosine"
        ),
    )
    return exact.orderBy(F.desc("cosine"), id_col).limit(k)


_PQ_CACHE: dict = {}


def q65_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ+refine approximate top-10 of vec_id=0 (rows-only; pytest
    asserts recall vs exact and the 16× code compression). Codebooks and
    codes build once per (session, sf) — the ingest-time artifacts a
    deployment persists like the IVF/MinHash index tables."""
    emb = load_table(spark, sf_dir, "embeddings")
    key = (id(spark), sf_dir)
    if key not in _PQ_CACHE:
        books = pq_train(emb)
        _PQ_CACHE[key] = (books, pq_encode(emb, books).cache())
    books, codes = _PQ_CACHE[key]
    q = _query_vector(spark, sf_dir, 0)
    return pq_topk(codes, emb, books, q, k=10, exclude_id=0)


_IVFPQ_CACHE: dict = {}


def ivfpq_table_for(spark: SparkSession, sf_dir: str) -> tuple[str, list, str]:
    """Persisted IVF+PQ scan table — the FAISS IVFADC layout: ``(vec_id,
    codes, cell)`` PARTITIONED BY cell, built ONCE per corpus at ingest
    by joining the PQ codes onto the IVF cell assignments. Returns
    (table name, codebooks, centroid side-table name). Codebooks are
    re-derived per session rather than persisted: ``pq_train`` is
    seeded AND content-addressed (md5-ordered sample), so any session
    training against the same corpus gets byte-identical books — the
    adopted on-disk codes stay decodable (a deployment would persist
    the few-KB books next to the table; here determinism substitutes).
    """
    key = (id(spark), sf_dir)
    if key not in _IVFPQ_CACHE:
        from .dedup import _sf_tag, reuse_persisted_table

        emb = load_table(spark, sf_dir, "embeddings")
        books = pq_train(emb)
        ivf_name = ivf_table_for(spark, sf_dir)
        name = f"embeddings_ivfpq_{_sf_tag(sf_dir)}"
        if not reuse_persisted_table(spark, name):
            codes = pq_encode(emb, books)
            cells = spark.table(ivf_name).select("vec_id", "cell")
            (
                codes.join(cells, "vec_id")
                .repartition("cell")
                .write.partitionBy("cell")
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        _IVFPQ_CACHE[key] = (name, books, f"{ivf_name}_centroids")
    return _IVFPQ_CACHE[key]


def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 6,
    refine: int = 100,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF+PQ approximate top-k (Jégou et al.'s IVFADC): rank cells by
    centroid cosine on the driver (metadata-sized), PARTITION-PRUNE the
    persisted code table to the ``n_probe`` probed cells, ADC-scan just
    those cells' 16-byte codes, exact-rerank the ``refine`` shortlist
    against the raw vectors. The 100 TB composition: IVF's pruning cuts
    the scan to n_probe/n_cells of the corpus and PQ cuts what remains
    to codes — neither tier alone does both; recall is governed by
    (n_probe, refine), both spelled in the plan, not by quantization
    distortion (the rerank is full-precision — the q65 contract)."""
    name, books, cent_table = ivfpq_table_for(spark, sf_dir)
    centroids = {
        r["cell"]: list(r["centroid"])
        for r in spark.table(cent_table).collect()
    }
    probe = _rank_cells(query_vec, centroids)[:n_probe]
    codes = spark.table(name).filter(F.col("cell").isin(probe))
    raw = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        codes, raw, books, query_vec, k=k, refine=refine,
        exclude_id=exclude_id,
    )


def q176_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ approximate top-10 of vec_id=0 (rows-only; pytest pins
    recall vs exact q23, the partition-pruned scan, exact-cosine
    rerank values, and determinism)."""
    q = _query_vector(spark, sf_dir, 0)
    return ivfpq_topk(spark, sf_dir, q, k=10, exclude_id=0)


def q63_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table at cosine ≥ 0.4, against the
    persisted TWO-probe IVF table (each vector in its 2 nearest cells,
    so cell-boundary near-dup pairs co-occur somewhere). Rows-only: the
    seeded k-means geometry has no DuckDB analog; pytest asserts
    planted-duplicate removal, survivor consistency, and recall vs the
    exact q53 pair set — multi-probe strictly above single-probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        spark,
        emb,
        threshold=0.4,
        ivf_table=ivf_table_for(spark, sf_dir, n_probe_assign=2),
    )


# ------------------------------------------- int8 scalar quantization
def int8_quantize_expr(vec: Column) -> Column:
    """Symmetric per-vector int8 codes: scale = max|x|/127, code =
    round-half-up(x/scale), clamped by construction to [-127, 127].
    4× smaller than float32 (16× vs the doubles Spark computes in) —
    the standard serving-layer compression tier between full precision
    and PQ (q65). Codes are kept as doubles holding integer values so
    the shared cosine path applies unchanged; cosine over codes is
    scale-invariant, so the per-vector scale needs no separate column
    for ranking purposes. ``floor(x*127/m + 0.5)`` rather than round():
    both engines agree on floor for every input, while round() is
    HALF_EVEN in Spark and HALF_UP in DuckDB.

    Zero vectors (m = 0) quantize to all-zero codes, which the cosine
    convention (cosine_expr → 0.0) then ranks last — engine-identical.
    """
    from .dedup import bind

    return bind(
        F.array_max(F.transform(vec, F.abs)),
        lambda m: F.transform(
            vec,
            lambda x: F.when(m > 0, F.floor(x * 127.0 / m + 0.5))
            .otherwise(F.lit(0))
            .cast("double"),
        ),
    )


def int8_codes(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """(id, q int8-codes-as-double) — the persisted quantized index a
    deployment writes at ingest (like the IVF/PQ tables)."""
    return df.select(
        F.col(id_col), int8_quantize_expr(_as_double(emb_col)).alias("q")
    )


def _int8_quantize_py(vec: list[float]) -> list[float]:
    """Driver-side twin of :func:`int8_quantize_expr` for probe vectors
    (same IEEE ops in the same order → identical codes)."""
    import math

    m = max(abs(float(x)) for x in vec) if vec else 0.0
    if m <= 0:
        return [0.0] * len(vec)
    return [float(math.floor(float(x) * 127.0 / m + 0.5)) for x in vec]


def int8_topk(
    codes: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k in int8 code space: the probe is quantized
    with the identical formula, ranking = cosine over integer-valued
    arrays (exact dot products — cross-engine bit-identical), top-k via
    TakeOrderedAndProject."""
    pq = _vector_lit(_int8_quantize_py(query_vec))
    return (
        codes.select(
            F.col(id_col),
            F.round(cosine_expr(F.col("q"), pq), 6).alias("q_cos"),
        )
        .orderBy(F.desc("q_cos"), id_col)
        .limit(k)
    )


def q77_int8_quant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 neighbors of vec_id=0 ranked by cosine over int8-quantized
    codes (oracle-checked: quantization is deterministic elementwise
    math and code dot products are exact integers, so DuckDB reproduces
    every score bit-for-bit). pytest pins fidelity vs the exact q23
    ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    return int8_topk(int8_codes(emb), q, k=20)


# ------------------------------------------ binary (sign) quantization
def binary_sign_codes(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, code array<long>) — sign bits packed 64-per-long: bit i of
    word w is set when embedding[w*64+i] > 0. One bit per dimension —
    64× smaller than the doubles Spark computes in (8× vs float32, 8×
    vs the int8 tier), the coarsest compression rung under int8 (q77)
    and PQ (q65). The packing is a static fold of per-element literal
    powers (dim is known at plan time), all whole-stage codegen. This
    builds the code frame; :func:`sign_codes_table_for` is what
    persists it once at ingest like the IVF/PQ/MinHash tables — query
    paths read the persisted codes, they never re-pack the corpus."""
    v = _as_double(emb_col)
    words = []
    for w in range((dim + 63) // 64):
        lo, n = w * 64, min(64, dim - w * 64)
        word = F.lit(0).cast("long")
        for i in range(n):
            # bit 63 is the sign bit: its power literal must enter as
            # the signed long Spark stores, not the Python 1<<63
            power = (1 << i) if i < 63 else -(1 << 63)
            word = word.bitwiseOR(
                F.when(
                    F.element_at(v, lo + i + 1) > 0,
                    F.lit(power).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            )
        words.append(word.alias(f"w{w}"))
    return df.select(F.col(id_col), F.array(*words).alias("code"))


def _pack_signs_py(vec: list[float]) -> list[int]:
    """Driver-side twin of :func:`binary_sign_codes` for probe vectors
    (same sign rule, same packing; word 63 wraps to the signed long)."""
    out = []
    for w in range((len(vec) + 63) // 64):
        word = 0
        for i, x in enumerate(vec[w * 64:(w + 1) * 64]):
            if float(x) > 0:
                word |= (1 << i) if i < 63 else -(1 << 63)
        out.append(word)
    return out


_SIGN_TABLE_CACHE: dict = {}


def sign_codes_table_for(
    spark: SparkSession,
    sf_dir: str,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """Persisted 1-bit sign index ``(vec_id, code array<long>)`` —
    built ONCE per corpus at ingest (same adopt-don't-rewrite contract
    as the IVF/PQ/MinHash tables: construction params live in the
    ``_sf_tag`` name, the source parquet is immutable, steady state is
    read-only). The point of the tier is that the Hamming scan reads
    1 bit/dim instead of the 64-bit doubles — which only holds if the
    scan targets this table, never the embedding column; the query
    path (:func:`binary_hamming_topk` via q199) reads codes only."""
    from .dedup import _sf_tag, reuse_persisted_table

    # construction params live in the name (r11 advice: a different
    # dim — or column mapping — must NEVER silently adopt another
    # build's code table), matching ivf_table_for's _pN convention;
    # non-default column names join the suffix so the default path
    # keeps a stable, short name
    key = (id(spark), sf_dir, dim, id_col, emb_col)
    if key not in _SIGN_TABLE_CACHE:
        cols = (
            "" if (id_col, emb_col) == ("vec_id", "embedding")
            else f"_{id_col}_{emb_col}"
        )
        name = f"embeddings_signbits_{_sf_tag(sf_dir)}_d{dim}{cols}"
        if not reuse_persisted_table(spark, name):
            emb = load_table(spark, sf_dir, "embeddings")
            (
                binary_sign_codes(emb, dim=dim, id_col=id_col,
                                  emb_col=emb_col)
                .write.mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        _SIGN_TABLE_CACHE[key] = name
    return _SIGN_TABLE_CACHE[key]


def binary_hamming_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Binary-quantized ANN: Hamming shortlist over packed sign codes
    (xor + bit_count per 64-dim word — the cheapest possible scan),
    then EXACT cosine rerank of the ``shortlist`` survivors.

    Spark shape (scales to 100 TB): pass ``codes`` = the persisted
    sign index (``sign_codes_table_for``) so the scan stage reads only
    the code column (1 bit/dim — the tier's 64×-smaller-scan story);
    with ``codes=None`` the codes are packed inline from ``emb``
    (ad-hoc/test path — reads full-precision vectors, do not use at
    scale). The shortlist is a rank-limited TakeOrderedAndProject (no
    full sort), and the rerank broadcasts the shortlist ids back onto
    the embedding table — full-precision vectors are touched for
    ``shortlist`` rows only. Deterministic: Hamming ties break on id,
    cosine ties on id."""
    if codes is None:
        codes = binary_sign_codes(emb, dim=len(query_vec),
                                  id_col=id_col, emb_col=emb_col)
    pw = _pack_signs_py(query_vec)
    ham = F.lit(0)
    for w, p in enumerate(pw):
        ham = ham + F.bit_count(
            F.element_at(F.col("code"), w + 1).bitwiseXOR(
                F.lit(p).cast("long")
            )
        )
    if exclude_id is not None:
        codes = codes.filter(F.col(id_col) != exclude_id)
    short = (
        codes.select(F.col(id_col), ham.cast("long").alias("hamming"))
        .orderBy("hamming", id_col)
        .limit(shortlist)
    )
    pq = _vector_lit(query_vec)
    return (
        emb.join(F.broadcast(short), id_col)
        .select(
            F.col(id_col),
            F.col("hamming"),
            F.round(cosine_expr(_as_double(emb_col), pq), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def q199_ann_binary_hamming_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-quantization ANN tier: top-10 neighbors of vec_id=0 via a
    100-candidate Hamming shortlist over packed sign bits, exact-cosine
    reranked. Completes the compression ladder exact (q23) → int8
    (q77) → PQ (q65) → IVFADC (q176) with the 1-bit rung. Runs against
    the PERSISTED sign-code table (``sign_codes_table_for`` — built
    once per corpus at ingest); the Hamming stage scans codes only,
    never the embedding column (plan-pinned in pytest). Oracle: DuckDB
    reproduces the whole pipeline (sign-disagreement count via
    list_transform, same shortlist order, list_cosine_similarity
    rerank)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    codes = spark.table(sign_codes_table_for(spark, sf_dir, dim=len(q)))
    return binary_hamming_topk(emb, q, k=10, shortlist=100,
                               exclude_id=0, codes=codes)


# --------------------------------------------------- k-means clustering
def _kmeans_seeds(
    vecs: DataFrame, k: int, id_col: str, emb_col: str
) -> list[list[float]]:
    """Deterministic, content-addressed initial centroids: the k vectors
    with the smallest md5(id). A partition-order ``limit(k)`` would seed
    from whatever scan partitions answer first (source-biased on an
    ordered corpus); the md5 order is an unbiased deterministic shuffle
    — same convention as the PQ codebook sample (pq_train)."""
    rows = (
        vecs.select(
            _as_double(emb_col).alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def _best_cluster_expr(v: Column, centroids: list[list[float]]) -> Column:
    """struct(d, c) of the nearest centroid by squared L2 — k × dim
    multiply-adds per row in whole-stage codegen, centroids inlined as
    broadcast literals. Ties break toward the lower cluster id via
    struct ordering."""

    def dist2(c: list[float]) -> Column:
        return F.aggregate(
            F.zip_with(v, _vector_lit(c), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.array_min(
        F.array(
            *[
                F.struct(dist2(c).alias("d"), F.lit(i).alias("c"))
                for i, c in enumerate(centroids)
            ]
        )
    )


def kmeans_assign(
    vecs: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2) — assignment pass, no shuffle, no Python."""
    best = _best_cluster_expr(_as_double(emb_col), centroids)
    return vecs.select(
        F.col(id_col),
        best["c"].alias("cluster"),
        best["d"].alias("dist2"),
    )


def _kmeans_driver(
    X, seeds: list[list[float]], n_iter: int
) -> tuple[list[list[float]], list[int], list[float]]:
    """Exact Lloyd iterations over a BOUNDED collected (id-sorted)
    n × dim numpy matrix — the fast tier, same reasoning as the
    pagerank/connected_components driver tiers: each distributed
    superstep costs ~0.3 s of job overhead and the final codegen
    assignment ~0.7 s of Janino, regardless of data size. Returns
    (centroids, assignment, dist2) with numpy argmin's first-minimum
    tie break (same rule as the expression tier's struct ordering)."""
    import numpy as np

    cm = np.asarray(seeds)
    a = None
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(cm.shape[0]):
            m = a == c
            if m.any():
                cm[c] = X[m].sum(axis=0) / m.sum()
    d2 = ((X[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    return (
        [list(map(float, c)) for c in cm],
        [int(x) for x in a],
        [float(d2[i, a[i]]) for i in range(len(a))],
    )


def _collect_sorted(
    vecs: DataFrame, id_col: str, emb_col: str
) -> tuple["list", "object"]:
    """Collect (ids, n × dim float64 matrix) sorted by id — a
    deterministic driver-side snapshot independent of scan partition
    order. Goes through Arrow (``toPandas`` on the two slim columns)
    into ONE contiguous numpy matrix rather than Python row objects:
    at the 100k-row tier bound with 64-dim vectors that is
    100_000 × 64 × 8 B = 51.2 MB of driver RSS (plus an id column),
    not the gigabyte-class boxed-float graph a ``collect()`` of list
    rows would build."""
    import numpy as np

    pdf = vecs.select(F.col(id_col), _as_double(emb_col).alias("v")).toPandas()
    pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    ids = pdf[id_col].tolist()
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    return ids, X


def kmeans_fit(
    vecs: DataFrame,
    k: int = 10,
    n_iter: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    driver_max_rows: int = 100_000,
) -> list[list[float]]:
    """Lloyd's k-means with DataFrame-native supersteps (above
    ``driver_max_rows``) or exact driver-side iteration below it — the
    adaptive convention shared with connected_components/pagerank;
    seeds and update rule are identical in both tiers, and the planted
    fixtures pin their agreement. The bound's budget math (same style
    as connected_components' 2M-edge bound): the snapshot lands as one
    Arrow-backed float64 matrix, 100_000 × 64 dims × 8 B ≈ 51 MB, and
    Lloyd's pairwise-distance temp adds n × k × 8 B ≈ 8 MB at k=10 —
    comfortably inside a driver heap, and an order of magnitude below
    the old 500k boxed-list default the r5 review flagged.

    Per round: one assignment pass (broadcast centroid literals, no
    shuffle) + one update aggregation — ``posexplode`` to (cluster,
    dim, component) and a partial-aggregated groupBy, so the shuffle
    moves k × dim partial sums per map task, never vectors. The k × dim
    result (a few KB) collects to the driver to become the next round's
    literals — the same metadata-sized barrier the IVF builder uses.
    Empty clusters keep their previous centroid. Fixed ``n_iter``
    supersteps (no convergence probe): deterministic cost, and dedup/
    SemDeDup-style corpora converge in a handful of rounds; callers
    needing a tolerance stop can compare successive centroid frames.

    MLlib's ``KMeans`` (k-means|| init) is the stock alternative; this
    native loop exists because the engine contract requires bit-stable
    deterministic output across runs, which seeded sampling inits don't
    give.

    The per-round pass is an Arrow ``mapInPandas`` (BLAS assignment +
    per-partition partial sums), not the expression form
    :func:`kmeans_assign` uses: each round has NEW centroid literals, so
    the expression form would recompile a k × dim codegen tree per
    round (~0.7 s of Janino per superstep — measured; it dominated the
    fit). The Python pass emits k × dim partial rows per partition —
    the same slim-shuffle shape — and the vectorized matmul is the
    standard per-batch cost. The FINAL assignment (one compile, fixed
    centroids) stays in codegen.
    """
    import numpy as np
    import pandas as pd

    cents = _kmeans_seeds(vecs, k, id_col, emb_col)
    if vecs.count() <= driver_max_rows:
        _ids, X = _collect_sorted(vecs, id_col, emb_col)
        cm, _a, _d = _kmeans_driver(X, cents, n_iter)
        return cm
    dim = len(cents[0])
    src = vecs.select(_as_double(emb_col).alias("v")).localCheckpoint()
    for _ in range(n_iter):
        C = [list(c) for c in cents]  # plain floats into the closure

        def partials(batches, C=C):
            cm = np.asarray(C)  # k × dim
            cn2 = (cm * cm).sum(axis=1)
            for pdf in batches:
                X = np.array(list(pdf["v"]), dtype=np.float64)
                if len(X) == 0:
                    continue
                # argmin ||x-c||² = argmin (|c|² - 2 x·c); ties → lowest
                # cluster id (np.argmin takes the first minimum)
                a = np.argmin(cn2[None, :] - 2.0 * (X @ cm.T), axis=1)
                out = []
                for cl in np.unique(a):
                    s = X[a == cl].sum(axis=0)
                    n = int((a == cl).sum())
                    out.extend(
                        {"cluster": int(cl), "dim": d, "s": float(s[d]), "n": n}
                        for d in range(X.shape[1])
                    )
                yield pd.DataFrame(out)

        sums = (
            src.mapInPandas(partials, "cluster int, dim int, s double, n long")
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        nxt = [list(c) for c in cents]
        for r in sums:
            nxt[r["cluster"]][r["dim"]] = r["s"] / r["n"]
        cents = nxt
    return cents


def kmeans_clusters(
    vecs: DataFrame,
    k: int = 10,
    n_iter: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    driver_max_rows: int = 100_000,
) -> DataFrame:
    """Final per-vector cluster assignment after :func:`kmeans_fit` —
    the corpus-organization primitive under SemDeDup/IVF (those persist
    their cells at ingest; this is the reusable fit+assign surface).
    Bounded inputs fit AND assign on the driver (one Arrow collect into
    a numpy matrix — see :func:`_collect_sorted`'s bytes math — no
    codegen compile); larger ones use the distributed fit plus the
    expression assignment pass."""
    seeds = _kmeans_seeds(vecs, k, id_col, emb_col)
    if vecs.count() <= driver_max_rows:
        ids, X = _collect_sorted(vecs, id_col, emb_col)
        _cm, assign, d2 = _kmeans_driver(X, seeds, n_iter)
        import math

        out = [
            (ids[i], assign[i], round(math.sqrt(d2[i]), 6))
            for i in range(len(ids))
        ]
        return vecs.sparkSession.createDataFrame(
            out, f"{id_col} long, cluster int, dist double"
        ).orderBy(id_col)
    cents = kmeans_fit(vecs, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col)
    return (
        kmeans_assign(vecs, cents, id_col=id_col, emb_col=emb_col)
        .select(id_col, "cluster", F.round(F.sqrt("dist2"), 6).alias("dist"))
        .orderBy(id_col)
    )


def q78_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=10 Lloyd clustering of the embeddings corpus (rows-only: the
    iterative fit has no DuckDB analog; pytest pins determinism,
    monotone inertia, and planted-label purity)."""
    return kmeans_clusters(load_table(spark, sf_dir, "embeddings"), k=10)


# ------------------------------------------------------------ kNN graph
def knn_graph(
    df: DataFrame,
    k: int = 5,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """EXACT k-nearest-neighbor graph over the whole corpus: for every
    vector, its top-k cosine neighbors with ranks — the substrate for
    SemDeDup-style graph dedup, kNN-classification features, and
    UMAP/graph-cluster preprocessing (an ALL-queries top-k, where
    ``cosine_topk`` answers one query).

    Plan: same (n_blocks²+n_blocks)/2 block-cross tiling as
    :func:`cosine_near_dup_pairs` — one BLAS matmul per tile — but each
    tile emits only its LOCAL top-k per row (both directions on
    off-diagonal tiles), so ≤ n·B·k candidate rows ever exist as Spark
    rows; a window rank over candidates yields the global top-k. Local
    top-k under the (cosine DESC, neighbor id ASC) total order is
    lossless: a global top-k neighbor is in the tile covering that
    pair, where anything outranking it locally also outranks it
    globally — so it survives its tile's cut. Tile-side tie-break is
    vectorized by pre-sorting the neighbor axis by id and using a
    STABLE argsort on -cosine (no per-row Python loop).
    """
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.window import Window  # noqa: PLC0415

    spark = df.sparkSession
    if n_blocks is None:
        n = df.count()
        n_blocks = max(1, min(64, math.ceil(n / 1000)))
    src = df.select(
        F.col(id_col).alias("id"),
        _as_double(emb_col).alias("e"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    tasks = spark.createDataFrame(
        [(bi, bj) for bi in range(n_blocks) for bj in range(bi, n_blocks)],
        "bi int, bj int",
    )
    left = (
        src.alias("sl")
        .join(F.broadcast(tasks.alias("tl")), F.col("sl.blk") == F.col("tl.bi"))
        .select(
            F.col("tl.bi").alias("bi"), F.col("tl.bj").alias("bj"),
            F.col("sl.id").alias("id"), F.col("sl.e").alias("e"),
        )
    )
    right = (
        src.alias("sr")
        .join(F.broadcast(tasks.alias("tr")), F.col("sr.blk") == F.col("tr.bj"))
        .select(
            F.col("tr.bi").alias("bi"), F.col("tr.bj").alias("bj"),
            F.col("sr.id").alias("id"), F.col("sr.e").alias("e"),
        )
    )

    def _norm_rows(frame: "pd.DataFrame") -> tuple:
        ids = frame["id"].to_numpy()
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in frame["e"]])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        return ids, m / norms[:, None]

    def _local_topk(cos, row_ids, col_ids):
        """Per-row local top-k of a (rows × cols) cosine matrix whose
        COLUMNS are already sorted by id; stable argsort on -cos makes
        ties break toward the smaller neighbor id."""
        kk = min(k, cos.shape[1])
        order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(row_ids, kk)
        cols = col_ids[order.ravel()]
        vals = np.take_along_axis(cos, order, axis=1).ravel()
        keep = ~np.isneginf(vals)
        return rows[keep], cols[keep], vals[keep]

    def tile(l: "pd.DataFrame", r: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id": pd.Series(dtype="int64"),
             "nbr": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if l.empty or r.empty:
            return empty
        ida, ma = _norm_rows(l)
        idb, mb = _norm_rows(r)
        # sort the neighbor axis by id so stable argsort tie-breaks by id
        ob = np.argsort(idb, kind="stable")
        idb, mb = idb[ob], mb[ob]
        cos = np.round(ma @ mb.T, 6)
        same_block = int(l["bi"].iloc[0]) == int(l["bj"].iloc[0])
        outs = []
        if same_block:
            cos[ida[:, None] == idb[None, :]] = -np.inf  # no self edge
            outs.append(_local_topk(cos, ida, idb))
        else:
            outs.append(_local_topk(cos, ida, idb))
            oa = np.argsort(ida, kind="stable")
            outs.append(_local_topk(cos.T[:, oa], idb, ida[oa]))
        rows = np.concatenate([o[0] for o in outs])
        cols = np.concatenate([o[1] for o in outs])
        vals = np.concatenate([o[2] for o in outs])
        return pd.DataFrame({"id": rows, "nbr": cols, "cosine": vals})

    cands = (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(tile, "id long, nbr long, cosine double")
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), "nbr")
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("id", "rank")
    )


def q107_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN graph over the embeddings corpus (oracle: DuckDB
    all-pairs window). This exact tier is the ORACLE BASELINE for the
    IVF-cell approximate tier (:func:`knn_graph_ivf`, q124) — at
    corpus scale the approximate graph over the persisted cells is the
    deployment path and this tile-exact build is what its recall is
    measured against."""
    return knn_graph(load_table(spark, sf_dir, "embeddings"), k=5)


def knn_graph_ivf(
    spark: SparkSession,
    df: DataFrame | None = None,
    k: int = 5,
    ivf_table: str | None = None,
    n_cells: int = 16,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_probe_assign: int = 2,
) -> DataFrame:
    """APPROXIMATE k-nearest-neighbor graph over the persisted IVF
    cells — the SemDeDup blocking idea (:func:`semantic_dedup`)
    applied to graph construction: each vector's candidate neighbors
    are the co-residents of its ``n_probe_assign`` nearest cells; the
    exact tier (:func:`knn_graph`, q107) is this tier's oracle
    baseline, and the recall pytest measures the gap on planted
    neighborhoods and on the live corpus instead of pretending it away.

    Plan: cell assignment comes from the PERSISTED multi-probe IVF
    table when given (``create_ivf_table`` at ingest — no k-means
    here); one ``applyInPandas`` per cell computes the in-cell cosine
    matrix with a single BLAS matmul and emits only each row's LOCAL
    top-k (≤ probes·k candidate rows per vector ever exist); a
    (id, nbr) max-merge deduplicates shared-cell pairs and a window
    rank keeps the global top-k under the exact tier's
    (cosine DESC, nbr ASC) total order.

    Scale: the quadratic stage is bounded by Σ|cell|² like SemDeDup —
    never corpus² — and cells shuffle once on the cell key; at 100 TB
    the IVF table is the ingest artifact and this graph is an
    incremental per-cell rebuild when cells change.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.window import Window  # noqa: PLC0415

    if ivf_table is not None:
        assigned = spark.table(ivf_table).select(
            F.col(id_col).alias("id"),
            _as_double(emb_col).alias("e"),
            "cell",
        )
    else:
        idx, _ = ivf_index(df, n_cells, seed, id_col, emb_col, n_probe_assign)
        assigned = idx.select(
            F.col(id_col).alias("id"), _as_double(emb_col).alias("e"), "cell"
        )

    def cell_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id": pd.Series(dtype="int64"),
             "nbr": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["id"].to_numpy()
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["e"]])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        # sort the neighbor axis by id so stable argsort tie-breaks by
        # id — the exact tier's convention
        order = np.argsort(ids, kind="stable")
        idb, mb = ids[order], m[order]
        cos = np.round(m @ mb.T, 6)
        cos[ids[:, None] == idb[None, :]] = -np.inf  # no self edge
        kk = min(k, cos.shape[1] - 1)
        top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(ids, kk)
        cols = idb[top.ravel()]
        vals = np.take_along_axis(cos, top, axis=1).ravel()
        keep = ~np.isneginf(vals)
        return pd.DataFrame(
            {"id": rows[keep], "nbr": cols[keep], "cosine": vals[keep]}
        )

    cands = assigned.groupBy("cell").applyInPandas(
        cell_topk, "id long, nbr long, cosine double"
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), "nbr")
    return (
        cands.groupBy("id", "nbr")
        .agg(F.max("cosine").alias("cosine"))  # shared-cell pairs once
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("id", "rank")
    )


def q124_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate 5-NN graph over the persisted 2-probe IVF cells
    (rows-only: approximation has no SQL twin; the recall pytest
    measures it against the exact q107 tier, which is its oracle
    baseline)."""
    return knn_graph_ivf(
        spark, k=5, ivf_table=ivf_table_for(spark, sf_dir, n_probe_assign=2)
    )


def knn_graph_oracle_sql(k: int = 5) -> str:
    """DuckDB twin of :func:`knn_graph` (all-pairs + window rank)."""
    a, b = "a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]"
    # same zero-norm-→0.0 convention as queries._cos_sql / cosine_expr
    cos = (
        f"CASE WHEN list_dot_product({a}, {a}) = 0"
        f"       OR list_dot_product({b}, {b}) = 0 THEN 0.0"
        f"     ELSE list_cosine_similarity({a}, {b}) END"
    )
    return f"""
        WITH pairs AS (
          SELECT a.vec_id AS id, b.vec_id AS nbr,
                 round({cos}, 6) AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY id
                                       ORDER BY cosine DESC, nbr) AS rank
          FROM pairs
        )
        SELECT id, nbr, cosine, rank
        FROM ranked WHERE rank <= {k}
        ORDER BY id, rank
    """


def mutual_knn_clusters(
    df: DataFrame,
    k: int = 5,
    min_cosine: float = 0.2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    knn: DataFrame | None = None,
) -> DataFrame:
    """Mutual-kNN clustering: an edge exists iff each vector is in the
    OTHER's top-k (and the similarity clears ``min_cosine`` — without a
    floor, mutual-kNN still chains through weakly-similar points);
    transitive closure of those edges yields the cluster assignment
    ``(vec_id, component, cluster_size, is_canonical)``. The standard
    robust-clustering step over a kNN graph: one-directional edges are
    hub artifacts, mutuality prunes them.

    Scale: composes two operators that already scale — the tiled
    :func:`knn_graph` (≤ n·B·k candidate rows) and dedup's adaptive
    :func:`connected_components` (driver union-find under the edge
    bound, Pregel propagation above). The mutuality check is one
    groupBy on the (lo, hi) edge key: a pair with BOTH directions
    present appears exactly twice.
    """
    from .dedup import connected_components  # noqa: PLC0415
    from pyspark.sql import Window  # noqa: PLC0415

    g = knn if knn is not None else knn_graph(
        df, k=k, id_col=id_col, emb_col=emb_col
    )
    mutual = (
        g.filter(F.col("cosine") >= min_cosine)
        .select(
            F.least("id", "nbr").alias("id_a"),
            F.greatest("id", "nbr").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_dir"))
        .filter(F.col("n_dir") == 2)
        .select("id_a", "id_b")
    )
    comp = connected_components(mutual).withColumnRenamed("id", id_col)
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col).cast("long")).alias(
                "component"
            ),
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
        .withColumn(
            "is_canonical",
            (F.col(id_col) == F.col("component")).cast("int"),
        )
        .orderBy(id_col)
    )


_KNN_TABLE_CACHE: dict = {}


def knn_table_for(spark: SparkSession, sf_dir: str, k: int = 5) -> str:
    """Per-(session, corpus) PERSISTED kNN graph — an ingest artifact
    like the MinHash signatures, shingle sets, and IVF cells: a real
    pipeline materializes the neighbor graph once at dedup/indexing
    time and every downstream consumer (mutual-kNN clustering q108,
    graph features, SemDeDup variants) reads it instead of re-running
    the tiled matmul. q107 stays a LIVE run — it is the oracle-checked
    exact tier and its timing must reflect the graph build's true
    cost (the q52/q60 split)."""
    from .dedup import _sf_tag, reuse_persisted_table

    key = (id(spark), sf_dir, k)
    if key not in _KNN_TABLE_CACHE:
        name = f"embeddings_knn{k}_{_sf_tag(sf_dir)}"
        if not reuse_persisted_table(spark, name):
            knn_graph(
                load_table(spark, sf_dir, "embeddings"), k=k
            ).write.mode("overwrite").format("parquet").saveAsTable(name)
        _KNN_TABLE_CACHE[key] = name
    return _KNN_TABLE_CACHE[key]


def q108_mutual_knn_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN clusters from the PERSISTED neighbor graph (the
    ingest artifact q107 builds live)."""
    return mutual_knn_clusters(
        load_table(spark, sf_dir, "embeddings"),
        knn=spark.table(knn_table_for(spark, sf_dir)),
    )


def mutual_knn_oracle_sql(k: int = 5, min_cosine: float = 0.2) -> str:
    """DuckDB twin of :func:`mutual_knn_clusters` (all-pairs window →
    mutual filter → recursive closure, q60's CTE shape)."""
    a, b = "a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]"
    cos = (
        f"CASE WHEN list_dot_product({a}, {a}) = 0"
        f"       OR list_dot_product({b}, {b}) = 0 THEN 0.0"
        f"     ELSE list_cosine_similarity({a}, {b}) END"
    )
    return f"""
        WITH RECURSIVE ranked AS (
          SELECT a.vec_id AS id, b.vec_id AS nbr,
                 round({cos}, 6) AS cosine,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY round({cos}, 6) DESC, b.vec_id)
                     AS rank
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        ), topk AS (
          SELECT id, nbr FROM ranked
          WHERE rank <= {k} AND cosine >= {min_cosine}
        ), mutual AS (
          SELECT least(id, nbr) AS id_a, greatest(id, nbr) AS id_b
          FROM topk GROUP BY 1, 2 HAVING count(*) = 2
        ), e AS (
          SELECT id_a AS a, id_b AS b FROM mutual
          UNION
          SELECT id_b AS a, id_a AS b FROM mutual
        ), r(id, lbl) AS (
          SELECT a, a FROM e
          UNION
          SELECT e.a, r.lbl FROM e JOIN r ON e.b = r.id
        ), comp AS (
          SELECT id, min(lbl) AS component FROM r GROUP BY id
        ), base AS (
          SELECT v.vec_id,
                 coalesce(c.component, v.vec_id) AS component
          FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.id
        )
        SELECT vec_id, component,
               count(*) OVER (PARTITION BY component) AS cluster_size,
               CAST(vec_id = component AS INT) AS is_canonical
        FROM base
        ORDER BY vec_id
    """


# ------------------------------------------------ MMR diversified top-k
def mmr_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR '98):
    top-k balancing query relevance against redundancy with the
    already-selected set — ``argmax λ·sim(q,d) − (1−λ)·max_{s∈S}
    sim(d,s)``. The diversity pass a retrieval-augmented sampler needs
    when the plain top-k is dominated by near-duplicates (the exact
    failure SemDeDup measures).

    Two tiers, same contract as the retrieval rankers (q75/q80):
    - DISTRIBUTED: the exact cosine ``shortlist`` via
      TakeOrderedAndProject — each partition contributes its local
      top-``shortlist``; the only stage that touches the corpus;
    - BOUNDED: the O(k·shortlist) greedy selection runs on the
      collected shortlist — ≤``shortlist`` rows by construction
      (driver-sized, documented bound, NOT a corpus collect).

    Deterministic: cosines are 6dp-rounded before selection and ties
    break on id, so the selected set is engine- and order-independent.
    Rows-only registry entry (the greedy recurrence has no SQL analog);
    the pytest plants a redundant cluster and asserts (a) λ=1 degrades
    to exact top-k, (b) λ<1 swaps redundant picks for diverse ones.
    """
    import numpy as np

    emb = _as_double(emb_col)
    out = df if exclude_id is None else df.filter(F.col(id_col) != exclude_id)
    cos = F.round(cosine_expr(emb, _vector_lit(query_vec)), 6)
    cand = (
        out.select(
            F.col(id_col),
            cos.alias("rel"),
            normalized_expr(emb).alias("_nvec"),
        )
        .orderBy(F.desc("rel"), id_col)
        .limit(shortlist)
        .collect()
    )
    if not cand:
        schema = "rank int, " + id_col + " bigint, cosine double, mmr double"
        return df.sparkSession.createDataFrame([], schema)
    ids = [r[id_col] for r in cand]
    rel = np.array([r["rel"] for r in cand])
    V = np.array([r["_nvec"] for r in cand])  # shortlist × dim, unit rows
    sims = np.round(V @ V.T, 6)  # pairwise cosine, same 6dp contract
    picked: list[int] = []
    scores: list[float] = []
    avail = list(range(len(cand)))
    while avail and len(picked) < k:
        if picked:
            red = sims[np.ix_(avail, picked)].max(axis=1)
        else:
            red = np.zeros(len(avail))
        mmr = lam * rel[avail] - (1.0 - lam) * red
        # argmax with (score desc, id asc) tie-break, float-stable
        best = min(range(len(avail)), key=lambda i: (-mmr[i], ids[avail[i]]))
        picked.append(avail[best])
        scores.append(float(np.round(mmr[best], 6)))
        avail.pop(best)
    rows = [
        (i + 1, ids[j], float(rel[j]), scores[i])
        for i, j in enumerate(picked)
    ]
    schema = "rank int, " + id_col + " bigint, cosine double, mmr double"
    return df.sparkSession.createDataFrame(rows, schema)


def q130_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-10 around vec_id=0 (rows-only; recall/
    degradation pytest vs exact q23)."""
    q = _query_vector(spark, sf_dir, 0)
    return mmr_topk(
        load_table(spark, sf_dir, "embeddings"), q, k=10, exclude_id=0
    )


# ----------------------------------------- label-centroid separability
def label_centroid_report(
    df: DataFrame,
    dim: int = EMBED_DIM,
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding geometry: member count, centroid norm, and
    the mean member-to-centroid distance — the label-quality audit a
    training pipeline runs to find collapsed (near-zero scatter) or
    incoherent (huge scatter) classes before fitting a classifier.

    Plan shape: centroids come from ONE groupBy with ``dim`` codegen
    ``sum(element_at(...))`` expressions — no posexplode (an explode
    multiplies the shuffle by dim; at 100 TB that is the difference
    between shuffling n rows and n×64). The centroid table is
    labels-sized, so the distance pass broadcast-joins it back and
    aggregates on the same label key. Two scans of the embeddings —
    the unavoidable stats-then-score shape (same as winsorization).
    """
    e = F.col(emb_col).cast("array<double>")
    emb = df.select(F.col(label_col).alias("label"), e.alias("e"))
    # parsed SQL strings, not per-dim Column building: the 2×dim
    # py4j-built expressions cost ~0.4 s of pure plan construction per
    # build through this environment's gateway (guide §5 driver work;
    # same trees — the q166/q198 emit-SQL precedent)
    sums = [
        F.expr(f"sum(element_at(e, {i + 1})) AS s{i}") for i in range(dim)
    ]
    cent = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .select(
            "label",
            "n",
            F.expr(
                "array("
                + ", ".join(f"(s{i} / n)" for i in range(dim))
                + ") AS c"
            ),
        )
    )
    cent = cent.select(
        "label",
        "n",
        "c",
        F.round(norm_expr(F.col("c")), 6).alias("centroid_norm"),
    )
    dist = F.expr(
        "sqrt(aggregate(zip_with(e, c, (x, m) -> ((x - m) * (x - m))), "
        "0.0D, (acc, x) -> (acc + x)))"
    )
    return (
        emb.join(F.broadcast(cent), "label")
        .groupBy("label")
        .agg(
            F.first("n").alias("n"),
            F.first("centroid_norm").alias("centroid_norm"),
            F.round(F.avg(dist), 6).alias("avg_dist"),
        )
        .orderBy("label")
    )


def q146_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + scatter (oracle: DuckDB unnest-with-
    ordinality twin)."""
    return label_centroid_report(load_table(spark, sf_dir, "embeddings"))


LABEL_CENTROID_ORACLE_SQL = """
    WITH e AS (
      SELECT label, vec_id, embedding[u.i]::DOUBLE AS x, u.i AS pos
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ), c AS (
      SELECT label, pos, avg(x) AS m, count(*) AS n_at_pos
      FROM e GROUP BY label, pos
    ), cn AS (
      SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm,
             min(n_at_pos) AS n
      FROM c GROUP BY label
    ), d AS (
      SELECT e.label, e.vec_id, sqrt(sum((e.x - c.m) * (e.x - c.m))) AS dist
      FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
      GROUP BY e.label, e.vec_id
    )
    SELECT d.label, cn.n, cn.centroid_norm,
           round(avg(d.dist), 6) AS avg_dist
    FROM d JOIN cn ON d.label = cn.label
    GROUP BY d.label, cn.n, cn.centroid_norm
    ORDER BY d.label
"""
