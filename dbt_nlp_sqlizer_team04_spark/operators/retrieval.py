"""Chunk-level text retrieval — the RAG-shaped composition of three
existing components: overlapping chunking (``packing.chunk_documents``),
the hashed TF-IDF encoder the model plane already ships
(``models/embedder.py``, the public-knowledge analog of a sentence
encoder per SURVEY.md A12), and the similarity plane's cosine top-k.

Scale shape:
- the encoder FITS on a bounded sample (IDF statistics converge fast;
  the fitted model is a ``dim``-sized int array — metadata, like PQ
  codebooks) and is BROADCAST into an Arrow ``mapInPandas`` encode pass
  — the corpus-sized stage is one flat map, no shuffle;
- at deployment the chunk vectors are written once at ingest and served
  through the persisted ANN paths (IVF cells / PQ codes — q43/q65);
  the brute-force cosine here is the exactness baseline, same
  convention as q23 vs q24;
- retrieval is ``cosine_expr`` + ``TakeOrderedAndProject`` — top-k
  never materializes a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..models.embedder import HashingTfidfEncoder
from ..sources.parquet import load_table
from .dedup import tokens_expr
from .packing import chunk_documents
from .similarity import _as_double, _vector_lit, cosine_expr

DEFAULT_DIM = 256


def fit_chunk_encoder(
    chunks: DataFrame,
    dim: int = DEFAULT_DIM,
    sample_n: int = 2048,
    text_col: str = "chunk_text",
) -> HashingTfidfEncoder:
    """Fit IDF statistics on a bounded chunk sample (driver-side collect
    of ``sample_n`` texts — the fitted encoder is metadata-sized).

    The sample is content-addressed (top-n by md5 of the chunk key via
    TakeOrderedAndProject), NOT ``limit(n)``: limit takes whatever scan
    partitions answer first, which on a source-ordered corpus fits the
    IDF on one source/language; the md5 order is an unbiased,
    partition-invariant shuffle of the corpus."""
    texts = [
        r[0]
        for r in chunks.select(
            F.col(text_col),
            F.md5(F.concat_ws("_", "doc_id", "chunk_id")).alias("__h"),
        )
        .orderBy("__h")
        .limit(sample_n)
        .collect()
    ]
    return HashingTfidfEncoder(dim=dim).fit(texts)


def encode_chunks(
    chunks: DataFrame,
    encoder: HashingTfidfEncoder,
    text_col: str = "chunk_text",
) -> DataFrame:
    """Distributed encode: ``(doc_id, chunk_id, emb)`` via one
    Arrow-batched ``mapInPandas`` pass with the fitted encoder broadcast
    in the closure. The text column is projected away after encoding —
    downstream similarity never moves it."""
    import pandas as pd

    enc_state = encoder.to_dict()

    def encode(batches):
        enc = HashingTfidfEncoder.from_dict(enc_state)
        for pdf in batches:
            vecs = enc.encode_many(list(pdf[text_col]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "chunk_id": pdf["chunk_id"],
                    "emb": [v.tolist() for v in vecs],
                }
            )

    return chunks.select("doc_id", "chunk_id", text_col).mapInPandas(
        encode, "doc_id long, chunk_id long, emb array<float>"
    )


def retrieve_chunks(
    chunk_vecs: DataFrame,
    encoder: HashingTfidfEncoder,
    question: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k chunks for a text query (query encoded
    driver-side — one vector)."""
    q = [float(x) for x in encoder.encode(question)]
    c = cosine_expr(_as_double("emb"), _vector_lit(q))
    return (
        chunk_vecs.select(
            "doc_id", "chunk_id", F.round(c, 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), "doc_id", "chunk_id")
        .limit(k)
    )


_CHUNK_INDEX_CACHE: dict = {}


def create_chunk_index_tables(
    spark: SparkSession, docs: DataFrame, table_name: str
) -> None:
    """ONE-TIME ingest step: chunk the corpus, fit the encoder on a
    content-addressed sample, and persist the chunk-vector table plus a
    one-row ``<name>_encoder`` sidecar holding the fitted encoder state
    (JSON — it is metadata-sized, like the IVF centroids table). The
    Python encode pass runs once per corpus here instead of once per
    process."""
    import json
    import os
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (table_name, f"{table_name}_encoder"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(warehouse, t)
        if os.path.exists(loc):
            shutil.rmtree(loc)
    chunks = chunk_documents(docs)
    enc = fit_chunk_encoder(chunks)
    (
        encode_chunks(chunks, enc)
        .write.mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )
    spark.createDataFrame(
        [(json.dumps(enc.to_dict()),)], "state string"
    ).write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_name}_encoder"
    )


def chunk_index_for(
    spark: SparkSession, sf_dir: str
) -> tuple[HashingTfidfEncoder, DataFrame]:
    """Per-(session, corpus) persisted chunk index — the shared entry
    point for q67 and bench ingest, same adopt-or-build contract as
    ``dedup.minhash_table_for``."""
    import json

    from .dedup import _sf_tag, reuse_persisted_table

    key = (id(spark), sf_dir)
    if key not in _CHUNK_INDEX_CACHE:
        name = f"documents_chunk_vecs_{_sf_tag(sf_dir)}"
        if not (
            reuse_persisted_table(spark, name)
            and reuse_persisted_table(spark, f"{name}_encoder")
        ):
            create_chunk_index_tables(
                spark, load_table(spark, sf_dir, "documents"), name
            )
        enc = HashingTfidfEncoder.from_dict(
            json.loads(spark.table(f"{name}_encoder").first()["state"])
        )
        _CHUNK_INDEX_CACHE[key] = (enc, spark.table(name))
    return _CHUNK_INDEX_CACHE[key]


# ------------------------------------------------------------------ BM25
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical BM25 top-k retrieval (Robertson/Sparck-Jones probabilistic
    ranking; the Lucene ``+1``-inside-the-log idf variant so idf stays
    positive at any df) — the sparse complement to the dense cosine path
    (q67). No reference analog (the reference's text plane stops at
    schema-synonym mining).

    Plan shape, and why it scales:
    - ONE narrow projection computes per-doc length and one tf counter
      per query term as pure column expressions over the token array —
      no explode, no per-term shuffle, whole-stage codegen end to end;
    - corpus statistics (N, avgdl, per-term df) are ONE 1-row aggregate
      over that projection, broadcast back via cross join — the classic
      q33/TF-IDF shape, so scoring is a second scan of the same slim
      projection, never a join on terms;
    - non-matching docs are filtered before the sort, and top-k is
      ``TakeOrderedAndProject`` (no global sort materializes).
    A deployment serving many queries would persist an inverted
    (term → postings) index at ingest instead of scanning; for the
    analytics-side "score the corpus against a probe query" shape used
    here, the two-scan plan reads less data than an index build.

    Oracle-exact: tf/df/dl are integers, avgdl = sum/count of integers,
    and each doc's score sums the per-term contributions in declared
    term order, so DuckDB reproduces the doubles bit-for-bit.
    """
    toks = tokens_expr(F.col(text_col))

    def term_count(term: str):
        # NB: a two-parameter lambda would be read by F.filter as the
        # (element, index) form — keep the closure single-argument
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [
        term_count(term).alias(f"tf{i}")
        for i, term in enumerate(query_terms)
    ]
    base = docs.select(
        F.col(id_col), F.size(toks).alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            1.0
            + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        tf = F.col(f"tf{i}")
        contrib = idf * (
            tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        )
        score = contrib if score is None else score + contrib
    matched = sum(F.col(f"tf{i}") for i in range(len(query_terms)))
    return (
        base.crossJoin(F.broadcast(stats))
        .where(matched > 0)
        .select(F.col(id_col), F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


# Fixed probe query for the registry entry — mid/high-df corpus terms so
# tf saturation and the length prior both matter in the ranking.
BM25_QUERY_TERMS = ("spark", "merge", "window")


def q75_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 docs for a fixed probe query (oracle-checked: DuckDB
    reproduces tf/df/avgdl and the per-term scoring sum exactly)."""
    return bm25_topk(
        load_table(spark, sf_dir, "documents", spread=True), BM25_QUERY_TERMS
    )


def bm25_oracle_sql(
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_topk`, same term order and arithmetic."""
    toks = r"string_split_regex(trim(lower(text)), '\s+')"
    tf_defs = ",\n               ".join(
        f"len(list_filter({toks}, t -> t = '{term}')) AS tf{i}"
        for i, term in enumerate(query_terms)
    )
    df_defs = ",\n               ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    contribs = "\n             + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * ({k1} + 1.0)"
        f" / (tf{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
        for i in range(len(query_terms))
    )
    matched = " + ".join(f"tf{i}" for i in range(len(query_terms)))
    return f"""
        WITH base AS (
          SELECT doc_id,
               len({toks}) AS dl,
               {tf_defs}
          FROM documents
        ), stats AS (
          SELECT count(*) AS n,
               sum(dl) * 1.0 / count(*) AS avgdl,
               {df_defs}
          FROM base
        )
        SELECT doc_id,
               round({contribs}, 4) AS bm25
        FROM base, stats
        WHERE {matched} > 0
        ORDER BY bm25 DESC, doc_id
        LIMIT {k}
    """


def q67_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval smoke: the corpus is chunked + encoded ONCE PER CORPUS
    into a persisted chunk-vector table (+ encoder sidecar) — the
    ingest artifacts a deployment builds at write time — and a fixed
    query retrieves its top-5 chunks. Rows-only (the Python
    tokenizer/hash has no DuckDB analog); pytest asserts the planted
    ground-truth chunk ranks first and that scoring is deterministic.
    """
    enc, vecs = chunk_index_for(spark, sf_dir)
    # a content question built from the corpus's own vocabulary: take
    # doc 0's first chunk text as the "question" — its own chunk must
    # dominate, which the pytest pins exactly
    first = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 0)
        .select(F.substring("text", 1, 200).alias("t"))
        .first()
    )
    return retrieve_chunks(vecs, enc, first["t"], k=5)


# ---------------------------------------------------- hybrid RRF fusion
RRF_K = 60  # the published reciprocal-rank-fusion constant (Cormack et al.)


def hybrid_rrf_topk(
    docs: DataFrame,
    vecs: DataFrame,
    query_terms: tuple[str, ...],
    query_vec: list[float],
    k: int = 20,
    shortlist: int = 50,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Hybrid lexical+dense retrieval via reciprocal-rank fusion:
    RRF(d) = Σ_lists 1/(rrf_k + rank_list(d)) over the BM25 shortlist
    and the embedding-cosine shortlist — the standard score-free way to
    combine rankers whose scores aren't commensurable. A document
    present in only one list keeps that one contribution (FULL join),
    so partially-embedded corpora degrade gracefully to lexical-only.

    Scale shape: each ranker keeps its own top-``shortlist`` via
    TakeOrderedAndProject (never a global sort), the rank windows run
    over those bounded shortlists (single-partition but ≤ shortlist
    rows — the standard fusion cost), and the fusion join is
    shortlist × shortlist sized. Ranks are integers and the fused score
    a two-term sum in fixed order, so DuckDB reproduces it exactly.
    """
    from pyspark.sql import Window

    from .similarity import cosine_topk

    lex = bm25_topk(docs, query_terms, k=shortlist).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("lex_rank"),
    )
    dense = cosine_topk(vecs, query_vec, k=shortlist).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), "vec_id"))
        .alias("dense_rank"),
    )
    score = F.coalesce(
        1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0))
    return (
        lex.join(dense, "doc_id", "full")
        .select("doc_id", F.round(score, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(k)
    )


def q80_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25 + dense-cosine top-20 under reciprocal-rank fusion
    (oracle-checked: integer ranks, fixed-order two-term sum). The
    dense probe is vec_id 0's embedding; doc_id and vec_id share the
    id space (partially at larger SFs — exactly the graceful-degrade
    case the FULL join covers)."""
    from .similarity import _query_vector

    return hybrid_rrf_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        BM25_QUERY_TERMS,
        _query_vector(spark, sf_dir, 0),
    )


def hybrid_rrf_oracle_sql(
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 20,
    shortlist: int = 50,
    rrf_k: int = RRF_K,
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk` (same shortlists, ranks,
    and fusion arithmetic; cosine mirrors the q23 zero-norm CASE)."""
    cos = (
        "CASE WHEN list_dot_product(e, e) = 0"
        "       OR list_dot_product(pe, pe) = 0 THEN 0.0"
        "     ELSE list_cosine_similarity(e, pe) END"
    )
    return f"""
        WITH lex AS (
          SELECT doc_id, bm25 FROM ({bm25_oracle_sql(query_terms, k=shortlist)})
        ), lexr AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
          FROM lex
        ), probe AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pe
          FROM embeddings WHERE vec_id = 0
        ), dense AS (
          SELECT vec_id AS doc_id, round({cos}, 6) AS cosine
          FROM (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings), probe
          ORDER BY cosine DESC, doc_id
          LIMIT {shortlist}
        ), denser AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY cosine DESC, doc_id) AS dense_rank
          FROM dense
        )
        SELECT coalesce(lexr.doc_id, denser.doc_id) AS doc_id,
               round(coalesce(1.0 / ({rrf_k} + lex_rank), 0.0)
                     + coalesce(1.0 / ({rrf_k} + dense_rank), 0.0), 6) AS rrf
        FROM lexr FULL JOIN denser ON lexr.doc_id = denser.doc_id
        ORDER BY rrf DESC, doc_id
        LIMIT {k}
    """
