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


def q67_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval smoke: the corpus is chunked + encoded once per
    (session, sf) — the ingest artifacts a deployment persists — and a
    fixed query retrieves its top-5 chunks. Rows-only (the Python
    tokenizer/hash has no DuckDB analog); pytest asserts the planted
    ground-truth chunk ranks first and that scoring is deterministic.
    """
    key = (id(spark), sf_dir)
    if key not in _CHUNK_INDEX_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        chunks = chunk_documents(docs)
        enc = fit_chunk_encoder(chunks)
        _CHUNK_INDEX_CACHE[key] = (enc, encode_chunks(chunks, enc).cache())
    enc, vecs = _CHUNK_INDEX_CACHE[key]
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
