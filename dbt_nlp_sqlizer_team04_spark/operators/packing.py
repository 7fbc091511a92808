"""Sequence packing — builder-brief extension (no reference analog):
assign documents to fixed token-budget training sequences ("bins"), the
standard pre-training step between dedup/filtering and tokenization.

Packing is inherently order-dependent, so scalable packing = pick a
DETERMINISTIC order and shard it: documents land in a content-addressed
shard (md5(doc_id) % n_shards — same function as the split/sample
operators, reproducible by any engine), and each shard packs greedily
in doc_id order. Shards are independent → the operator is one shuffle
on the shard key plus an Arrow stage per shard; at 100 TB you raise
``n_shards`` so a shard's (doc_id, n_tokens) pairs fit comfortably in
executor memory (the TEXT never moves — packing needs only the token
counts).

Greedy rule (identical in the Spark stage and the DuckDB recursive-CTE
oracle): keep a running token total; a document that would overflow
``capacity`` starts a new sequence; the first document of a shard (or
one larger than capacity) always occupies its current sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .sampling import hash_bucket_expr, hash_bucket_sql
from .text import BPE_PATTERN, bpe_token_count_expr

DEFAULT_CAPACITY = 512
DEFAULT_SHARDS = 8

# DuckDB twin of text.bpe_token_count_expr — the same regex q30
# hash-matches, so the packing budget counts what a real tokenizer
# splits on (runs of letters / digits / single punctuation marks), not
# whitespace words (~1.3-2x fewer, which would silently over-pack).
BPE_TOKENS_SQL = f"len(regexp_extract_all(text, '{BPE_PATTERN}', 0))"


def pack_sequences(
    df: DataFrame,
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_expr: Column | None = None,
) -> DataFrame:
    """(doc_id, shard, seq_id, n_tokens): greedy packing of documents
    into ≤ capacity-token sequences, per content-addressed shard.

    ``count_expr`` is the per-document token count the budget is charged
    against; it defaults to the BPE-ish regex count (``text.py``'s
    ``bpe_token_count_expr``) so the capacity means real-tokenizer
    tokens. Pass a precomputed column (e.g. from an ingest table) to
    skip the regex, or a different counter for another tokenizer."""
    import pandas as pd  # noqa: PLC0415

    if count_expr is None:
        count_expr = bpe_token_count_expr(F.col(text_col))
    src = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket_expr(F.col(id_col), n_shards).cast("int").alias("shard"),
        count_expr.cast("long").alias("n_tokens"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs = []
        seq, acc, first = 0, 0, True
        for tok in pdf["n_tokens"]:
            if first:
                acc, first = tok, False
            elif acc + tok > capacity:
                seq += 1
                acc = tok
            else:
                acc += tok
            seqs.append(seq)
        pdf["seq_id"] = pd.Series(seqs, dtype="int64")
        return pdf[["doc_id", "shard", "seq_id", "n_tokens"]]

    return (
        src.groupBy("shard")
        .applyInPandas(pack, "doc_id long, shard int, seq_id long, n_tokens long")
        .orderBy("doc_id")
    )


def pack_sequences_oracle_sql(
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
    tokens_sql: str = BPE_TOKENS_SQL,
) -> str:
    """DuckDB twin: the same greedy rule as a recursive CTE stepping
    through each shard in doc_id order."""
    shard = hash_bucket_sql("doc_id", n_shards)
    return f"""
        WITH RECURSIVE base AS (
          SELECT doc_id,
                 ({shard})::int AS shard,
                 ({tokens_sql})::bigint AS n_tokens,
                 row_number() OVER (PARTITION BY ({shard})
                                    ORDER BY doc_id) AS rn
          FROM documents
        ), rec AS (
          SELECT shard, rn, doc_id, n_tokens,
                 0::bigint AS seq_id, n_tokens AS acc
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.shard, b.rn, b.doc_id, b.n_tokens,
                 CASE WHEN r.acc + b.n_tokens > {capacity}
                      THEN r.seq_id + 1 ELSE r.seq_id END,
                 CASE WHEN r.acc + b.n_tokens > {capacity}
                      THEN b.n_tokens ELSE r.acc + b.n_tokens END
          FROM rec r JOIN base b ON b.shard = r.shard AND b.rn = r.rn + 1
        )
        SELECT doc_id, shard, seq_id, n_tokens
        FROM rec
        ORDER BY doc_id
    """


def materialize_sequences(
    df: DataFrame,
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """The export step: assemble each packed sequence into one training
    row — (shard, seq_id, n_docs, n_tokens, text) with member documents
    concatenated in doc_id order.

    Text moves exactly once: the packing stage works on token counts
    only, then one join + one groupBy(shard, seq_id) shuffle carries
    each document body to its sequence. In-sequence order is made
    deterministic JVM-side (array_sort over (doc_id, text) structs —
    collect_list order is partition-dependent, sorting restores the
    contract the oracle's ``string_agg ... ORDER BY doc_id`` states).
    """
    packed = pack_sequences(df, capacity, n_shards, id_col, text_col)
    joined = packed.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")),
        "doc_id",
    )
    members = F.array_sort(F.collect_list(F.struct("doc_id", "__t")))
    return (
        joined.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.concat_ws(sep, F.transform(members, lambda s: s["__t"])).alias(
                "text"
            ),
        )
        .orderBy("shard", "seq_id")
    )


def materialize_sequences_oracle_sql(
    capacity: int = DEFAULT_CAPACITY, n_shards: int = DEFAULT_SHARDS
) -> str:
    """DuckDB twin: the packing CTE as a derived table, string_agg in
    doc_id order."""
    pack = pack_sequences_oracle_sql(capacity, n_shards)
    return f"""
        SELECT p.shard, p.seq_id,
               count(*)             AS n_docs,
               sum(p.n_tokens)::bigint AS n_tokens,
               string_agg(d.text, chr(10) ORDER BY p.doc_id) AS text
        FROM ({pack}) p
        JOIN documents d USING (doc_id)
        GROUP BY p.shard, p.seq_id
        ORDER BY p.shard, p.seq_id
    """


def q56_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 512-token sequence packing over documents (oracle: DuckDB
    recursive CTE replaying the identical greedy rule per shard)."""
    return pack_sequences(load_table(spark, sf_dir, "documents"))


def q58_materialized_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed sequences assembled into training rows (oracle-checked:
    string_agg over the recursive-CTE packing)."""
    return materialize_sequences(load_table(spark, sf_dir, "documents"))


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 500,
    overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping character chunks — the context-window prep
    step between curation and tokenization (RAG/pre-training chunking).

    Pure whole-stage-codegen plan: ``sequence`` generates the stride
    offsets, ``posexplode`` fans them out, ``substring`` slices — no
    shuffle at all; chunking is a flat-map fused into the scan, which is
    exactly what you want when the corpus is 100 TB (output rows ≈
    input_chars / stride, written straight back out partition-local).

    Deterministic contract (DuckDB-reproducible, q66's oracle): chunks
    start at 0, stride ``chunk_chars - overlap``; every offset < length
    (one empty chunk for an empty text); the trailing chunk may be
    short; ``chunk_md5`` content-addresses each slice.
    """
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not 0 <= overlap < chunk_chars:
        # negative overlap would stride PAST chunk_chars and silently
        # drop the characters between chunks — data loss, not a layout
        raise ValueError(
            f"overlap must be in [0, chunk_chars), got {overlap}"
        )
    stride = chunk_chars - overlap
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length(text_col) - 1, F.lit(0)),
                    F.lit(stride),
                )
            ).alias("chunk_id", "chunk_start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "chunk_start",
            F.expr(f"substring(text, chunk_start + 1, {int(chunk_chars)})").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
        .withColumn("chunk_md5", F.md5("chunk_text"))
    )


def chunk_documents_oracle_sql(
    chunk_chars: int = 500, overlap: int = 100, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same offsets/slices)."""
    stride = chunk_chars - overlap
    return f"""
        SELECT doc_id,
               (t.i // {stride})::bigint AS chunk_id,
               t.i::bigint AS chunk_start,
               substr(text, t.i::int + 1, {chunk_chars}) AS chunk_text,
               length(substr(text, t.i::int + 1, {chunk_chars}))::bigint AS chunk_len,
               md5(substr(text, t.i::int + 1, {chunk_chars})) AS chunk_md5
        FROM {table}, unnest(range(0, greatest(length(text), 1), {stride})) AS t(i)
    """


def q66_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking audit: every chunk row (offsets, lengths, content md5)
    for the corpus at 500-char windows with 100-char overlap —
    hash-checked against the DuckDB twin slice-for-slice."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        chunk_documents(docs)
        .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "chunk_md5")
        .orderBy("doc_id", "chunk_id")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-addressed shard manifest for a corpus export: assign each
    document to ``md5(id) % n_shards`` and audit every shard with
    counts, char volume, id range, and a COMMUTATIVE content checksum
    (sum of each doc's 32-bit md5(text) prefix) — order- and
    partitioning-independent, so any engine can re-derive the manifest
    and verify a delivered shard without re-reading its neighbors.

    This is the reproducibility contract a training job needs from its
    data export: shard membership is a pure function of the id (appends
    don't reshuffle existing shards), and the checksum catches silent
    text corruption/truncation per shard. One scan, one #shards-row
    shuffle of partial aggregates.
    """
    shard = hash_bucket_expr(F.col(id_col), n_shards).alias("shard")
    # 32-bit prefix (avg ~2.1e9): int64 holds the sum up to ~4.3e9 docs
    # PER SHARD — raise n_shards with the corpus to stay inside. (A
    # 48-bit prefix overflows at only ~65k docs/shard, far below any
    # real corpus, and Spark's wrap vs DuckDB's HUGEINT widening would
    # diverge exactly then.)
    text_h = F.conv(F.substring(F.md5(text_col), 1, 8), 16, 10).cast("bigint")
    return (
        df.select(
            shard,
            F.col(id_col).alias("doc_id"),
            F.length(text_col).alias("n_chars"),
            text_h.alias("text_h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("text_h").alias("content_checksum"),
        )
        .orderBy("shard")
    )


def shard_manifest_oracle_sql(n_shards: int = 32, table: str = "documents") -> str:
    """DuckDB twin of :func:`shard_manifest` (identical hash arithmetic)."""
    return f"""
        SELECT {hash_bucket_sql('doc_id', n_shards)} AS shard,
               count(*)             AS n_docs,
               sum(length(text))::bigint AS total_chars,
               min(doc_id)          AS min_doc_id,
               max(doc_id)          AS max_doc_id,
               sum(('0x' || substr(md5(text), 1, 8))::bigint)::bigint
                   AS content_checksum
        FROM {table}
        GROUP BY shard
        ORDER BY shard
    """


def q68_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-shard export manifest over documents — hash-checked: DuckDB
    re-derives shard membership AND per-shard content checksums."""
    return shard_manifest(load_table(spark, sf_dir, "documents"))
