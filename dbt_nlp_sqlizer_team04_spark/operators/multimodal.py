"""Multimodal (image/audio/video) column handling — builder-brief
extension (no reference analog; the reference is text/SQL-only).

Contract: media rides in DataFrames as an opaque ``binary`` payload
column plus a typed metadata struct — the lakehouse pattern for
training-data pipelines. All *plumbing* (schema, partitioning, Arrow
batch shape, mapInPandas signatures) is real and tested; the actual
codec work is stubbed because no image/audio libraries exist in this
container:

- ``decode_stub=True`` (default) parses the deterministic fake header
  written by ``synthesize_media`` — stable values for tests/oracles;
- ``decode_stub=False`` raises ``NotImplementedError`` at the exact
  seam where Pillow/ffmpeg/torchaudio decode would slot in.

Scale design:
- payloads NEVER pass through Python row-at-a-time: every media op is
  ``mapInPandas`` (Arrow batches) or pure column expressions;
- ``spark.sql.files.maxPartitionBytes`` / ``maxRecordsPerBatch`` bound
  executor memory since each row can be MBs — feature extraction
  projects payloads away as early as possible (column pruning does the
  rest);
- derived features (dims, fingerprints, embeddings) land in ordinary
  columns so downstream joins/dedup/ANN reuse the operators in
  similarity.py / dedup.py without touching bytes again.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FAKE"
_FMT = ">4sHHI"  # magic, width, height, n_frames
_HEADER = struct.Struct(_FMT)
_HDR_SIZE = _HEADER.size
# NOTE: closures shipped to executors must use struct.unpack(_FMT, ...)
# with the format STRING — a struct.Struct instance is not picklable.


def fake_payload(width: int, height: int, n_frames: int, fill: int) -> bytes:
    """Deterministic fake media payload: header + fill bytes."""
    body = bytes([fill % 256]) * (width * height % 4096)
    return _HEADER.pack(_MAGIC, width, height, n_frames) + body


def synthesize_media(
    spark: SparkSession, n: int = 64, modality_cycle=("image", "audio", "video")
) -> DataFrame:
    """Deterministic fake media table conforming to MEDIA_SCHEMA (the
    testdata ships no binary media; everything derives from media_id)."""
    rows = []
    for i in range(n):
        modality = modality_cycle[i % len(modality_cycle)]
        w, h, fr = 16 + (i % 8) * 4, 16 + (i % 5) * 4, 1 + (i % 10)
        payload = fake_payload(w, h, fr, i)
        rows.append(
            (
                i,
                modality,
                payload,
                (f"cam{i % 4}", f"{modality}/fake", len(payload)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DECODED_SCHEMA = (
    "media_id long, modality string, width int, height int, n_frames int, "
    "n_bytes long, fingerprint string"
)


def decode_media(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode payload headers into typed feature columns via mapInPandas
    (one Arrow batch of payloads in, one batch of small rows out; the
    payload column is dropped on output so downstream stages never
    reshuffle bytes).

    With ``decode_stub=False`` this is the seam for a real decoder
    (Pillow / ffmpeg) — deliberately unimplemented in this container.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires Pillow/ffmpeg, not present in this "
            "environment; use decode_stub=True (deterministic fake header)"
        )

    def decode(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [],
                "modality": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "n_bytes": [],
                "fingerprint": [],
            }
            for mid, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if len(raw) >= _HDR_SIZE and raw[:4] == _MAGIC:
                    _, w, h, fr = struct.unpack(_FMT, raw[:_HDR_SIZE])
                else:
                    w = h = fr = 0
                out["media_id"].append(mid)
                out["modality"].append(modality)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(fr)
                out["n_bytes"].append(len(raw))
                out["fingerprint"].append(hashlib.md5(raw).hexdigest())
            yield pd.DataFrame(out)

    return df.select("media_id", "modality", "payload").mapInPandas(
        decode, DECODED_SCHEMA
    )


EMBED_SCHEMA = "media_id long, embedding array<float>"


def media_embeddings(df: DataFrame, dim: int = 16, decode_stub: bool = True) -> DataFrame:
    """Feature-extraction seam: payload → embedding vector via
    mapInPandas. The stub derives a deterministic pseudo-embedding from
    the payload hash (so ANN/dedup plumbing is exercised end-to-end);
    a real extractor (CLIP/wav2vec) drops into the same generator."""
    if not decode_stub:
        raise NotImplementedError("real feature extraction requires a model runtime")

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(raw).digest()
                need = dim * 4
                buf = (digest * (need // len(digest) + 1))[:need]
                v = np.frombuffer(buf, dtype=">u4").astype(np.float64)
                v = (v / np.iinfo(np.uint32).max) * 2.0 - 1.0
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype(np.float32).tolist())
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return df.select("media_id", "payload").mapInPandas(extract, EMBED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Resize seam (images): stub rewrites the fake header dims —
    byte-level payload transformation through Arrow, the same batch
    shape a Pillow resize would use."""
    if not decode_stub:
        raise NotImplementedError("real resize requires Pillow")

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_payload = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if len(raw) >= _HDR_SIZE and raw[:4] == _MAGIC:
                    _, _, _, fr = struct.unpack(_FMT, raw[:_HDR_SIZE])
                    raw = struct.pack(_FMT, _MAGIC, width, height, fr) + raw[_HDR_SIZE:]
                out_payload.append(raw)
            pdf = pdf.copy()
            pdf["payload"] = out_payload
            yield pdf

    return df.filter(F.col("modality") == "image").mapInPandas(resize, df.schema)


def sample_frames(df: DataFrame, every_n: int = 2, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling seam (video): stub halves n_frames in the header.
    Real implementation would emit one row per kept frame."""
    if not decode_stub:
        raise NotImplementedError("real frame sampling requires ffmpeg")

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_payload = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if len(raw) >= _HDR_SIZE and raw[:4] == _MAGIC:
                    _, w, h, fr = struct.unpack(_FMT, raw[:_HDR_SIZE])
                    kept = max(1, (fr + every_n - 1) // every_n)
                    raw = struct.pack(_FMT, _MAGIC, w, h, kept) + raw[_HDR_SIZE:]
                out_payload.append(raw)
            pdf = pdf.copy()
            pdf["payload"] = out_payload
            yield pdf

    return df.filter(F.col("modality") == "video").mapInPandas(sample, df.schema)


# ----------------------------------------------------- registry queries
def q39_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized media → header decode (mapInPandas) → per-modality
    dimension stats (rows-only: the media table is synthesized
    in-session, so no DuckDB view exists; determinism is pytest-checked).
    ``sf_dir`` is unused — media derives from ids, not testdata files."""
    media = synthesize_media(spark, n=64)
    dec = decode_media(media)
    return (
        dec.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.max("width").alias("max_width"),
            F.max("n_frames").alias("max_frames"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("modality")
    )


def q40_media_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media payload → stub embedding (mapInPandas) → exact cosine top-5
    for media_id=0 via the shared similarity operator (rows-only).

    The embedding frame is cached before the query-vector collect so the
    Arrow/mapInPandas stage executes ONCE — the collect materializes it,
    and the top-k pass reads the cache (r2 verdict: the uncached form
    re-ran the embedding stage over the full table)."""
    from .similarity import cosine_topk

    media = synthesize_media(spark, n=64)
    emb = media_embeddings(media, dim=16).cache()
    q = emb.filter(F.col("media_id") == 0).collect()[0]["embedding"]
    return cosine_topk(emb, list(q), k=5, id_col="media_id", exclude_id=0)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-expression stats over the media table (no payload decode):
    per-modality counts and byte totals — the metadata struct means the
    scan reads only ``meta.n_bytes``, never the payload column."""
    return (
        df.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.max(F.col("meta.n_bytes")).alias("max_bytes"),
        )
        .orderBy("modality")
    )


def q84_media_decode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality rollup over the DECODED headers — oracle-backed,
    unlike q39/q40: the synthetic payloads are closed-form in media_id,
    so DuckDB reproduces width/height/frames/bytes without touching a
    byte, and the hash gate thereby verifies the Arrow ``mapInPandas``
    decode path end-to-end (any drift in the batch plumbing — wrong
    header offset, dropped rows, padding mistakes — breaks the hash)."""
    dec = decode_media(synthesize_media(spark, n=64))
    return (
        dec.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("modality")
    )


def media_decode_oracle_sql(n: int = 64, hdr_size: int = _HDR_SIZE) -> str:
    """DuckDB twin of :func:`q84_media_decode_rollup`: the fake-payload
    generator's closed form (synthesize_media/fake_payload), no binary
    involved."""
    return f"""
        WITH m AS (
          SELECT i,
                 CASE CAST(i % 3 AS INT)
                      WHEN 0 THEN 'image'
                      WHEN 1 THEN 'audio'
                      ELSE 'video' END AS modality,
                 16 + (i % 8) * 4 AS w,
                 16 + (i % 5) * 4 AS h,
                 1 + (i % 10) AS fr
          FROM range({n}) t(i)
        )
        SELECT modality,
               count(*) AS n_items,
               CAST(sum({hdr_size} + (w * h) % 4096) AS BIGINT) AS total_bytes,
               round(avg(w), 4) AS avg_width,
               round(avg(h), 4) AS avg_height,
               max(fr) AS max_frames
        FROM m GROUP BY modality ORDER BY modality
    """


def q115_frame_sample_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling verified through the hash gate: every-2nd-frame
    sampling over the video modality, then the decode rollup per width
    bucket — the oracle reproduces kept = ceil(frames/2) from the
    generator's closed form, so the Arrow ``sample_frames`` header
    rewrite (and its composition with ``decode_media``) is externally
    verified the same way q84 verifies the plain decode."""
    sampled = sample_frames(synthesize_media(spark, n=64), every_n=2)
    dec = decode_media(sampled)
    return (
        dec.groupBy("width")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum("n_frames").alias("frames_kept"),
            F.max("n_frames").alias("max_kept"),
        )
        .orderBy("width")
    )


def frame_sample_oracle_sql(n: int = 64, every_n: int = 2) -> str:
    """DuckDB twin of :func:`q115_frame_sample_rollup` via the
    fake-payload closed form."""
    return f"""
        WITH m AS (
          SELECT i,
                 16 + (i % 8) * 4 AS w,
                 1 + (i % 10) AS fr
          FROM range({n}) t(i)
          WHERE CAST(i % 3 AS INT) = 2
        )
        SELECT w AS width,
               count(*) AS n_videos,
               CAST(sum(greatest(1, (fr + {every_n} - 1) // {every_n}))
                    AS BIGINT) AS frames_kept,
               CAST(max(greatest(1, (fr + {every_n} - 1) // {every_n}))
                    AS INT) AS max_kept
        FROM m GROUP BY w ORDER BY w
    """


def q116_resize_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize seam verified through the hash gate: images resized to
    64×48, then decoded — widths/heights must all be the target while
    n_frames and BODY SIZE survive untouched (the body length still
    follows the ORIGINAL w*h%4096 closed form, which is exactly what
    proves the rewrite touched only the header)."""
    dec = decode_media(
        resize_images(synthesize_media(spark, n=64), width=64, height=48)
    )
    return (
        dec.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("width", "height")
    )


def resize_oracle_sql(
    n: int = 64, width: int = 64, height: int = 48, hdr_size: int = _HDR_SIZE
) -> str:
    """DuckDB twin of :func:`q116_resize_rollup` via the closed form."""
    return f"""
        WITH m AS (
          SELECT i,
                 16 + (i % 8) * 4 AS w0,
                 16 + (i % 5) * 4 AS h0,
                 1 + (i % 10) AS fr
          FROM range({n}) t(i)
          WHERE CAST(i % 3 AS INT) = 0
        )
        SELECT CAST({width} AS INT) AS width,
               CAST({height} AS INT) AS height,
               count(*) AS n_images,
               CAST(sum({hdr_size} + (w0 * h0) % 4096) AS BIGINT)
                   AS total_bytes,
               CAST(sum(fr) AS BIGINT) AS total_frames
        FROM m GROUP BY 1, 2 ORDER BY width, height
    """
