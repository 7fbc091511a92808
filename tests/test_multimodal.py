"""Multimodal binary-column plumbing: schema, Arrow batch shape,
mapInPandas seams, stubbed decode determinism, and integration with the
ANN operator over derived embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_nlp_sqlizer_team04_spark.operators import multimodal as M
from dbt_nlp_sqlizer_team04_spark.operators import similarity as V


@pytest.fixture(scope="module")
def media(spark):
    return M.synthesize_media(spark, n=60).cache()


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 60
    mods = {r["modality"] for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_stub_parses_header(media):
    out = M.decode_media(media).collect()
    assert len(out) == 60
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["width"] == 16 and by_id[0]["n_frames"] == 1
    assert by_id[1]["width"] == 20
    assert all(len(r["fingerprint"]) == 32 for r in out)
    # payload column projected away: decoded output carries no bytes
    assert "payload" not in M.decode_media(media).columns


def test_decode_real_path_is_explicit_seam(media):
    with pytest.raises(NotImplementedError):
        M.decode_media(media, decode_stub=False)


def test_decode_deterministic(media):
    a = sorted(map(tuple, M.decode_media(media).collect()))
    b = sorted(map(tuple, M.decode_media(media).collect()))
    assert a == b


def test_media_embeddings_feed_ann(media):
    emb = M.media_embeddings(media, dim=16)
    rows = emb.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    # unit-normalized
    n0 = sum(x * x for x in rows[0]["embedding"]) ** 0.5
    assert n0 == pytest.approx(1.0, abs=1e-3)
    # derived embeddings plug straight into the similarity operator
    q = list(rows[0]["embedding"])
    top = V.cosine_topk(emb, q, k=3, id_col="media_id").collect()
    assert top[0]["media_id"] == rows[0]["media_id"]
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-5)


def test_resize_rewrites_header(media, spark):
    resized = M.resize_images(media, 8, 8)
    dec = {r["media_id"]: r for r in M.decode_media(resized).collect()}
    assert dec and all(r["width"] == 8 and r["height"] == 8 for r in dec.values())
    # only images pass through
    assert set(dec) == {
        r["media_id"] for r in media.filter(F.col("modality") == "image").collect()
    }


def test_frame_sampling(media):
    sampled = M.sample_frames(media, every_n=2)
    before = {
        r["media_id"]: r["n_frames"]
        for r in M.decode_media(media.filter(F.col("modality") == "video")).collect()
    }
    after = {r["media_id"]: r["n_frames"] for r in M.decode_media(sampled).collect()}
    assert after and all(after[k] == max(1, (v + 1) // 2) for k, v in before.items())


def test_media_stats_never_touches_payload(media, spark, tmp_path):
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    stats = M.media_stats(spark.read.parquet(path))
    rows = {r["modality"]: r for r in stats.collect()}
    assert rows["image"]["n_items"] == 20
    plan = stats._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        stats._jdf.queryExecution(), "formatted"
    )
    # column pruning: the parquet ReadSchema must exclude the payload
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "payload" not in read_schema[0]
    assert "n_bytes" in read_schema[0]


def test_q40_embedding_stage_runs_once(spark):
    """q40 must read the cached embedding frame in its top-k pass — the
    plan shows InMemoryTableScan, not a second mapInPandas over the
    payloads (r2 verdict: the uncached form ran the Arrow stage twice)."""
    out = M.q40_media_embedding_topk(spark, "unused")
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    # InMemoryTableScan = the top-k pass reads the cache. (The cache
    # node prints its build lineage, so MapInPandas still appears in the
    # text — inside the InMemoryRelation definition, not as a second
    # executed stage.)
    assert "InMemoryTableScan" in plan
    assert len(out.collect()) == 5
