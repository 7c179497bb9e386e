"""Multimodal plumbing: schema, Arrow batch shapes, stub gating,
determinism of the fake decoder."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_voting_data_engineering_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.generate_media(spark, 32, kind="image").cache()


def test_media_schema_and_content(media):
    assert media.schema["content"].dataType.typeName() == "binary"
    row = media.first()
    assert isinstance(row.content, (bytes, bytearray)) and len(row.content) == 128
    assert 16 <= row.meta.width <= 1935


def test_decode_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception) as ei:
        M.decode_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codecs" in str(ei.value)


def test_fake_decode_features_deterministic(spark, media):
    f1 = {r.media_id: r.feature for r in M.decode_features(media, fake=True).collect()}
    f2 = {r.media_id: r.feature for r in M.decode_features(media, fake=True).collect()}
    assert f1 == f2
    assert all(len(v) == 64 for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_frame_sampling_counts(spark):
    videos = M.generate_media(spark, 10, kind="video")
    frames = M.sample_frames(videos, every_nth=30)
    meta = {r.media_id: r.meta.n_frames for r in videos.collect()}
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for mid, nf in meta.items():
        expected = (max(nf - 1, 0)) // 30 + 1
        assert counts[mid] == expected


def test_resize_preserves_aspect_ratio(media):
    for r in M.resize_meta(media, max_side=256).collect():
        assert max(r.target_width, r.target_height) <= 256
        if r.orig_width >= r.orig_height:
            assert r.target_width >= r.target_height
        else:
            assert r.target_height >= r.target_width


def test_media_from_documents_bridge(spark, sf_dir):
    from realtime_voting_data_engineering_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = M.media_from_documents(docs)
    assert media.count() == docs.count()
    row = media.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.kind in {"image", "audio", "video"}
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    feats = M.decode_features(media.limit(20), fake=True)
    assert feats.count() == 20
