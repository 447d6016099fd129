"""Multimodal binary-column plumbing tests (north-star surface): the
decode kernels are deterministic stubs, but the Spark contracts —
schemas, Arrow batch iteration, metadata-first pruning, executor-side
row explosion — are real and asserted here."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_makanmana_spark.multimodal import (
    IMAGE_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_features,
    resize_images,
    sample_frames,
    synthetic_media_table,
)


def test_synthetic_media_table_deterministic(spark):
    a = synthetic_media_table(spark, n=12, seed=7).collect()
    b = synthetic_media_table(spark, n=12, seed=7).collect()
    assert a == b
    assert {r.kind for r in a} == {"image", "audio", "video"}
    for r in a:
        assert len(bytes(r.payload)) == r.meta.width * r.meta.height * 3


def test_decode_image_features_schema_and_filter(spark):
    media = synthetic_media_table(spark, n=12)
    feats = decode_image_features(media, dim=8)
    assert feats.schema == IMAGE_FEATURE_SCHEMA
    rows = feats.collect()
    # only kind == 'image' rows reach the decode stage
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    for r in rows:
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # deterministic stub: same input → same features
    again = {r.media_id: r.feature for r in decode_image_features(media, dim=8).collect()}
    assert {r.media_id: r.feature for r in rows} == again


def test_resize_images_contract(spark):
    media = synthetic_media_table(spark, n=9)
    out = resize_images(media, 32, 32)
    assert out.schema == MEDIA_SCHEMA
    for r in out.collect():
        assert r.meta.width == 32 and r.meta.height == 32
        assert len(bytes(r.payload)) == 32 * 32 * 3


def test_sample_frames_explodes_per_frame(spark):
    media = synthetic_media_table(spark, n=12)
    vids = media.filter(F.col("kind") == "video").select("media_id", "meta.n_frames")
    expected = {
        r.media_id: len(range(0, r.n_frames, 2)) for r in vids.collect()
    }
    frames = sample_frames(media, every_nth=2)
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == expected
    # frame indices are the sampled ones and payloads are non-empty slices
    for r in frames.collect():
        assert r.frame_idx % 2 == 0
        assert len(bytes(r.frame_payload)) > 0
