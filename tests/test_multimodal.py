"""Multimodal column plumbing: fake codec roundtrips, Arrow-batched
decode/resize/frame-sample/embedding ops, batch-shape invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.functions.multimodal import (
    audio_stats,
    decode_image_pixels,
    decode_meta,
    decode_real_image,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    image_embedding,
    image_resize,
    image_stats,
    resize_nearest,
    synthesize_media,
    video_frame_sample,
    with_media_meta,
)


def test_codec_roundtrip():
    p = encode_fake_image(7, 12, 5, 3)
    m = decode_meta(p)
    assert (m["kind"], m["width"], m["height"], m["channels"]) == ("image", 12, 5, 3)
    img = decode_image_pixels(p)
    assert img.shape == (5, 12, 3)
    # pixel i = (k + i) % 256, row-major
    assert img.ravel()[0] == 7 and img.ravel()[10] == 17

    v = encode_fake_video(3, 4, 8, 8, 1)
    mv = decode_meta(v)
    assert (mv["kind"], mv["n_frames"]) == ("video", 4)

    a = encode_fake_audio(5, 50, 8000)
    ma = decode_meta(a)
    assert (ma["kind"], ma["n_samples"], ma["sample_rate"]) == ("audio", 50, 8000)


def test_resize_nearest_exact():
    p = encode_fake_image(0, 4, 4, 1)  # pixels 0..15
    out = decode_image_pixels(resize_nearest(p, 2, 2))
    # nearest gather: rows 0,2 cols 0,2 -> [[0,2],[8,10]]
    assert out[:, :, 0].tolist() == [[0, 2], [8, 10]]


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real_image(b"\x89PNG\r\n")


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(0, 64).withColumnRenamed("id", "media_id")
    return synthesize_media(ids, "media_id", kind="image").cache()


def test_meta_and_stats(spark, media):
    meta = with_media_meta(media).select("media_id", "meta.*")
    row = meta.where(F.col("media_id") == 5).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (21, 13, 3)
    assert row["n_bytes"] == 9 + 21 * 13 * 3

    st = image_stats(media, "media_id").where(F.col("media_id") == 5).collect()[0]
    n = 21 * 13 * 3
    expected_mean = float(np.mean((5 + np.arange(n)) % 256))
    assert st["mean_px"] == pytest.approx(expected_mean)


def test_stats_batch_shape_invariant(spark, media):
    """Same result whatever the Arrow batch/partition layout."""
    a = image_stats(media, "media_id").orderBy("media_id").collect()
    b = (
        image_stats(media.repartition(13), "media_id")
        .orderBy("media_id")
        .collect()
    )
    assert a == b


def test_resize_pipeline(spark, media):
    resized = image_resize(media, 8, 8, out_col="payload2")
    meta = with_media_meta(resized, payload_col="payload2").select(
        "media_id", "meta.width", "meta.height"
    )
    assert meta.where("width = 8 AND height = 8").count() == 64


def test_video_frame_sample(spark):
    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    vids = synthesize_media(ids, "media_id", kind="video")
    frames = video_frame_sample(vids, "media_id", every=2)
    # k frames = 1 + k%5; sampled every 2 -> ceil(k_frames / 2)
    got = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for k in range(20):
        nf = 1 + k % 5
        assert got[k] == (nf + 1) // 2
    # each frame decodes as a valid image
    one = frames.where("media_id = 9 AND frame_idx = 2").collect()[0]
    img = decode_image_pixels(bytes(one["frame"]))
    assert img.shape == (8, 8, 1)
    assert img.ravel()[0] == (9 + 2 * 17) % 256


def test_audio_stats(spark):
    ids = spark.range(0, 10).withColumnRenamed("id", "media_id")
    auds = synthesize_media(ids, "media_id", kind="audio")
    st = audio_stats(auds, "media_id").where(F.col("media_id") == 4).collect()[0]
    n = 100 + 4 % 100
    s = ((4 * 7 + np.arange(n) * 3) % 512) - 256
    assert st["n_samples"] == n
    assert st["mean_amp"] == pytest.approx(float(s.mean()))
    assert st["rms"] == pytest.approx(float(np.sqrt((s.astype(float) ** 2).mean())))


def test_image_embedding_feeds_similarity(spark, media):
    emb = image_embedding(media, "media_id", bins=16)
    rows = emb.orderBy("media_id").collect()
    assert len(rows) == 64
    v = np.array(rows[0]["embedding"])
    assert v.shape == (16,)
    assert v.sum() == pytest.approx(1.0, abs=1e-6)
