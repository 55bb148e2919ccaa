"""Multimodal plumbing: schema, batch shape, deterministic fake decode,
and the NotImplementedError gate on real decode."""

import pytest

from resin_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=18)


def test_features_pipeline(spark, media):
    out = mm.media_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 18
    by_id = {r["media_id"]: r for r in rows}
    for i, r in by_id.items():
        assert r["n_bytes"] == 64 + i
        assert len(r["content_sha"]) == 64
        assert len(r["features"]) == 8
    # deterministic: same content => same features
    rows2 = mm.media_features(media, fake=True).collect()
    assert {r["media_id"]: r["features"] for r in rows2} == {
        r["media_id"]: r["features"] for r in rows
    }


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"xx", fake=False)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"xx", fake=False)


def test_resize_plumbing(spark, media):
    from pyspark.sql import functions as F

    imgs = media.filter(F.col("modality") == "image")
    out = mm.resize_images(imgs, 4, 4, fake=True).collect()
    assert out and all(r["width"] == 4 and r["height"] == 4 for r in out)
    assert all(len(bytes(r["content"])) == 4 * 4 * 3 for r in out)


def test_unknown_modality_passthrough(spark):
    df = spark.createDataFrame(
        [(99, "hologram", "x/y", bytearray(b"zz"), None, None, None)],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = mm.media_features(df, fake=True).collect()
    assert rows[0]["features"] == []
