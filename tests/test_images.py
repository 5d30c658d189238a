"""Image pipeline invariants (input_hint): decode allclose for
lossless, PSNR>=40dB for lossy, phash reproduction, caption-cleaning
exact equality vs a pure-Python reference implementation."""

from __future__ import annotations

import html as pyhtml
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from omni_crawler_spark.operators import imagecodec as C
from omni_crawler_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def images(spark):
    return M.generate_images_df(spark, 60, partitions=4).cache()


def test_generated_schema_matches_input_hint(images):
    assert [f.name for f in images.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    assert dict(images.groupBy().count().collect()[0].asDict())["count"] == 60


def test_decode_validate_all_ok(spark, images):
    res = M.decode_validate(images).cache()
    bad = res.filter(~F.col("ok")).collect()
    assert bad == [], bad
    # lossless rows must be pixel-exact; lossy rows >= 40 dB
    assert res.filter((F.col("fmt") == "png") & ~F.col("lossless_exact")).count() == 0
    lossy = res.filter(F.col("fmt") == "qnt")
    assert lossy.count() > 0
    assert lossy.filter(F.col("psnr_db") < 40.0).count() == 0
    assert res.filter(~F.col("phash_ok")).count() == 0


def test_decode_validate_catches_corruption(spark, images):
    corrupted = images.withColumn(
        "bytes",
        F.when(
            F.col("fmt") == "png",
            F.concat(F.lit(b"\x00\x01"), F.col("bytes")),
        ).otherwise(F.col("bytes")),
    )
    res = M.decode_validate(corrupted)
    assert res.filter(F.col("err").isNotNull()).count() > 0


def test_image_features_deterministic(spark, images):
    f1 = {r.image_id: r.thumb8 for r in M.image_features(images).collect()}
    f2 = {r.image_id: r.thumb8 for r in M.image_features(images).collect()}
    assert f1 == f2


def test_caption_cleaning_exact_equality(spark, images):
    """Engine caption_clean (JVM columns) == pure-Python reference
    (entity unescape + whitespace collapse) — exact string equality
    per input_hint."""
    rows = images.select(
        "caption", M.caption_clean(F.col("caption")).alias("cleaned")
    ).collect()
    for r in rows:
        expected = re.sub(r"\s+", " ", pyhtml.unescape(r.caption)).strip()
        assert r.cleaned == expected, repr(r.caption)


def test_phash_similarity_property():
    px, _, _, _ = M.reference_pixels("img_00000001")
    near = np.clip(px.astype(int) + 2, 0, 255).astype(np.uint8)
    far, _, _, _ = M.reference_pixels("img_00000042")
    h = C.phash64(px)
    assert C.hamming64(h, C.phash64(near)) <= 6
    if px.shape == far.shape:
        assert C.hamming64(h, C.phash64(far)) > 10


def test_video_stub_is_marked():
    with pytest.raises(NotImplementedError):
        M.frame_sample_video(None)
