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


def test_resize_images_dims_and_determinism(spark, images):
    small = M.resize_images(images, 32, 32)
    rows = {r.image_id: r for r in small.collect()}
    assert len(rows) == 60
    assert all(r.w == 32 and r.h == 32 and r.fmt == "png" for r in rows.values())
    # decoded thumbnails have the right shape and are reproducible
    again = {r.image_id: r for r in M.resize_images(images, 32, 32).collect()}
    for iid, r in rows.items():
        px = C.decode_image(bytes(r.bytes), "png")
        assert px.shape == (32, 32, 3)
        assert bytes(again[iid].bytes) == bytes(r.bytes)
    # resized slice is itself a valid images-table input: re-resizing
    # at the same size is stable (area mean of 1x1 blocks = identity)
    twice = {r.image_id: bytes(r.bytes)
             for r in M.resize_images(small, 32, 32).collect()}
    assert twice == {k: bytes(v.bytes) for k, v in rows.items()}


def test_resize_block_mean_exact():
    import numpy as np

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = M._resize_rgb(px, 4, 4)
    assert out.shape == (4, 4, 3)
    # block mean of the top-left 2x2 block, channel 0: values 0,3,24,27
    assert out[0, 0, 0] == round((0 + 3 + 24 + 27) / 4)
    # non-divisible target falls back to floor-index NN sampling
    nn = M._resize_rgb(px, 3, 3)
    assert nn.shape == (3, 3, 3)
    assert nn[0, 0, 0] == px[0, 0, 0]


def test_pipeline_multimodal_stage_counts(spark, sf_dir):
    """The end-to-end image pipeline's summary row proves each stage
    acted: 5 planted copies dropped by pHash dedup BEFORE decode, all
    150 survivors decode-valid, all featurized."""
    from omni_crawler_spark.analytics import REGISTRY

    row = REGISTRY["pipeline_multimodal"].build(spark, sf_dir).collect()[0]
    assert row.n_in == 155
    assert row.n_after_dedup == 150
    assert row.n_valid == 150
    assert row.n_features == 150
    assert 0 < row.avg_mean_r < 255


def test_phash_near_dup_banding_finds_perturbed_image(spark):
    """A slightly perturbed image must be recovered by the banded
    pHash hamming join (the image analog of SimHash dedup)."""
    import numpy as np

    from omni_crawler_spark.operators import dedup as D
    from omni_crawler_spark.operators import multimodal as M2

    rng = np.random.default_rng(3)
    rows = []
    for i in range(80):
        px, w, h, fmt = M2.reference_pixels(f"img_{i:08d}")
        rows.append((f"img_{i:08d}", C.phash64(px)))
    # planted: a +-2-intensity perturbation of image 0
    px0, _, _, _ = M2.reference_pixels("img_00000000")
    noisy = np.clip(
        px0.astype(np.int16) + rng.integers(-2, 3, px0.shape), 0, 255
    ).astype(np.uint8)
    rows.append(("img_00000000_noisy", C.phash64(noisy)))
    df = spark.createDataFrame(rows, "image_id string, sig long")
    pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_near_dups(df, "image_id", max_hamming=8).collect()
    }
    found = {(a, b) for a, b, _ in pairs}
    assert ("img_00000000", "img_00000000_noisy") in found
    # and no random-pair false positives at <=8/64 bits
    assert all("img_00000000" in a or "img_00000000" in b for a, b in found)
