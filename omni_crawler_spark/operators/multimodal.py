"""Multimodal (image) column plumbing: the Spark side of the
image+caption pipeline (BASELINE.json input_hint).

Images are opaque ``binary`` columns with typed metadata
(image_id, bytes, w, h, fmt, caption, phash). All pixel work runs in
Arrow-batched ``mapInPandas`` — binary columns cross the JVM/Python
boundary as Arrow buffers, one batch at a time, never per-row.

Generation is *distributed and deterministic*: pixels are a pure
function of image_id (seeded per-id RNG), so any executor can
regenerate the reference pixels for validation without shipping
originals — this is how decode-validate checks allclose/PSNR at
scale without a second copy of the corpus.

Reference parity: the reference only collects image URLs + meta-
description captions (src/crawler/multi_engine_crawler.py:191-212);
decode/validate is new per the north rule (SURVEY §2.8 N11).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from omni_crawler_spark.operators import imagecodec as C

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

_SIZES = [32, 64, 128, 256]
_FMTS = ["png", "qnt"]  # qnt = lossy stand-in (see imagecodec docstring)

_CAPTION_VOCAB = [
    "sunset", "harbor", "mountain", "forest", "skyline", "river",
    "market", "stadium", "museum", "bridge", "garden", "desert",
]


def _id_seed(image_id: str) -> int:
    """Stable per-image seed (FNV-1a of the id; no salted hash())."""
    h = 0xCBF29CE484222325
    for ch in image_id.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def reference_pixels(image_id: str) -> tuple[np.ndarray, int, int, str]:
    """Regenerate the canonical pixels for an image_id: seeded
    gradient + noise pattern. Pure function — identical on every
    executor/process."""
    rng = np.random.default_rng(_id_seed(image_id))
    w = int(rng.choice(_SIZES))
    h = int(rng.choice(_SIZES))
    fmt = _FMTS[int(rng.integers(0, 2))]
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(1, w - 1)),
            (yy * 255 // max(1, h - 1)),
            ((xx + yy) * 255 // max(1, w + h - 2)),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = rng.integers(-20, 21, size=(h, w, 3), dtype=np.int32)
    px = np.clip(base + noise, 0, 255).astype(np.uint8)
    return px, w, h, fmt


def reference_caption(image_id: str, idx: int) -> str:
    """Seeded caption with the edge cases FIXTURES.md §1 requires:
    empty, whitespace-heavy, HTML-entity, >500-char variants."""
    rng = np.random.default_rng(_id_seed(image_id) ^ 0xCAFE)
    k = idx % 17
    words = [
        _CAPTION_VOCAB[int(i)] for i in rng.integers(0, len(_CAPTION_VOCAB), 8)
    ]
    sent = f"A photo of the {words[0]} near the {words[1]} at {words[2]}."
    if k == 0:
        return ""
    if k == 1:
        return "   " + sent.replace(" ", "   ") + "  \n\t "
    if k == 2:
        return sent.replace("photo", "photo &amp; sketch") + " &lt;hdr&gt;"
    if k == 3:
        return " ".join(f"The {w} and the {v}." for w, v in zip(words * 40, words[::-1] * 40))
    return sent


def generate_images_df(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Distributed deterministic images table: spark.range drives
    mapInPandas — each executor generates + encodes its own id range
    (no driver-side loop, no collected pixel data)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                image_id = f"img_{int(i):08d}"
                px, w, h, fmt = reference_pixels(image_id)
                rows.append(
                    {
                        "image_id": image_id,
                        "bytes": C.encode_image(px, fmt),
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": reference_caption(image_id, int(i)),
                        "phash": C.phash64(px),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, IMAGES_SCHEMA)
    )


DECODE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("dims_ok", BooleanType()),
        StructField("phash_ok", BooleanType()),
        StructField("psnr_db", DoubleType()),
        StructField("lossless_exact", BooleanType()),
        StructField("fmt", StringType()),
        StructField("err", StringType()),
    ]
)


def decode_validate(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """N11 — decode + pixel validation per the north rule: decoded
    pixels must match the regenerated reference exactly (lossless) or
    at PSNR>=40dB (lossy); dims and recomputed phash must match the
    stored metadata. One Arrow batch in, one result batch out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                rec = {
                    "image_id": r.image_id, "ok": False, "dims_ok": False,
                    "phash_ok": False, "psnr_db": 0.0,
                    "lossless_exact": False, "fmt": r.fmt, "err": None,
                }
                try:
                    px = C.decode_image(bytes(r.bytes), r.fmt)
                    ref, w, h, _ = reference_pixels(r.image_id)
                    rec["dims_ok"] = px.shape[:2] == (r.h, r.w) == (h, w)
                    p = C.psnr(ref, px)
                    rec["psnr_db"] = round(min(p, 99.0), 2)
                    rec["lossless_exact"] = bool(np.array_equal(ref, px))
                    # lossless must reproduce the stored phash exactly;
                    # lossy decode shifts the median threshold so pairs
                    # of low-energy DCT bits flip — <=8/64 observed
                    dist = C.hamming64(C.phash64(px), r.phash)
                    rec["phash_ok"] = dist == 0 if r.fmt == "png" else dist <= 8
                    rec["ok"] = bool(
                        rec["dims_ok"]
                        and (
                            rec["lossless_exact"]
                            if r.fmt == "png"
                            else p >= min_psnr_db
                        )
                    )
                except Exception as exc:  # noqa: BLE001
                    rec["err"] = str(exc)[:200]
                out.append(rec)
            yield pd.DataFrame(out)

    return images.mapInPandas(run, DECODE_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("thumb8", StringType()),  # 8x8 gray thumbnail, hex
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Feature extraction over the binary column (decode → channel
    means + 8×8 thumbnail). The pattern for any downstream embedding
    model: decode in mapInPandas, emit fixed-width features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = C.decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
                gray = px @ np.array([0.299, 0.587, 0.114])
                thumb = C._block_mean_resize(gray, 8).astype(np.uint8)
                out.append(
                    {
                        "image_id": r.image_id,
                        "mean_r": round(float(px[..., 0].mean()), 4),
                        "mean_g": round(float(px[..., 1].mean()), 4),
                        "mean_b": round(float(px[..., 2].mean()), 4),
                        "thumb8": thumb.tobytes().hex(),
                    }
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def _resize_rgb(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic resize: exact block-mean when the target divides
    the source (area interpolation), floor-index nearest-neighbor
    otherwise — bit-reproducible across platforms (no float filter
    kernels), which is what the pixel-validation invariants need."""
    h, w = px.shape[:2]
    if h % th == 0 and w % tw == 0:
        bh, bw = h // th, w // tw
        return (
            px.reshape(th, bh, tw, bw, 3).mean(axis=(1, 3)).round()
            .astype(np.uint8)
        )
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    return px[rows][:, cols]


def resize_images(images: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Thumbnail/resize over the binary column: decode → deterministic
    area/NN resample → lossless re-encode. Same Arrow-batch shape as
    decode_validate; output is a valid images-table slice (so resize →
    decode_validate chains). The standard pre-processing step before
    batched feature extraction at 100 TB — resized bytes are ~1/64th
    of the originals, so downstream shuffles move thumbnails, not
    full images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = C.decode_image(bytes(r.bytes), r.fmt)
                small = _resize_rgb(px, target_w, target_h)
                out.append(
                    {
                        "image_id": r.image_id,
                        "bytes": C.encode_image(small, "png"),
                        "w": target_w,
                        "h": target_h,
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_video(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — REAL plumbing, STUBBED decode: no video
    codec exists in this environment. The operator contract (binary
    column in, exploded frame rows out via mapInPandas) is what a
    production ffmpeg-backed implementation would keep."""
    raise NotImplementedError(
        "video codecs unavailable in this environment; see docstring"
    )


def caption_clean(col):
    """Caption cleaning column: entity unescape + whitespace collapse,
    mirroring the reference's normalization pass
    (src/utils/content_cleaner.py:221-244). Pure JVM expression —
    exact equality with the Python reference is a pytest invariant."""
    from omni_crawler_spark.functions.text import clean_html

    return clean_html(col)
