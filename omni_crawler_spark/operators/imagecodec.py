"""Pure-Python image codecs + perceptual hash (no PIL/libjpeg in this
environment — see note below).

The graft's input table carries real encoded image bytes
(BASELINE.json input_hint: ``bytes:binary, w, h, fmt, phash``) and the
engine must decode + validate them per-row (allclose for lossless,
PSNR>=40dB for lossy). Two real codecs, both deterministic:

- **PNG** (lossless): full spec-compliant encoder (8-bit RGB, filter
  0) and decoder (all 5 scanline filters) over ``zlib`` — these bytes
  open in any image viewer.
- **QNT** (lossy): a real quantizing codec in a minimal container
  (magic ``QNT1`` | w | h | step | zlib(quantized RGB)). Uniform
  quantization with step=6 gives MSE≈step²/12≈3 → PSNR≈43dB — a true
  lossy decode/PSNR path.

ENVIRONMENT STUB NOTE: the reference pipeline would carry JPEG;
libjpeg/PIL are not installed here, so QNT stands in as the lossy
format. The Spark-side plumbing (binary column, Arrow UDF batches,
schema, PSNR gate) is identical; swapping in a real JPEG codec is a
2-line change in encode_image/decode_image.

pHash: 32×32 block-mean resize → 2-D DCT-II (explicit cosine-matrix
matmul, no scipy) → top-left 8×8 (skipping DC) → median threshold →
64-bit int. Deterministic across platforms (float64 matmul).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG (lossless)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) → PNG bytes (filter 0 scanlines)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Handles all 5 scanline filters
    (8-bit RGB, non-interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.zeros((h, w * 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need sequential passes
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                b = prev[x]
                if f == 1:
                    val = line[x] + a
                elif f == 3:
                    val = line[x] + ((a + b) >> 1)
                else:
                    c0 = prev[x - 3] if x >= 3 else 0
                    p = a + b - c0
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c0)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c0)
                    val = line[x] + pred
                rec[x] = val & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# QNT (lossy stand-in, real quantization — see module docstring)
# ---------------------------------------------------------------------------

_QNT_MAGIC = b"QNT1"
QNT_STEP = 6  # PSNR ≈ 10·log10(255²/(step²/12)) ≈ 43 dB


def qnt_encode(pixels: np.ndarray, step: int = QNT_STEP) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) + step // 2) // step
    header = _QNT_MAGIC + struct.pack(">IIB", w, h, step)
    return header + zlib.compress(q.astype(np.uint8).tobytes(), 6)


def qnt_decode(data: bytes) -> np.ndarray:
    if data[:4] != _QNT_MAGIC:
        raise ValueError("not a QNT")
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    px = np.clip(q.astype(np.int32) * step, 0, 255).astype(np.uint8)
    return px.reshape(h, w, 3)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "qnt":
        return qnt_encode(pixels)
    raise NotImplementedError(
        f"format {fmt!r}: real JPEG/WebP codecs unavailable in this "
        "environment (no libjpeg/PIL); plumbing supports them — see "
        "module docstring"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "qnt":
        return qnt_decode(data)
    raise NotImplementedError(f"format {fmt!r} (see encode_image)")


# ---------------------------------------------------------------------------
# PSNR + perceptual hash
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _block_mean_resize(gray: np.ndarray, size: int = 32) -> np.ndarray:
    """Deterministic area resize to size×size via block means."""
    h, w = gray.shape
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    out = np.empty((size, size), dtype=np.float64)
    for i in range(size):
        for j in range(size):
            out[i, j] = gray[ys[i] : max(ys[i] + 1, ys[i + 1]),
                             xs[j] : max(xs[j] + 1, xs[j + 1])].mean()
    return out


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64 for Spark LongType)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _block_mean_resize(gray, 32)
    m = _dct_matrix(32)
    dct = m @ small @ m.T
    block = dct[:8, :8].flatten()
    block = block[1:]  # drop DC term
    med = np.median(block)
    bits = block > med
    val = np.uint64(0)
    for b in bits:  # 63 bits; bit 63 left 0
        val = (val << np.uint64(1)) | np.uint64(bool(b))
    return int(np.int64(val))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
