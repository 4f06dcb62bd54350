"""Deterministic fake image codec.

The container has no real image libraries (PIL/opencv), so per the build
contract the *decode* step is a clearly-marked deterministic fake: a tiny
header + pixel-byte payload. What matters — and is real — is the Spark-side
plumbing (binary columns, Arrow-batched vectorized decode, PSNR math on
decoded pixel arrays, caption byte-equality) demanded by BASELINE.json's
``input_hint``: decoded-pixel allclose with PSNR >= 40 dB for lossy formats.

Formats:
  * ``png``  — lossless: payload is the raw uint8 pixel buffer.
  * ``jpg``  — lossy: pixels are quantized to steps of Q=4 before encoding,
    which bounds per-pixel error to Q/2 and yields PSNR ~= 42 dB — above the
    40 dB gate, below lossless — so the verify UDF's PSNR math is exercised
    for real on both sides of the threshold.

Header layout (little-endian): magic 4s | fmt 3s | w uint16 | h uint16 | c uint8.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"FIMG"
_HDR = struct.Struct("<4s3sHHB")
JPG_Q = 4  # quantization step for the lossy path


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, c) uint8 pixel array. STUB CODEC (see module doc):
    deterministic, reversible up to jpg quantization."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3:
        raise ValueError("pixels must be (h, w, c) uint8")
    h, w, c = pixels.shape
    if fmt == "jpg":
        payload = ((pixels.astype(np.uint16) // JPG_Q) * JPG_Q + JPG_Q // 2)
        payload = np.minimum(payload, 255).astype(np.uint8)
    elif fmt == "png":
        payload = pixels
    else:
        raise NotImplementedError(f"real codec for format {fmt!r} not available in this container")
    return _HDR.pack(MAGIC, fmt.encode().ljust(3), w, h, c) + payload.tobytes()


def decode(data: bytes) -> tuple[np.ndarray, str]:
    """Decode bytes -> ((h, w, c) uint8 array, fmt). STUB CODEC."""
    magic, fmt_b, w, h, c = _HDR.unpack_from(data, 0)
    if magic != MAGIC:
        raise NotImplementedError("real image decode not available in this container")
    fmt = fmt_b.rstrip(b" ").decode()
    arr = np.frombuffer(data, dtype=np.uint8, offset=_HDR.size)
    return arr.reshape(h, w, c).copy(), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10((255.0 * 255.0) / mse)


def phash64(pixels: np.ndarray) -> int:
    """Tiny deterministic perceptual hash: 8x8 block-mean > global-mean bits.
    Signed 64-bit to fit Spark LongType.

    Integer-exact semantics: bit[i,j] = (64 * block_sum[i,j] > total_sum),
    which is algebraically identical to block-mean(gray) > global-mean(gray)
    for equal-size blocks (both sides scaled by 64*c*bh*bw) but has no float
    rounding — so the scalar and the batch twin (engine.verify._phash_batch)
    agree bit-for-bit by construction, and no float64 gray plane (2 KB/row)
    is ever materialized. Remainder rows/cols when a side is not divisible
    by 8 are ignored, matching the old slice-based fallback.

    Images narrower than 8 in either dimension can't form 8x8 blocks; they
    fall back to nearest-neighbor sampling an 8x8 grid (row i -> i*h//8) —
    still deterministic and integer-exact, instead of a reshape ValueError.
    The batch twin never sees this path (its fast-path gate requires
    side % 8 == 0 and side >= 8; smaller rows go through this scalar)."""
    h, w, _ = pixels.shape
    if h < 8 or w < 8:
        if h == 0 or w == 0:
            raise ValueError("phash64 needs a non-empty image")
        s = (
            pixels[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8]
            .astype(np.int64)
            .sum(axis=2)
        )
    else:
        bh, bw = h // 8, w // 8
        s = (
            pixels[: 8 * bh, : 8 * bw]
            .astype(np.int64)
            .sum(axis=2)
            .reshape(8, bh, 8, bw)
            .sum(axis=(1, 3))
        )
    bits = (s * 64 > s.sum()).flatten()
    val = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
    return val - (1 << 64) if val >= (1 << 63) else val
