"""Payload verification: vectorized decode + PSNR + caption/phash checks.

Per BASELINE.json input_hint: every fetched row's image bytes must decode to
pixels that match the reference pixels (PSNR >= 40 dB for lossy formats,
exact for lossless), captions must be byte-exact, phash must match. Runs as
an Arrow-batched ``mapInPandas`` (no per-row Python dispatch): the whole
batch is decoded into one (n, h, w, 3) ndarray and PSNR / exactness / phash
are bulk numpy ops — per-row Python only on malformed payloads (fallback).

Ground truth is REGENERATED on the executors from the deterministic corpus
seed (datagen.make_corpus layout: image k <- default_rng(seed*1_000_003+k)),
so no reference pixels are shipped — the check is a true end-to-end payload
integrity gate over the fetch/store path (Arrow + parquet binary handling).
The codec itself is the container-safe stub in codec.py; the PSNR math and
the 40 dB gate are real (jpg lands ~46 dB, png at +inf).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec

PSNR_MIN_DB = 40.0
PSNR_EXACT = 999.0  # stand-in for +inf (lossless exact match)

VERIFY_SCHEMA = (
    "round int, url_id long, image_id string, fmt string, "
    "psnr_db double, psnr_ok boolean, caption_ok boolean, phash_ok boolean"
)

_HDR = codec._HDR.size


def _expected_caption(k: int) -> str:
    return f"caption for image {k}: {'lorem ipsum ' * (k % 4 + 1)}".strip()


def _phash_batch(px: np.ndarray) -> np.ndarray:
    """Vectorized codec.phash64 over a (n, h, w, 3) batch (h, w divisible by
    8 on this path). Bit-identical to the scalar version: channel sums of 3
    uint8 are exact in float64, so sum/3 == float64 mean."""
    n, h, w, _ = px.shape
    # strided int16 adds then one float64 cast: bit-identical to
    # px.astype(f64).mean(axis=3) (3-byte sums are exact) at ~40% the cost
    g16 = px[..., 0].astype(np.int16)
    g16 += px[..., 1]
    g16 += px[..., 2]
    gray = g16.astype(np.float64) / 3.0
    bh, bw = h // 8, w // 8
    blocks = gray.reshape(n, 8, bh, 8, bw).mean(axis=(2, 4))
    bits = blocks > blocks.mean(axis=(1, 2), keepdims=True)
    packed = np.packbits(bits.reshape(n, 64).astype(np.uint8), axis=1)
    vals = packed.view(">u8")[:, 0].astype(np.uint64)
    return vals.view(np.int64)


def verify_fetched(fetched_with_payload: DataFrame, corpus_seed: int = 42, img_side: int = 16) -> DataFrame:
    """Input columns: round, url_id, image_id, bytes, fmt, caption, phash."""
    side = img_side
    payload_len = _HDR + side * side * 3

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # executor-lifetime ground-truth cache, regenerated per image k
        orig_cache: dict[int, np.ndarray] = {}
        cap_cache: dict[int, str] = {}

        def _orig(k: int) -> np.ndarray:
            if k not in orig_cache:
                r = np.random.default_rng(corpus_seed * 1_000_003 + k)
                orig_cache[k] = r.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
                cap_cache[k] = _expected_caption(k)
            return orig_cache[k]

        def _slow_row(blob: bytes, k: int, caption: str, phash: int):
            """Fallback for malformed/odd-shaped payloads."""
            try:
                orig = _orig(k)
                px, fmt = codec.decode(blob)
                p = codec.psnr(orig, px)
                lossless = fmt == "png"
                db = PSNR_EXACT if np.isinf(p) else p
                ok = np.array_equal(orig, px) if lossless else p >= PSNR_MIN_DB
                return db, ok, caption == cap_cache[k], phash == codec.phash64(px)
            except Exception:
                return 0.0, False, False, False

        for pdf in batches:
            n = len(pdf)
            image_ids = pdf["image_id"].astype(str)
            ks = pd.to_numeric(image_ids.str.slice(3), errors="coerce")
            blobs = pdf["bytes"].to_numpy()
            captions = pdf["caption"].astype(str).to_numpy()
            phashes = pdf["phash"].to_numpy()

            psnr_db = np.zeros(n)
            psnr_ok = np.zeros(n, dtype=bool)
            caption_ok = np.zeros(n, dtype=bool)
            phash_ok = np.zeros(n, dtype=bool)

            # fast path: well-formed fixed-size payloads with valid magic
            # (requires sides divisible by 8 for the vectorized phash)
            fast = np.zeros(n, dtype=bool)
            if side % 8 == 0:
                for i in range(n):
                    b = blobs[i]
                    fast[i] = (
                        not pd.isna(ks.iloc[i])
                        and isinstance(b, (bytes, bytearray))
                        and len(b) == payload_len
                        and b[:4] == codec.MAGIC
                    )
            idx = np.nonzero(fast)[0]
            if len(idx):
                kf = ks.iloc[idx].astype(int).to_numpy()
                px = np.stack(
                    [np.frombuffer(blobs[i], np.uint8, offset=_HDR) for i in idx]
                ).reshape(len(idx), side, side, 3)
                # ground truth gathered through unique-k indexing (the
                # corpus is orders of magnitude smaller than the batch)
                uk, inv = np.unique(kf, return_inverse=True)
                orig = np.stack([_orig(int(k)) for k in uk])[inv]
                expected_caps = np.array([cap_cache[int(k)] for k in uk], dtype=object)[inv]
                is_png = np.array([bytes(blobs[i][4:7]).rstrip(b" ") == b"png" for i in idx])
                # int64-accumulated einsum: one int16 diff temp, no float
                # casts or squared copies — this stage is memory-bound
                d = np.subtract(orig, px, dtype=np.int16)
                mse = (
                    np.einsum("nhwc,nhwc->n", d, d, dtype=np.int64).astype(np.float64)
                    / (side * side * 3)
                )
                with np.errstate(divide="ignore"):
                    db = 10.0 * np.log10((255.0 * 255.0) / mse)
                exact = mse == 0.0
                psnr_db[idx] = np.where(exact, PSNR_EXACT, db)
                psnr_ok[idx] = np.where(is_png, exact, db >= PSNR_MIN_DB)
                caption_ok[idx] = captions[idx] == expected_caps
                phash_ok[idx] = phashes[idx].astype(np.int64) == _phash_batch(px)

            for i in np.nonzero(~fast)[0]:
                k = -1 if pd.isna(ks.iloc[i]) else int(ks.iloc[i])
                psnr_db[i], psnr_ok[i], caption_ok[i], phash_ok[i] = _slow_row(
                    bytes(blobs[i]) if blobs[i] is not None else b"", k, captions[i], int(phashes[i])
                )

            yield pd.DataFrame(
                {
                    "round": pdf["round"],
                    "url_id": pdf["url_id"],
                    "image_id": pdf["image_id"],
                    "fmt": pdf["fmt"],
                    "psnr_db": psnr_db,
                    "psnr_ok": psnr_ok,
                    "caption_ok": caption_ok,
                    "phash_ok": phash_ok,
                }
            )

    return fetched_with_payload.mapInPandas(_verify, schema=VERIFY_SCHEMA)
