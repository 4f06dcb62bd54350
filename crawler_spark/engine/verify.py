"""Payload verification: vectorized decode + PSNR + caption/phash checks.

Per BASELINE.json input_hint: every fetched row's image bytes must decode to
pixels that match the reference pixels (PSNR >= 40 dB for lossy formats,
exact for lossless), captions must be byte-exact, phash must match. Runs as
an Arrow-batched ``mapInPandas`` (no per-row Python dispatch).

Ground truth is REGENERATED on the executors from the deterministic corpus
seed (datagen.make_corpus layout: image k <- default_rng(seed*1_000_003+k)),
so no reference pixels are shipped — the check is a true end-to-end payload
integrity gate over the fetch/store path (Arrow + parquet binary handling).
The codec itself is the container-safe stub in codec.py; the PSNR math and
the 40 dB gate are real (jpg lands ~42 dB, png at +inf).
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


def _expected_caption(k: int) -> str:
    return f"caption for image {k}: {'lorem ipsum ' * (k % 4 + 1)}".strip()


def verify_fetched(fetched_with_payload: DataFrame, corpus_seed: int = 42, img_side: int = 16) -> DataFrame:
    """Input columns: round, url_id, image_id, bytes, fmt, caption, phash."""

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # executor-lifetime caches: ground-truth pixels / captions / phash
        # per image k are regenerated once, not per row (the corpus is many
        # orders of magnitude smaller than the fetch stream)
        orig_cache: dict[int, np.ndarray] = {}
        cap_cache: dict[int, str] = {}

        def _orig(k: int) -> np.ndarray:
            if k not in orig_cache:
                r = np.random.default_rng(corpus_seed * 1_000_003 + k)
                orig_cache[k] = r.integers(0, 256, size=(img_side, img_side, 3), dtype=np.uint8)
                cap_cache[k] = _expected_caption(k)
            return orig_cache[k]

        for pdf in batches:
            n = len(pdf)
            psnr_db = np.zeros(n)
            psnr_ok = np.zeros(n, dtype=bool)
            caption_ok = np.zeros(n, dtype=bool)
            phash_ok = np.zeros(n, dtype=bool)
            image_ids = pdf["image_id"].to_numpy()
            blobs = pdf["bytes"].to_numpy()
            captions = pdf["caption"].to_numpy()
            phashes = pdf["phash"].to_numpy()
            for i in range(n):
                try:
                    k = int(str(image_ids[i])[3:])
                    orig = _orig(k)
                    px, fmt = codec.decode(bytes(blobs[i]))
                    p = codec.psnr(orig, px)
                    lossless = fmt == "png"
                    psnr_db[i] = PSNR_EXACT if np.isinf(p) else p
                    psnr_ok[i] = np.array_equal(orig, px) if lossless else p >= PSNR_MIN_DB
                    caption_ok[i] = str(captions[i]) == cap_cache[k]
                    # phash recomputed from THIS row's decoded pixels (a
                    # cache keyed on image id would mask per-row corruption)
                    phash_ok[i] = int(phashes[i]) == codec.phash64(px)
                except Exception:
                    pass
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
