"""Multimodal-column operators: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas (BASELINE.json
input_hint plumbing). The container has no real image libs, so decode uses
the clearly-marked deterministic stub codec (crawler_spark/codec.py); the
Spark-side plumbing — binary columns, schemas, vectorized batches — is real.

All three queries are DuckDB-oracle-gated: `mm_binary_stats` via pure byte
math, `mm_decode_features` via a closed-form pixel pattern whose decoded
channel means DuckDB recomputes symbolically, `mm_sample_select` via the
shared content-hash expression.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codec, datagen
from .common import duck_h32, load, spark_h32, table_rows


# -- binary column stats (oracle-checked byte math) -------------------------
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.expr(spark_h32("text")).alias("content_h32"),
        F.substring("text", 1, 1).alias("first_byte"),
    )


BINARY_STATS_SQL = f"""
SELECT doc_id, octet_length(encode(text))::bigint AS n_bytes,
       {duck_h32('text')} AS content_h32,
       substr(text, 1, 1) AS first_byte
FROM documents
"""


# -- decode + feature extraction over binary image payloads (oracle-gated) --
#
# The corpus for this query uses CLOSED-FORM pixels (not rng) so the decoded
# channel means are independently computable by the DuckDB oracle:
#     px[k, i, j, c] = (k*7919 + i*131 + j*17 + c*101) % 256
# Odd k is encoded lossy ("jpg", quantized to (p//4)*4+2 by the stub codec),
# even k lossless ("png"). Generation runs ON EXECUTORS (spark.range ->
# mapInPandas), so at scale no binary payload ever passes through the driver;
# the feature stage then decodes the binary column Arrow-batch-vectorized
# (np.frombuffer stack, einsum channel sums, vectorized phash — the
# engine/verify.py pattern; zero per-row Python in the hot path).
#
# Means are emitted UNROUNDED: the channel sum is an exact int64 and
# side*side = 256 is a power of two, so sum/256 is exact in float64 in both
# engines — no summation-order noise to round away.

MM_SIDE = 16  # divisible by 8 -> vectorized phash path
_MM_HDR = codec._HDR.size
_MM_NBYTES = _MM_HDR + MM_SIDE * MM_SIDE * 3

FEATURE_SCHEMA = (
    "image_id string, fmt string, w int, h int, n_bytes long, "
    "mean_r double, mean_g double, mean_b double, phash_match boolean"
)


def _pattern_pixels(ks: np.ndarray, side: int) -> np.ndarray:
    """(n, side, side, 3) uint8 closed-form pattern, vectorized."""
    i = np.arange(side, dtype=np.int64)[None, :, None, None]
    j = np.arange(side, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    k = ks.astype(np.int64)[:, None, None, None]
    return ((k * 7919 + i * 131 + j * 17 + c * 101) % 256).astype(np.uint8)


def _gen_pattern_corpus(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..engine.verify import _phash_batch

    side = MM_SIDE
    for pdf in batches:
        ks = pdf["id"].to_numpy(dtype=np.int64)
        if not len(ks):
            continue
        px = _pattern_pixels(ks, side)
        lossy = ks % 2 == 1
        # stub-codec jpg roundtrip: quantize the whole batch vectorized
        # ((p//4)*4+2 <= 254, so codec.encode's clip is a no-op)
        decoded = px.copy()
        decoded[lossy] = (px[lossy] >> 2 << 2) + codec.JPG_Q // 2
        phashes = _phash_batch(decoded)
        fmts = np.where(lossy, "jpg", "png")
        blobs = [
            codec._HDR.pack(codec.MAGIC, fmts[x].encode().ljust(3), side, side, 3)
            + decoded[x].tobytes()
            for x in range(len(ks))
        ]
        yield pd.DataFrame(
            {
                "image_id": [f"img{k}" for k in ks],
                "bytes": blobs,
                "w": np.full(len(ks), side, dtype=np.int32),
                "h": np.full(len(ks), side, dtype=np.int32),
                "fmt": fmts,
                "caption": [f"pattern caption {k}" for k in ks],
                "phash": phashes,
            }
        )


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..engine.verify import _phash_batch

    side = MM_SIDE
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        hdr, payload = full[:, :_MM_HDR], full[:, _MM_HDR:]
        px = payload.reshape(n, side, side, 3)
        # header fields, vectorized (layout: magic 4s | fmt 3s | w H | h H | c B)
        fmt = np.where(hdr[:, 4] == ord("j"), "jpg", "png")
        w = (hdr[:, 7].astype(np.int32) | (hdr[:, 8].astype(np.int32) << 8))
        h = (hdr[:, 9].astype(np.int32) | (hdr[:, 10].astype(np.int32) << 8))
        sums = np.einsum("nijc->nc", px, dtype=np.int64).astype(np.float64)
        means = sums / (side * side)  # exact: power-of-two divisor
        yield pd.DataFrame(
            {
                "image_id": pdf["image_id"],
                "fmt": fmt,
                "w": w,
                "h": h,
                "n_bytes": np.array([len(b) for b in blobs], dtype=np.int64),
                "mean_r": means[:, 0],
                "mean_g": means[:, 1],
                "mean_b": means[:, 2],
                "phash_match": _phash_batch(px) == pdf["phash"].to_numpy().astype(np.int64),
            }
        )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern corpus sized from sf_dir (|documents| // 5 images), generated
    and decoded entirely on executors in Arrow batches. Oracle: DuckDB
    recomputes the expected means from the closed-form pixel pattern."""
    n = table_rows(sf_dir, "documents") // 5
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_pattern_corpus, schema=datagen.WORLD_SCHEMAS["corpus"]
    )
    return corpus.mapInPandas(_decode_features, schema=FEATURE_SCHEMA)


DECODE_FEATURES_SQL = f"""
WITH ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < (SELECT count(*) // 5 FROM documents)
),
px AS (
  SELECT k,
         (k*7919 + i.range*131 + j.range*17) % 256 AS r0,
         (k*7919 + i.range*131 + j.range*17 + 101) % 256 AS g0,
         (k*7919 + i.range*131 + j.range*17 + 202) % 256 AS b0,
         k % 2 = 1 AS lossy
  FROM ks, range(0, {MM_SIDE}) i, range(0, {MM_SIDE}) j
),
q AS (
  SELECT k, lossy,
         CASE WHEN lossy THEN (r0//4)*4+2 ELSE r0 END AS r,
         CASE WHEN lossy THEN (g0//4)*4+2 ELSE g0 END AS g,
         CASE WHEN lossy THEN (b0//4)*4+2 ELSE b0 END AS b
  FROM px
)
SELECT 'img' || k AS image_id,
       CASE WHEN k % 2 = 1 THEN 'jpg' ELSE 'png' END AS fmt,
       {MM_SIDE} AS w, {MM_SIDE} AS h, {_MM_NBYTES}::bigint AS n_bytes,
       sum(r)::double / {MM_SIDE * MM_SIDE} AS mean_r,
       sum(g)::double / {MM_SIDE * MM_SIDE} AS mean_g,
       sum(b)::double / {MM_SIDE * MM_SIDE} AS mean_b,
       true AS phash_match
FROM q GROUP BY k
"""


# -- resize (vectorized nearest-neighbor downsample) ------------------------
MM_RESIZE_FACTOR = 2  # 16x16 -> 8x8; strided view, no interpolation kernel

RESIZE_SCHEMA = (
    "image_id string, fmt string, w int, h int, "
    "mean_r double, mean_g double, mean_b double"
)


def _resize_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    side, f = MM_SIDE, MM_RESIZE_FACTOR
    out_side = side // f
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        px = full[:, _MM_HDR:].reshape(n, side, side, 3)
        small = px[:, ::f, ::f, :]  # whole-batch strided nearest-neighbor
        fmt = np.where(full[:, 4] == ord("j"), "jpg", "png")
        sums = np.einsum("nijc->nc", small, dtype=np.int64).astype(np.float64)
        means = sums / (out_side * out_side)  # exact: power-of-two divisor
        yield pd.DataFrame(
            {
                "image_id": pdf["image_id"],
                "fmt": fmt,
                "w": np.full(n, out_side, dtype=np.int32),
                "h": np.full(n, out_side, dtype=np.int32),
                "mean_r": means[:, 0],
                "mean_g": means[:, 1],
                "mean_b": means[:, 2],
            }
        )


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize over the binary payloads, whole
    batches at a time (strided numpy view — no per-image Python). The
    oracle recomputes the resized means from the closed-form pattern at the
    sampled (even) pixel coordinates."""
    n = table_rows(sf_dir, "documents") // 5
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_pattern_corpus, schema=datagen.WORLD_SCHEMAS["corpus"]
    )
    return corpus.mapInPandas(_resize_features, schema=RESIZE_SCHEMA)


_OUT_SIDE = MM_SIDE // MM_RESIZE_FACTOR
RESIZE_SQL = f"""
WITH ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < (SELECT count(*) // 5 FROM documents)
),
px AS (
  SELECT k,
         (k*7919 + (i.range*{MM_RESIZE_FACTOR})*131 + (j.range*{MM_RESIZE_FACTOR})*17) % 256 AS r0,
         (k*7919 + (i.range*{MM_RESIZE_FACTOR})*131 + (j.range*{MM_RESIZE_FACTOR})*17 + 101) % 256 AS g0,
         (k*7919 + (i.range*{MM_RESIZE_FACTOR})*131 + (j.range*{MM_RESIZE_FACTOR})*17 + 202) % 256 AS b0,
         k % 2 = 1 AS lossy
  FROM ks, range(0, {_OUT_SIDE}) i, range(0, {_OUT_SIDE}) j
),
q AS (
  SELECT k, lossy,
         CASE WHEN lossy THEN (r0//4)*4+2 ELSE r0 END AS r,
         CASE WHEN lossy THEN (g0//4)*4+2 ELSE g0 END AS g,
         CASE WHEN lossy THEN (b0//4)*4+2 ELSE b0 END AS b
  FROM px
)
SELECT 'img' || k AS image_id,
       CASE WHEN k % 2 = 1 THEN 'jpg' ELSE 'png' END AS fmt,
       {_OUT_SIDE} AS w, {_OUT_SIDE} AS h,
       sum(r)::double / {_OUT_SIDE * _OUT_SIDE} AS mean_r,
       sum(g)::double / {_OUT_SIDE * _OUT_SIDE} AS mean_g,
       sum(b)::double / {_OUT_SIDE * _OUT_SIDE} AS mean_b
FROM q GROUP BY k
"""


# -- frame/sample selection on metadata (oracle-checked) --------------------
def mm_sample_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-8 sampling by content hash (the frame-sampling
    pattern: cheap metadata-level selection before expensive decode)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.expr(f"{spark_h32('text')} % 8 = 0")).select(
        "doc_id", "source", F.col("n_chars").alias("n_chars")
    )


SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE {duck_h32('text')} % 8 = 0
"""


QUERIES = {
    "mm_binary_stats": (mm_binary_stats, BINARY_STATS_SQL),
    "mm_decode_features": (mm_decode_features, DECODE_FEATURES_SQL),
    "mm_resize": (mm_resize, RESIZE_SQL),
    "mm_sample_select": (mm_sample_select, SAMPLE_SQL),
}
