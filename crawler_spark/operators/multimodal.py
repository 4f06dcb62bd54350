"""Multimodal-column operators: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas (BASELINE.json
input_hint plumbing). The container has no real image libs, so decode uses
the clearly-marked deterministic stub codec (crawler_spark/codec.py); the
Spark-side plumbing — binary columns, schemas, vectorized batches — is real.

All queries are DuckDB-oracle-gated: `mm_decode_features` / `mm_resize` /
`mm_frame_sample` via a closed-form pixel pattern whose decoded channel
means DuckDB recomputes symbolically, `mm_phash_neardup` via a bit-exact
hugeint rebuild of the average-hash, `mm_sample_select` via the shared
content-hash expression (`mm_binary_stats` is oracle-verified in pytest,
not a catalog slot — see tests/test_ungated_oracles.py).
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
# Not a standalone gated entry (the driver checks at most 50 queries): the
# byte-stat semantics are gated through `mm_frame_sample` (per-payload
# n_bytes) and `mm_sample_select` (the same content-h32 expression drives its
# filter), and this standalone builder stays oracle-verified by
# tests/test_ungated_oracles.py.
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


# -- perceptual-hash near-duplicate detection over image payloads -----------
#
# THE image-side dedup primitive for a crawl-scale training pipeline: two
# crawled images are near-dups when their 64-bit perceptual hashes are within
# a small Hamming distance (re-encodes, lossy roundtrips, small edits). The
# scale shape mirrors dedup_minhash_lsh: band the 64-bit phash into 4x16-bit
# slices, equi-join on (band_no, band_val) — a near pair (ham <= 4) shares at
# least one intact band unless all flipped bits straddle 4 distinct bands, so
# band recall is high and every candidate pays only one popcount — then
# verify ham(xor) <= PHASH_HAM_MAX and canonicalize each image to the min-id
# member of its neighborhood (the exact-dedup keep-min pattern). No all-pairs
# comparison anywhere; at 100 TB the phash is an index-time artifact computed
# once at decode (the engine's verify stage already emits it) and the band
# join shuffles only (band_val, id, phash) tuples.
#
# The pattern corpus repeats every 256 ids (gcd(7919, 256) = 1 and 256 is
# even, so k and k+256 produce byte-identical images WITH the same lossy
# treatment) — real duplicate classes, not an artificial pair list. DuckDB
# recomputes the phash bit-exactly from the closed form (integer average-hash:
# bit = 64*block_sum > total_sum, packed MSB-first) and runs the same
# band-join + popcount pipeline.

PHASH_HAM_MAX = 4
N_PHASH_BANDS = 4
PHASH_BAND_BITS = 64 // N_PHASH_BANDS


def _phash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, phash) materialized ONCE (the ANN-family lesson from round 2:
    both band-join sides must read one checkpoint leaf, not re-run the
    decode)."""
    n = table_rows(sf_dir, "documents") // 5
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_pattern_corpus, schema=datagen.WORLD_SCHEMAS["corpus"]
    )
    return corpus.select(
        F.expr("cast(substring(image_id, 4) as long)").alias("k"), "phash"
    ).localCheckpoint(eager=True)


def _band_stack(df: DataFrame, hash_col: str, *carry: str) -> DataFrame:
    """Explode a signed-64-bit hash column into N_PHASH_BANDS
    (band_no, band_val) rows — THE one definition of the LSH band layout,
    shared by the image (`_phash_edges`) and video (`_video_edges`) dedup
    paths so the two cannot drift. Arithmetic shiftright then mask keeps
    exactly bits [16b, 16b+16) of the two's-complement pattern, sign bits
    masked away (matches the SQL twins' `(s >> 16b) & 0xffff` on the
    unsigned hugeint)."""
    mask = (1 << PHASH_BAND_BITS) - 1
    stack_args = ", ".join(
        f"{b}, cast(shiftright({hash_col}, {b * PHASH_BAND_BITS}) & {mask} as bigint)"
        for b in range(N_PHASH_BANDS)
    )
    return df.select(
        *carry, hash_col,
        F.expr(f"stack({N_PHASH_BANDS}, {stack_args}) as (band_no, band_val)"),
    )


def _phash_edges(idx: DataFrame) -> DataFrame:
    """Undirected verified near-dup edges (ka < kb): band equi-join
    candidates filtered by Hamming <= PHASH_HAM_MAX — shared by the
    pairwise near-dup view and the transitive group builder."""
    bands = _band_stack(idx, "phash", "k")
    left = bands.select(
        F.col("k").alias("ka"), F.col("phash").alias("pa"), "band_no", "band_val"
    )
    right = bands.select(
        F.col("k").alias("kb"), F.col("phash").alias("pb"), "band_no", "band_val"
    )
    return (
        left.join(right, ["band_no", "band_val"])
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb", "pa", "pb")
        .distinct()  # a pair sharing several bands is one candidate
        .filter(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) <= PHASH_HAM_MAX)
        .select("ka", "kb")
    )


def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _phash_index(spark, sf_dir)
    edges = _phash_edges(idx)
    directed = edges.unionByName(
        edges.select(F.col("kb").alias("ka"), F.col("ka").alias("kb"))
    )
    agg = directed.groupBy("ka").agg(
        F.min("kb").alias("min_nb"), F.count("*").alias("n_near")
    )
    return idx.join(agg, idx["k"] == agg["ka"], "left").select(
        F.concat(F.lit("img"), F.col("k").cast("string")).alias("image_id"),
        "phash",
        F.concat(
            F.lit("img"),
            F.least(F.col("k"), F.coalesce("min_nb", F.col("k"))).cast("string"),
        ).alias("rep_id"),
        F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
        (F.coalesce("min_nb", F.col("k")) < F.col("k")).alias("is_dup"),
    )


# ONE definition of the phash-edge CTE chain (closed-form decode ->
# average-hash -> bands -> verified edges) shared by the pairwise near-dup
# oracle and the transitive groups oracle
_PHASH_EDGE_CTES = f"""ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < (SELECT count(*) // 5 FROM documents)
),
px AS (
  SELECT k, i.range AS i, j.range AS j,
         (k*7919 + i.range*131 + j.range*17) % 256 AS r0,
         (k*7919 + i.range*131 + j.range*17 + 101) % 256 AS g0,
         (k*7919 + i.range*131 + j.range*17 + 202) % 256 AS b0,
         k % 2 = 1 AS lossy
  FROM ks, range(0, {MM_SIDE}) i, range(0, {MM_SIDE}) j
),
g AS (
  SELECT k, i//2 AS bi, j//2 AS bj,
         (CASE WHEN lossy THEN (r0//4)*4+2 ELSE r0 END
        + CASE WHEN lossy THEN (g0//4)*4+2 ELSE g0 END
        + CASE WHEN lossy THEN (b0//4)*4+2 ELSE b0 END) AS gray
  FROM px
),
bs AS (SELECT k, bi, bj, sum(gray)::bigint AS bsum FROM g GROUP BY k, bi, bj),
tot AS (SELECT k, sum(bsum)::hugeint AS total FROM bs GROUP BY k),
bits AS (
  SELECT bs.k, (bi*8 + bj) AS idx,
         CASE WHEN 64::hugeint * bsum > total THEN 1::hugeint ELSE 0::hugeint END AS bit
  FROM bs JOIN tot ON bs.k = tot.k
),
packed AS (SELECT k, sum(bit * (1::hugeint << (63 - idx))) AS s FROM bits GROUP BY k),
ph AS (
  SELECT k, s,
         (CASE WHEN s >= (1::hugeint << 63) THEN s - (1::hugeint << 64) ELSE s END)::bigint AS phash
  FROM packed
),
bands AS (
  SELECT k, phash, b.range AS band_no,
         ((s >> ({PHASH_BAND_BITS} * b.range)::int) & {(1 << PHASH_BAND_BITS) - 1})::bigint AS band_val
  FROM ph, range(0, {N_PHASH_BANDS}) b
),
edges AS (
  SELECT ka, kb FROM (
    SELECT DISTINCT a.k AS ka, b.k AS kb, a.phash AS pa, b.phash AS pb
    FROM bands a JOIN bands b
      ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.k < b.k
  ) WHERE bit_count(xor(pa, pb)) <= {PHASH_HAM_MAX}
)"""

PHASH_NEARDUP_SQL = f"""
WITH {_PHASH_EDGE_CTES},
directed AS (SELECT ka, kb FROM edges UNION ALL SELECT kb AS ka, ka AS kb FROM edges),
agg AS (SELECT ka, min(kb) AS min_nb, count(*)::bigint AS n_near FROM directed GROUP BY ka)
SELECT 'img' || ph.k AS image_id, phash,
       'img' || least(ph.k, coalesce(min_nb, ph.k)) AS rep_id,
       coalesce(n_near, 0)::bigint AS n_near,
       coalesce(min_nb, ph.k) < ph.k AS is_dup
FROM ph LEFT JOIN agg ON ph.k = agg.ka
"""


# -- admission-time image near-dup gate over a persisted phash index --------
def mm_dedup_incremental_frames(
    batch_idx: DataFrame, index_idx: DataFrame
) -> DataFrame:
    """Admission-time near-dup verdict for an INCOMING image batch against
    an already-indexed corpus in O(batch + matched) — the image twin of
    `dedup.dedup_incremental_frames`, and exactly the gate a crawl ingest
    needs (the engine's verify stage already emits the phash per fetched
    image; re-running the corpus-wide band join per ingest, what
    mm_phash_groups does, is not an option at 100 TB).

    Inputs: `index_idx` (k, phash) is the PERSISTED index table appended
    per admitted batch; `batch_idx` the incoming batch's (k, phash) rows.
    Output, one row per batch image: is_novel, dup_of = the MIN-id
    verified neighbor among index images and SMALLER-id batch siblings
    ('' when novel), hamming of that neighbor (-1 when novel). Greedy
    min-id is deterministic and SQL-expressible; transitive grouping
    stays mm_phash_groups' compaction-time job.

    Scale shape: the batch is banded in O(batch); candidates come from
    TWO equi-joins — batch bands × index bands (persist the index
    bucketed by (band_no, band_val) so only the batch side shuffles) and
    batch × batch for intra-batch dups. Unlike the minhash gate there is
    NO second verification pass against a shingle store: the phash IS the
    verifier (in-row popcount on the candidate pair), so no torn-store
    mode exists — one table, one invariant. Replay safety: the index's
    copies of the CURRENT batch (self-pairs and batch siblings alike) are
    anti-joined out of cross candidates, so re-admitting an already-
    appended batch reproduces the clean run's verdicts exactly (pinned in
    tests/test_ungated_oracles.py::test_mm_incremental_replay_safe)."""
    bb = _band_stack(batch_idx, "phash", "k")
    ib = _band_stack(index_idx, "phash", "k")
    cross = (
        bb.select(
            F.col("k").alias("ka"), F.col("phash").alias("pa"),
            "band_no", "band_val",
        )
        .join(
            ib.select(
                F.col("k").alias("kb"), F.col("phash").alias("pb"),
                "band_no", "band_val",
            ),
            ["band_no", "band_val"],
        )
        # replay: an index copy of a batch sibling must not shadow
        # internal's smaller-id rule (the dedup_incremental lesson)
        .join(
            F.broadcast(batch_idx.select(F.col("k").alias("kb"))),
            "kb",
            "left_anti",
        )
        .select("ka", "kb", "pa", "pb")
    )
    internal = (
        bb.select(
            F.col("k").alias("ka"), F.col("phash").alias("pa"),
            "band_no", "band_val",
        )
        .join(
            bb.select(
                F.col("k").alias("kb"), F.col("phash").alias("pb"),
                "band_no", "band_val",
            ),
            ["band_no", "band_val"],
        )
        .filter(F.col("kb") < F.col("ka"))
        .select("ka", "kb", "pa", "pb")
    )
    verified = (
        cross.unionByName(internal)
        .distinct()  # a pair sharing several bands (or replayed) is one candidate
        .withColumn(
            "ham", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("long")
        )
        .filter(F.col("ham") <= PHASH_HAM_MAX)
    )
    # kb is unique per (ka, kb) pair, so the struct min picks the min-id
    # neighbor deterministically and carries its hamming along
    best = verified.groupBy("ka").agg(F.min(F.struct("kb", "ham")).alias("m"))
    return (
        batch_idx.join(best.select(F.col("ka").alias("k"), "m"), "k", "left")
        .select(
            F.concat(F.lit("img"), F.col("k").cast("string")).alias("image_id"),
            "phash",
            F.col("m").isNull().alias("is_novel"),
            F.when(F.col("m").isNull(), F.lit("")).otherwise(
                F.concat(F.lit("img"), F.col("m.kb").cast("string"))
            ).alias("dup_of"),
            F.coalesce(F.col("m.ham"), F.lit(-1)).cast("long").alias("hamming"),
        )
    )


def mm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-corpus stand-in (the dedup_incremental / decontaminate trick):
    images with k % 4 == 0 play the incoming batch, the rest the persisted
    index. Phashes are per-image (corpus-independent), so the split
    computes EXACTLY the verdicts the production frames API would emit for
    this batch against that index. Both splits read the ONE _phash_index
    checkpoint leaf — no second decode pass."""
    idx = _phash_index(spark, sf_dir)
    is_batch = F.col("k") % 4 == 0
    return mm_dedup_incremental_frames(idx.filter(is_batch), idx.filter(~is_batch))


MM_INCREMENTAL_SQL = f"""
WITH {_PHASH_EDGE_CTES},
cand AS (
  SELECT DISTINCT a.k AS ka, b.k AS kb, a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
  WHERE a.k % 4 = 0 AND (b.k % 4 <> 0 OR b.k < a.k)
),
ver AS (
  SELECT ka, kb, bit_count(xor(pa, pb))::bigint AS ham
  FROM cand WHERE bit_count(xor(pa, pb)) <= {PHASH_HAM_MAX}
),
best AS (
  SELECT ka, kb, ham FROM (
    SELECT ka, kb, ham,
           row_number() OVER (PARTITION BY ka ORDER BY kb) AS rn
    FROM ver
  ) WHERE rn = 1
)
SELECT 'img' || ph.k AS image_id, ph.phash,
       best.kb IS NULL AS is_novel,
       CASE WHEN best.kb IS NULL THEN '' ELSE 'img' || best.kb END AS dup_of,
       coalesce(best.ham, -1)::bigint AS hamming
FROM ph LEFT JOIN best ON ph.k = best.ka
WHERE ph.k % 4 = 0
"""


def mm_phash_groups(spark: SparkSession, sf_dir: str,
                    max_iters: int = 16) -> DataFrame:
    """Transitive phash duplicate GROUPS — the image analog of
    dedup_groups: a re-encode chain A~B~C (each hop within Hamming 4, the
    ends possibly beyond it) is one duplicate class with one
    representative, which the pairwise neighborhood view
    (mm_phash_neardup's direct-neighbor rep) cannot express. Edges are the
    shared `_phash_edges`; components come from the shared
    `dedup.min_label_components` propagation over the edge subgraph only —
    an image with no near-dup edge never rides an iteration. DuckDB twin:
    a recursive-CTE reachability closure over the identical edge set."""
    from .dedup import min_label_components

    idx = _phash_index(spark, sf_dir)
    edges = _phash_edges(idx).select(
        F.col("ka").alias("doc_a"), F.col("kb").alias("doc_b")
    )
    labels = min_label_components(edges, max_iters)
    sized = labels.join(
        labels.groupBy("label").agg(F.count("*").alias("group_size")), "label"
    )
    return idx.join(sized, idx["k"] == sized["doc_id"], "left").select(
        F.concat(F.lit("img"), F.col("k").cast("string")).alias("image_id"),
        F.concat(
            F.lit("img"), F.coalesce("label", F.col("k")).cast("string")
        ).alias("group_id"),
        F.coalesce("group_size", F.lit(1)).cast("long").alias("group_size"),
        (F.col("k") == F.coalesce("label", F.col("k"))).alias("is_rep"),
    )


PHASH_GROUPS_SQL = f"""
WITH RECURSIVE {_PHASH_EDGE_CTES},
sym AS (SELECT ka AS a, kb AS b FROM edges
        UNION ALL SELECT kb AS a, ka AS b FROM edges),
reach(v, r) AS (
  SELECT k AS v, k AS r FROM ks
  UNION
  SELECT s.b AS v, reach.r FROM reach JOIN sym s ON s.a = reach.v
),
grp AS (SELECT v AS k, min(r) AS gid FROM reach GROUP BY v),
gs AS (SELECT gid, count(*)::bigint AS group_size FROM grp GROUP BY gid)
SELECT 'img' || grp.k AS image_id,
       'img' || gid AS group_id,
       gs.group_size,
       (grp.k = gid) AS is_rep
FROM grp JOIN gs USING (gid)
"""


# -- leakage-safe image split (the pipeline_split image leg) -----------------
# Train/val/test assignment keyed by the phash duplicate CLASS: hashing
# image_id would put a re-encode of a training image into the eval set
# (the image-retrieval leakage channel — LAION dedup practice). Unlike
# pipeline_split's text side there is NO singleton escape hatch to build:
# byte-identical images decode to the identical phash, share every LSH
# band, and therefore ALWAYS get a Hamming-0 edge into one group — the
# sub-shingle-length leak has no image analog, so the group label alone is
# a complete key. Bucket = the shared h32 md5-slice twins % 100 on the
# 'imgNN' group label (already namespace-prefixed), same 80/10/10 rule as
# pipeline_split so the two sides of an interleaved corpus split
# consistently. Scale: the audited phash-groups dataflow + one stateless
# per-row bucket — no new exchange.

def _group_split(g: DataFrame, id_name: str) -> DataFrame:
    """Bucket a (id, group_id, group_size) frame into train/val/test by the
    group label — ONE definition of the assignment shared by mm_split and
    the video/audio clip splits (same h32 twins, same 80/10/10 thresholds
    as pipeline_split, so every modality of an interleaved corpus splits
    consistently)."""
    from .pipeline import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT

    bucket = F.expr(spark_h32("group_id")) % 100
    return g.select(
        id_name,
        "group_id",
        "group_size",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


def _group_split_sql(groups_sql: str, id_name: str) -> str:
    from .pipeline import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT

    b = f"({duck_h32('group_id')} % 100)"
    return f"""
WITH g AS (SELECT * FROM ({groups_sql}) gg)
SELECT {id_name}, group_id, group_size,
       {b}::bigint AS bucket,
       CASE WHEN {b} < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {b} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM g
"""


def mm_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _group_split(mm_phash_groups(spark, sf_dir), "image_id")


def _mm_split_sql() -> str:
    return _group_split_sql(PHASH_GROUPS_SQL, "image_id")


MM_SPLIT_SQL = _mm_split_sql()


# -- query-by-image retrieval (phash Hamming top-k) --------------------------
# The image-axis retrieval leg, completing the matrix next to the dedup
# views: given a small query set of images, return each query's k nearest
# corpus images by phash Hamming distance — reverse image search, "find
# training images similar to this eval image" audits, and the serving
# shape of every copy-detection triage UI. Same architecture as
# ann_bucket_rerank translated to Hamming space: candidates come from the
# banded LSH equi-join (an image must share at least one exact 16-bit
# band with the query — by pigeonhole this RECALLS every image within
# Hamming <= N_PHASH_BANDS-1 of the query wherever the 4 flipped bits
# land, and grades further-out images best-effort; retrieval does NOT
# threshold at PHASH_HAM_MAX, that is the near-dup views' job), then the
# exact popcount reranks and a per-query row_number pages the top-k (the
# ANN serving-block shape). The QUERY side broadcasts by construction
# (N_IMG_QUERIES rows); the index is the shared `_phash_index` checkpoint
# leaf, so the serving plan re-decodes nothing. Candidate cost at 100 TB:
# |queries| x (corpus fraction sharing a band) — the band join IS the
# index probe, never an all-pairs scan.
N_IMG_QUERIES = 8
IMG_TOP = 5


def mm_phash_topk(spark: SparkSession, sf_dir: str,
                  n_queries: int = N_IMG_QUERIES,
                  top: int = IMG_TOP) -> DataFrame:
    from pyspark.sql import Window

    idx = _phash_index(spark, sf_dir)
    bands = _band_stack(idx, "phash", "k")
    q = bands.filter(F.col("k") < n_queries).select(
        F.col("k").alias("qk"), F.col("phash").alias("pq"),
        "band_no", "band_val",
    )
    c = bands.select(
        F.col("k").alias("ck"), F.col("phash").alias("pc"),
        "band_no", "band_val",
    )
    cand = (
        c.join(F.broadcast(q), ["band_no", "band_val"])
        .filter(F.col("ck") != F.col("qk"))
        .select("qk", "ck", "pq", "pc")
        .distinct()  # a pair sharing several bands is one candidate
    )
    w = Window.partitionBy("qk").orderBy(F.asc("hamming"), F.asc("ck"))
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("pq").bitwiseXOR(F.col("pc"))).cast("long"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            F.concat(F.lit("img"), F.col("qk").cast("string")).alias("q_img"),
            F.concat(F.lit("img"), F.col("ck").cast("string")).alias("image_id"),
            F.col("rank").cast("long").alias("rank"),
            "hamming",
        )
    )


PHASH_TOPK_SQL = f"""
WITH {_PHASH_EDGE_CTES},
cand AS (
  SELECT DISTINCT a.k AS qk, b.k AS ck, a.phash AS pq, b.phash AS pc
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
  WHERE a.k < {N_IMG_QUERIES} AND b.k <> a.k
),
ranked AS (
  SELECT qk, ck, bit_count(xor(pq, pc))::bigint AS hamming,
         row_number() OVER (
           PARTITION BY qk
           ORDER BY bit_count(xor(pq, pc)) ASC, ck ASC) AS rank
  FROM cand
)
SELECT 'img' || qk AS q_img, 'img' || ck AS image_id,
       rank::bigint AS rank, hamming
FROM ranked WHERE rank <= {IMG_TOP}
"""


# -- video frame sampling over multi-frame binary payloads ------------------
#
# The video analog of mm_decode_features: a payload is an opaque container of
# MM_FRAMES fixed-geometry frames (header + F x side x side x 3 raw bytes —
# the stub-codec stand-in for a real demuxer, which this container lacks);
# frame-sampling decodes every FRAME_STRIDE-th frame and feature-extracts it,
# whole Arrow batches at a time (one reshape exposes the frame axis; the
# sampled frames are a strided view — no per-frame Python, no copy of the
# skipped frames). At 100 TB the skipped frames never leave the container
# scan: the kernel slices the byte range before decode. Pixels follow the
# closed form px[k,f,i,j,c] = (k*7919 + f*523 + i*131 + j*17 + c*101) % 256
# so the DuckDB oracle recomputes the sampled-frame channel means exactly.

MM_FRAMES = 8
FRAME_STRIDE = 4  # sample frames 0, 4
_VID_NBYTES = _MM_HDR + MM_FRAMES * MM_SIDE * MM_SIDE * 3

VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
)
FRAME_SCHEMA = (
    "video_id string, frame_no int, w int, h int, n_bytes long, "
    "mean_r double, mean_g double, mean_b double"
)


def _video_pixels(ks: np.ndarray) -> np.ndarray:
    """(n, MM_FRAMES, side, side, 3) uint8 closed-form pattern, vectorized."""
    side = MM_SIDE
    f = np.arange(MM_FRAMES, dtype=np.int64)[None, :, None, None, None]
    i = np.arange(side, dtype=np.int64)[None, None, :, None, None]
    j = np.arange(side, dtype=np.int64)[None, None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, None, :]
    k = ks.astype(np.int64)[:, None, None, None, None]
    return ((k * 7919 + f * 523 + i * 131 + j * 17 + c * 101) % 256).astype(np.uint8)


def _gen_video_corpus(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    side = MM_SIDE
    for pdf in batches:
        ks = pdf["id"].to_numpy(dtype=np.int64)
        if not len(ks):
            continue
        px = _video_pixels(ks)
        hdr = codec._HDR.pack(codec.MAGIC, b"vid", side, side, 3)
        yield pd.DataFrame(
            {
                "video_id": [f"vid{k}" for k in ks],
                "bytes": [hdr + px[x].tobytes() for x in range(len(ks))],
                "w": np.full(len(ks), side, dtype=np.int32),
                "h": np.full(len(ks), side, dtype=np.int32),
                "n_frames": np.full(len(ks), MM_FRAMES, dtype=np.int32),
                "fmt": "vid",
            }
        )


def _sampled_frame_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    side = MM_SIDE
    frame_nos = np.arange(0, MM_FRAMES, FRAME_STRIDE, dtype=np.int32)
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        px = full[:, _MM_HDR:].reshape(n, MM_FRAMES, side, side, 3)
        sampled = px[:, ::FRAME_STRIDE]  # strided view: skipped frames untouched
        sums = np.einsum("nfijc->nfc", sampled, dtype=np.int64).astype(np.float64)
        means = sums / (side * side)  # exact: power-of-two divisor
        n_f = len(frame_nos)
        yield pd.DataFrame(
            {
                "video_id": np.repeat(pdf["video_id"].to_numpy(), n_f),
                "frame_no": np.tile(frame_nos, n),
                "w": np.full(n * n_f, side, dtype=np.int32),
                "h": np.full(n * n_f, side, dtype=np.int32),
                "n_bytes": np.repeat(
                    np.array([len(b) for b in blobs], dtype=np.int64), n_f
                ),
                "mean_r": means[:, :, 0].ravel(),
                "mean_g": means[:, :, 1].ravel(),
                "mean_b": means[:, :, 2].ravel(),
            }
        )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video corpus sized from sf_dir (|documents| // 20 clips), generated
    and frame-sampled entirely on executors in Arrow batches. Oracle: DuckDB
    recomputes the sampled frames' channel means from the closed-form
    pattern."""
    n = max(table_rows(sf_dir, "documents") // 20, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_video_corpus, schema=VIDEO_SCHEMA
    )
    return corpus.mapInPandas(_sampled_frame_features, schema=FRAME_SCHEMA)


FRAME_SAMPLE_SQL = f"""
WITH ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < greatest((SELECT count(*) // 20 FROM documents), 1)
),
fs AS (SELECT range AS f FROM range(0, {MM_FRAMES}) WHERE range % {FRAME_STRIDE} = 0),
px AS (
  SELECT k, f,
         (k*7919 + f*523 + i.range*131 + j.range*17) % 256 AS r,
         (k*7919 + f*523 + i.range*131 + j.range*17 + 101) % 256 AS g,
         (k*7919 + f*523 + i.range*131 + j.range*17 + 202) % 256 AS b
  FROM ks, fs, range(0, {MM_SIDE}) i, range(0, {MM_SIDE}) j
)
SELECT 'vid' || k AS video_id, f::int AS frame_no,
       {MM_SIDE} AS w, {MM_SIDE} AS h, {_VID_NBYTES}::bigint AS n_bytes,
       sum(r)::double / {MM_SIDE * MM_SIDE} AS mean_r,
       sum(g)::double / {MM_SIDE * MM_SIDE} AS mean_g,
       sum(b)::double / {MM_SIDE * MM_SIDE} AS mean_b
FROM px GROUP BY k, f
"""


# -- video near-duplicate detection via sampled-frame phash ------------------
#
# Frame-based video copy detection, the standard shape in the public
# literature (and the video analog of mm_phash_neardup): two clips are
# near-dups when enough of their SAMPLED frames match perceptually —
# re-encodes, container changes, trims. Matching is temporal-shift
# TOLERANT by design: a frame of A may match ANY sampled frame of B (a
# trimmed copy shifts every frame index), so the unit of candidacy is the
# frame phash, not the (frame_no, phash) pair. Dataflow: one generated
# corpus scan -> per-sampled-frame 64-bit phash (whole-batch kernel, the
# strided-view trick from mm_frame_sample so skipped frames are never
# decoded) materialized ONCE -> band each phash into 4x16-bit slices ->
# equi-join on (band_no, band_val) -> verify Hamming <= PHASH_HAM_MAX ->
# count DISTINCT matched frames of the lower-id side per video pair ->
# edge when >= VID_MATCH_MIN. No all-pairs comparison at any level: at
# 100 TB the frame-phash index is an ingest-time artifact (a few int64s
# per clip) and the band join shuffles (band_val, k, frame_no, phash)
# tuples only, exactly the image-dedup shape. Per-video rollup mirrors
# mm_phash_neardup (min-id representative of the direct neighborhood).
#
# The video corpus's frame uniqueness comes from the per-frame offset
# (k*7919 + f*523) % 256, so cross-video frame matches are REAL byte-
# identical frames (whole offset classes), not an artificial pair list —
# sized at |documents| // 4 clips so matches exist from sf0.001 up.

# Matched sampled frames required for a near-dup edge. With FRAME_STRIDE
# sampling 2 frames per clip this is FULL containment of the sampled set —
# at 1 the count aggregate would be inert (any single frame collision =
# edge, same as a plain distinct); at 2 it discriminates (measured at the
# 125-clip corpus: 564 single-frame pairs rejected, 122 double-frame edges
# kept, 80/125 clips flagged dup).
VID_MATCH_MIN = 2
_VID_FRAME_NOS = np.arange(0, MM_FRAMES, FRAME_STRIDE, dtype=np.int32)


def _frame_phashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..engine.verify import _phash_batch

    side = MM_SIDE
    nf = len(_VID_FRAME_NOS)
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        px = full[:, _MM_HDR:].reshape(n, MM_FRAMES, side, side, 3)
        sampled = px[:, ::FRAME_STRIDE].reshape(n * nf, side, side, 3)
        yield pd.DataFrame(
            {
                "k": np.repeat(
                    pdf["video_id"].str.slice(3).astype(np.int64).to_numpy(), nf
                ),
                "frame_no": np.tile(_VID_FRAME_NOS, n),
                "fphash": _phash_batch(sampled),
            }
        )


def _video_phash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, frame_no, fphash) materialized once — both band-join sides and
    the per-video rollup read this checkpoint, never the generated corpus."""
    n = max(table_rows(sf_dir, "documents") // 4, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_video_corpus, schema=VIDEO_SCHEMA
    )
    return corpus.mapInPandas(
        _frame_phashes, schema="k long, frame_no int, fphash long"
    ).localCheckpoint(eager=True)


def _containment_edges(
    idx: DataFrame, hash_col: str, unit_col: str, match_min: int
) -> DataFrame:
    """(ka < kb, n_matched) pairs where n_matched = # distinct UNITS of ka
    (sampled frames for video, fingerprint windows for audio) with a
    Hamming-<=PHASH_HAM_MAX match anywhere in kb — the shift-tolerant
    containment kernel shared by the video and audio copy-detection paths
    (one dataflow, two modalities)."""
    bands = _band_stack(idx, hash_col, "k", unit_col)
    left = bands.select(
        F.col("k").alias("ka"), F.col(unit_col).alias("fa"),
        F.col(hash_col).alias("pa"), "band_no", "band_val",
    )
    right = bands.select(
        F.col("k").alias("kb"), F.col(hash_col).alias("pb"),
        "band_no", "band_val",
    )
    matched = (
        left.join(right, ["band_no", "band_val"])
        .filter(F.col("ka") < F.col("kb"))
        .filter(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) <= PHASH_HAM_MAX)
        .select("ka", "fa", "kb")
        .distinct()  # one vote per matched unit, however many hits in kb
    )
    return (
        matched.groupBy("ka", "kb")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= match_min)
    )


def _containment_rollup(
    idx: DataFrame, edges: DataFrame, prefix: str, id_name: str, n_name: str
) -> DataFrame:
    """Per-item near-dup rollup (min-id neighborhood representative), shared
    by the video and audio paths — mirrors mm_phash_neardup's rollup shape."""
    units = idx.groupBy("k").agg(F.count("*").alias(n_name))
    directed = edges.select("ka", "kb").unionByName(
        edges.select(F.col("kb").alias("ka"), F.col("ka").alias("kb"))
    )
    agg = directed.groupBy("ka").agg(
        F.min("kb").alias("min_nb"), F.count("*").alias("n_near")
    )
    return units.join(agg, units["k"] == agg["ka"], "left").select(
        F.concat(F.lit(prefix), F.col("k").cast("string")).alias(id_name),
        F.col(n_name).cast("long").alias(n_name),
        F.concat(
            F.lit(prefix),
            F.least(F.col("k"), F.coalesce("min_nb", F.col("k"))).cast("string"),
        ).alias("rep_id"),
        F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
        (F.coalesce("min_nb", F.col("k")) < F.col("k")).alias("is_dup"),
    )


def mm_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _video_phash_index(spark, sf_dir)
    edges = _containment_edges(idx, "fphash", "frame_no", VID_MATCH_MIN)
    return _containment_rollup(idx, edges, "vid", "video_id", "n_frames_sampled")


# ONE definition of the sampled-frame phash band CTE chain for every
# video oracle (closed-form frame pixels -> per-frame phash -> LSH bands)
_VIDEO_BAND_CTES = f"""ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < greatest((SELECT count(*) // 4 FROM documents), 1)
),
fs AS (SELECT range AS f FROM range(0, {MM_FRAMES}) WHERE range % {FRAME_STRIDE} = 0),
g AS (
  SELECT k, f, i.range // 2 AS bi, j.range // 2 AS bj,
         ((k*7919 + f*523 + i.range*131 + j.range*17) % 256
        + (k*7919 + f*523 + i.range*131 + j.range*17 + 101) % 256
        + (k*7919 + f*523 + i.range*131 + j.range*17 + 202) % 256) AS gray
  FROM ks, fs, range(0, {MM_SIDE}) i, range(0, {MM_SIDE}) j
),
bs AS (SELECT k, f, bi, bj, sum(gray)::bigint AS bsum FROM g GROUP BY k, f, bi, bj),
tot AS (SELECT k, f, sum(bsum)::hugeint AS total FROM bs GROUP BY k, f),
bits AS (
  SELECT bs.k, bs.f, (bi*8 + bj) AS idx,
         CASE WHEN 64::hugeint * bsum > total THEN 1::hugeint ELSE 0::hugeint END AS bit
  FROM bs JOIN tot ON bs.k = tot.k AND bs.f = tot.f
),
packed AS (SELECT k, f, sum(bit * (1::hugeint << (63 - idx))) AS s FROM bits GROUP BY k, f),
ph AS (
  SELECT k, f,
         (CASE WHEN s >= (1::hugeint << 63) THEN s - (1::hugeint << 64) ELSE s END)::bigint AS fphash,
         s
  FROM packed
),
bands AS (
  SELECT k, f, fphash, b.range AS band_no,
         ((s >> ({PHASH_BAND_BITS} * b.range)::int) & {(1 << PHASH_BAND_BITS) - 1})::bigint AS band_val
  FROM ph, range(0, {N_PHASH_BANDS}) b
)"""


VIDEO_NEARDUP_SQL = f"""
WITH {_VIDEO_BAND_CTES},
fmatch AS (
  SELECT DISTINCT a.k AS ka, a.f AS fa, b.k AS kb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.k < b.k
  WHERE bit_count(xor(a.fphash, b.fphash)) <= {PHASH_HAM_MAX}
),
edges AS (
  SELECT ka, kb FROM fmatch GROUP BY ka, kb
  HAVING count(*) >= {VID_MATCH_MIN}
),
directed AS (SELECT ka, kb FROM edges UNION ALL SELECT kb AS ka, ka AS kb FROM edges),
agg AS (SELECT ka, min(kb) AS min_nb, count(*)::bigint AS n_near FROM directed GROUP BY ka),
vids AS (SELECT k, count(*)::bigint AS n_frames_sampled FROM ph GROUP BY k)
SELECT 'vid' || vids.k AS video_id,
       n_frames_sampled,
       'vid' || least(vids.k, coalesce(min_nb, vids.k)) AS rep_id,
       coalesce(n_near, 0)::bigint AS n_near,
       coalesce(min_nb, vids.k) < vids.k AS is_dup
FROM vids LEFT JOIN agg ON vids.k = agg.ka
"""


# -- video quality gate (the video leg of the quality row) ------------------
# Static-content / exposure verdicts from per-frame integer gray sums over
# ALL MM_FRAMES frames (one decode pass, whole-batch numpy): a clip whose
# frame sums barely move is static filler (the video-specific failure mode
# image gates can't see — every frame individually looks fine), and the
# whole-clip gray total bounds catch under/over-exposed clips. Both
# signals are exact int64 sums of the uint8 pattern, so the DuckDB twin
# recomputes the verdicts bit-identically from the closed form. Thresholds
# at the measured distribution so every rule fires both ways at every sf
# (sf0.001: 53/125 static, 17 dark, 17 bright, keep 48; proportions hold
# at 10x) — the mm_quality_filter convention.

VID_SPREAD_MIN = 1536     # max-min frame gray sum below this = static
VID_TOTAL_LO = 781_000    # whole-clip gray total below = too dark
VID_TOTAL_HI = 786_000    # above = too bright

VIDEO_QUALITY_SCHEMA = (
    "video_id string, frame_spread long, total_gray long, "
    "too_static boolean, too_dark boolean, too_bright boolean, keep boolean"
)


def _video_quality_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    side = MM_SIDE
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        full = np.stack([np.frombuffer(b, np.uint8) for b in pdf["bytes"].to_numpy()])
        px = full[:, _MM_HDR:].reshape(n, MM_FRAMES, side, side, 3).astype(np.int64)
        fsum = px.sum(axis=(2, 3, 4))          # (n, MM_FRAMES) int gray sums
        spread = fsum.max(1) - fsum.min(1)
        total = fsum.sum(1)
        static = spread < VID_SPREAD_MIN
        dark = total < VID_TOTAL_LO
        bright = total > VID_TOTAL_HI
        yield pd.DataFrame(
            {
                "video_id": pdf["video_id"].to_numpy(),
                "frame_spread": spread,
                "total_gray": total,
                "too_static": static,
                "too_dark": dark,
                "too_bright": bright,
                "keep": ~static & ~dark & ~bright,
            }
        )


def mm_video_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = max(table_rows(sf_dir, "documents") // 4, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_video_corpus, schema=VIDEO_SCHEMA
    )
    return corpus.mapInPandas(_video_quality_rows, schema=VIDEO_QUALITY_SCHEMA)


VIDEO_QUALITY_SQL = f"""
WITH ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < greatest((SELECT count(*) // 4 FROM documents), 1)
),
g AS (
  SELECT k, f.range AS f,
         sum((k*7919 + f.range*523 + i.range*131 + j.range*17) % 256
           + (k*7919 + f.range*523 + i.range*131 + j.range*17 + 101) % 256
           + (k*7919 + f.range*523 + i.range*131 + j.range*17 + 202) % 256
         )::bigint AS fsum
  FROM ks, range(0, {MM_FRAMES}) f, range(0, {MM_SIDE}) i, range(0, {MM_SIDE}) j
  GROUP BY k, f.range
),
a AS (
  SELECT k, (max(fsum) - min(fsum))::bigint AS frame_spread,
         sum(fsum)::bigint AS total_gray
  FROM g GROUP BY k
)
SELECT 'vid' || k AS video_id, frame_spread, total_gray,
       frame_spread < {VID_SPREAD_MIN} AS too_static,
       total_gray < {VID_TOTAL_LO} AS too_dark,
       total_gray > {VID_TOTAL_HI} AS too_bright,
       (frame_spread >= {VID_SPREAD_MIN} AND total_gray >= {VID_TOTAL_LO}
        AND total_gray <= {VID_TOTAL_HI}) AS keep
FROM a
"""


# -- audio feature extraction over PCM binary payloads ----------------------
#
# The audio analog of the image/video kernels (not a catalog slot — the
# driver gates at most 50 queries; oracle-verified in
# tests/test_ungated_oracles.py): a payload is header + N_AUDIO_SAMPLES
# little-endian int16 PCM mono samples (the stub stand-in for a real audio
# decoder, which this container lacks); features are whole-batch vectorized
# int64 math — peak, RMS, zero-crossing count — the standard cheap
# quality/speech-activity signals a training pipeline filters audio by.
# Samples follow the closed form s[k, t] = (k*7919 + t*37) % 4096 - 2048 so
# the DuckDB oracle recomputes every feature exactly (the squared sum is
# < 2^32 and /1024 is a power-of-two divide — exact in float64).

N_AUDIO_SAMPLES = 1024
_AUD_NBYTES = _MM_HDR + N_AUDIO_SAMPLES * 2

AUDIO_SCHEMA = "clip_id string, bytes binary, n_samples int, fmt string"
AUDIO_FEATURES_SCHEMA = (
    "clip_id string, n_samples int, n_bytes long, peak long, "
    "rms double, n_zero_cross long"
)


def _audio_samples(ks: np.ndarray) -> np.ndarray:
    """(n, N_AUDIO_SAMPLES) int16 closed-form PCM, vectorized."""
    t = np.arange(N_AUDIO_SAMPLES, dtype=np.int64)[None, :]
    k = ks.astype(np.int64)[:, None]
    return ((k * 7919 + t * 37) % 4096 - 2048).astype("<i2")


def _gen_audio_corpus(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ks = pdf["id"].to_numpy(dtype=np.int64)
        if not len(ks):
            continue
        pcm = _audio_samples(ks)
        hdr = codec._HDR.pack(codec.MAGIC, b"pcm", N_AUDIO_SAMPLES, 1, 1)
        yield pd.DataFrame(
            {
                "clip_id": [f"aud{k}" for k in ks],
                "bytes": [hdr + pcm[x].tobytes() for x in range(len(ks))],
                "n_samples": np.full(len(ks), N_AUDIO_SAMPLES, dtype=np.int32),
                "fmt": "pcm",
            }
        )


def _audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        pcm = (
            np.ascontiguousarray(full[:, _MM_HDR:])
            .view("<i2")
            .reshape(n, N_AUDIO_SAMPLES)
            .astype(np.int64)
        )
        sq = np.einsum("nt,nt->n", pcm, pcm)
        yield pd.DataFrame(
            {
                "clip_id": pdf["clip_id"],
                "n_samples": np.full(n, N_AUDIO_SAMPLES, dtype=np.int32),
                "n_bytes": np.array([len(b) for b in blobs], dtype=np.int64),
                "peak": np.abs(pcm).max(axis=1),
                "rms": np.round(np.sqrt(sq / N_AUDIO_SAMPLES), 6),
                "n_zero_cross": ((pcm[:, :-1] * pcm[:, 1:]) < 0).sum(axis=1),
            }
        )


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM corpus sized from sf_dir (|documents| // 20 clips), generated and
    feature-extracted entirely on executors in Arrow batches."""
    n = max(table_rows(sf_dir, "documents") // 20, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_audio_corpus, schema=AUDIO_SCHEMA
    )
    return corpus.mapInPandas(_audio_features, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_FEATURES_SQL = f"""
WITH ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < greatest((SELECT count(*) // 20 FROM documents), 1)
),
s AS (
  SELECT k, t.range AS t,
         ((k*7919 + t.range*37) % 4096 - 2048)::bigint AS v
  FROM ks, range(0, {N_AUDIO_SAMPLES}) t
),
w AS (
  SELECT k, v, lead(v) OVER (PARTITION BY k ORDER BY t) AS nxt FROM s
)
SELECT 'aud' || k AS clip_id, {N_AUDIO_SAMPLES} AS n_samples,
       {_AUD_NBYTES}::bigint AS n_bytes,
       max(abs(v))::bigint AS peak,
       round(sqrt(sum(v*v)::double / {N_AUDIO_SAMPLES}), 6) AS rms,
       sum(CASE WHEN v * nxt < 0 THEN 1 ELSE 0 END)::bigint AS n_zero_cross
FROM w GROUP BY k
"""


# -- audio quality gate (the audio leg of the quality row) ------------------
# Clipping / silence / noisiness verdicts BEFORE a clip reaches expensive
# downstream stages — the audio sibling of mm_quality_filter (image),
# text_metrics' keep (text), and mm_video_quality below. All three signals
# are exact int64s decoded from the PCM payload (peak = max |v|, energy =
# Σv² — NOT the features view's rounded rms — and the zero-crossing count),
# so the DuckDB twin recomputes every verdict bit-identically from the
# closed-form samples. Thresholds sit at the measured corpus distribution
# so every rule fires BOTH ways at every sf (the mm_quality_filter
# convention, documented not hidden: peak>=2048 trims 32%, the energy
# floor trims ~45%, the zc ceiling trims ~35%, keep lands ~25-30% at
# sf0.001/0.01/0.1). One decode pass, stateless per-clip math, zero joins.

AUD_CLIP_PEAK = 2048          # |sample| at int16-ish full scale = clipped
AUD_ENERGY_MIN = 1_420_000_000  # Σv² below this = too quiet (corpus median)
AUD_ZC_MAX = 18               # zero-crossings above this = too noisy

AUDIO_QUALITY_SCHEMA = (
    "clip_id string, peak long, energy long, n_zero_cross long, "
    "clipped boolean, too_quiet boolean, too_noisy boolean, keep boolean"
)


def _audio_quality_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        pcm = np.stack([
            np.frombuffer(b, "<i2", N_AUDIO_SAMPLES, _MM_HDR).astype(np.int64)
            for b in pdf["bytes"].to_numpy()
        ])
        peak = np.abs(pcm).max(1)
        energy = (pcm * pcm).sum(1)
        zc = ((pcm[:, :-1] * pcm[:, 1:]) < 0).sum(1)
        clipped = peak >= AUD_CLIP_PEAK
        quiet = energy < AUD_ENERGY_MIN
        noisy = zc > AUD_ZC_MAX
        yield pd.DataFrame(
            {
                "clip_id": pdf["clip_id"].to_numpy(),
                "peak": peak,
                "energy": energy,
                "n_zero_cross": zc.astype(np.int64),
                "clipped": clipped,
                "too_quiet": quiet,
                "too_noisy": noisy,
                "keep": ~clipped & ~quiet & ~noisy,
            }
        )


def mm_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = max(table_rows(sf_dir, "documents") // 20, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_audio_corpus, schema=AUDIO_SCHEMA
    )
    return corpus.mapInPandas(_audio_quality_rows, schema=AUDIO_QUALITY_SCHEMA)


AUDIO_QUALITY_SQL = f"""
WITH ks AS (
  SELECT k FROM (
    SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents
  ) WHERE k < greatest((SELECT count(*) // 20 FROM documents), 1)
),
s AS (
  SELECT k, t.range AS t,
         ((k*7919 + t.range*37) % 4096 - 2048)::bigint AS v
  FROM ks, range(0, {N_AUDIO_SAMPLES}) t
),
w AS (
  SELECT k, v, lead(v) OVER (PARTITION BY k ORDER BY t) AS nxt FROM s
),
a AS (
  SELECT k, max(abs(v))::bigint AS peak, sum(v*v)::bigint AS energy,
         sum(CASE WHEN v * nxt < 0 THEN 1 ELSE 0 END)::bigint AS n_zero_cross
  FROM w GROUP BY k
)
SELECT 'aud' || k AS clip_id, peak, energy, n_zero_cross,
       peak >= {AUD_CLIP_PEAK} AS clipped,
       energy < {AUD_ENERGY_MIN} AS too_quiet,
       n_zero_cross > {AUD_ZC_MAX} AS too_noisy,
       (peak < {AUD_CLIP_PEAK} AND energy >= {AUD_ENERGY_MIN}
        AND n_zero_cross <= {AUD_ZC_MAX}) AS keep
FROM a
"""


# -- audio fingerprint near-duplicate detection ------------------------------
#
# The audio leg of the copy-detection matrix (image: mm_phash_neardup,
# video: mm_video_neardup): Shazam/Chromaprint-shaped fingerprint matching —
# hash fixed-length signal WINDOWS, index the window hashes, and call two
# clips near-dups when enough windows of one match ANYWHERE in the other.
# Window-level (not clip-level) matching makes it trim/pad tolerant exactly
# like the video path's frame containment, so the two share ONE Spark kernel
# (`_containment_edges` + `_containment_rollup`) and the LSH `_band_stack`.
#
# The window hash is a 64-bit sign fingerprint: bit j = (sample j of the
# window > 0), packed MSB-first like the phash. Real fingerprints hash
# spectral energy deltas; the sign bit is the honest stand-in this
# container's stub PCM supports, and the Spark-side plumbing — windowing,
# banding, containment counting — is identical. The dup corpus is built so
# the fingerprint has real work to do: clip k is class c = k % C cut at
# window offset o = k // C (a trimmed copy — window w of clip k is window
# o+w of the class master) with a per-clip DC offset k % 3 (a remaster),
# over a QUADRATIC chirp
#     pcm[t] = (X*X*37 + X*131) % 4096 - 2048 + dc,  X = c*7919 + o*64 + t
# — quadratic because the sign sequence of any AFFINE walk mod M is a
# low-complexity rotation pattern whose windows collide everywhere
# (measured: an affine step-37 corpus matched 7742/7750 pairs; the chirp
# matches exactly the 250/250 same-class pairs at the 125-clip corpus with
# 0 false edges, 513 partial-overlap pairs rejected below AUD_MATCH_MIN,
# and 641 nonzero-Hamming window matches exercising the tolerance path —
# the DC offset flips a sign bit only where the master value sits in
# (-dc, 0], so matched windows carry Hamming 0-2).
#
# At 100 TB: the fingerprint is an ingest-time artifact (N_AUD_WINS int64s
# per clip); the band join shuffles (band_val, k, win_no, ahash) tuples
# only; no all-pairs stage at any level. DuckDB recomputes every window
# hash bit-exactly from the closed form (hugeint bit packing, the phash
# trick) and runs the same band-join + containment pipeline.

AUD_WIN = 64                              # samples per fingerprint window
N_AUD_WINS = N_AUDIO_SAMPLES // AUD_WIN   # 16 windows per clip
_AUD_DUP_OFFSETS = 5                      # trim offsets per class (o = k // C)
# Matched windows required for an edge: same-class pairs share 16-|dO|
# aligned windows with |dO| <= 4, so 12 keeps every true trim pair while
# partial overlaps (1-3 coincidental window matches, measured above) reject.
AUD_MATCH_MIN = N_AUD_WINS - (_AUD_DUP_OFFSETS - 1)


def _audio_dup_samples(ks: np.ndarray, n_classes: int) -> np.ndarray:
    """(n, N_AUDIO_SAMPLES) int16 closed-form PCM with duplicate structure
    (class master trimmed at o windows, DC offset dc), vectorized. The
    chirp is evaluated on x mod 4096 BEFORE squaring — mathematically
    identical (37x^2+131x mod 4096 depends only on x mod 4096) and bounds
    the square at 4095^2*37 ~ 6.2e8, so the arithmetic can never overflow
    int64 at ANY corpus size (numpy would wrap silently where the DuckDB
    twin raises Out of Range — the engines must fail together or not at
    all)."""
    k = ks.astype(np.int64)
    c, o, dc = k % n_classes, k // n_classes, k % 3
    t = np.arange(N_AUDIO_SAMPLES, dtype=np.int64)[None, :]
    x = (c[:, None] * 7919 + o[:, None] * AUD_WIN + t) % 4096
    return ((x * x * 37 + x * 131) % 4096 - 2048 + dc[:, None]).astype("<i2")


def _gen_audio_dup_corpus(n_classes: int):
    """mapInPandas generator for the dup-structured PCM corpus (same
    AUDIO_SCHEMA as the feature corpus; the closed form differs because the
    feature corpus has no duplicate classes to detect)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = codec._HDR.pack(codec.MAGIC, b"pcm", N_AUDIO_SAMPLES, 1, 1)
        for pdf in batches:
            ks = pdf["id"].to_numpy(dtype=np.int64)
            if not len(ks):
                continue
            pcm = _audio_dup_samples(ks, n_classes)
            yield pd.DataFrame(
                {
                    "clip_id": [f"aud{k}" for k in ks],
                    "bytes": [hdr + pcm[x].tobytes() for x in range(len(ks))],
                    "n_samples": np.full(len(ks), N_AUDIO_SAMPLES, dtype=np.int32),
                    "fmt": "pcm",
                }
            )

    return gen


def _audio_fingerprints(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(k, win_no, ahash) per AUD_WIN-sample window: 64-bit sign fingerprint,
    whole-batch vectorized (one packbits per Arrow batch, zero per-row
    Python), bit-packed MSB-first exactly like engine.verify._phash_batch."""
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        pcm = (
            np.ascontiguousarray(full[:, _MM_HDR:])
            .view("<i2")
            .reshape(n, N_AUDIO_SAMPLES)
        )
        bits = (pcm > 0).reshape(n * N_AUD_WINS, AUD_WIN)
        packed = np.packbits(bits.astype(np.uint8), axis=1)
        ah = packed.view(">u8")[:, 0].astype(np.uint64).view(np.int64)
        yield pd.DataFrame(
            {
                "k": np.repeat(
                    pdf["clip_id"].str.slice(3).astype(np.int64).to_numpy(),
                    N_AUD_WINS,
                ),
                "win_no": np.tile(np.arange(N_AUD_WINS, dtype=np.int32), n),
                "ahash": ah,
            }
        )


def _audio_fp_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, win_no, ahash) materialized once — both band-join sides and the
    per-clip rollup read this checkpoint, never the generated corpus."""
    n = max(table_rows(sf_dir, "documents") // 4, 1)
    # CEILING division: k // n_classes then never exceeds
    # _AUD_DUP_OFFSETS - 1, preserving AUD_MATCH_MIN's >= 16-|dO| aligned
    # windows for EVERY same-class pair at any corpus size (floor division
    # would hand the last clips a 5th trim offset whenever 5 does not
    # divide n, silently breaking the designed every-pair-is-an-edge
    # invariant)
    n_classes = max((n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_audio_dup_corpus(n_classes), schema=AUDIO_SCHEMA
    )
    return corpus.mapInPandas(
        _audio_fingerprints, schema="k long, win_no int, ahash long"
    ).localCheckpoint(eager=True)


def mm_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _audio_fp_index(spark, sf_dir)
    edges = _containment_edges(idx, "ahash", "win_no", AUD_MATCH_MIN)
    return _containment_rollup(idx, edges, "aud", "clip_id", "n_wins")


# ONE definition of the audio window-fingerprint band CTE chain for every
# audio oracle (dup-class corpus -> sign fingerprints -> LSH bands)
_AUDIO_BAND_CTES = f"""nn AS (SELECT greatest(count(*) // 4, 1) AS n FROM documents),
ks AS (
  SELECT k,
         k % greatest((n + {_AUD_DUP_OFFSETS - 1}) // {_AUD_DUP_OFFSETS}, 1) AS c,
         k // greatest((n + {_AUD_DUP_OFFSETS - 1}) // {_AUD_DUP_OFFSETS}, 1) AS o,
         k % 3 AS dc
  FROM (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k FROM documents), nn
  WHERE k < n
),
sx AS (
  SELECT k, dc, t.range AS t,
         ((c*7919 + o*{AUD_WIN} + t.range) % 4096)::bigint AS x
  FROM ks, range(0, {N_AUDIO_SAMPLES}) t
),
s AS (SELECT k, t, (x*x*37 + x*131) % 4096 - 2048 + dc AS v FROM sx),
packed AS (
  SELECT k, t // {AUD_WIN} AS w,
         sum(CASE WHEN v > 0
             THEN (1::hugeint << (63 - (t % {AUD_WIN})::int))
             ELSE 0::hugeint END) AS s
  FROM s GROUP BY k, t // {AUD_WIN}
),
ah AS (
  SELECT k, w, s,
         (CASE WHEN s >= (1::hugeint << 63) THEN s - (1::hugeint << 64) ELSE s END)::bigint AS ahash
  FROM packed
),
bands AS (
  SELECT k, w, ahash, b.range AS band_no,
         ((s >> ({PHASH_BAND_BITS} * b.range)::int) & {(1 << PHASH_BAND_BITS) - 1})::bigint AS band_val
  FROM ah, range(0, {N_PHASH_BANDS}) b
)"""


AUDIO_NEARDUP_SQL = f"""
WITH {_AUDIO_BAND_CTES},
wmatch AS (
  SELECT DISTINCT a.k AS ka, a.w AS wa, b.k AS kb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.k < b.k
  WHERE bit_count(xor(a.ahash, b.ahash)) <= {PHASH_HAM_MAX}
),
edges AS (
  SELECT ka, kb FROM wmatch GROUP BY ka, kb
  HAVING count(*) >= {AUD_MATCH_MIN}
),
directed AS (SELECT ka, kb FROM edges UNION ALL SELECT kb AS ka, ka AS kb FROM edges),
agg AS (SELECT ka, min(kb) AS min_nb, count(*)::bigint AS n_near FROM directed GROUP BY ka),
wins AS (SELECT k, count(*)::bigint AS n_wins FROM ah GROUP BY k)
SELECT 'aud' || wins.k AS clip_id, n_wins,
       'aud' || least(wins.k, coalesce(min_nb, wins.k)) AS rep_id,
       coalesce(n_near, 0)::bigint AS n_near,
       coalesce(min_nb, wins.k) < wins.k AS is_dup
FROM wins LEFT JOIN agg ON wins.k = agg.ka
"""


# -- query-by-clip retrieval (video + audio containment top-k) ---------------
# The retrieval legs completing the modality matrix: text has BM25, images
# have mm_phash_topk, and the multi-unit modalities now rank by CONTAINMENT
# instead of a single Hamming distance — for each query clip, a candidate
# scores (n_matched, sum_ham): how many of the query's units (sampled
# frames / fingerprint windows) have ANY banded Hamming match in the
# candidate, and the sum of each unit's best (min) Hamming. Order is
# n_matched DESC then sum_ham ASC then id — more of the query contained
# wins, closer containment breaks ties, total per query by construction.
# Like mm_phash_topk, retrieval does NOT threshold at PHASH_HAM_MAX (that
# is the near-dup views' admission job) and does not demand
# VID/AUD_MATCH_MIN units — partial containment is exactly what a
# copy-triage UI wants surfaced, graded, not hidden.
#
# ONE kernel serves both modalities (the _containment_edges discipline:
# one dataflow, two instantiations), and each twin composes the SAME band
# CTE chain as its near-dup sibling, so the fingerprint math cannot drift
# between the dedup and retrieval views. Scale shape: the query side is
# n_queries x units x bands rows — broadcast by construction — so the
# band equi-join is an index probe (|queries| x corpus-band fraction),
# never all-pairs; the per-unit min and per-pair count collapse map-side;
# the final page is one |queries|-keyed window over <= candidates rows.
N_CLIP_QUERIES = 8
CLIP_TOP = 5


def _containment_topk(idx: DataFrame, hash_col: str, unit_col: str,
                      prefix: str, q_name: str, id_name: str,
                      n_queries: int, top: int) -> DataFrame:
    from pyspark.sql import Window

    bands = _band_stack(idx, hash_col, "k", unit_col)
    q = bands.filter(F.col("k") < n_queries).select(
        F.col("k").alias("qk"), F.col(unit_col).alias("fa"),
        F.col(hash_col).alias("pa"), "band_no", "band_val",
    )
    c = bands.select(
        F.col("k").alias("ck"), F.col(hash_col).alias("pb"),
        "band_no", "band_val",
    )
    per_unit = (
        c.join(F.broadcast(q), ["band_no", "band_val"])
        .filter(F.col("ck") != F.col("qk"))
        .groupBy("qk", "fa", "ck")
        .agg(F.min(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))).alias("ham"))
    )
    pair = per_unit.groupBy("qk", "ck").agg(
        F.count("*").alias("n_matched"), F.sum("ham").alias("sum_ham")
    )
    w = Window.partitionBy("qk").orderBy(
        F.desc("n_matched"), F.asc("sum_ham"), F.asc("ck")
    )
    return (
        pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(
            F.concat(F.lit(prefix), F.col("qk").cast("string")).alias(q_name),
            F.concat(F.lit(prefix), F.col("ck").cast("string")).alias(id_name),
            F.col("rank").cast("long").alias("rank"),
            F.col("n_matched").cast("long").alias("n_matched"),
            F.col("sum_ham").cast("long").alias("sum_ham"),
        )
    )


def mm_video_topk(spark: SparkSession, sf_dir: str,
                  n_queries: int = N_CLIP_QUERIES,
                  top: int = CLIP_TOP) -> DataFrame:
    idx = _video_phash_index(spark, sf_dir)
    return _containment_topk(idx, "fphash", "frame_no", "vid",
                             "q_video", "video_id", n_queries, top)


def mm_audio_topk(spark: SparkSession, sf_dir: str,
                  n_queries: int = N_CLIP_QUERIES,
                  top: int = CLIP_TOP) -> DataFrame:
    idx = _audio_fp_index(spark, sf_dir)
    return _containment_topk(idx, "ahash", "win_no", "aud",
                             "q_clip", "clip_id", n_queries, top)


def _containment_topk_sql(band_ctes: str, hash_col: str, unit_col: str,
                          prefix: str, q_name: str, id_name: str,
                          n_queries: int, top: int) -> str:
    return f"""
WITH {band_ctes},
pu AS (
  SELECT a.k AS qk, a.{unit_col} AS fa, b.k AS ck,
         min(bit_count(xor(a.{hash_col}, b.{hash_col})))::bigint AS ham
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
  WHERE a.k < {n_queries} AND b.k <> a.k
  GROUP BY a.k, a.{unit_col}, b.k
),
pair AS (
  SELECT qk, ck, count(*)::bigint AS n_matched, sum(ham)::bigint AS sum_ham
  FROM pu GROUP BY qk, ck
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY qk ORDER BY n_matched DESC, sum_ham ASC, ck ASC) AS rank
  FROM pair
)
SELECT '{prefix}' || qk AS {q_name}, '{prefix}' || ck AS {id_name},
       rank::bigint AS rank, n_matched, sum_ham
FROM ranked WHERE rank <= {top}
"""


VIDEO_TOPK_SQL = _containment_topk_sql(
    _VIDEO_BAND_CTES, "fphash", "f", "vid", "q_video", "video_id",
    N_CLIP_QUERIES, CLIP_TOP,
)
AUDIO_TOPK_SQL = _containment_topk_sql(
    _AUDIO_BAND_CTES, "ahash", "w", "aud", "q_clip", "clip_id",
    N_CLIP_QUERIES, CLIP_TOP,
)


# -- transitive clip duplicate groups + leakage-safe clip splits -------------
# The groups and split rows of the modality matrix for the multi-unit
# modalities (text: dedup_groups/pipeline_split; image: mm_phash_groups/
# mm_split): a re-encode chain A~B~C whose ends drift past the pairwise
# containment bound is ONE duplicate class with one representative, which
# the neighborhood rollup (mm_video/audio_neardup's min-neighbor rep)
# cannot express. Components come from the shared
# `dedup.min_label_components` propagation over the containment-edge
# subgraph — a clip with no edge never rides an iteration — and the twins
# run the identical recursive reachability closure over the identical edge
# CTEs as the near-dup siblings.
#
# The split needs no singleton escape hatch here either (mm_split's
# argument, one modality over): byte-identical clips have identical unit
# fingerprints, match on every unit at Hamming 0 (>= MATCH_MIN), and land
# in one group by construction — the group label is a complete key.

def _containment_groups(idx: DataFrame, hash_col: str, unit_col: str,
                        match_min: int, prefix: str, id_name: str,
                        max_iters: int = 16) -> DataFrame:
    from .dedup import min_label_components

    edges = _containment_edges(idx, hash_col, unit_col, match_min).select(
        F.col("ka").alias("doc_a"), F.col("kb").alias("doc_b")
    )
    labels = min_label_components(edges, max_iters)
    sized = labels.join(
        labels.groupBy("label").agg(F.count("*").alias("group_size")), "label"
    )
    items = idx.select("k").distinct()
    return items.join(sized, items["k"] == sized["doc_id"], "left").select(
        F.concat(F.lit(prefix), F.col("k").cast("string")).alias(id_name),
        F.concat(
            F.lit(prefix), F.coalesce("label", F.col("k")).cast("string")
        ).alias("group_id"),
        F.coalesce("group_size", F.lit(1)).cast("long").alias("group_size"),
        (F.col("k") == F.coalesce("label", F.col("k"))).alias("is_rep"),
    )


def mm_video_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _video_phash_index(spark, sf_dir)
    return _containment_groups(idx, "fphash", "frame_no", VID_MATCH_MIN,
                               "vid", "video_id")


def mm_audio_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _audio_fp_index(spark, sf_dir)
    return _containment_groups(idx, "ahash", "win_no", AUD_MATCH_MIN,
                               "aud", "clip_id")


def mm_video_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _group_split(mm_video_groups(spark, sf_dir), "video_id")


def mm_audio_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _group_split(mm_audio_groups(spark, sf_dir), "clip_id")


def _containment_groups_sql(band_ctes: str, hash_col: str, unit_col: str,
                            match_min: int, prefix: str, id_name: str,
                            src_cte: str) -> str:
    return f"""
WITH RECURSIVE {band_ctes},
um AS (
  SELECT DISTINCT a.k AS ka, a.{unit_col} AS ua, b.k AS kb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.k < b.k
  WHERE bit_count(xor(a.{hash_col}, b.{hash_col})) <= {PHASH_HAM_MAX}
),
edges AS (SELECT ka, kb FROM um GROUP BY ka, kb HAVING count(*) >= {match_min}),
sym AS (SELECT ka AS a, kb AS b FROM edges
        UNION ALL SELECT kb AS a, ka AS b FROM edges),
kk AS (SELECT DISTINCT k FROM {src_cte}),
reach(v, r) AS (
  SELECT k AS v, k AS r FROM kk
  UNION
  SELECT s.b AS v, reach.r FROM reach JOIN sym s ON s.a = reach.v
),
grp AS (SELECT v AS k, min(r) AS gid FROM reach GROUP BY v),
gs AS (SELECT gid, count(*)::bigint AS group_size FROM grp GROUP BY gid)
SELECT '{prefix}' || grp.k AS {id_name},
       '{prefix}' || gid AS group_id,
       gs.group_size,
       (grp.k = gid) AS is_rep
FROM grp JOIN gs USING (gid)
"""


VIDEO_GROUPS_SQL = _containment_groups_sql(
    _VIDEO_BAND_CTES, "fphash", "f", VID_MATCH_MIN, "vid", "video_id", "ph"
)
AUDIO_GROUPS_SQL = _containment_groups_sql(
    _AUDIO_BAND_CTES, "ahash", "w", AUD_MATCH_MIN, "aud", "clip_id", "ah"
)
VIDEO_SPLIT_SQL = _group_split_sql(VIDEO_GROUPS_SQL, "video_id")
AUDIO_SPLIT_SQL = _group_split_sql(AUDIO_GROUPS_SQL, "clip_id")


# -- image quality gate (the LAION-style pre-training filter) ---------------
#
# Drop decoded images that are near-constant (no signal), too dark, or too
# bright BEFORE they reach expensive downstream stages (embedding, caption
# alignment). Per-image gray mean/variance are whole-batch einsum sums over
# the decoded pixels — the same Arrow-vectorized kernel shape as
# mm_decode_features, one pass, no per-image Python. Exactness: the gray
# channel sum and sum-of-squares are small exact int64s, every divisor is a
# power of two, and mean^2 has <= 16 fractional bits — so mean/variance are
# exact in float64 and DuckDB recomputes them bit-identically from the
# closed-form pattern. Thresholds are config: QUAL_VAR_MIN sits at the
# synthetic corpus's variance median so keep and drop BOTH occur (~50/50);
# the mean bounds are structurally exercised but constant-false here — the
# gradient pattern has no all-dark/all-bright images (means 377..388).

QUAL_VAR_MIN = 6900.0   # flat below this gray variance (corpus: 6584..7246)
QUAL_MEAN_LO = 64.0     # too dark below (gray in 0..765 = r+g+b)
QUAL_MEAN_HI = 704.0    # too bright above

QUALITY_SCHEMA = (
    "image_id string, fmt string, mean_gray double, var_gray double, "
    "too_dark boolean, too_bright boolean, too_flat boolean, keep boolean"
)


def _gray_stats(full: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean_gray, var_gray, img_keep) from decoded payload bytes — the ONE
    definition both the quality gate and pair curation score with (a
    threshold or pattern change lands in exactly one place)."""
    side = MM_SIDE
    npix = side * side
    px = full[:, _MM_HDR:].reshape(n, side, side, 3).astype(np.int64)
    gray = px.sum(axis=3)  # 0..765 per pixel
    gsum = np.einsum("nij->n", gray)
    gsq = np.einsum("nij,nij->n", gray, gray)
    mean = gsum.astype(np.float64) / npix
    var = gsq.astype(np.float64) / npix - mean * mean
    keep = ~((mean < QUAL_MEAN_LO) | (mean > QUAL_MEAN_HI) | (var < QUAL_VAR_MIN))
    return mean, var, keep


def _quality_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        mean, var, keep = _gray_stats(full, n)
        too_dark = mean < QUAL_MEAN_LO
        too_bright = mean > QUAL_MEAN_HI
        too_flat = var < QUAL_VAR_MIN
        yield pd.DataFrame(
            {
                "image_id": pdf["image_id"],
                "fmt": np.where(full[:, 4] == ord("j"), "jpg", "png"),
                "mean_gray": mean,
                "var_gray": var,
                "too_dark": too_dark,
                "too_bright": too_bright,
                "too_flat": too_flat,
                "keep": keep,
            }
        )


def mm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table_rows(sf_dir, "documents") // 5
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_pattern_corpus, schema=datagen.WORLD_SCHEMAS["corpus"]
    )
    return corpus.mapInPandas(_quality_features, schema=QUALITY_SCHEMA)


# ONE definition of the gray-stats CTE chain for every oracle that scores
# image quality (the SQL twin of `_gray_stats`): pattern corpus ks ->
# closed-form pixels -> quantized gray -> per-image mean/variance
_GRAY_CTES = f"""ks AS (
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
g AS (
  SELECT k, lossy,
         (CASE WHEN lossy THEN (r0//4)*4+2 ELSE r0 END
        + CASE WHEN lossy THEN (g0//4)*4+2 ELSE g0 END
        + CASE WHEN lossy THEN (b0//4)*4+2 ELSE b0 END)::bigint AS gray
  FROM px
),
s AS (
  SELECT k, bool_or(lossy) AS lossy,
         sum(gray)::double / {MM_SIDE * MM_SIDE} AS mean_gray,
         sum(gray*gray)::double / {MM_SIDE * MM_SIDE}
           - (sum(gray)::double / {MM_SIDE * MM_SIDE})
             * (sum(gray)::double / {MM_SIDE * MM_SIDE}) AS var_gray
  FROM g GROUP BY k
)"""

_IMG_KEEP_SQL = (
    f"NOT (mean_gray < {QUAL_MEAN_LO} OR mean_gray > {QUAL_MEAN_HI}"
    f" OR var_gray < {QUAL_VAR_MIN})"
)

QUALITY_SQL = f"""
WITH {_GRAY_CTES}
SELECT 'img' || k AS image_id,
       CASE WHEN lossy THEN 'jpg' ELSE 'png' END AS fmt,
       mean_gray, var_gray,
       mean_gray < {QUAL_MEAN_LO} AS too_dark,
       mean_gray > {QUAL_MEAN_HI} AS too_bright,
       var_gray < {QUAL_VAR_MIN} AS too_flat,
       {_IMG_KEEP_SQL} AS keep
FROM s
"""


# -- image-text pair curation (the LAION-style pre-CLIP gate) ---------------
#
# A multimodal training set is curated per PAIR: the image must carry signal
# (the mm_quality_filter gate) AND the caption must look like usable text
# (token count bounds, not digit-dominated). Both sides decode/tokenize in
# the same pass over the corpus — the caption checks are JVM built-ins on
# the caption column the decode batch already carries, so pair curation
# costs exactly the image gate's one corpus pass plus free expressions.
# DuckDB recomputes the image stats from the closed form and the caption
# stats from the same generated strings ('pattern caption <k>').

CAP_MIN_TOKENS = 2
# drop digit-dominated captions (ids, timestamps). 0.12 sits between the
# synthetic corpus's 2-digit (0.111) and 3-digit (0.158) caption ratios —
# clean margins, no float-boundary ties. Ids stay < 100 at sf0.001/sf0.01
# (500-doc tables) so the cap gate passes everything there; at sf0.1 the
# 3-digit ids are dropped and all four (img_keep x cap_keep) combinations
# occur (verified: 397/54/503/46 of 1000).
CAP_DIGIT_MAX = 0.12


PAIR_SCHEMA = (
    "image_id string, img_keep boolean, n_cap_tokens long, "
    "digit_ratio double, cap_keep boolean, pair_keep boolean"
)


def mm_pair_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE kernel pass emits both sides: the image stats and the caption
    stats come out of the same Arrow batch, so pair curation costs exactly
    one corpus scan — no second decode branch, no join."""
    n = table_rows(sf_dir, "documents") // 5
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_pattern_corpus, schema=datagen.WORLD_SCHEMAS["corpus"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            if not n_rows:
                continue
            blobs = pdf["bytes"].to_numpy()
            full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
            _, _, img_keep = _gray_stats(full, n_rows)
            caps = pdf["caption"].astype(str)
            n_tok = (
                caps.str.split(r" +", regex=True)
                .map(lambda ts: sum(1 for t in ts if t))
                .to_numpy(dtype=np.int64)
            )
            n_digits = caps.str.count(r"[0-9]").to_numpy(dtype=np.float64)
            cap_len = np.maximum(caps.str.len().to_numpy(dtype=np.float64), 1.0)
            digit_ratio = n_digits / cap_len
            cap_keep = (n_tok >= CAP_MIN_TOKENS) & (digit_ratio <= CAP_DIGIT_MAX)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "img_keep": img_keep,
                    "n_cap_tokens": n_tok,
                    "digit_ratio": np.round(digit_ratio, 6),
                    "cap_keep": cap_keep,
                    "pair_keep": img_keep & cap_keep,
                }
            )

    return corpus.mapInPandas(kernel, schema=PAIR_SCHEMA)


PAIR_CURATION_SQL = f"""
WITH {_GRAY_CTES},
cap AS (
  SELECT k, 'pattern caption ' || k AS caption FROM ks
),
capstats AS (
  SELECT k,
         len(list_filter(string_split_regex(caption, ' +'), x -> x <> ''))::bigint
           AS n_cap_tokens,
         len(regexp_replace(caption, '[^0-9]', '', 'g'))::double
           / greatest(len(caption), 1) AS digit_ratio
  FROM cap
)
SELECT 'img' || s.k AS image_id,
       {_IMG_KEEP_SQL} AS img_keep,
       n_cap_tokens,
       round(digit_ratio, 6) AS digit_ratio,
       (n_cap_tokens >= {CAP_MIN_TOKENS} AND digit_ratio <= {CAP_DIGIT_MAX})
         AS cap_keep,
       ({_IMG_KEEP_SQL}
        AND n_cap_tokens >= {CAP_MIN_TOKENS}
        AND digit_ratio <= {CAP_DIGIT_MAX}) AS pair_keep
FROM s JOIN capstats ON s.k = capstats.k
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
    "mm_decode_features": (mm_decode_features, DECODE_FEATURES_SQL),
    "mm_resize": (mm_resize, RESIZE_SQL),
    "mm_phash_neardup": (mm_phash_neardup, PHASH_NEARDUP_SQL),
    "mm_frame_sample": (mm_frame_sample, FRAME_SAMPLE_SQL),
    "mm_sample_select": (mm_sample_select, SAMPLE_SQL),
}


# -- quality-argmax image representative (the image dedup_best_rep) ---------
MM_NPIX = MM_SIDE * MM_SIDE


def _k_phash_gray_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(k, phash, g_sum, g_ssq) in ONE decode pass — the phash rides the
    corpus column, the gray moments are EXACT int64 sums (no float mean/var
    anywhere: npix*g_ssq - g_sum^2 = npix^2 * variance is a total order
    both engines compute bit-identically, the dedup_best_rep struct-max
    requirement). Bounds: gray <= 765, so g_ssq <= 256*765^2 ~ 1.5e8 and
    the score products stay far inside int64."""
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        full = np.stack([np.frombuffer(b, np.uint8) for b in pdf["bytes"].to_numpy()])
        px = full[:, _MM_HDR:].reshape(n, MM_SIDE, MM_SIDE, 3).astype(np.int64)
        gray = px.sum(axis=3)
        yield pd.DataFrame(
            {
                "k": pdf["image_id"].str[3:].astype("int64"),
                "phash": pdf["phash"].astype("int64"),
                "g_sum": np.einsum("nij->n", gray),
                "g_ssq": np.einsum("nij,nij->n", gray, gray),
            }
        )


def _phash_quality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, phash, g_sum, g_ssq) materialized once — the _phash_index
    discipline extended with the integer quality moments, still ONE corpus
    generation + decode pass feeding both the band joins and the argmax."""
    n = table_rows(sf_dir, "documents") // 5
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_pattern_corpus, schema=datagen.WORLD_SCHEMAS["corpus"]
    )
    return corpus.mapInPandas(
        _k_phash_gray_sums, schema="k long, phash long, g_sum long, g_ssq long"
    ).localCheckpoint(eager=True)


def mm_best_rep(spark: SparkSession, sf_dir: str, max_iters: int = 16) -> DataFrame:
    return mm_best_rep_frames(_phash_quality_index(spark, sf_dir), max_iters)


def mm_best_rep_frames(idx: DataFrame, max_iters: int = 16) -> DataFrame:
    """Quality-argmax image representative — the image twin of
    `pipeline.dedup_best_rep` (SemDeDup keeps the most central member,
    FineWeb keeps by quality; min-id is an accident of crawl order): per
    phash duplicate GROUP (the mm_phash_groups transitive classes over the
    shared `_phash_edges`), keep the member with the highest integer
    variance score npix*g_ssq - g_sum^2 (a sharper image beats its re-
    encodes), ties to the LOWEST k via an exact (score, -k) struct max.

    Scale shape: groups ride the shared `min_label_components` kernel over
    the edge subgraph only; the argmax runs ONLY over multi-member groups
    (singletons self-represent and never enter the exchange); everything
    downstream of the one checkpointed (k, phash, g_sum, g_ssq) leaf is
    JVM expressions — zero Python past the decode, plan-asserted."""
    from .dedup import min_label_components

    edges = _phash_edges(idx.select("k", "phash")).select(
        F.col("ka").alias("doc_a"), F.col("kb").alias("doc_b")
    )
    labels = min_label_components(edges, max_iters)
    sized = labels.join(
        labels.groupBy("label").agg(F.count("*").alias("group_size")), "label"
    )
    scored = idx.select(
        "k",
        (F.lit(MM_NPIX) * F.col("g_ssq") - F.col("g_sum") * F.col("g_sum"))
        .cast("long")
        .alias("score"),
    )
    best = (
        labels.join(scored, labels["doc_id"] == scored["k"])
        .groupBy("label")
        .agg(F.max(F.struct(F.col("score"), (-F.col("k")).alias("nk"))).alias("m"))
        .select("label", (-F.col("m.nk")).alias("rep_k"))
    )
    return (
        idx.join(sized, idx["k"] == sized["doc_id"], "left")
        .join(scored, "k")
        .join(best, "label", "left")
        .select(
            F.concat(F.lit("img"), F.col("k").cast("string")).alias("image_id"),
            F.concat(
                F.lit("img"), F.coalesce("label", F.col("k")).cast("string")
            ).alias("group_id"),
            F.coalesce("group_size", F.lit(1)).cast("long").alias("group_size"),
            F.concat(
                F.lit("img"), F.coalesce("rep_k", F.col("k")).cast("string")
            ).alias("rep_id"),
            (F.col("k") == F.coalesce("rep_k", F.col("k"))).alias("is_rep"),
            F.col("score").cast("long").alias("score"),
        )
    )


MM_BEST_REP_SQL = f"""
WITH RECURSIVE {_PHASH_EDGE_CTES},
gi AS (
  SELECT k, sum(gray)::bigint AS g_sum, sum(gray*gray)::bigint AS g_ssq
  FROM g GROUP BY k
),
sc AS (SELECT k, ({MM_NPIX} * g_ssq - g_sum * g_sum)::bigint AS score FROM gi),
sym AS (SELECT ka AS a, kb AS b FROM edges
        UNION ALL SELECT kb AS a, ka AS b FROM edges),
reach(v, r) AS (
  SELECT k AS v, k AS r FROM ks
  UNION
  SELECT s.b AS v, reach.r FROM reach JOIN sym s ON s.a = reach.v
),
grp AS (SELECT v AS k, min(r) AS gid FROM reach GROUP BY v),
gsz AS (SELECT gid, count(*)::bigint AS group_size FROM grp GROUP BY gid),
r AS (
  SELECT gid, k AS rep_k FROM (
    SELECT grp.gid, grp.k,
           row_number() OVER (
             PARTITION BY gid ORDER BY score DESC, grp.k ASC) AS rn
    FROM grp JOIN sc ON grp.k = sc.k
  ) WHERE rn = 1
)
SELECT 'img' || grp.k AS image_id,
       'img' || grp.gid AS group_id,
       gsz.group_size,
       'img' || r.rep_k AS rep_id,
       (grp.k = r.rep_k) AS is_rep,
       sc.score
FROM grp
JOIN gsz ON grp.gid = gsz.gid
JOIN r ON grp.gid = r.gid
JOIN sc ON grp.k = sc.k
"""


# -- WebDataset-style shard packing (whole-sample byte-budget bins) ---------
# Image training data ships as tar shards of WHOLE samples (WebDataset /
# tfrecord layout): a sample (image payload + its text/caption member)
# never splits across shards — the dual of pack_sequences, where token
# bins split documents freely. Whole-sample greedy packing with a reset is
# inherently SEQUENTIAL within a writer (the bin boundary depends on every
# earlier reset — no prefix-sum closed form), which is also the physical
# truth: a tar writer appends serially. So the operator keys samples into
# n_streams independent writer streams by hash (the pack_sequences move)
# and runs the exact greedy per stream in ONE applyInPandas kernel —
# parallelism = stream count (set n_streams ~ writers at 100 TB), and the
# per-stream state is two integers, never corpus-sized. Greedy rule: a
# sample opens a new shard when it would overflow the byte budget; an
# OVERSIZED sample (> budget) lands alone in its own shard (next sample
# always overflows past it). Sample size here = the pair's tar-member
# bytes: octet_length(text) + the fixed rendered-image payload
# (_MM_NBYTES; the synthetic blobs are fixed-size, the text side carries
# the variance). DuckDB twin replays the identical greedy as a recursive
# CTE stepping rn -> rn+1 per stream.
MM_SHARD_BUDGET = 4096
MM_PACK_STREAMS = 8


def _pack_writer(budget: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ns = pdf["n_bytes"].to_numpy()
        shard = np.empty(len(ns), np.int64)
        off = np.empty(len(ns), np.int64)
        fill = 0
        sh = 0
        for i, s in enumerate(ns):
            if i and fill + s > budget:
                sh += 1
                fill = 0
            shard[i] = sh
            off[i] = fill
            fill += int(s)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "stream": pdf["stream"],
                "n_bytes": ns,
                "shard_no": shard,
                "offset": off,
            }
        )

    return fn


def mm_shard_pack(spark: SparkSession, sf_dir: str,
                  budget: int = MM_SHARD_BUDGET,
                  n_streams: int = MM_PACK_STREAMS) -> DataFrame:
    from .common import load, spark_h32

    h = spark_h32("concat('wds:', cast(doc_id as string))")
    samples = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"{h} % {n_streams}").cast("int").alias("stream"),
        (F.expr("octet_length(text)") + F.lit(_MM_NBYTES))
        .cast("long")
        .alias("n_bytes"),
    )
    return mm_shard_pack_frame(samples, budget)


def mm_shard_pack_frame(samples: DataFrame, budget: int = MM_SHARD_BUDGET) -> DataFrame:
    return samples.groupBy("stream").applyInPandas(
        _pack_writer(budget),
        schema="doc_id long, stream int, n_bytes long, shard_no long, offset long",
    )


def _shard_pack_sql(budget: int = MM_SHARD_BUDGET,
                    n_streams: int = MM_PACK_STREAMS) -> str:
    from .common import duck_h32

    h = duck_h32("'wds:' || doc_id::varchar")
    return f"""
WITH RECURSIVE sized AS (
  SELECT doc_id::bigint AS doc_id,
         ({h} % {n_streams})::int AS stream,
         (strlen(text) + {_MM_NBYTES})::bigint AS n_bytes,
         row_number() OVER (
           PARTITION BY ({h} % {n_streams}) ORDER BY doc_id) AS rn
  FROM documents
),
packed(stream, rn, doc_id, n_bytes, shard_no, off, fill) AS (
  SELECT stream, rn, doc_id, n_bytes,
         0::bigint, 0::bigint, n_bytes
  FROM sized WHERE rn = 1
  UNION ALL
  SELECT n.stream, n.rn, n.doc_id, n.n_bytes,
         CASE WHEN p.fill + n.n_bytes > {budget}
              THEN p.shard_no + 1 ELSE p.shard_no END,
         CASE WHEN p.fill + n.n_bytes > {budget}
              THEN 0 ELSE p.fill END,
         CASE WHEN p.fill + n.n_bytes > {budget}
              THEN n.n_bytes ELSE p.fill + n.n_bytes END
  FROM packed p JOIN sized n ON n.stream = p.stream AND n.rn = p.rn + 1
)
SELECT doc_id, stream, n_bytes, shard_no, off AS offset FROM packed
"""


MM_SHARD_PACK_SQL = _shard_pack_sql()


# -- admission-time VIDEO near-dup gate (completes the modality matrix) -----
def mm_video_dedup_incremental_frames(
    batch_idx: DataFrame, index_idx: DataFrame, match_min: int = VID_MATCH_MIN
) -> DataFrame:
    """Admission-time near-dup verdict for an INCOMING clip batch against
    an already-indexed corpus — the video leg of the admission-gate matrix
    (text `dedup_incremental` / image `mm_dedup_incremental`), built on the
    SAME shift-tolerant containment semantics as `mm_video_neardup`: a
    batch clip is a duplicate of a neighbor when >= match_min of ITS
    sampled frames have a Hamming-<=PHASH_HAM_MAX match ANYWHERE in the
    neighbor (trims/re-muxes don't break alignment). Inputs are
    (k, frame_no, fphash) frame-index frames — a few int64s per clip,
    computed once at ingest. Candidates come from band equi-joins only:
    batch x index (replay-safe: index copies of the current batch are
    anti-joined out, the mm_dedup_incremental lesson) plus batch x
    smaller-id batch siblings; one containment vote per (batch frame,
    neighbor); verdict = the MIN-id neighbor clearing the containment
    floor, its n_matched carried along. O(batch + matched) — the
    persisted index is only ever touched through its band buckets.
    Shares `_containment_gate` with the audio gate — one admission
    kernel for both time-shifted modalities."""
    v = _containment_gate(batch_idx, index_idx, "fphash", "frame_no", match_min)
    return v.select(
        F.concat(F.lit("vid"), F.col("k").cast("string")).alias("video_id"),
        F.col("n_units").alias("n_frames_sampled"),
        "is_novel",
        F.when(F.col("dup_k").isNull(), F.lit("")).otherwise(
            F.concat(F.lit("vid"), F.col("dup_k").cast("string"))
        ).alias("dup_of"),
        "n_matched",
    )


def _containment_gate(
    batch_idx: DataFrame, index_idx: DataFrame,
    hash_col: str, unit_col: str, match_min: int,
) -> DataFrame:
    """The generic admission-time containment verdict shared by the video
    (sampled-frame phash) and audio (window-fingerprint) gates — the
    incremental counterpart of `_containment_edges`. Returns one row per
    batch item: (k, n_units, is_novel, dup_k nullable, n_matched)."""
    bb = _band_stack(batch_idx, hash_col, "k", unit_col)
    ib = _band_stack(index_idx, hash_col, "k", unit_col)
    left = bb.select(
        F.col("k").alias("ka"), F.col(unit_col).alias("fa"),
        F.col(hash_col).alias("pa"), "band_no", "band_val",
    )
    cross = (
        left.join(
            ib.select(
                F.col("k").alias("kb"), F.col(hash_col).alias("pb"),
                "band_no", "band_val",
            ),
            ["band_no", "band_val"],
        )
        .join(
            F.broadcast(batch_idx.select(F.col("k").alias("kb")).distinct()),
            "kb",
            "left_anti",
        )
    )
    internal = left.join(
        bb.select(
            F.col("k").alias("kb"), F.col(hash_col).alias("pb"),
            "band_no", "band_val",
        ),
        ["band_no", "band_val"],
    ).filter(F.col("kb") < F.col("ka"))
    pairs = (
        cross.unionByName(internal)
        .filter(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) <= PHASH_HAM_MAX)
        .select("ka", "fa", "kb")
        .distinct()  # one vote per matched batch unit per neighbor
        .groupBy("ka", "kb")
        .agg(F.count("*").cast("long").alias("n_matched"))
        .filter(F.col("n_matched") >= match_min)
    )
    best = pairs.groupBy("ka").agg(
        F.min(F.struct("kb", "n_matched")).alias("m")
    )
    items = batch_idx.groupBy("k").agg(
        F.count("*").cast("long").alias("n_units")
    )
    return items.join(best.select(F.col("ka").alias("k"), "m"), "k", "left").select(
        "k",
        "n_units",
        F.col("m").isNull().alias("is_novel"),
        F.col("m.kb").alias("dup_k"),
        F.coalesce(F.col("m.n_matched"), F.lit(-1)).cast("long").alias("n_matched"),
    )


def mm_video_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-corpus stand-in (the mm_dedup_incremental convention): clips with
    k % 4 == 0 play the incoming batch, the rest the persisted index; both
    splits read the ONE _video_phash_index checkpoint leaf."""
    idx = _video_phash_index(spark, sf_dir)
    is_batch = F.col("k") % 4 == 0
    return mm_video_dedup_incremental_frames(
        idx.filter(is_batch), idx.filter(~is_batch)
    )


MM_VIDEO_INCREMENTAL_SQL = f"""
WITH {_VIDEO_BAND_CTES},
cand AS (
  SELECT DISTINCT a.k AS ka, a.f AS fa, b.k AS kb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
  WHERE a.k % 4 = 0 AND (b.k % 4 <> 0 OR b.k < a.k)
    AND bit_count(xor(a.fphash, b.fphash)) <= {PHASH_HAM_MAX}
),
pairs AS (
  SELECT ka, kb, count(*)::bigint AS n_matched
  FROM cand GROUP BY ka, kb HAVING count(*) >= {VID_MATCH_MIN}
),
best AS (
  SELECT ka, kb, n_matched FROM (
    SELECT ka, kb, n_matched,
           row_number() OVER (PARTITION BY ka ORDER BY kb) AS rn
    FROM pairs
  ) WHERE rn = 1
),
clips AS (
  SELECT k, count(*)::bigint AS n_frames_sampled FROM ph
  WHERE k % 4 = 0 GROUP BY k
)
SELECT 'vid' || clips.k AS video_id,
       n_frames_sampled,
       best.kb IS NULL AS is_novel,
       CASE WHEN best.kb IS NULL THEN '' ELSE 'vid' || best.kb END AS dup_of,
       coalesce(best.n_matched, -1)::bigint AS n_matched
FROM clips LEFT JOIN best ON clips.k = best.ka
"""


# -- admission-time AUDIO near-dup gate (the matrix's fourth modality) ------
AUD_GATE_BATCH_CLASSES = 5  # dup classes admitted whole (novel + siblings)


def mm_audio_dedup_incremental_frames(
    batch_idx: DataFrame, index_idx: DataFrame, match_min: int = AUD_MATCH_MIN
) -> DataFrame:
    """Admission-time near-dup verdict for an INCOMING clip batch against a
    persisted window-fingerprint index — the audio leg of the admission
    gate matrix, riding the SAME `_containment_gate` kernel as the video
    gate (one admission dataflow for both time-shifted modalities):
    a batch clip is a duplicate when >= match_min of its sign-fingerprint
    windows have a banded Hamming-<=PHASH_HAM_MAX match ANYWHERE in the
    neighbor (trim/pad tolerant). Inputs are (k, win_no, ahash) frames."""
    v = _containment_gate(batch_idx, index_idx, "ahash", "win_no", match_min)
    return v.select(
        F.concat(F.lit("aud"), F.col("k").cast("string")).alias("clip_id"),
        F.col("n_units").alias("n_wins"),
        "is_novel",
        F.when(F.col("dup_k").isNull(), F.lit("")).otherwise(
            F.concat(F.lit("aud"), F.col("dup_k").cast("string"))
        ).alias("dup_of"),
        "n_matched",
    )


def mm_audio_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-corpus stand-in. The audio corpus is dup-CLASS designed (every
    same-class pair is an edge), so the image gate's k % 4 split would be
    one-sided: class members cover every residue mod 4, making every batch
    clip a dup. Instead: the batch is the FIRST trim-offset of every class
    (o = 0) plus ALL members of the first AUD_GATE_BATCH_CLASSES classes —
    so all three verdict paths occur by construction: the first member of
    a batch-only class is NOVEL (its mates are larger-id siblings), its
    mates are sibling dups, and the o = 0 member of every other class is a
    CROSS dup of an index mate."""
    idx = _audio_fp_index(spark, sf_dir)
    n = max(table_rows(sf_dir, "documents") // 4, 1)
    nc = max((n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS, 1)
    is_batch = (F.col("k") % nc < AUD_GATE_BATCH_CLASSES) | (F.col("k") < nc)
    return mm_audio_dedup_incremental_frames(
        idx.filter(is_batch), idx.filter(~is_batch)
    )


MM_AUDIO_INCREMENTAL_SQL = f"""
WITH {_AUDIO_BAND_CTES},
nc AS (
  SELECT greatest((n + {_AUD_DUP_OFFSETS - 1}) // {_AUD_DUP_OFFSETS}, 1) AS c
  FROM nn
),
cand AS (
  SELECT DISTINCT a.k AS ka, a.w AS wa, b.k AS kb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val, nc
  WHERE (a.k % nc.c < {AUD_GATE_BATCH_CLASSES} OR a.k < nc.c)
    AND (NOT (b.k % nc.c < {AUD_GATE_BATCH_CLASSES} OR b.k < nc.c) OR b.k < a.k)
    AND bit_count(xor(a.ahash, b.ahash)) <= {PHASH_HAM_MAX}
),
pairs AS (
  SELECT ka, kb, count(*)::bigint AS n_matched
  FROM cand GROUP BY ka, kb HAVING count(*) >= {AUD_MATCH_MIN}
),
best AS (
  SELECT ka, kb, n_matched FROM (
    SELECT ka, kb, n_matched,
           row_number() OVER (PARTITION BY ka ORDER BY kb) AS rn
    FROM pairs
  ) WHERE rn = 1
),
clips AS (
  SELECT k, count(*)::bigint AS n_wins FROM ah, nc
  WHERE (k % nc.c < {AUD_GATE_BATCH_CLASSES} OR k < nc.c) GROUP BY k
)
SELECT 'aud' || clips.k AS clip_id,
       n_wins,
       best.kb IS NULL AS is_novel,
       CASE WHEN best.kb IS NULL THEN '' ELSE 'aud' || best.kb END AS dup_of,
       coalesce(best.n_matched, -1)::bigint AS n_matched
FROM clips LEFT JOIN best ON clips.k = best.ka
"""


# -- eval-overlap decontamination (the decontamination row of the matrix) ----
#
# `text.decontaminate` (the GPT-3/C4-style n-gram overlap scrub) gets its
# three multimodal siblings here: benchmarks leak through IMAGES and CLIPS
# too (an eval image re-encoded into the crawl, a benchmark clip trimmed
# into a montage), so a training pipeline must run the scrub per modality.
# The contamination criterion is each modality's OWN near-dup criterion,
# made asymmetric — a TRAIN item is contaminated when it would near-dup-
# match some EVAL item:
#
#   image: phash Hamming <= PHASH_HAM_MAX             (mm_phash_neardup)
#   video: >= VID_MATCH_MIN sampled frames matched
#          anywhere in an eval clip                   (mm_video_neardup)
#   audio: >= AUD_MATCH_MIN fingerprint windows
#          matched anywhere in an eval clip           (mm_audio_neardup)
#
# through the SAME `_band_stack` LSH layout and the same verified-match
# math as the near-dup views, so the fingerprint and the threshold cannot
# drift between the dedup and decontamination views of one corpus.
#
# 100 TB shape (the text.decontaminate lesson, unchanged by modality): the
# eval side is a benchmark suite — thousands of items, not billions — so
# its banded fingerprints BROADCAST, the train corpus pays exactly one
# fingerprint scan with NO shuffle before the join survivors, and the
# per-item aggregates key on the contaminated fraction only (state is
# O(contamination), not O(corpus)). Because the eval index is STATIC, the
# probe is stateless row-local work and serves on an ingest stream
# unchanged (`streaming.stream_mm_decontaminate`). The eval split here is
# the deterministic in-corpus stand-in the text scrub uses (k % eval_mod
# == 0); a real pipeline reads a benchmark table — the dataflow is
# identical.
MM_DECONTAM_EVAL_MOD = 10  # the text scrub's DECONTAM_EVAL_MOD convention


def mm_decontaminate_frames(idx: DataFrame, eval_mod: int = MM_DECONTAM_EVAL_MOD) -> DataFrame:
    """Back half over a materialized (k, phash) index: band-probe train
    phashes against the BROADCAST eval bands, verify Hamming, aggregate
    per contaminated train image — (k, n_eval_imgs, min_ham)."""
    bands = _band_stack(idx, "phash", "k")
    ev = bands.filter(F.col("k") % eval_mod == 0).select(
        F.col("k").alias("ke"), F.col("phash").alias("pe"), "band_no", "band_val"
    )
    tr = bands.filter(F.col("k") % eval_mod != 0)
    hits = (
        tr.join(F.broadcast(ev), ["band_no", "band_val"])
        .select("k", "phash", "ke", "pe")
        .distinct()  # a pair sharing several bands is one candidate
        .withColumn("ham", F.bit_count(F.col("phash").bitwiseXOR(F.col("pe"))))
        .filter(F.col("ham") <= PHASH_HAM_MAX)
    )
    return hits.groupBy("k").agg(
        F.countDistinct("ke").alias("n_eval_imgs"),
        F.min("ham").cast("long").alias("min_ham"),
    )


def mm_decontaminate(spark: SparkSession, sf_dir: str,
                     eval_mod: int = MM_DECONTAM_EVAL_MOD) -> DataFrame:
    """Image decontamination: flag every train image whose phash is within
    PHASH_HAM_MAX of some eval-split image, with the distinct eval images
    hit and the closest Hamming distance."""
    out = mm_decontaminate_frames(_phash_index(spark, sf_dir), eval_mod)
    return out.select(
        F.concat(F.lit("img"), F.col("k").cast("string")).alias("image_id"),
        "n_eval_imgs",
        "min_ham",
    )


def _mm_decontam_sql(eval_mod: int = MM_DECONTAM_EVAL_MOD) -> str:
    """Twin GENERATED from the same eval_mod so a non-default split in a
    test keeps the engines in lockstep (the ivf_sql precedent). DuckDB
    prunes the unreferenced trailing `edges` CTE of the shared chain."""
    return f"""
WITH {_PHASH_EDGE_CTES},
ev AS (SELECT k AS ke, phash AS pe, band_no, band_val FROM bands WHERE k % {eval_mod} = 0),
tr AS (SELECT k, phash, band_no, band_val FROM bands WHERE k % {eval_mod} <> 0),
hits AS (
  SELECT k, ke, bit_count(xor(phash, pe)) AS ham FROM (
    SELECT DISTINCT t.k, t.phash, e.ke, e.pe
    FROM tr t JOIN ev e ON t.band_no = e.band_no AND t.band_val = e.band_val)
  WHERE bit_count(xor(phash, pe)) <= {PHASH_HAM_MAX}
)
SELECT 'img' || k AS image_id, count(DISTINCT ke)::bigint AS n_eval_imgs,
       min(ham)::bigint AS min_ham
FROM hits GROUP BY k
"""


MM_DECONTAM_SQL = _mm_decontam_sql()


def _containment_decontam_frames(tr: DataFrame, ev: DataFrame, hash_col: str,
                                 unit_col: str, match_min: int) -> DataFrame:
    """The clip-modality decontamination kernel shared by the video and
    audio scrubs (the asymmetric counterpart of `_containment_edges`, as
    `_containment_gate` is for admission): a train clip is contaminated by
    an eval clip when >= match_min of its DISTINCT units (sampled frames /
    fingerprint windows) have a Hamming-<=PHASH_HAM_MAX match anywhere in
    that eval clip. `tr` and `ev` are (k, unit, hash) fingerprint frames.
    Eval bands broadcast; the eval unit number is dropped before the join
    (match-anywhere, the trim/shift tolerance), so the probe ships only
    (band_val, ke, hash) tuples. Output per contaminated train clip:
    (k, n_eval_clips, max_matched). Stateless given a static eval index —
    the same frames serve per micro-batch at ingest
    (`streaming.serve_clip_decontam_gate`)."""
    trb = _band_stack(tr, hash_col, "k", unit_col)
    evb = _band_stack(ev, hash_col, "k").select(
        F.col("k").alias("ke"), F.col(hash_col).alias("pe"), "band_no", "band_val"
    )
    matched = (
        trb.join(F.broadcast(evb), ["band_no", "band_val"])
        .filter(F.bit_count(F.col(hash_col).bitwiseXOR(F.col("pe"))) <= PHASH_HAM_MAX)
        .select("k", unit_col, "ke")
        .distinct()  # one vote per matched unit, however many hits in ke
    )
    pairs = (
        matched.groupBy("k", "ke")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") >= match_min)
    )
    return pairs.groupBy("k").agg(
        F.countDistinct("ke").alias("n_eval_clips"),
        F.max("n_matched").alias("max_matched"),
    )


def _containment_decontam(idx: DataFrame, hash_col: str, unit_col: str,
                          match_min: int, eval_mod: int) -> DataFrame:
    """In-corpus stand-in split (k % eval_mod == 0 is the eval suite) over
    one checkpointed index, feeding the two-frame kernel above."""
    return _containment_decontam_frames(
        idx.filter(F.col("k") % eval_mod != 0),
        idx.filter(F.col("k") % eval_mod == 0),
        hash_col, unit_col, match_min,
    )


def mm_video_decontaminate(spark: SparkSession, sf_dir: str,
                           eval_mod: int = MM_DECONTAM_EVAL_MOD) -> DataFrame:
    """Video decontamination: train clips sharing >= VID_MATCH_MIN sampled
    frames (phash-matched, position-free) with some eval-split clip."""
    idx = _video_phash_index(spark, sf_dir)
    out = _containment_decontam(idx, "fphash", "frame_no", VID_MATCH_MIN, eval_mod)
    return out.select(
        F.concat(F.lit("vid"), F.col("k").cast("string")).alias("video_id"),
        "n_eval_clips",
        "max_matched",
    )


def mm_audio_decontaminate(spark: SparkSession, sf_dir: str,
                           eval_mod: int = MM_DECONTAM_EVAL_MOD) -> DataFrame:
    """Audio decontamination: train clips sharing >= AUD_MATCH_MIN
    fingerprint windows (sign-hash-matched, offset-free) with some
    eval-split clip."""
    idx = _audio_fp_index(spark, sf_dir)
    out = _containment_decontam(idx, "ahash", "win_no", AUD_MATCH_MIN, eval_mod)
    return out.select(
        F.concat(F.lit("aud"), F.col("k").cast("string")).alias("clip_id"),
        "n_eval_clips",
        "max_matched",
    )


def _containment_decontam_sql(band_ctes: str, hash_col: str, unit_col: str,
                              match_min: int, eval_mod: int,
                              prefix: str, id_name: str) -> str:
    """ONE twin generator for both clip modalities, composing the same band
    CTE chain as the near-dup/groups/topk siblings of that modality."""
    return f"""
WITH {band_ctes},
ev AS (SELECT k AS ke, {hash_col} AS pe, band_no, band_val FROM bands WHERE k % {eval_mod} = 0),
tr AS (SELECT k, {unit_col} AS u, {hash_col} AS p, band_no, band_val FROM bands WHERE k % {eval_mod} <> 0),
umatch AS (
  SELECT DISTINCT t.k, t.u, e.ke
  FROM tr t JOIN ev e ON t.band_no = e.band_no AND t.band_val = e.band_val
  WHERE bit_count(xor(t.p, e.pe)) <= {PHASH_HAM_MAX}
),
pairs AS (
  SELECT k, ke, count(*)::bigint AS n_matched FROM umatch GROUP BY k, ke
  HAVING count(*) >= {match_min}
)
SELECT '{prefix}' || k AS {id_name}, count(DISTINCT ke)::bigint AS n_eval_clips,
       max(n_matched)::bigint AS max_matched
FROM pairs GROUP BY k
"""


VIDEO_DECONTAM_SQL = _containment_decontam_sql(
    _VIDEO_BAND_CTES, "fphash", "f", VID_MATCH_MIN, MM_DECONTAM_EVAL_MOD,
    "vid", "video_id",
)
AUDIO_DECONTAM_SQL = _containment_decontam_sql(
    _AUDIO_BAND_CTES, "ahash", "w", AUD_MATCH_MIN, MM_DECONTAM_EVAL_MOD,
    "aud", "clip_id",
)


# -- quality-argmax clip representatives (video/audio dedup_best_rep) --------
#
# The representative row of the modality matrix completed for the
# multi-unit modalities (text: pipeline.dedup_best_rep; image:
# mm_best_rep): per transitive duplicate CLASS (the mm_video/audio_groups
# components over the shared containment edges), keep the member that
# maximizes the modality's own exact-integer quality signal — the
# mm_*_quality convention — with ties to the LOWEST id via the
# (score, -k) struct max both engines compute bit-identically:
#
#   video: whole-clip gray total over ALL MM_FRAMES frames (the exposure
#          signal). Deliberately NOT the sampled-frame spread: matched
#          sampled frames are byte-identical by corpus construction, so
#          any sampled-frame statistic is GROUP-CONSTANT and the argmax
#          would degenerate to min-id; the unsampled frames are where
#          group members actually differ.
#   audio: Σv² energy (the quality view's silence signal, here on the
#          dup corpus) — trim offset and DC remaster both move it, so a
#          class's loudest/cleanest master wins over its derivates.
#
# One decode pass per modality: a fused kernel emits the containment
# fingerprint AND the quality signal into a single checkpoint leaf (the
# _phash_quality_index discipline), and everything downstream is JVM
# expressions — groups ride `min_label_components` over the edge subgraph,
# the argmax runs per label, singletons self-represent.

def _frame_phash_tgrays(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(k, frame_no, fphash, tgray) per sampled frame in ONE decode pass:
    the sampled-frame phashes (identical math to `_frame_phashes`) plus
    the whole-clip ALL-frames gray total repeated per row (gray <= 765 a
    pixel, 8*256 pixels a clip -> tgray <= ~1.6e6, far inside int64)."""
    from ..engine.verify import _phash_batch

    side = MM_SIDE
    nf = len(_VID_FRAME_NOS)
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        px = full[:, _MM_HDR:].reshape(n, MM_FRAMES, side, side, 3)
        sampled = px[:, ::FRAME_STRIDE].reshape(n * nf, side, side, 3)
        tgray = px.astype(np.int64).sum(axis=(1, 2, 3, 4))
        yield pd.DataFrame(
            {
                "k": np.repeat(
                    pdf["video_id"].str.slice(3).astype(np.int64).to_numpy(), nf
                ),
                "frame_no": np.tile(_VID_FRAME_NOS, n),
                "fphash": _phash_batch(sampled),
                "tgray": np.repeat(tgray, nf),
            }
        )


def _video_rep_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = max(table_rows(sf_dir, "documents") // 4, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_video_corpus, schema=VIDEO_SCHEMA
    )
    return corpus.mapInPandas(
        _frame_phash_tgrays, schema="k long, frame_no int, fphash long, tgray long"
    ).localCheckpoint(eager=True)


def _audio_rep_fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(k, win_no, ahash, wen) per window in ONE decode pass: the sign
    fingerprints (identical math to `_audio_fingerprints`) plus the exact
    per-window energy Σv² (v² <= ~4.2e6, 64 samples a window -> wen <=
    ~2.7e8; the clip total stays <= ~4.3e9, far inside int64)."""
    for pdf in batches:
        n = len(pdf)
        if not n:
            continue
        blobs = pdf["bytes"].to_numpy()
        full = np.stack([np.frombuffer(b, np.uint8) for b in blobs])
        pcm = (
            np.ascontiguousarray(full[:, _MM_HDR:])
            .view("<i2")
            .reshape(n, N_AUDIO_SAMPLES)
            .astype(np.int64)
        )
        wins = pcm.reshape(n * N_AUD_WINS, AUD_WIN)
        packed = np.packbits((wins > 0).astype(np.uint8), axis=1)
        yield pd.DataFrame(
            {
                "k": np.repeat(
                    pdf["clip_id"].str.slice(3).astype(np.int64).to_numpy(),
                    N_AUD_WINS,
                ),
                "win_no": np.tile(np.arange(N_AUD_WINS, dtype=np.int32), n),
                "ahash": packed.view(">u8")[:, 0].astype(np.uint64).view(np.int64),
                "wen": np.einsum("nw,nw->n", wins, wins),
            }
        )


def _audio_rep_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = max(table_rows(sf_dir, "documents") // 4, 1)
    n_classes = max((n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS, 1)
    corpus = spark.range(0, n, 1, 8).mapInPandas(
        _gen_audio_dup_corpus(n_classes), schema=AUDIO_SCHEMA
    )
    return corpus.mapInPandas(
        _audio_rep_fps, schema="k long, win_no int, ahash long, wen long"
    ).localCheckpoint(eager=True)


def _containment_best_rep(idx: DataFrame, hash_col: str, unit_col: str,
                          match_min: int, scored: DataFrame,
                          prefix: str, id_name: str,
                          max_iters: int = 16) -> DataFrame:
    """Shared argmax-per-duplicate-class kernel for the clip modalities
    (`mm_best_rep_frames`'s shape over `_containment_edges` instead of
    `_phash_edges`): `scored` is a (k, score) frame derived from the SAME
    checkpoint leaf as `idx`."""
    from .dedup import min_label_components

    edges = _containment_edges(idx, hash_col, unit_col, match_min).select(
        F.col("ka").alias("doc_a"), F.col("kb").alias("doc_b")
    )
    labels = min_label_components(edges, max_iters)
    sized = labels.join(
        labels.groupBy("label").agg(F.count("*").alias("group_size")), "label"
    )
    best = (
        labels.join(scored, labels["doc_id"] == scored["k"])
        .groupBy("label")
        .agg(F.max(F.struct(F.col("score"), (-F.col("k")).alias("nk"))).alias("m"))
        .select("label", (-F.col("m.nk")).alias("rep_k"))
    )
    items = idx.select("k").distinct()
    return (
        items.join(sized, items["k"] == sized["doc_id"], "left")
        .join(scored, "k")
        .join(best, "label", "left")
        .select(
            F.concat(F.lit(prefix), F.col("k").cast("string")).alias(id_name),
            F.concat(
                F.lit(prefix), F.coalesce("label", F.col("k")).cast("string")
            ).alias("group_id"),
            F.coalesce("group_size", F.lit(1)).cast("long").alias("group_size"),
            F.concat(
                F.lit(prefix), F.coalesce("rep_k", F.col("k")).cast("string")
            ).alias("rep_id"),
            (F.col("k") == F.coalesce("rep_k", F.col("k"))).alias("is_rep"),
            F.col("score").cast("long").alias("score"),
        )
    )


def mm_video_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _video_rep_index(spark, sf_dir)
    scored = idx.groupBy("k").agg(F.min("tgray").cast("long").alias("score"))
    return _containment_best_rep(
        idx.select("k", "frame_no", "fphash"), "fphash", "frame_no",
        VID_MATCH_MIN, scored, "vid", "video_id",
    )


def mm_audio_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _audio_rep_index(spark, sf_dir)
    scored = idx.groupBy("k").agg(F.sum("wen").cast("long").alias("score"))
    return _containment_best_rep(
        idx.select("k", "win_no", "ahash"), "ahash", "win_no",
        AUD_MATCH_MIN, scored, "aud", "clip_id",
    )


def _containment_best_rep_sql(band_ctes: str, hash_col: str, unit_col: str,
                              match_min: int, prefix: str, id_name: str,
                              score_sql: str, src_cte: str) -> str:
    """ONE twin generator for both clip-modality argmax reps, composing
    the identical edge + reachability CTEs as the groups twins plus a
    modality-specific exact-integer score CTE."""
    return f"""
WITH RECURSIVE {band_ctes},
um AS (
  SELECT DISTINCT a.k AS ka, a.{unit_col} AS ua, b.k AS kb
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.k < b.k
  WHERE bit_count(xor(a.{hash_col}, b.{hash_col})) <= {PHASH_HAM_MAX}
),
edges AS (SELECT ka, kb FROM um GROUP BY ka, kb HAVING count(*) >= {match_min}),
sym AS (SELECT ka AS a, kb AS b FROM edges
        UNION ALL SELECT kb AS a, ka AS b FROM edges),
kk AS (SELECT DISTINCT k FROM {src_cte}),
reach(v, r) AS (
  SELECT k AS v, k AS r FROM kk
  UNION
  SELECT s.b AS v, reach.r FROM reach JOIN sym s ON s.a = reach.v
),
grp AS (SELECT v AS k, min(r) AS gid FROM reach GROUP BY v),
gs AS (SELECT gid, count(*)::bigint AS group_size FROM grp GROUP BY gid),
sc AS ({score_sql}),
r AS (
  SELECT gid, k AS rep_k FROM (
    SELECT grp.gid, grp.k,
           row_number() OVER (
             PARTITION BY gid ORDER BY score DESC, grp.k ASC) AS rn
    FROM grp JOIN sc ON grp.k = sc.k
  ) WHERE rn = 1
)
SELECT '{prefix}' || grp.k AS {id_name},
       '{prefix}' || gid AS group_id,
       gs.group_size,
       '{prefix}' || r.rep_k AS rep_id,
       (grp.k = r.rep_k) AS is_rep,
       sc.score
FROM grp
JOIN gs USING (gid)
JOIN r USING (gid)
JOIN sc ON grp.k = sc.k
"""


VIDEO_BEST_REP_SQL = _containment_best_rep_sql(
    _VIDEO_BAND_CTES, "fphash", "f", VID_MATCH_MIN, "vid", "video_id",
    # ALL-frames gray total (ks is the band chain's clip id CTE; the band
    # chain's own g/tot cover sampled frames only)
    f"""SELECT k, sum((k*7919 + f.range*523 + i.range*131 + j.range*17) % 256
           + (k*7919 + f.range*523 + i.range*131 + j.range*17 + 101) % 256
           + (k*7919 + f.range*523 + i.range*131 + j.range*17 + 202) % 256
         )::bigint AS score
  FROM ks, range(0, {MM_FRAMES}) f, range(0, {MM_SIDE}) i, range(0, {MM_SIDE}) j
  GROUP BY k""",
    "ph",
)
AUDIO_BEST_REP_SQL = _containment_best_rep_sql(
    _AUDIO_BAND_CTES, "ahash", "w", AUD_MATCH_MIN, "aud", "clip_id",
    # Σv² energy over the dup-corpus closed form (s is the band chain's
    # sample CTE)
    "SELECT k, sum(v*v)::bigint AS score FROM s GROUP BY k",
    "ah",
)
