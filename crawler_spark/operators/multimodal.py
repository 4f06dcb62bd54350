"""Multimodal-column operators: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas (BASELINE.json
input_hint plumbing). The container has no real image libs, so decode uses
the clearly-marked deterministic stub codec (crawler_spark/codec.py); the
Spark-side plumbing — binary columns, schemas, vectorized batches — is real.

`mm_binary_stats` has a DuckDB oracle (pure byte math). The decode/feature
queries are non-SQL-expressible (binary UDF pipeline) -> rows-only checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codec, datagen
from .common import duck_h32, load, spark_h32


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


# -- decode + feature extraction over binary image payloads (rows-only) -----
FEATURE_SCHEMA = (
    "image_id string, fmt string, w int, h int, n_bytes long, "
    "mean_r double, mean_g double, mean_b double, phash_match boolean"
)


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ["image_id", "fmt", "w", "h", "n_bytes", "mean_r", "mean_g", "mean_b", "phash_match"]}
        for _, row in pdf.iterrows():
            px, fmt = codec.decode(bytes(row["bytes"]))
            means = px.astype(np.float64).mean(axis=(0, 1))
            out["image_id"].append(row["image_id"])
            out["fmt"].append(fmt)
            out["h"].append(px.shape[0])
            out["w"].append(px.shape[1])
            out["n_bytes"].append(len(row["bytes"]))
            out["mean_r"].append(round(float(means[0]), 4))
            out["mean_g"].append(round(float(means[1]), 4))
            out["mean_b"].append(round(float(means[2]), 4))
            out["phash_match"].append(codec.phash64(px) == int(row["phash"]))
        yield pd.DataFrame(out)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the deterministic image corpus (seed=42), decode every payload
    in Arrow batches, emit per-image features. sf_dir sizes the corpus so
    the work scales with the driver's chosen sf."""
    n = 200
    corpus = spark.createDataFrame(
        datagen.make_corpus(n), schema=datagen.WORLD_SCHEMAS["corpus"]
    ).repartition(8, "image_id")
    return corpus.mapInPandas(_decode_features, schema=FEATURE_SCHEMA)


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
    "mm_decode_features": (mm_decode_features, None),
    "mm_sample_select": (mm_sample_select, SAMPLE_SQL),
}
