"""Source readers (SURVEY §2.1 S1-S9 analogs).

The reference's sources are an HTTP search API, `git clone`, `find`-based
file-tree scans, and UTF-8 file reads. Spark-side the same roles are:

  S1/S3  table scans      -> load_table / load_world (parquet; partition &
                             predicate pushdown come free from the format)
  S5/S7  payload fetch    -> read_binary_dir (spark.read.format('binaryFile'))
  S2     JSON decode      -> read_jsonl (schema-explicit, PERMISSIVE with
                             corrupt-record capture, no sampling pass);
                             read_csv carries the same contract for
                             delimited input
  S9     config           -> job params (crawler_spark.oracle.CrawlConfig)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..datagen import WORLD_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One testdata/world table. Plain parquet scan: Catalyst pushes filters
    and prunes columns into the reader (asserted in tests/test_plans.py)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_world(spark: SparkSession, world_dir: str) -> dict[str, DataFrame]:
    """All crawl-world tables written by datagen.write_world, with explicit
    schemas (never inferred — FIXTURES.md is the contract)."""
    out = {}
    for name, schema in WORLD_SCHEMAS.items():
        path = os.path.join(world_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.schema(schema).parquet(path)
    return out


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque binary payloads + metadata (path, modificationTime, length,
    content) — the multimodal ingestion path for image/audio/video files.
    Columns match Spark's binaryFile source; downstream decode is a
    mapInPandas stage (operators/multimodal.py)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Line-delimited JSON with an EXPLICIT schema (no inference pass over
    100 TB) and corrupt-record capture instead of row drops — the S2
    'panics on malformed' decode (search.rs:98-110) made total."""
    return (
        spark.read.schema(schema + ", _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True) -> DataFrame:
    """CSV with the same contract as read_jsonl: EXPLICIT schema (no
    driver-side inference scan) and PERMISSIVE corrupt-record capture — a
    malformed row lands in `_corrupt` with null data columns instead of
    being silently dropped or failing the job, so the caller audits bad
    input with a `_corrupt IS NOT NULL` filter (pushed to the scan)."""
    return (
        spark.read.schema(schema + ", _corrupt string")
        .option("header", "true" if header else "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
