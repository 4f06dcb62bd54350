"""Shared helpers for the driver-contract query catalog.

Every query is a pair ``(builder, oracle_sql)`` where the builder is
``(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the ANSI-SQL twin
DuckDB runs on the same parquet files. The cross-engine contract:

 * column NAMES identical (driver sorts columns by name before hashing);
 * floats rounded in BOTH engines (summation-order noise);
 * aggregate ints cast to bigint in DuckDB (sum() is HUGEINT there);
 * token hash = first 8 hex chars of md5 as a bigint — verified identical
   between Spark ``conv(substring(md5(x),1,8),16,10)`` and DuckDB
   ``('0x' || substr(md5(x),1,8))::bigint``;
 * polynomial char hash = fold (acc*31 + ascii(c)) % 1e9+7 — verified
   identical between Spark ``aggregate(split(s,''),0L,...)`` and DuckDB
   ``list_reduce(list_prepend(0, ...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

POLY_MOD = 1_000_000_007


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources import load_table

    return load_table(spark, sf_dir, name)


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footers only — no Spark job. Sizing decisions
    (e.g. the multimodal pattern-corpus cardinality) need |table| but not a
    cluster scan: footers are KBs per file even on a 100 TB table."""
    import os

    import pyarrow.dataset as ds

    path = os.path.join(sf_dir, f"{name}.parquet")
    return ds.dataset(path, format="parquet").count_rows()


# word tokens of a text column, identical in both engines
def spark_tokens(col: str) -> str:
    return f"filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"


def duck_tokens(col: str) -> str:
    return f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


SPARK_TOKENS = spark_tokens("text")
DUCK_TOKENS = duck_tokens("text")

# 32-bit token hash from md5 hex
def spark_h32(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}),1,8),16,10) as bigint)"


def duck_h32(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}),1,8))::bigint)"


# 60-bit md5 slice (15 hex chars — stays inside int64): for hash-first
# two-pass ops where a 32-bit space would saturate (e.g. mining over
# billions of distinct n-grams, birthday collisions at ~2^16 keys for h32
# vs ~2^30 for h60); same construction as the h32 twins so parity is
# engine-exact
def spark_h60(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}),1,15),16,10) as bigint)"


def duck_h60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}),1,15))::bigint)"


# polynomial char hash (whole-string fingerprint)
def spark_polyhash(expr: str) -> str:
    return f"aggregate(split({expr},''), 0L, (acc,c) -> (acc*31 + ascii(c)) % {POLY_MOD})"


def duck_polyhash(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::bigint, list_transform(string_split({expr},''), "
        f"c -> ascii(c)::bigint)), (acc,c) -> (acc*31 + c) % {POLY_MOD})"
    )
