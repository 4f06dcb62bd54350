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


# exact integer milli-bits log2: 1000*floor(log2 n) plus a LINEAR-mantissa
# fractional part, 1000*(n - 2^b) div 2^b with b = floor(log2 n). No float
# log anywhere (the text_surprisal contract: float ln diverges in the last
# ulp across engines/partitionings), yet ~1/1000-bit resolution instead of
# the whole-bit quantization that made the first BM25 idf draft vacuous
# (df ~ N rounded every weight to exactly 0). The linear mantissa under-
# estimates log2 by at most 0.086 bits (max at n = 1.44*2^b) — a SCORING
# approximation, not a parity risk: all three twins (Spark / DuckDB /
# py_mlog2) compute the identical integer, property-tested in
# tests/test_ungated_oracles.py. Domain n >= 1; int64-safe for
# n <= (2^63-1)/1000 ~ 9.2e15 (any realistic count: 100 TB of text is
# ~2.5e13 tokens).
def spark_mlog2(expr: str) -> str:
    b = f"(length(bin({expr})) - 1)"
    p = f"shiftleft(cast(1 as bigint), {b})"
    return f"(1000 * {b} + (1000 * (({expr}) - {p})) div {p})"


def duck_mlog2(expr: str) -> str:
    b = f"(length(bin({expr})) - 1)"
    p = f"(1::BIGINT << {b})"
    return f"(1000 * {b} + (1000 * (({expr}) - {p})) // {p})"


def py_mlog2(n: int) -> int:
    b = n.bit_length() - 1
    return 1000 * b + (1000 * (n - (1 << b))) // (1 << b)


# exact integer square root twins: floor(sqrt(n)) for a nonnegative bigint.
# Seeded from the double sqrt — within 1 of the true root for n < 2^52,
# where a double still represents n exactly and sqrt is correctly rounded,
# so ONE correction in each direction restores exactness — and guarded
# loudly past that bound in both engines (the packed-key precedent: an
# off-by-one here would silently skew every temperature weight). This is
# the τ = 2 temperature-sampling primitive: n^(1/τ) = isqrt(n) keeps the
# whole rate table in exact int64 arithmetic (the mlog2 philosophy —
# float pow/sqrt folds diverge in the last ulp across engines).
# Property-tested against math.isqrt in tests/test_ungated_oracles.py.
_ISQRT_CAP = 1 << 52


def spark_isqrt(expr: str) -> str:
    s0 = f"cast(sqrt(cast(({expr}) as double)) as bigint)"
    s1 = f"({s0} - (case when {s0} * {s0} > ({expr}) then 1 else 0 end))"
    w = f"({s1} + (case when ({s1} + 1) * ({s1} + 1) <= ({expr}) then 1 else 0 end))"
    return (
        f"case when ({expr}) >= 0 and ({expr}) < {_ISQRT_CAP} then {w} "
        f"else cast(raise_error('isqrt: n outside [0, 2^52) - the double "
        f"seed is no longer within 1 of the true root') as bigint) end"
    )


def duck_isqrt(expr: str) -> str:
    s0 = f"floor(sqrt(({expr})::double))::bigint"
    s1 = f"({s0} - (CASE WHEN {s0} * {s0} > ({expr}) THEN 1 ELSE 0 END))"
    w = f"({s1} + (CASE WHEN ({s1} + 1) * ({s1} + 1) <= ({expr}) THEN 1 ELSE 0 END))"
    return (
        f"CASE WHEN ({expr}) >= 0 AND ({expr}) < {_ISQRT_CAP} THEN {w} "
        f"ELSE error('isqrt: n outside [0, 2^52)') END"
    )
