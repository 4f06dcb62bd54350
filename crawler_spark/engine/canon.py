"""Spark-side (JVM, codegen-friendly) URL canonicalization + ids.

Built-in-function twin of ``crawler_spark.ids.canonicalize_url`` — NO Python
UDF in this hot path (input_hint: no per-row Python). Property-tested for
byte-equality with the Python version in tests/test_canon.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canon_url(col: Column) -> Column:
    """Strip fragment, lower-case scheme+host, drop one trailing slash (only
    when a path is present, i.e. more than 3 '/' total)."""
    no_frag = F.substring_index(F.trim(col), "#", 1)
    has_scheme = no_frag.contains("://")
    scheme = F.lower(F.substring_index(no_frag, "://", 1))
    rest = F.substring(no_frag, F.length(scheme) + 4, F.lit(1 << 30))
    host = F.lower(F.substring_index(rest, "/", 1))
    path = F.substring(rest, F.length(host) + 1, F.lit(1 << 30))  # '' or '/...'
    rebuilt = F.concat(scheme, F.lit("://"), host, path)
    canon = F.when(has_scheme, rebuilt).otherwise(no_frag)
    n_slash = F.size(F.split(canon, "/")) - 1
    return F.when(
        canon.endswith("/") & (n_slash > 3), F.substring(canon, 1, F.length(canon) - 1)
    ).otherwise(canon)


def url_id(col: Column) -> Column:
    """xxhash64(canonical url) — Spark's built-in, seed 42 (ids.py twin)."""
    return F.xxhash64(canon_url(col))


def host_of(canon: Column) -> Column:
    return F.substring_index(F.substring_index(canon, "://", -1), "/", 1)


def path_of(canon: Column) -> Column:
    rest = F.substring_index(canon, "://", -1)
    h = F.substring_index(rest, "/", 1)
    p = F.substring(rest, F.length(h) + 1, F.lit(1 << 30))
    return F.when(F.length(p) > 0, p).otherwise(F.lit("/"))


def host_bucket(host: Column, n_buckets: int) -> Column:
    """Host-hash partition key: bounds per-host politeness state to one
    partition (reference two-level pools, run.rs:37-53 -> partitions)."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")
