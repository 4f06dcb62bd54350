"""Python/Spark twin equivalence for ids + canonicalization (SURVEY §2.8 X11).

The whole parity story rests on `ids.xxhash64 == F.xxhash64` and
`ids.canonicalize_url == engine.canon.canon_url` byte-for-byte — these tests
pin that contract.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark import ids
from crawler_spark.engine import canon

URLS = [
    "http://Host0.Example/page/p1",
    "http://host1.example/page/p2#frag",
    "HTTPS://HOST2.EXAMPLE/a/b/c/",
    "http://host3.example/",
    "http://host4.example",
    "http://host5.example/page/p7/",
    "ftp://mixed.CASE.example/Path/Keeps/Case#x",
    "http://dangling.example/missing/42",
    "",
    "no-scheme-at-all",
    "http://h.example/p?q=1#frag",
]


def test_canonicalize_python_examples():
    assert ids.canonicalize_url("http://A.B/x/") == "http://a.b/x"
    assert ids.canonicalize_url("http://a.b/x#f") == "http://a.b/x"
    assert ids.canonicalize_url("http://a.b/") == "http://a.b/"  # root slash kept
    assert ids.canonicalize_url("http://a.b/X/Y") == "http://a.b/X/Y"  # path case kept


def test_canon_twins_on_examples(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = df.select(
        "url",
        canon.canon_url(F.col("url")).alias("c"),
        canon.url_id(F.col("url")).alias("uid"),
    ).collect()
    for row in got:
        assert row["c"] == ids.canonicalize_url(row["url"]), row["url"]
        assert row["uid"] == ids.url_id(row["url"]), row["url"]


def test_host_path_twins(spark):
    canon_urls = [ids.canonicalize_url(u) for u in URLS if "://" in u]
    df = spark.createDataFrame([(u,) for u in canon_urls], "url string")
    got = df.select(
        "url",
        canon.host_of(F.col("url")).alias("h"),
        canon.path_of(F.col("url")).alias("p"),
    ).collect()
    for row in got:
        assert row["h"] == ids.url_host(row["url"]), row["url"]
        assert row["p"] == ids.url_path(row["url"]), row["url"]


def test_xxhash64_matches_spark(spark):
    strings = ["", "a", "abc", "0123456789abcdef", "x" * 31, "y" * 32, "z" * 100] + URLS
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in strings:
        assert got[s] == ids.xxhash64(s), repr(s)


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_xxhash64_pure_python_props(s):
    h = ids.xxhash64(s)
    assert -(1 << 63) <= h < (1 << 63)
    assert h == ids.xxhash64(s)  # deterministic


def test_canonical_idempotent():
    for u in URLS:
        c = ids.canonicalize_url(u)
        assert ids.canonicalize_url(c) == c


def test_xxh64_long_vectorized_matches_scalar_twin():
    """The seen filter's vectorized numpy XXH64-of-a-long must equal the
    property-tested scalar twin on the little-endian 8 bytes (and thus
    Spark's xxhash64 on a LongType column)."""
    import struct

    import numpy as np

    from crawler_spark.engine.seen_filter import _xxh64_long

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(-(1 << 62), 1 << 62, size=200, dtype=np.int64),
            np.array([0, 1, -1, (1 << 63) - 1, -(1 << 63)], dtype=np.int64),
        ]
    )
    got = _xxh64_long(vals.view(np.uint64), 42).view(np.int64)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == ids.xxhash64(struct.pack("<q", v)), v
    # seed chaining (multi-arg xxhash64): XXH64(k, XXH64(v, 42))
    h0 = _xxh64_long(vals.view(np.uint64), 42)
    h1 = _xxh64_long(np.uint64(1), h0).view(np.int64)
    for v, h, g in zip(vals.tolist(), h0.view(np.int64).tolist(), h1.tolist()):
        assert g == ids.xxhash64(struct.pack("<q", 1), seed=h & ((1 << 64) - 1)), v
