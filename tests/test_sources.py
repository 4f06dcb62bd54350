"""Source readers (SURVEY §2.1): binaryFile payload ingestion round-trip
(S5/S7) and schema-explicit JSONL decode with corrupt-record capture (S2)."""

from __future__ import annotations

import os

import numpy as np

from crawler_spark import codec
from crawler_spark.sources.readers import read_binary_dir, read_jsonl


def test_binary_dir_payload_roundtrip(spark, tmp_path):
    """Files written by the stub codec come back byte-exact through the
    binaryFile source and decode to the original pixels."""
    d = tmp_path / "imgs"
    d.mkdir()
    originals = {}
    for k in range(6):
        rng = np.random.default_rng(1000 + k)
        px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        fmt = "jpg" if k % 2 else "png"
        blob = codec.encode(px, fmt)
        (d / f"img{k}.{fmt}").write_bytes(blob)
        originals[f"img{k}.{fmt}"] = (px, fmt, blob)

    df = read_binary_dir(spark, str(d))
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == set(originals)
    for name, (px, fmt, blob) in originals.items():
        got = bytes(rows[name]["content"])
        assert got == blob  # byte-exact through the source
        assert rows[name]["length"] == len(blob)
        decoded, dfmt = codec.decode(got)
        assert dfmt == fmt
        if fmt == "png":
            assert np.array_equal(decoded, px)
        else:  # lossy: bounded quantization error, PSNR above the gate
            assert codec.psnr(px, decoded) >= 40.0

    # glob filtering reaches the source (partition-level file pruning)
    only_png = read_binary_dir(spark, str(d), glob="*.png")
    assert only_png.count() == 3


def test_jsonl_corrupt_capture(spark, tmp_path):
    """Malformed lines land in _corrupt instead of being dropped or
    poisoning the scan (the S2 decode made total, search.rs:98-110)."""
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"url": "http://a.example/x", "stars": 10}\n'
        "THIS IS NOT JSON\n"
        '{"url": "http://b.example/y", "stars": 7}\n'
    )
    df = read_jsonl(spark, str(p), "url string, stars int").cache()
    good = df.filter(df._corrupt.isNull())
    bad = df.filter(df._corrupt.isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.collect()[0]["_corrupt"].startswith("THIS")
    assert {r["url"] for r in good.collect()} == {
        "http://a.example/x", "http://b.example/y"
    }
    df.unpersist()


def test_csv_corrupt_capture(spark, tmp_path):
    """read_csv shares read_jsonl's contract: explicit schema, malformed
    rows captured in _corrupt (extra columns / unparsable types), good
    rows typed."""
    from crawler_spark.sources.readers import read_csv

    p = tmp_path / "in.csv"
    p.write_text(
        "url,stars\n"
        "http://a.example/x,10\n"
        "http://bad.example/z,not_a_number\n"
        "http://b.example/y,7\n"
    )
    df = read_csv(spark, str(p), "url string, stars int").cache()
    good = df.filter(df._corrupt.isNull())
    bad = df.filter(df._corrupt.isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt"]
    assert {r["stars"] for r in good.collect()} == {10, 7}
    df.unpersist()
