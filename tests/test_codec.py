"""Codec + payload-verify gates (BASELINE.json input_hint: PSNR>=40dB lossy,
exact lossless, byte-exact captions, phash equality)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark import codec, datagen
from crawler_spark.engine.verify import PSNR_EXACT, verify_fetched, verify_stats


def _pixels(seed=7, side=16):
    return np.random.default_rng(seed).integers(0, 256, (side, side, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    px = _pixels()
    out, fmt = codec.decode(codec.encode(px, "png"))
    assert fmt == "png"
    assert np.array_equal(out, px)


def test_jpg_lossy_in_psnr_band():
    px = _pixels()
    out, fmt = codec.decode(codec.encode(px, "jpg"))
    assert fmt == "jpg"
    assert not np.array_equal(out, px)  # genuinely lossy
    p = codec.psnr(px, out)
    assert 40.0 <= p < 60.0  # above the gate, below lossless


def test_psnr_math():
    px = _pixels()
    assert codec.psnr(px, px) == float("inf")
    worse = px.copy()
    worse[0, 0, 0] ^= 0xFF
    assert codec.psnr(px, worse) < float("inf")


def test_phash_stability_and_sensitivity():
    px = _pixels()
    assert codec.phash64(px) == codec.phash64(px.copy())
    other = _pixels(seed=8)
    assert codec.phash64(px) != codec.phash64(other)
    assert -(1 << 63) <= codec.phash64(px) < (1 << 63)


def test_phash_small_images_degrade_gracefully():
    """h<8 or w<8 must hash via the nearest-sampled 8x8 grid, not raise
    (regression: reshape ValueError for sub-8 dimensions)."""
    rng = np.random.default_rng(11)
    for shape in [(5, 5), (3, 12), (12, 3), (1, 1), (7, 64)]:
        px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        v = codec.phash64(px)
        assert v == codec.phash64(px.copy())
        assert -(1 << 63) <= v < (1 << 63)
    with pytest.raises(ValueError):
        codec.phash64(np.zeros((0, 4, 3), dtype=np.uint8))


def test_parse_k_overflow_matches_jvm_twin():
    """Digit runs past 18 map to -1 in BOTH twins (the JVM try_cast side
    already did; the Python side used to overflow np.int64 instead)."""
    from crawler_spark.engine.verify import parse_k

    assert parse_k("img7") == 7
    assert parse_k("img" + "9" * 18) == int("9" * 18)
    assert parse_k("img" + "9" * 19) == -1
    assert parse_k("img") == -1
    assert parse_k("img12x") == -1
    # Unicode digits pass str.isdigit() but the JVM twin's [0-9] rejects
    # them (and int('²') raises) — both sides must map them to -1
    assert parse_k("img٣") == -1  # ARABIC-INDIC THREE
    assert parse_k("img²") == -1  # SUPERSCRIPT TWO
    assert parse_k("img1٨3") == -1  # mixed ASCII + EXTENDED ARABIC-INDIC
    # and it must build an int64 array without raising
    np.array([parse_k("img" + "9" * 40)], dtype=np.int64)


def test_prefetch_pump_exits_on_abandoned_consumer():
    """Abandoning the _prefetch iterator early (task kill / limit) must not
    leak the pump thread blocked on a full queue."""
    import threading
    import time

    from crawler_spark.engine.verify import _prefetch

    before = set(threading.enumerate())
    g = _prefetch(iter(range(1000)), depth=2)
    assert next(g) == 0
    g.close()  # GeneratorExit -> finally sets the stop event
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"pump thread leaked: {leaked}"


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        codec.encode(_pixels(), "webp")
    with pytest.raises(NotImplementedError):
        codec.decode(b"NOPE" + b"\x00" * 64)


def test_verify_fetched_all_ok(spark):
    corpus = datagen.make_corpus(24)
    sdf = spark.createDataFrame(corpus, schema=datagen.WORLD_SCHEMAS["corpus"])
    fetched = sdf.select(
        F.lit(1).alias("round"),
        F.xxhash64("image_id").alias("url_id"),
        "image_id", "bytes", "fmt", "caption", "phash",
    )
    res = verify_fetched(fetched).toPandas()
    assert len(res) == 24
    assert res["psnr_ok"].all()
    assert res["caption_ok"].all()
    assert res["phash_ok"].all()
    assert (res.loc[res["fmt"] == "png", "psnr_db"] == PSNR_EXACT).all()
    jpg = res.loc[res["fmt"] == "jpg", "psnr_db"]
    assert ((jpg >= 40.0) & (jpg < PSNR_EXACT)).all()


def test_verify_fetched_catches_corruption(spark):
    corpus = datagen.make_corpus(4)
    # corrupt one payload byte well inside the pixel buffer + one caption
    corrupt = corpus.copy()
    b = bytearray(corrupt.loc[0, "bytes"])
    b[-1] ^= 0xFF
    corrupt.loc[0, "bytes"] = bytes(b)
    corrupt.loc[1, "caption"] = corrupt.loc[1, "caption"] + "!"
    sdf = spark.createDataFrame(corrupt, schema=datagen.WORLD_SCHEMAS["corpus"])
    fetched = sdf.select(
        F.lit(1).alias("round"),
        F.xxhash64("image_id").alias("url_id"),
        "image_id", "bytes", "fmt", "caption", "phash",
    )
    res = verify_fetched(fetched).orderBy("image_id").toPandas().set_index("image_id")
    assert not res.loc["img0", "psnr_ok"]  # png must decode byte-exact
    assert not res.loc["img1", "caption_ok"]
    assert res.loc["img2", "psnr_ok"] and res.loc["img3", "psnr_ok"]


def test_verify_stats_matches_per_row(spark):
    """The aggregate form (JVM k-parse + caption twin, per-batch count fold)
    must agree with the per-row API on every counter — including corrupted
    payloads, corrupted captions, and a malformed image_id."""
    corpus = datagen.make_corpus(8)
    corrupt = corpus.copy()
    b = bytearray(corrupt.loc[0, "bytes"])
    b[-1] ^= 0xFF
    corrupt.loc[0, "bytes"] = bytes(b)
    corrupt.loc[1, "caption"] = corrupt.loc[1, "caption"] + "!"
    corrupt.loc[2, "image_id"] = "not-an-image-id"
    corrupt.loc[3, "bytes"] = corrupt.loc[3, "bytes"][:10]  # truncated
    sdf = spark.createDataFrame(corrupt, schema=datagen.WORLD_SCHEMAS["corpus"])
    fetched = sdf.select(
        F.lit(1).alias("round"),
        F.xxhash64("image_id").alias("url_id"),
        "image_id", "bytes", "fmt", "caption", "phash",
    )
    per_row = verify_fetched(fetched).toPandas()
    stats = verify_stats(fetched).collect()[0]
    assert stats["n"] == len(per_row) == 8
    assert stats["n_psnr_ok"] == int(per_row["psnr_ok"].sum())
    assert stats["n_caption_ok"] == int(per_row["caption_ok"].sum())
    assert stats["n_phash_ok"] == int(per_row["phash_ok"].sum())
    assert stats["n_ok"] == int(
        (per_row["psnr_ok"] & per_row["caption_ok"] & per_row["phash_ok"]).sum()
    )
    assert stats["n_ok"] == 4  # rows 4-7 untouched
