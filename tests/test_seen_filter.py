"""Bloom seen-filter: unit invariants (no false negatives) + full-crawl
parity with the filter enabled — results must be bit-identical to the
filterless run (the filter is an optimization, never correctness)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_spark import datagen
from crawler_spark.engine import seen_filter as sf
from crawler_spark.engine.crawl import crawl
from crawler_spark.engine.seen_filter import BloomSeenFilter
from crawler_spark.oracle import CrawlConfig, simulate


def test_bits_no_false_negatives_and_low_fp_rate():
    rng = np.random.default_rng(42)
    ids = rng.integers(-(1 << 62), 1 << 62, size=5000, dtype=np.int64)
    n_bits = 1 << 17  # ~2.6 bits/id... use bigger for fp-rate check
    n_bits = 1 << 18
    bits = sf._build_bits(ids, n_bits, 4)
    assert sf._probe_bits(ids, bits, 4).all()  # every inserted id hits
    others = rng.integers(-(1 << 62), 1 << 62, size=20000, dtype=np.int64)
    others = others[~np.isin(others, ids)]
    fp = sf._probe_bits(others, bits, 4).mean()
    assert fp < 0.05, fp


def test_split_partitions_frontier(spark):
    w = datagen.make_world(n_urls=300, n_hosts=8, n_images=10, with_corpus=False)
    from crawler_spark.engine import round as round_mod
    from crawler_spark.oracle import CrawlConfig as CC

    world = round_mod.prepare_world(spark, datagen.to_spark(spark, w), CC())
    frontier = world.pages.select(
        "url_id", "url", "host", "host_bucket", "priority"
    )
    filt = BloomSeenFilter(spark, bits_per_bucket=1 << 14)
    # no filter yet -> everything definitely-new
    maybe, new = filt.split(frontier)
    assert maybe.count() == 0 and new.count() == 300

    # insert a third of ids; they must all land on the maybe side
    seen_part = frontier.limit(100).select("url_id", "host_bucket")
    filt.update(seen_part)
    maybe2, new2 = filt.split(frontier)
    m_ids = {r["url_id"] for r in maybe2.select("url_id").collect()}
    s_ids = {r["url_id"] for r in seen_part.collect()}
    assert s_ids <= m_ids  # no false negatives
    assert maybe2.count() + new2.count() == 300


def test_crawl_parity_with_prefilter(spark):
    w = datagen.make_world(n_urls=300, n_hosts=10, n_images=20, with_corpus=False)
    cfg = CrawlConfig(page_size=25, tries=2, max_rounds=100)
    o = simulate(w, cfg)
    filt = BloomSeenFilter(spark, bits_per_bucket=1 << 14)
    r = crawl(spark, datagen.to_spark(spark, w), cfg, seen_prefilter=filt)
    assert o.rounds == r.rounds
    pd.testing.assert_frame_equal(
        o.trace.astype("int64"),
        r.trace[["round", "seq", "url_id"]].astype("int64").reset_index(drop=True),
    )
    pd.testing.assert_frame_equal(
        o.seen.sort_values("url_id").reset_index(drop=True),
        r.seen.sort_values("url_id").reset_index(drop=True).astype({"url_id": "int64", "round": "int64"}),
    )
    pd.testing.assert_frame_equal(
        o.lineage.astype("int64"), r.lineage.astype("int64").reset_index(drop=True)
    )


def test_jvm_mark_matches_numpy_probe(spark):
    """The codegen probe (mark()) and the numpy probe (_probe_bits) must
    agree row-for-row — they are twins of the same xxhash64-slice plan."""
    rng = np.random.default_rng(11)
    ids = rng.integers(-(1 << 62), 1 << 62, size=4000, dtype=np.int64)
    buckets = rng.integers(0, 8, size=4000)
    rows = [(int(i), int(b)) for i, b in zip(ids, buckets)]
    frontier = spark.createDataFrame(rows, "url_id long, host_bucket int")
    filt = BloomSeenFilter(spark, bits_per_bucket=1 << 12)
    seen = frontier.filter("pmod(url_id, 3) = 0")
    filt.rebuild(seen)
    got = {
        r["url_id"]: r["_pf"]
        for r in filt.mark(frontier).select("url_id", "_pf").collect()
    }
    # numpy expectation, per bucket
    bitsets = {
        r["host_bucket"]: np.asarray(r["bits"], dtype=np.int64)
        for r in filt.filter_df.collect()
    }
    for i, b in rows:
        if b in bitsets:
            exp = bool(sf._probe_bits(np.array([i], dtype=np.int64), bitsets[b], 4)[0])
        else:
            exp = False
        assert got[i] == exp, (i, b)
    # and still zero false negatives through the JVM path
    seen_ids = {r["url_id"] for r in seen.collect()}
    assert all(got[i] for i in seen_ids)


def test_save_load_bit_exact_with_catchup(spark, tmp_path):
    """save() then load() with a post-watermark catch-up must reproduce the
    EXACT word arrays a from-scratch rebuild over all rounds produces — the
    bitsets are pure functions of the id set, so any divergence is a
    correctness bug (a missed OR = a potential false negative)."""
    rng = np.random.default_rng(7)

    def seen_rows(n, round_no):
        ids = rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "url_id": ids,
                    "host_bucket": (ids % 8 + 8) % 8,
                    "status": "fetched",
                    "round": round_no,
                }
            ),
            "url_id long, host_bucket int, status string, round int",
        )

    early = seen_rows(2000, 1).unionByName(seen_rows(2000, 2))
    late = seen_rows(1500, 3)

    a = BloomSeenFilter(spark, bits_per_bucket=1 << 12)
    a.rebuild(early)
    a.save(str(tmp_path / "bloom"), upto_round=2)

    b = BloomSeenFilter(spark, bits_per_bucket=1 << 12)
    assert b.load(str(tmp_path / "bloom"), early.unionByName(late))

    c = BloomSeenFilter(spark, bits_per_bucket=1 << 12)
    c.rebuild(early.unionByName(late))

    def words(f):
        return {
            r.host_bucket: np.asarray(r.bits, dtype=np.int64)
            for r in f.filter_df.collect()
        }

    wb, wc = words(b), words(c)
    assert set(wb) == set(wc)
    for k in wc:
        assert np.array_equal(wb[k], wc[k]), f"bucket {k} diverged"
