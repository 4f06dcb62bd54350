"""Engine-vs-oracle parity: per-round fetch ORDER (trace), final seen-set,
and lineage counters must match the pure-Python simulator EXACTLY — at two
parallelism levels (local[8] vs local[32], the sandbox N-vs-4N evidence per
BASELINE.json north_rule). Reference semantics: crawler/src/runner/run.rs,
search.rs (see crawler_spark/oracle.py docstring)."""

from __future__ import annotations

import pandas as pd
import pytest

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.oracle import CrawlConfig, simulate

from .conftest import spark_at

WORLDS = {
    "chain": (datagen.world_chain, CrawlConfig(page_size=4, tries=2, max_rounds=50)),
    "many": (datagen.world_many, CrawlConfig(page_size=4, tries=2, max_rounds=50)),
    "many_system": (datagen.world_many_system, CrawlConfig(page_size=4, tries=2, max_rounds=50)),
    "dup_storm": (datagen.world_dup_storm, CrawlConfig(page_size=4, tries=2, max_rounds=50)),
    "politeness": (datagen.world_politeness, CrawlConfig(page_size=10, tries=2, max_rounds=50)),
}


def assert_parity(spark, world: dict[str, pd.DataFrame], cfg: CrawlConfig, **kw):
    o = simulate(world, cfg)
    r = crawl(spark, datagen.to_spark(spark, world), cfg, **kw)
    assert o.rounds == r.rounds
    ot = o.trace.reset_index(drop=True)
    rt = (
        r.trace[["round", "seq", "url_id"]]
        .astype({"round": "int64", "seq": "int64", "url_id": "int64"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ot.astype("int64"), rt)
    os_ = o.seen.sort_values("url_id").reset_index(drop=True)
    rs = (
        r.seen.sort_values("url_id")
        .reset_index(drop=True)
        .astype({"url_id": "int64", "round": "int64"})
    )
    pd.testing.assert_frame_equal(os_, rs)
    pd.testing.assert_frame_equal(
        o.lineage.astype("int64").reset_index(drop=True),
        r.lineage.astype("int64").reset_index(drop=True),
    )
    return o, r


@pytest.mark.parametrize("name", list(WORLDS))
def test_mini_world_parity_local32(name):
    make, cfg = WORLDS[name]
    assert_parity(spark_at(32), make(), cfg)


def test_generated_world_parity_local32():
    w = datagen.make_world(n_urls=300, n_hosts=10, n_images=20, with_corpus=False)
    assert_parity(spark_at(32), w, CrawlConfig(page_size=25, tries=2, max_rounds=100))


def test_max_depth_parity_local32():
    """Depth is carried in the frontier (parent+1, first non-capped parent
    in attempt order) and the max_depth cap drops too-deep discoveries
    identically in engine and oracle (n_depth_capped lineage)."""
    w = datagen.make_world(n_urls=300, n_hosts=10, n_images=20, with_corpus=False)
    cfg = CrawlConfig(page_size=25, tries=2, max_rounds=100, max_depth=2)
    o, r = assert_parity(spark_at(32), w, cfg)
    # the cap must actually bind on this world — otherwise the test is vacuous
    assert o.lineage["n_depth_capped"].sum() > 0
    # and the capped crawl resolves fewer URLs than the uncapped one
    o_uncapped = simulate(w, CrawlConfig(page_size=25, tries=2, max_rounds=100))
    assert len(o.seen) < len(o_uncapped.seen)


def test_host_rank_priority_parity_local32():
    """rank_alpha > 0: host authority mixes into every ENQUEUED discovery's
    priority (oracle step 7) — trace/seen/lineage stay exactly parity, and
    the fetch ORDER actually differs from the unmixed crawl (the knob
    binds; a vacuous mix would make this test meaningless)."""
    w = datagen.make_world(n_urls=300, n_hosts=10, n_images=20, with_corpus=False)
    cfg = CrawlConfig(page_size=25, tries=2, max_rounds=100, rank_alpha=8)
    o_ranked, _ = assert_parity(spark_at(32), w, cfg)
    o_plain = simulate(w, CrawlConfig(page_size=25, tries=2, max_rounds=100))
    assert not o_ranked.trace.equals(o_plain.trace)
    # same pages resolve in the end — the mix reorders, it doesn't drop
    assert sorted(o_ranked.seen["url_id"]) == sorted(o_plain.seen["url_id"])


def test_host_rank_priority_parity_local8():
    """Same ranked crawl at 1/4 cores: identical result (the mixed priority
    is one deterministic float per row, partition-invariant)."""
    w = datagen.make_world(n_urls=300, n_hosts=10, n_images=20, with_corpus=False)
    cfg = CrawlConfig(page_size=25, tries=2, max_rounds=100, rank_alpha=8)
    assert_parity(spark_at(8), w, cfg)


def test_generated_world_parity_local8_same_result():
    """Same world at 1/4 the cores: identical trace/seen/lineage — order is
    partition-invariant (the N vs 4N determinism half of the scaling rule)."""
    w = datagen.make_world(n_urls=300, n_hosts=10, n_images=20, with_corpus=False)
    assert_parity(spark_at(8), w, CrawlConfig(page_size=25, tries=2, max_rounds=100))


def test_mini_world_parity_local8():
    make, cfg = WORLDS["many"]
    assert_parity(spark_at(8), make(), cfg)
