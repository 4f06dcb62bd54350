"""Lineage conservation + no-refetch properties (SURVEY §5.4).

Per-round flow conservation over the frontier and the global guarantee that
no URL is ever fetched twice (the whole point of the seen-set,
crawler/src/runner/run.rs:74-89)."""

from __future__ import annotations

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.oracle import CrawlConfig, simulate


def _check_lineage(lineage, trace, seen):
    rows = lineage.sort_values("round").to_dict("records")
    for i, ln in enumerate(rows):
        # attempts split exactly into outcomes
        assert ln["n_attempts"] == ln["n_fetched"] + ln["n_retry"] + ln["n_exhausted"]
        # frontier flow: next eligible = this - terminals + discoveries
        if i + 1 < len(rows):
            expected = (
                ln["n_eligible"] - ln["n_dedup"] - ln["n_denied"]
                - ln["n_fetched"] - ln["n_exhausted"] + ln["n_discovered"]
            )
            assert rows[i + 1]["n_eligible"] == expected, f"round {ln['round']}"
    # one trace row per attempt
    per_round = trace.groupby("round").size().to_dict()
    for ln in rows:
        assert per_round.get(ln["round"], 0) == ln["n_attempts"]
    # no URL enters seen twice; every seen id appears at most once in fetched status
    assert seen["url_id"].is_unique
    # total fetched == seen rows with status fetched
    assert sum(r["n_fetched"] for r in rows) == (seen["status"] == "fetched").sum()
    assert sum(r["n_exhausted"] for r in rows) == (seen["status"] == "exhausted").sum()
    assert sum(r["n_denied"] for r in rows) == (seen["status"] == "denied").sum()


def test_engine_lineage_conservation(spark):
    w = datagen.make_world(n_urls=200, n_hosts=8, n_images=20, with_corpus=False)
    r = crawl(spark, datagen.to_spark(spark, w), CrawlConfig(page_size=20, tries=2, max_rounds=100))
    _check_lineage(r.lineage, r.trace, r.seen)


def test_oracle_lineage_conservation():
    w = datagen.make_world(n_urls=200, n_hosts=8, n_images=20, seed=7, with_corpus=False)
    o = simulate(w, CrawlConfig(page_size=20, tries=2, max_rounds=100))
    _check_lineage(o.lineage, o.trace, o.seen)


def test_no_url_fetched_twice(spark):
    w = datagen.make_world(n_urls=200, n_hosts=8, n_images=20, with_corpus=False)
    r = crawl(spark, datagen.to_spark(spark, w), CrawlConfig(page_size=20, tries=2, max_rounds=100))
    fetched = r.store.fetched().toPandas()
    assert fetched["url_id"].is_unique
