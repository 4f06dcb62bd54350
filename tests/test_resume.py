"""Checkpoint/resume (SURVEY §2.9 P10): kill after round k, resume from the
manifest, and the final trace/seen/lineage must be identical to an
uninterrupted run. Mirrors the reference's idempotent-rerun resumability
(crawler/src/runner/db.rs:57-89, search.rs:120-124)."""

from __future__ import annotations

import dataclasses

import pandas as pd

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.oracle import CrawlConfig


def _norm(df: pd.DataFrame, sort_cols) -> pd.DataFrame:
    return (
        df.sort_values(sort_cols)
        .reset_index(drop=True)
        .astype({c: "int64" for c in df.columns if df[c].dtype.kind in "iu"})
    )


def test_resume_matches_uninterrupted(spark, tmp_path):
    w = datagen.make_world(n_urls=120, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)

    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    # interrupted: stop after 3 rounds, then resume to completion
    cut = dataclasses.replace(cfg, max_rounds=3)
    part = crawl(spark, sdf, cut, state_dir=str(tmp_path / "resume"))
    assert part.rounds == 3
    resumed = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "resume"), resume=True)

    assert resumed.rounds == full.rounds
    pd.testing.assert_frame_equal(
        _norm(full.trace, ["round", "seq"]), _norm(resumed.trace, ["round", "seq"])
    )
    pd.testing.assert_frame_equal(
        _norm(full.seen, ["url_id"]), _norm(resumed.seen, ["url_id"])
    )
    pd.testing.assert_frame_equal(
        _norm(full.lineage, ["round"]), _norm(resumed.lineage, ["round"])
    )


def test_resume_noop_when_complete(spark, tmp_path):
    w = datagen.world_chain()
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=4, tries=2, max_rounds=50)
    first = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "s"))
    again = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "s"), resume=True)
    assert again.rounds == first.rounds  # no extra rounds
    pd.testing.assert_frame_equal(
        _norm(first.seen, ["url_id"]), _norm(again.seen, ["url_id"])
    )
