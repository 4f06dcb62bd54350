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


def test_resume_from_pre_depth_checkpoint(spark, tmp_path):
    """Migration: a state dir written before the frontier carried `depth`
    (and before n_depth_capped lineage) must resume cleanly — depth defaults
    to 0, old lineage rows default the new counter to 0."""
    import json
    import os

    w = datagen.make_world(n_urls=120, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)

    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    cut = dataclasses.replace(cfg, max_rounds=3)
    state = str(tmp_path / "old")
    crawl(spark, sdf, cut, state_dir=state)

    # simulate the old on-disk format: strip depth from the last frontier
    # and the new counter from every lineage row
    last = max(int(d.split("=")[1]) for d in os.listdir(state) if d.startswith("round="))
    fdir = os.path.join(state, f"round={last}", "frontier")
    old_frontier = spark.read.parquet(fdir).drop("depth").toPandas()
    import shutil

    shutil.rmtree(fdir)
    spark.createDataFrame(old_frontier).write.parquet(fdir)
    for d in os.listdir(state):
        if not d.startswith("round="):
            continue
        lp = os.path.join(state, d, "lineage.json")
        row = json.load(open(lp))
        row.pop("n_depth_capped", None)
        json.dump(row, open(lp, "w"))

    resumed = crawl(spark, sdf, cfg, state_dir=state, resume=True)
    assert resumed.rounds == full.rounds
    pd.testing.assert_frame_equal(
        _norm(full.trace, ["round", "seq"]), _norm(resumed.trace, ["round", "seq"])
    )
    pd.testing.assert_frame_equal(
        _norm(full.seen, ["url_id"]), _norm(resumed.seen, ["url_id"])
    )
    # old rounds' lineage reads back with the new counter defaulted to 0
    assert (resumed.lineage["n_depth_capped"] == 0).all()
