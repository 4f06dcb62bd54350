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


def test_resume_from_legacy_seen_layout(spark, tmp_path):
    """Migration: a state dir written before the partitioned seen/ table
    (pre round-3: plain round=r/seen_delta dirs) must resume cleanly. The
    first resumed commit creates seen/ with ONLY the new round's partitions;
    seen() must still read each legacy round from its old dir — an
    all-or-nothing layout switch would silently drop every legacy round's
    rows (re-enqueues + oracle divergence)."""
    import os
    import shutil

    w = datagen.make_world(n_urls=120, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)

    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    state = str(tmp_path / "legacy")
    cut = dataclasses.replace(cfg, max_rounds=3)
    crawl(spark, sdf, cut, state_dir=state)

    # rewrite the on-disk format to the pre-round-3 layout: one plain
    # parquet dir per round, no partitioned seen/ table
    seen_dir = os.path.join(state, "seen")
    assert os.path.isdir(seen_dir)
    for entry in os.listdir(seen_dir):
        if not entry.startswith("round="):
            continue
        r = int(entry.split("=", 1)[1])
        rows = spark.read.parquet(os.path.join(seen_dir, entry)).toPandas()
        rows["round"] = r
        legacy_dir = os.path.join(state, f"round={r}", "seen_delta")
        spark.createDataFrame(
            rows[["url_id", "host_bucket", "status", "round"]],
            schema="url_id long, host_bucket int, status string, round int",
        ).write.parquet(legacy_dir)
    shutil.rmtree(seen_dir)

    resumed = crawl(spark, sdf, cfg, state_dir=state, resume=True)
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


def test_resume_loads_saved_bloom(spark, tmp_path):
    """Bloom persistence: a completed crawl saves its bitsets next to the
    checkpoint; resume loads them (plus a catch-up of any newer rounds)
    instead of re-scanning the seen table — and the crawl's results must be
    identical either way (no-false-negative invariant is preserved because
    the saved bits cover exactly the committed rounds up to the watermark)."""
    import json
    import os

    from crawler_spark.engine.seen_filter import BloomSeenFilter

    w = datagen.make_world(n_urls=120, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)

    full = crawl(
        spark, sdf, cfg, state_dir=str(tmp_path / "full"),
        seen_prefilter=BloomSeenFilter(spark, bits_per_bucket=1 << 12),
    )

    state = str(tmp_path / "resume")
    cut = dataclasses.replace(cfg, max_rounds=3)
    crawl(
        spark, sdf, cut, state_dir=state,
        seen_prefilter=BloomSeenFilter(spark, bits_per_bucket=1 << 12),
    )
    # the 3-round run saved its bitsets at watermark 3
    meta = json.load(open(os.path.join(state, "bloom", "meta.json")))
    assert meta["round"] == 3 and meta["bits_per_bucket"] == 1 << 12
    assert os.path.isdir(os.path.join(state, "bloom", "gen=3"))

    filt = BloomSeenFilter(spark, bits_per_bucket=1 << 12)
    resumed = crawl(
        spark, sdf, cfg, state_dir=state, resume=True, seen_prefilter=filt,
    )
    assert resumed.rounds == full.rounds
    pd.testing.assert_frame_equal(
        _norm(full.trace, ["round", "seq"]), _norm(resumed.trace, ["round", "seq"])
    )
    pd.testing.assert_frame_equal(
        _norm(full.seen, ["url_id"]), _norm(resumed.seen, ["url_id"])
    )
    # the completed resume re-saved at the final watermark
    meta2 = json.load(open(os.path.join(state, "bloom", "meta.json")))
    assert meta2["round"] == full.rounds
    assert not os.path.isdir(os.path.join(state, "bloom", "gen=3"))  # old gen GC'd


def test_resume_bloom_fallback_on_mismatch(spark, tmp_path):
    """A saved Bloom sized differently from the resuming filter must be
    ignored (full rebuild fallback), not half-used — positions depend on
    bits_per_bucket, so reusing mismatched words would create false
    negatives."""
    from crawler_spark.engine.seen_filter import BloomSeenFilter

    w = datagen.world_chain()
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=4, tries=2, max_rounds=50)
    state = str(tmp_path / "s")
    cut = dataclasses.replace(cfg, max_rounds=3)
    crawl(
        spark, sdf, cut, state_dir=state,
        seen_prefilter=BloomSeenFilter(spark, bits_per_bucket=1 << 12),
    )
    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    filt = BloomSeenFilter(spark, bits_per_bucket=1 << 13)  # different sizing
    assert not filt.load(str(tmp_path / "s" / "bloom"), None)  # rejected, no scan
    resumed = crawl(
        spark, sdf, cfg, state_dir=state, resume=True, seen_prefilter=filt,
    )
    pd.testing.assert_frame_equal(
        _norm(full.seen, ["url_id"]), _norm(resumed.seen, ["url_id"])
    )


def test_empty_seen_delta_round_commits_and_resumes(spark, tmp_path):
    """A committed round whose seen_delta is EMPTY (every attempt retried or
    politeness-deferred) must not poison the store: the zero-row dynamic
    partition write creates no seen/round=r dir, so commit_round writes an
    empty marker dir — seen() and a fresh-open resume read the round as
    empty instead of raising the missing-partition corruption error."""
    import os

    from crawler_spark.engine.state import SEEN_SCHEMA, TRACE_SCHEMA, StateStore

    state = str(tmp_path / "s")
    store = StateStore(spark, root=state)
    frontier = spark.createDataFrame(
        [(1, 0, 5, "http://a/x", "a")],
        "url_id long, host_bucket int, priority int, url string, host string",
    )
    empty = spark.createDataFrame([], SEEN_SCHEMA)
    trace = spark.createDataFrame([], TRACE_SCHEMA)
    fetched = spark.createDataFrame([], "round int, url_id long, image_id string")

    store.commit_round(1, frontier, empty, trace, fetched)
    store.finalize_round(1, {"round": 1})
    assert os.path.isdir(os.path.join(state, "seen", "round=1"))  # marker
    assert store.seen().count() == 0

    delta2 = spark.createDataFrame([(99, 3, "fetched", 2)], SEEN_SCHEMA)
    store.commit_round(2, frontier, delta2, trace, fetched)
    store.finalize_round(2, {"round": 2})
    assert store.seen().count() == 1

    # fresh open (the resume path) and maintenance over the marker dir
    store2 = StateStore(spark, root=state)
    assert [r.url_id for r in store2.seen().collect()] == [99]
    store2.compact_seen()
    store2.vacuum_seen()
    assert StateStore(spark, root=state).seen().count() == 1

    # a genuinely lost partition is still a hard error
    import shutil

    store3 = StateStore(spark, root=state)
    delta3 = spark.createDataFrame([(7, 1, "fetched", 3)], SEEN_SCHEMA)
    store3.commit_round(3, frontier, delta3, trace, fetched)
    store3.finalize_round(3, {"round": 3})
    shutil.rmtree(os.path.join(state, "seen", "round=3"))
    fresh = StateStore(spark, root=state)
    try:
        fresh.seen()
        raise AssertionError("lost partition must raise")
    except FileNotFoundError:
        pass


def test_pre_marker_empty_round_self_heals_on_resume(spark, tmp_path):
    """Migration: a store written BEFORE the empty-round marker existed has
    no seen/round=r dir for a zero-delta round. Its lineage proves the
    delta was empty (fetched+exhausted+denied == 0), so seen() self-heals
    by creating the marker — while a missing partition whose lineage shows
    rows (or proves nothing) stays the hard corruption error."""
    import json
    import os
    import shutil

    from crawler_spark.engine.state import SEEN_SCHEMA, TRACE_SCHEMA, StateStore

    state = str(tmp_path / "s")
    store = StateStore(spark, root=state)
    frontier = spark.createDataFrame(
        [(1, 0, 5, "http://a/x", "a")],
        "url_id long, host_bucket int, priority int, url string, host string",
    )
    trace = spark.createDataFrame([], TRACE_SCHEMA)
    fetched = spark.createDataFrame([], "round int, url_id long, image_id string")
    zeros = {"n_fetched": 0, "n_exhausted": 0, "n_denied": 0}

    store.commit_round(1, frontier, spark.createDataFrame([], SEEN_SCHEMA), trace, fetched)
    store.finalize_round(1, {"round": 1, **zeros})
    delta2 = spark.createDataFrame([(99, 3, "fetched", 2)], SEEN_SCHEMA)
    store.commit_round(2, frontier, delta2, trace, fetched)
    store.finalize_round(2, {"round": 2, "n_fetched": 1, "n_exhausted": 0, "n_denied": 0})

    # simulate the pre-marker writer: remove round 1's (empty) marker dir
    marker = os.path.join(state, "seen", "round=1")
    shutil.rmtree(marker)
    fresh = StateStore(spark, root=state)
    assert [r.url_id for r in fresh.seen().collect()] == [99]  # healed
    assert os.path.isdir(marker)  # marker recreated

    # a lost NON-empty partition stays fatal (lineage shows rows)
    shutil.rmtree(os.path.join(state, "seen", "round=2"))
    try:
        StateStore(spark, root=state).seen()
        raise AssertionError("lost non-empty partition must raise")
    except FileNotFoundError:
        pass

    # and a lineage missing the counters proves nothing -> still fatal
    state2 = str(tmp_path / "s2")
    s2 = StateStore(spark, root=state2)
    s2.commit_round(1, frontier, delta2.withColumn("round", delta2.round - 1), trace, fetched)
    s2.finalize_round(1, {"round": 1})
    shutil.rmtree(os.path.join(state2, "seen", "round=1"))
    try:
        StateStore(spark, root=state2).seen()
        raise AssertionError("counter-less lineage must not self-heal")
    except FileNotFoundError:
        pass
