"""Seen-table compaction (Iceberg rewrite_data_files analog, SURVEY §2.9
P10 maintenance): the per-(round, host_bucket) seen layout appends one
partition directory per round, so a long crawl accumulates O(rounds) files
per bucket. compact_seen() collapses the committed rows into one base
generation partitioned by host_bucket only; the manifest swap makes it
atomic, vacuum_seen() reclaims the superseded files, and `round` rides
inside the base files so seen-set parity, resume, and time-travel
(seen_as_of) are byte-identical before and after."""

from __future__ import annotations

import dataclasses
import glob
import os

import pandas as pd

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.engine.state import StateStore
from crawler_spark.oracle import CrawlConfig


def _seen_pdf(store: StateStore) -> pd.DataFrame:
    return (
        store.seen()
        .select("url_id", "host_bucket", "status", "round")
        .toPandas()
        .astype("object")
        .sort_values(["url_id"])
        .reset_index(drop=True)
    )


def test_compact_vacuum_resume_parity(spark, tmp_path):
    w = datagen.make_world(n_urls=150, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)

    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    # crawl 4 rounds, compact + vacuum the checkpoint, resume to completion
    state = str(tmp_path / "comp")
    cut = dataclasses.replace(cfg, max_rounds=4)
    crawl(spark, sdf, cut, state_dir=state)

    store = StateStore(spark, root=state)
    before = _seen_pdf(store)
    as_of_3_before = sorted(
        r.url_id for r in store.seen_as_of(3).select("url_id").collect()
    )
    store.compact_seen()
    store.vacuum_seen()

    # reopen from disk: manifest points at the base generation
    store2 = StateStore(spark, root=state)
    pd.testing.assert_frame_equal(before, _seen_pdf(store2))
    assert sorted(
        r.url_id for r in store2.seen_as_of(3).select("url_id").collect()
    ) == as_of_3_before

    # physical shape: one file per populated bucket, no round= dirs left
    base_files = glob.glob(os.path.join(state, "seen_base", "gen=1", "*", "*.parquet"))
    buckets = {os.path.basename(os.path.dirname(p)) for p in base_files}
    assert len(base_files) == len(buckets) > 0  # exactly one file per bucket
    assert not glob.glob(os.path.join(state, "seen", "round=*"))

    # resume continues appending per-round partitions on top of the base
    resumed = crawl(spark, sdf, cfg, state_dir=state, resume=True)
    assert resumed.rounds == full.rounds

    def norm(df: pd.DataFrame, cols) -> pd.DataFrame:
        return (
            df.sort_values(cols)
            .reset_index(drop=True)
            .astype({c: "int64" for c in df.columns if df[c].dtype.kind in "iu"})
        )

    pd.testing.assert_frame_equal(
        norm(full.seen, ["url_id"]), norm(resumed.seen, ["url_id"])
    )
    pd.testing.assert_frame_equal(
        norm(full.trace, ["round", "seq"]), norm(resumed.trace, ["round", "seq"])
    )

    # second compaction over base + post-resume rounds (the steady-state op)
    store3 = StateStore(spark, root=state)
    final = _seen_pdf(store3)
    store3.compact_seen()
    store3.vacuum_seen()
    assert not os.path.isdir(os.path.join(state, "seen_base", "gen=1"))
    pd.testing.assert_frame_equal(final, _seen_pdf(StateStore(spark, root=state)))


def _aux_pdf(store: StateStore, iface: str, table: str) -> pd.DataFrame:
    df = store.aux(iface, table)
    assert df is not None
    cols = sorted(df.columns)
    return (
        df.toPandas()
        .astype("object")
        .reindex(cols, axis=1)
        .sort_values(cols)
        .reset_index(drop=True)
    )


def test_compact_aux_parity_and_resume(spark, tmp_path):
    """commit_aux appends ~10 dirs per round with all three interfaces
    attached; compact_aux must collapse them into one base generation per
    table with byte-identical read results (round stays a data column),
    survive a resume that appends fresh per-round dirs on top, and support
    the steady-state second compaction."""
    from crawler_spark.engine.interfaces import (
        CaptionSIInterface,
        KernelFarerInterface,
        RebaseDLInterface,
    )

    ifaces = lambda: [CaptionSIInterface(), RebaseDLInterface(), KernelFarerInterface()]  # noqa: E731
    w = datagen.make_world(n_urls=200, n_hosts=6, n_images=30, with_corpus=True)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=40, tries=2, max_rounds=50)

    full = crawl(
        spark, sdf, cfg, with_payload=True, interfaces=ifaces(),
        state_dir=str(tmp_path / "full"),
    )

    state = str(tmp_path / "comp")
    cut = dataclasses.replace(cfg, max_rounds=2)
    crawl(spark, sdf, cut, with_payload=True, interfaces=ifaces(), state_dir=state)

    tables = [
        ("si", "files"),
        ("si", "matches"),
        ("rebasedl", "matches"),
        ("kernel_farer", "matches"),
    ]
    store = StateStore(spark, root=state)
    before = {(i, t): _aux_pdf(store, i, t) for i, t in tables}
    store.compact_seen()
    store.compact_aux()
    store.vacuum_seen()
    store.vacuum_aux()

    # reopen from disk: manifest points every table at the base generation
    store2 = StateStore(spark, root=state)
    for i, t in tables:
        pd.testing.assert_frame_equal(before[(i, t)], _aux_pdf(store2, i, t))
    assert glob.glob(os.path.join(state, "aux_base", "gen=1", "si", "files", "*.parquet"))
    assert not glob.glob(os.path.join(state, "round=*", "aux"))

    # resume appends fresh per-round aux dirs on top of the base; the union
    # must equal the uninterrupted crawl's tables
    resumed = crawl(
        spark, sdf, cfg, with_payload=True, interfaces=ifaces(),
        state_dir=state, resume=True,
    )
    assert resumed.rounds == full.rounds
    fstore = StateStore(spark, root=str(tmp_path / "full"))
    rstore = StateStore(spark, root=state)
    for i, t in tables:
        pd.testing.assert_frame_equal(
            _aux_pdf(fstore, i, t), _aux_pdf(rstore, i, t)
        )

    # steady-state second compaction over base + post-resume rounds
    final = {(i, t): _aux_pdf(rstore, i, t) for i, t in tables}
    rstore.compact_aux()
    rstore.vacuum_aux()
    assert not os.path.isdir(os.path.join(state, "aux_base", "gen=1"))
    store3 = StateStore(spark, root=state)
    for i, t in tables:
        pd.testing.assert_frame_equal(final[(i, t)], _aux_pdf(store3, i, t))

    # orphan gen (crash before manifest swap) is invisible to a fresh reader
    orphan = os.path.join(state, "aux_base", "gen=3", "si", "files")
    os.makedirs(orphan)
    store3.aux("si", "files").limit(1).write.mode("overwrite").parquet(orphan)
    fresh = StateStore(spark, root=state)
    assert fresh._aux_base["gen"] == 2
    pd.testing.assert_frame_equal(
        final[("si", "files")], _aux_pdf(fresh, "si", "files")
    )


def test_auto_compact_during_crawl_matches_plain_run(spark, tmp_path):
    """auto_compact_every runs the full maintenance pass (Bloom flush ->
    compact seen+aux -> vacuum all) inside the crawl loop every N rounds;
    the final trace/seen/aux state must be identical to an uncompacted
    run, and the superseded per-round files must actually be gone."""
    from crawler_spark.engine.interfaces import CaptionSIInterface
    from crawler_spark.engine.seen_filter import BloomSeenFilter

    w = datagen.make_world(n_urls=200, n_hosts=6, n_images=30, with_corpus=True)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=25, tries=2, max_rounds=50)

    plain = crawl(
        spark, sdf, cfg, with_payload=True, interfaces=[CaptionSIInterface()],
        state_dir=str(tmp_path / "plain"),
    )
    state = str(tmp_path / "auto")
    auto = crawl(
        spark, sdf, cfg, with_payload=True, interfaces=[CaptionSIInterface()],
        state_dir=state, auto_compact_every=3,
        seen_prefilter=BloomSeenFilter(spark, bits_per_bucket=1 << 12),
    )
    assert auto.rounds == plain.rounds > 3

    def norm(df: pd.DataFrame, cols) -> pd.DataFrame:
        return (
            df.sort_values(cols)
            .reset_index(drop=True)
            .astype({c: "int64" for c in df.columns if df[c].dtype.kind in "iu"})
        )

    pd.testing.assert_frame_equal(
        norm(plain.seen, ["url_id"]), norm(auto.seen, ["url_id"])
    )
    pd.testing.assert_frame_equal(
        norm(plain.trace, ["round", "seq"]), norm(auto.trace, ["round", "seq"])
    )
    pd.testing.assert_frame_equal(
        _aux_pdf(plain.store, "si", "matches"), _aux_pdf(auto.store, "si", "matches")
    )
    # physical: the last in-loop compaction's watermark holds on disk
    store = StateStore(spark, root=state)
    upto = store._seen_base["upto"]
    assert upto >= 3
    for r in range(1, upto + 1):
        assert not os.path.isdir(os.path.join(state, "seen", f"round={r}"))
        assert not os.path.isdir(os.path.join(state, f"round={r}", "aux"))
    # frontiers before the LAST in-loop compaction are vacuumed (rounds
    # after it commit fresh snapshots that nothing has vacuumed yet)
    c_last = (auto.rounds // 3) * 3
    for r in range(1, c_last):
        assert not os.path.isdir(os.path.join(state, f"round={r}", "frontier"))
    assert os.path.isdir(os.path.join(state, f"round={auto.rounds}", "frontier"))


def test_vacuum_frontiers_keeps_resume_intact(spark, tmp_path):
    """Old frontier snapshots are the largest per-round artifact and only
    the LAST committed one feeds resume: vacuum_frontiers must delete the
    superseded ones and leave resume + trace/seen parity untouched."""
    w = datagen.make_world(n_urls=150, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)
    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    state = str(tmp_path / "v")
    cut = dataclasses.replace(cfg, max_rounds=4)
    crawl(spark, sdf, cut, state_dir=state)
    StateStore(spark, root=state).vacuum_frontiers()
    for r in (1, 2, 3):
        assert not os.path.isdir(os.path.join(state, f"round={r}", "frontier"))
        assert os.path.isdir(os.path.join(state, f"round={r}", "trace"))
    assert os.path.isdir(os.path.join(state, "round=4", "frontier"))

    resumed = crawl(spark, sdf, cfg, state_dir=state, resume=True)
    assert resumed.rounds == full.rounds

    def norm(df: pd.DataFrame, cols) -> pd.DataFrame:
        return (
            df.sort_values(cols)
            .reset_index(drop=True)
            .astype({c: "int64" for c in df.columns if df[c].dtype.kind in "iu"})
        )

    pd.testing.assert_frame_equal(
        norm(full.seen, ["url_id"]), norm(resumed.seen, ["url_id"])
    )
    pd.testing.assert_frame_equal(
        norm(full.trace, ["round", "seq"]), norm(resumed.trace, ["round", "seq"])
    )


def test_orphan_generation_is_invisible(spark, tmp_path):
    """A crash between writing the gen dir and the manifest swap must leave
    the store reading the old layout (snapshot isolation), and the next
    compaction must reclaim the orphan's gen id cleanly."""
    w = datagen.world_chain()
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=4, tries=2, max_rounds=6)
    state = str(tmp_path / "s")
    crawl(spark, sdf, cfg, state_dir=state)

    store = StateStore(spark, root=state)
    before = _seen_pdf(store)

    # simulate the crash: gen dir exists, manifest never swapped
    orphan = os.path.join(state, "seen_base", "gen=1")
    os.makedirs(orphan)
    store.seen().limit(1).write.mode("overwrite").parquet(orphan)

    fresh = StateStore(spark, root=state)
    assert fresh._seen_base is None
    pd.testing.assert_frame_equal(before, _seen_pdf(fresh))

    fresh.compact_seen()  # overwrites the orphan at gen=1
    fresh.vacuum_seen()
    pd.testing.assert_frame_equal(before, _seen_pdf(StateStore(spark, root=state)))


def test_compact_then_bloom_resume_parity(spark, tmp_path):
    """Compaction x Bloom persistence: load() catches up from store.seen()
    filtered by the saved watermark, and compaction rewrites that table
    (round preserved as a data column) — resuming a compacted checkpoint
    with a saved Bloom must still match the uninterrupted run exactly."""
    from crawler_spark.engine.seen_filter import BloomSeenFilter

    w = datagen.make_world(n_urls=150, n_hosts=8, n_images=20, with_corpus=False)
    sdf = datagen.to_spark(spark, w)
    cfg = CrawlConfig(page_size=15, tries=2, max_rounds=100)
    full = crawl(spark, sdf, cfg, state_dir=str(tmp_path / "full"))

    state = str(tmp_path / "cb")
    cut = dataclasses.replace(cfg, max_rounds=4)
    crawl(
        spark, sdf, cut, state_dir=state,
        seen_prefilter=BloomSeenFilter(spark, bits_per_bucket=1 << 12),
    )
    store = StateStore(spark, root=state)
    store.compact_seen()
    store.vacuum_seen()
    store.vacuum_frontiers()

    resumed = crawl(
        spark, sdf, cfg, state_dir=state, resume=True,
        seen_prefilter=BloomSeenFilter(spark, bits_per_bucket=1 << 12),
    )
    assert resumed.rounds == full.rounds

    def norm(df: pd.DataFrame, cols) -> pd.DataFrame:
        return (
            df.sort_values(cols)
            .reset_index(drop=True)
            .astype({c: "int64" for c in df.columns if df[c].dtype.kind in "iu"})
        )

    pd.testing.assert_frame_equal(
        norm(full.seen, ["url_id"]), norm(resumed.seen, ["url_id"])
    )
    pd.testing.assert_frame_equal(
        norm(full.trace, ["round", "seq"]), norm(resumed.trace, ["round", "seq"])
    )
