"""The crawl driver loop: batch-iterative rounds over DataFrame state.

Mirrors the reference's outer loops (`crawler/src/runner/search.rs:69-94`,
`run.rs:57-71`): a driver-side while-loop where every arrow inside a round is
a Catalyst-planned DataFrame op (engine/round.py). Rounds commit atomically
through the StateStore (checkpoint/resume); lineage counters accumulate per
round (`run.rs:189-203` analog).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import LINEAGE_COLS, CrawlConfig
from . import round as round_mod
from .state import StateStore


def _bloom_dir(state_dir: str) -> str:
    import os

    return os.path.join(state_dir, "bloom")


@dataclass
class CrawlResult:
    trace: pd.DataFrame
    seen: pd.DataFrame
    lineage: pd.DataFrame
    rounds: int
    wall_s: float
    store: StateStore
    fetched_df: DataFrame | None = None
    extras: dict = field(default_factory=dict)


def crawl(
    spark: SparkSession,
    raw_world: dict[str, DataFrame],
    cfg: CrawlConfig,
    state_dir: str | None = None,
    resume: bool = False,
    seen_prefilter=None,
    with_payload: bool = False,
    collect_outputs: bool = True,
    interfaces: list | None = None,
    auto_compact_every: int | None = None,
) -> CrawlResult:
    """Run the crawl to completion (frontier empty) or cfg.max_rounds.

    seen_prefilter: optional BloomSeenFilter (engine/seen_filter.py).
    with_payload: join fetched rows against the corpus (the S5 "fetch" —
        payload bytes enter the fetched table).
    interfaces: optional match-table interfaces (engine/interfaces.py);
        each round their extract() runs over the payload-joined fetched rows
        and the tables are interned with the round's atomic commit (P10).
    auto_compact_every: with a state_dir, run the seen/aux compaction +
        vacuum every N committed rounds INSIDE the crawl (steady-state
        maintenance — a 10^4-round crawl otherwise accumulates 10^4 file
        generations until someone runs the CLI). The Bloom's pending
        deltas are flushed first: they are lazy reads of the per-round
        partitions the vacuum deletes.
    """
    t0 = time.monotonic()
    world = round_mod.prepare_world(spark, raw_world, cfg)
    # Materialize the static graph once as CHECKPOINTS, not persist():
    # persist caches blocks but every per-round join still re-ANALYZES the
    # full canonicalize/id-stamp plan tree; checkpointing gives the ~60
    # DataFrame ops built per round shallow leaves, cutting driver-side plan
    # construction ~3x (the multi-round loop's fixed cost). At cluster scale
    # this is the same one-time materialization cost as persist+count.
    world.pages = world.pages.localCheckpoint(eager=True)
    world.links = world.links.localCheckpoint(eager=True)
    world.robots = world.robots.localCheckpoint(eager=True)
    if world.corpus is not None and with_payload:
        world.corpus = world.corpus.localCheckpoint(eager=True)

    store = StateStore(spark, state_dir, keep_outputs=collect_outputs or with_payload)
    for iface in interfaces or []:
        iface.init(spark, store)  # seed-table bootstrap (reference init())
    if resume and store.rounds:
        frontier = store.frontier()
        r = store.last_round()
        if seen_prefilter is not None:
            # saved bitsets make resume O(bitsets + post-watermark rounds);
            # full rebuild (a whole-seen-table scan) is the fallback for a
            # first resume, a crashed save, or re-sized filter params
            loaded = state_dir and seen_prefilter.load(
                _bloom_dir(state_dir), store.seen()
            )
            if not loaded:
                seen_prefilter.rebuild(store.seen())
    else:
        frontier = round_mod.seeds_frontier(spark, raw_world["seeds"], world, cfg)
        frontier = frontier.localCheckpoint(eager=True)
        r = 0
        if cfg.max_rounds == 0 and state_dir:
            # `search` mode (§3.3): commit the seed-expanded frontier as
            # round 0 so a later crawl --resume continues from it
            from .state import SEEN_SCHEMA, TRACE_SCHEMA

            empty_seen = spark.createDataFrame([], SEEN_SCHEMA)
            empty_trace = spark.createDataFrame([], TRACE_SCHEMA)
            empty_fetched = spark.createDataFrame(
                [], "round int, url_id long, url string, image_id string"
            )
            store.commit_round(0, frontier, empty_seen, empty_trace, empty_fetched)
            ln0 = dict.fromkeys(LINEAGE_COLS, 0)
            ln0["round"] = 0
            ln0["n_eligible"] = frontier.count()
            store.finalize_round(0, ln0)

    n_frontier = frontier.count()
    res = None
    # try/finally: an exception mid-round must not leak the round's persisted
    # blocks or the Bloom's cached marked frontier into the (shared, in
    # tests/bench) Spark session
    try:
        while n_frontier > 0 and r < cfg.max_rounds:
            r += 1
            res = round_mod.run_round(
                spark, frontier, store.seen(), world, cfg, r, seen_prefilter=seen_prefilter
            )
            fetched = res.fetched
            if with_payload and world.corpus is not None:
                # no broadcast HINT: the optimizer broadcasts a corpus under
                # the auto threshold (the test/bench worlds) and falls back
                # to a shuffle join when the payload table is 100 TB — a
                # forced broadcast would OOM the driver there
                fetched = fetched.join(world.corpus, "image_id").select(
                    "round", "url_id", "url", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
                )
            frontier = store.commit_round(r, res.frontier, res.seen_delta, res.trace, fetched)
            # interfaces extract over the COMMITTED fetched table (checkpoint
            # or parquet leaves), so their plans stay valid and cheap after
            # the round's persisted intermediates are released — commit_aux
            # stores the plan and fires zero per-round jobs (memory mode)
            fetched_src = store.last_fetched()
            fetched_src = fetched if fetched_src is None else fetched_src
            for iface in interfaces or []:
                pre = iface.preprocess(fetched_src)  # lifecycle: preprocess -> compile
                for tname, tdf in iface.extract(pre).items():
                    store.commit_aux(r, iface.name, tname, tdf)
            # ONE driver-synchronous job closes the round: the commit's
            # checkpoint already materialized the round DAG (caching
            # marked/att via their persist), so lineage counters + the
            # next-frontier count collect together from cached inputs.
            # Counting the seen delta here also finalizes its LAZY
            # checkpoint inside the same job, and pending_force_aggs folds
            # the trace/fetched lazy checkpoints into the same
            # materialization point (StateStore.commit_round's contract).
            row_df = (
                res.counts
                .crossJoin(frontier.agg(F.count("*").alias("n_next")))
                .crossJoin(store.last_seen_delta.agg(F.count("*").alias("_n_delta")))
            )
            for agg in store.pending_force_aggs():
                row_df = row_df.crossJoin(agg)
            row = row_df.collect()[0]
            n_next = int(row["n_next"])
            store.finalize_round(r, res.lineage_from(row, n_next))
            if seen_prefilter is not None:
                # register this round's terminal ids BEFORE the next round
                # probes (no-false-negatives invariant): the filter batches
                # the bitset merge and exact-checks pending deltas in split()
                seen_prefilter.update(store.last_seen_delta)
            res.release()
            if state_dir and auto_compact_every and r % auto_compact_every == 0:
                if seen_prefilter is not None:
                    seen_prefilter.flush()
                store.compact_seen()
                store.compact_aux()
                store.vacuum_seen()
                store.vacuum_aux()
                store.vacuum_frontiers()
            n_frontier = n_next
        # success path only: persist the Bloom bitsets next to the
        # checkpoint (watermark = last committed round), so the next resume
        # loads them instead of re-scanning the seen table. A crash before
        # this point just means resume pays the catch-up/rebuild.
        if state_dir and seen_prefilter is not None and store.rounds:
            seen_prefilter.save(_bloom_dir(state_dir), store.last_round())
    finally:
        if res is not None:
            res.release()  # idempotent; frees a mid-round failure's caches
        if seen_prefilter is not None:
            seen_prefilter.release()

    wall = time.monotonic() - t0
    if collect_outputs:
        trace = store.traces().orderBy("round", "seq").toPandas()
        seen = store.seen().select("url_id", "status", "round").orderBy("url_id").toPandas()
    else:
        trace = pd.DataFrame(columns=["round", "seq", "url_id"])
        seen = pd.DataFrame(columns=["url_id", "status", "round"])
    lineage = pd.DataFrame(store.lineage_rows(), columns=LINEAGE_COLS)
    # world tables are localCheckpoint-ed: their blocks are NOT cache-manager
    # entries (df.unpersist() would be a no-op) — the ContextCleaner frees
    # them when the DataFrames are garbage collected, so just drop the refs
    world.pages = world.links = world.robots = world.corpus = None
    return CrawlResult(
        trace=trace,
        seen=seen,
        lineage=lineage,
        rounds=r,
        wall_s=wall,
        store=store,
        fetched_df=store.fetched(),
    )
