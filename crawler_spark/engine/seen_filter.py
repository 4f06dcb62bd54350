"""Partitioned Bloom URL-seen pre-filter (north_rule: "partitioned
Bloom/cuckoo URL-seen filter ... per-partition Arrow-backed bitsets").

The exact `left_anti` join against the seen table (SURVEY §2.3 J1,
`crawler/src/runner/run.rs:74-89`) is always the authority; this filter is a
pre-split so that, at 10^10-frontier scale, only the maybe-seen fraction of
the frontier pays the big shuffle. False positives are harmless (they go
through the exact join); false negatives are impossible by construction
(every committed seen-delta is OR-ed in before the next round).

Scale design — everything stays DataFrame-side, nothing driver-side:
 * the filter is a DataFrame ``(host_bucket int, bits binary)`` with ONE row
   per host bucket, persisted across rounds;
 * probe = ``frontier.cogroup(filter).applyInPandas`` on ``host_bucket``:
   each task sees one bucket's rows plus that bucket's bits exactly once
   (no per-row duplication of the bitset, no driver broadcast of 10^10-bit
   state), and probes vectorized in numpy;
 * build/merge = ``applyInPandas`` per bucket OR-ing bitsets.
At P buckets the filter memory is P × bits_per_bucket/8 spread across the
cluster; sizing: bits_per_bucket ≈ 10 × expected seen per bucket keeps the
false-positive rate ≈ 1%.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = (x + _C1).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= _C2
    z ^= z >> np.uint64(27)
    z *= _C3
    z ^= z >> np.uint64(31)
    return z


def _positions(ids: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(ids), n_hashes) bit positions via double hashing."""
    x = ids.astype(np.int64).view(np.uint64)
    h1 = _splitmix(x)
    h2 = _splitmix(x ^ _C2) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def _build_bits(ids: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(ids):
        pos = _positions(ids, n_bits, n_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def _probe_bits(ids: np.ndarray, bits: np.ndarray, n_hashes: int) -> np.ndarray:
    if len(ids) == 0:
        return np.zeros(0, dtype=bool)
    n_bits = len(bits) * 8
    pos = _positions(ids, n_bits, n_hashes)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=1).astype(bool)


class BloomSeenFilter:
    """Lifecycle: rebuild(seen) on start/resume, update(delta) per round,
    split(frontier) inside the round (engine/round.py).

    Bitset merges are BATCHED: update() parks each round's (small,
    checkpointed) delta in a pending list and only every `flush_every`
    rounds pays the build+merge+checkpoint job. Until then split() routes
    any frontier row whose id is in a pending delta to the maybe side via a
    broadcast flag join — folded into the round DAG, no extra job. The
    no-false-negative invariant is preserved because a pending id can never
    land on the definitely-new side, and the exact seen anti-join remains
    the authority for everything on the maybe side."""

    def __init__(
        self,
        spark,
        bits_per_bucket: int = 1 << 17,
        n_hashes: int = 4,
        flush_every: int = 8,
    ):
        if bits_per_bucket % 8:
            raise ValueError("bits_per_bucket must be a multiple of 8")
        self.spark = spark
        self.bits_per_bucket = bits_per_bucket
        self.n_hashes = n_hashes
        self.flush_every = flush_every
        self.filter_df: DataFrame | None = None
        self._last_marked: DataFrame | None = None
        self._pending: list[DataFrame] = []  # checkpointed per-round deltas

    # -- build / merge ---------------------------------------------------
    def _bits_of(self, ids_df: DataFrame) -> DataFrame:
        n_bits, n_hashes = self.bits_per_bucket, self.n_hashes

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = _build_bits(pdf["url_id"].to_numpy(), n_bits, n_hashes)
            return pd.DataFrame(
                {"host_bucket": [int(pdf["host_bucket"].iloc[0])], "bits": [bits.tobytes()]}
            )

        return ids_df.select("host_bucket", "url_id").groupBy("host_bucket").applyInPandas(
            build, schema="host_bucket int, bits binary"
        )

    def rebuild(self, seen_df: DataFrame) -> None:
        self._pending = []
        self._swap(self._bits_of(seen_df))

    def update(self, seen_delta: DataFrame) -> None:
        """Park the round's delta; merge bitsets once per flush window.
        `seen_delta` must be materialized (checkpoint/parquet-backed) — it
        is referenced for up to flush_every subsequent rounds."""
        self._pending.append(seen_delta.select("url_id", "host_bucket"))
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        batch = self._pending[0]
        for d in self._pending[1:]:
            batch = batch.unionByName(d)
        self._pending = []
        delta = self._bits_of(batch)
        if self.filter_df is None:
            self._swap(delta)
            return

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
            for b in pdf["bits"].iloc[1:]:
                acc |= np.frombuffer(b, dtype=np.uint8)
            return pd.DataFrame(
                {"host_bucket": [int(pdf["host_bucket"].iloc[0])], "bits": [acc.tobytes()]}
            )

        merged = (
            self.filter_df.unionByName(delta)
            .groupBy("host_bucket")
            .applyInPandas(merge, schema="host_bucket int, bits binary")
        )
        self._swap(merged)

    def _swap(self, new_df: DataFrame) -> None:
        # localCheckpoint truncates the round-over-round merge lineage; the
        # superseded bitsets' blocks are checkpoint storage (not cache
        # entries), freed by the ContextCleaner once the old reference drops
        self.filter_df = new_df.localCheckpoint(eager=True)

    # -- probe -----------------------------------------------------------
    def probe_maybe_ids(self, frontier: DataFrame) -> DataFrame:
        """(url_id, host_bucket) rows that MAY be seen. Only ids+buckets
        cross the Arrow boundary — the payload columns stay JVM-side. The
        bucket is carried through so downstream joins can use
        (url_id, host_bucket) keys and reuse a host_bucket partitioning."""
        n_hashes = self.n_hashes

        def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            ids = left["url_id"].to_numpy()
            if len(right):
                bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
                maybe = _probe_bits(ids, bits, n_hashes)
            else:
                maybe = np.zeros(len(ids), dtype=bool)
            bucket = int(left["host_bucket"].iloc[0]) if len(left) else 0
            return pd.DataFrame({"url_id": ids[maybe], "host_bucket": bucket})

        return (
            frontier.select("url_id", "host_bucket")
            .groupBy("host_bucket")
            .cogroup(self.filter_df.groupBy("host_bucket"))
            .applyInPandas(probe, schema="url_id long, host_bucket int")
        )

    def split(self, frontier: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(maybe_seen, definitely_new); together they partition `frontier`.
        A row is maybe-seen when the Bloom bitsets hit OR its id sits in a
        not-yet-flushed pending delta (small broadcast flag). The maybe-flag
        joins back on url_id — the same key as the downstream exact seen
        anti-join, so the frontier exchange is reused."""
        if self.filter_df is None and not self._pending:
            empty = self.spark.createDataFrame([], frontier.schema)
            return empty, frontier
        if self._last_marked is not None:
            self._last_marked.unpersist()
        if self.filter_df is not None:
            flag = self.probe_maybe_ids(frontier).withColumn("_pf", F.lit(True))
            # join on (url_id, host_bucket): host_bucket is functionally
            # dependent on url_id, so semantics are unchanged, but a
            # frontier already hash-partitioned by host_bucket satisfies the
            # join's clustering requirement and skips its exchange
            marked = frontier.join(flag, ["url_id", "host_bucket"], "left")
        else:
            marked = frontier.withColumn("_pf", F.lit(None).cast("boolean"))
        if self._pending:
            pend = self._pending[0].select("url_id")
            for d in self._pending[1:]:
                pend = pend.unionByName(d.select("url_id"))
            pend = pend.distinct().withColumn("_pp", F.lit(True))
            marked = marked.join(F.broadcast(pend), "url_id", "left")
        else:
            marked = marked.withColumn("_pp", F.lit(None).cast("boolean"))
        marked = marked.persist()
        self._last_marked = marked
        is_maybe = F.coalesce(F.col("_pf"), F.lit(False)) | F.coalesce(F.col("_pp"), F.lit(False))
        maybe = marked.filter(is_maybe).drop("_pf", "_pp")
        new = marked.filter(~is_maybe).drop("_pf", "_pp")
        return maybe, new

    def release(self) -> None:
        """Drop cached state so a finished crawl pins no executor memory.
        The marked frontier is persist()-ed -> unpersist() frees it now; the
        bitset filter is localCheckpoint-ed, so dropping the reference lets
        the ContextCleaner free its blocks on GC (df.unpersist() would be a
        no-op for checkpoint storage). rebuild() restores the filter on the
        next crawl/resume."""
        if self._last_marked is not None:
            self._last_marked.unpersist()
            self._last_marked = None
        self.filter_df = None
        self._pending = []  # owned by the StateStore, just drop the refs
