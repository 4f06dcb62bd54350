"""Partitioned Bloom URL-seen pre-filter (north_rule: "partitioned
Bloom/cuckoo URL-seen filter ... per-partition Arrow-backed bitsets").

The exact `left_anti` join against the seen table (SURVEY §2.3 J1,
`crawler/src/runner/run.rs:74-89`) is always the authority; this filter is a
pre-split so that, at 10^10-frontier scale, only the maybe-seen fraction of
the frontier pays the big shuffle. False positives are harmless (they go
through the exact join); false negatives are impossible by construction
(every committed seen-delta is OR-ed in before the next round).

Scale design — everything stays DataFrame-side, nothing driver-side:
 * the filter is a DataFrame ``(host_bucket int, bits array<bigint>)`` with
   ONE row per host bucket, persisted across rounds;
 * probe = broadcast join of the per-bucket word arrays + a pure-codegen
   bit test (``mark()``): bit positions are slices of ``xxhash64(url_id)``
   — the SAME function on both sides, evaluated by the JVM during the probe
   and by vectorized numpy during build/merge. No Arrow hop, no cogroup
   exchange: at 16M rows the old Python-cogroup probe cost ~120 task-seconds
   vs ~0 for the codegen test (profiled round 3);
 * build/merge = ``applyInPandas`` per bucket OR-ing word arrays (index
   maintenance — runs on the small seen deltas, not the frontier).
At P buckets the filter memory is P × bits_per_bucket/8 spread across the
cluster (the broadcast ships it once per executor, same as any broadcast
dim; at 10^10 seen ids the bitsets are ~12 GB total at 1% fp — size P so
each executor's share fits, or shard the broadcast by bucket range);
sizing: bits_per_bucket ≈ 10 × expected seen per bucket keeps the
false-positive rate ≈ 1%.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xxh64_long(v: np.ndarray | int, seed: np.ndarray | int) -> np.ndarray:
    """Vectorized XXH64 of a single 64-bit word — bit-identical to Spark's
    ``xxhash64`` on a LongType column (and to ``ids.xxhash64`` of the
    little-endian 8 bytes; property-tested in tests/test_ids.py)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        v = np.asarray(v, dtype=np.uint64)
        h = np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
        h = h ^ (_rotl(v * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h


def _slice_plan(n_bits: int, n_hashes: int) -> list[tuple[int, int]]:
    """(hash_no, shift) per position: log2(n_bits)-bit slices of the xxhash64
    chain h_0 = xxhash64(id), h_k = xxhash64(id, k). Both engines (numpy
    build, JVM probe) derive their positions from this one plan."""
    log2 = n_bits.bit_length() - 1
    per = 64 // log2
    return [(k // per, (k % per) * log2) for k in range(n_hashes)]


def _positions(ids: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(ids), n_hashes) bit positions: xxhash64-slice scheme."""
    mask = np.uint64(n_bits - 1)
    x = ids.astype(np.int64).view(np.uint64)
    h0 = _xxh64_long(x, 42)
    hashes = {0: h0}
    out = np.empty((len(ids), n_hashes), dtype=np.int64)
    for j, (hno, shift) in enumerate(_slice_plan(n_bits, n_hashes)):
        if hno not in hashes:
            # Spark's multi-arg xxhash64 chains: the previous hash seeds the
            # next word, so xxhash64(id, k) == XXH64(k, XXH64(id, 42))
            hashes[hno] = _xxh64_long(np.uint64(hno), h0)
        out[:, j] = ((hashes[hno] >> np.uint64(shift)) & mask).astype(np.int64)
    return out


def _probe_sql(n_bits: int, n_hashes: int, id_col: str = "url_id", bits_col: str = "_bits") -> str:
    """JVM twin of ``_positions`` + bit test: ANSI-safe shifts/masks only."""
    mask = n_bits - 1
    terms = []
    for hno, shift in _slice_plan(n_bits, n_hashes):
        h = (
            f"xxhash64({id_col})"
            if hno == 0
            else f"xxhash64({id_col}, cast({hno} as bigint))"
        )
        pos = f"(shiftright({h}, {shift}) & {mask})"
        word = f"element_at({bits_col}, cast(shiftright({pos}, 6) as int) + 1)"
        terms.append(f"((shiftright({word}, cast(({pos} & 63) as int)) & 1) = 1)")
    return " AND ".join(terms)


def _build_bits(ids: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """int64 word array (little-endian bit order: bit p lives in word p>>6
    at bit p&63 — the layout the JVM probe reads via element_at+shift)."""
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    if len(ids):
        pos = _positions(ids, n_bits, n_hashes).ravel()
        np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return words.view(np.int64)


def _probe_bits(ids: np.ndarray, words: np.ndarray, n_hashes: int) -> np.ndarray:
    if len(ids) == 0:
        return np.zeros(0, dtype=bool)
    words = np.asarray(words, dtype=np.int64)
    n_bits = len(words) * 64
    pos = _positions(ids, n_bits, n_hashes)
    hit = (words[pos >> 6] >> (pos & 63)) & 1
    return hit.all(axis=1).astype(bool)


def _merge_bits(stacked: DataFrame) -> DataFrame:
    """OR together per-bucket word arrays (rows of the same host_bucket)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.asarray(pdf["bits"].iloc[0], dtype=np.int64).copy()
        for b in pdf["bits"].iloc[1:]:
            acc |= np.asarray(b, dtype=np.int64)
        return pd.DataFrame(
            {"host_bucket": [int(pdf["host_bucket"].iloc[0])], "bits": [acc]}
        )

    return stacked.groupBy("host_bucket").applyInPandas(
        merge, schema="host_bucket int, bits array<bigint>"
    )


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
        if bits_per_bucket < 64 or bits_per_bucket & (bits_per_bucket - 1):
            raise ValueError("bits_per_bucket must be a power of two >= 64")
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
                {"host_bucket": [int(pdf["host_bucket"].iloc[0])], "bits": [bits]}
            )

        return ids_df.select("host_bucket", "url_id").groupBy("host_bucket").applyInPandas(
            build, schema="host_bucket int, bits array<bigint>"
        )

    def rebuild(self, seen_df: DataFrame) -> None:
        self._pending = []
        self._swap(self._bits_of(seen_df))

    # -- persistence (resume-scale): at a 10^10-URL seen set, rebuilding the
    # bitsets on resume re-scans the whole seen table before round one. The
    # saved form is the (host_bucket, bits) table itself — O(bitsets) to
    # load — plus a round watermark; load() ORs in only the rounds committed
    # after the save. ------------------------------------------------------
    def save(self, path: str, upto_round: int) -> None:
        """Persist the bitsets after flushing pending deltas. Atomic like the
        StateStore manifest: the gen directory is written first, then
        meta.json swaps in via os.replace — a crash in between leaves an
        orphan gen no meta references (the next save overwrites it)."""
        import json
        import os
        import shutil

        self.flush()
        if self.filter_df is None:
            return
        gen_dir = os.path.join(path, f"gen={upto_round}")
        self.filter_df.write.mode("overwrite").parquet(gen_dir)
        meta = {
            "round": upto_round,
            "bits_per_bucket": self.bits_per_bucket,
            "n_hashes": self.n_hashes,
        }
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
        for entry in os.listdir(path):
            if entry.startswith("gen=") and entry != f"gen={upto_round}":
                shutil.rmtree(os.path.join(path, entry))

    def load(self, path: str, seen_df: DataFrame) -> bool:
        """Restore bitsets written by save() and OR in the seen rows of any
        round past the saved watermark (one small merge job). Returns False
        — caller must rebuild() from the full seen table — when nothing was
        saved or the saved sizing differs from this filter's."""
        import json
        import os

        try:
            with open(os.path.join(path, "meta.json")) as f:
                meta = json.load(f)
        except FileNotFoundError:
            return False
        if (
            meta["bits_per_bucket"] != self.bits_per_bucket
            or meta["n_hashes"] != self.n_hashes
            or not os.path.isdir(os.path.join(path, f"gen={meta['round']}"))
        ):
            return False
        self._pending = []
        bits = self.spark.read.schema("host_bucket int, bits array<bigint>").parquet(
            os.path.join(path, f"gen={meta['round']}")
        )
        catchup = self._bits_of(seen_df.filter(F.col("round") > meta["round"]))
        self._swap(_merge_bits(bits.unionByName(catchup)))
        return True

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
        self._swap(_merge_bits(self.filter_df.unionByName(delta)))

    def _swap(self, new_df: DataFrame) -> None:
        # localCheckpoint truncates the round-over-round merge lineage; the
        # superseded bitsets' blocks are checkpoint storage (not cache
        # entries), freed by the ContextCleaner once the old reference drops
        self.filter_df = new_df.localCheckpoint(eager=True)

    # -- probe -----------------------------------------------------------
    def mark(self, frontier: DataFrame) -> DataFrame:
        """frontier + ``_pf`` boolean (Bloom maybe-hit). The per-bucket word
        arrays join in as a broadcast dim (one row per bucket) and the bit
        test is a pure whole-stage-codegen expression over xxhash64 slices —
        the frontier never leaves the JVM and never shuffles. A bucket with
        no bitset row (nothing seen there yet) probes false."""
        probe = _probe_sql(self.bits_per_bucket, self.n_hashes)
        return (
            frontier.join(
                F.broadcast(self.filter_df.withColumnRenamed("bits", "_bits")),
                "host_bucket",
                "left",
            )
            .withColumn(
                "_pf",
                F.when(F.col("_bits").isNull(), F.lit(False)).otherwise(F.expr(probe)),
            )
            .drop("_bits")
        )

    def probe_maybe_ids(self, frontier: DataFrame) -> DataFrame:
        """(url_id, host_bucket) rows that MAY be seen (thin mark() view)."""
        return self.mark(frontier).filter(F.col("_pf")).select("url_id", "host_bucket")

    def split(self, frontier: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(maybe_seen, definitely_new); together they partition `frontier`.
        A row is maybe-seen when the Bloom bitsets hit OR its id sits in a
        not-yet-flushed pending delta (small broadcast flag). Both checks
        are broadcast-side — the frontier's own partitioning is untouched."""
        if self.filter_df is None and not self._pending:
            empty = self.spark.createDataFrame([], frontier.schema)
            return empty, frontier
        if self._last_marked is not None:
            self._last_marked.unpersist()
        if self.filter_df is not None:
            marked = self.mark(frontier)
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
