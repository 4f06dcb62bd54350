"""Checkpoint/resume state store: parquet snapshots + an atomic manifest.

The reference commits one DB transaction per repo (`crawler_si/src/
interface.rs:115-139`) and is resumable because its tables are idempotent
(`db.rs:57-89`). Our analog (SURVEY.md §2.9 P10): each round's outputs are
written as parquet under ``round=R/`` and the round becomes visible only when
the manifest is atomically replaced (write-temp + os.replace). Resume reads
the manifest and continues from the last committed round — a poor-man's
Iceberg snapshot (Iceberg jars are not available in this container; the
store isolates that choice behind one interface).

Memory mode (root=None) keeps DataFrames persisted and uses
``localCheckpoint`` to truncate the iterative lineage — for tests/bench.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEEN_SCHEMA = "url_id long, host_bucket int, status string, round int"
TRACE_SCHEMA = "round int, seq int, url_id long"


class StateStore:
    def __init__(self, spark: SparkSession, root: str | None = None, keep_outputs: bool = True):
        self.spark = spark
        self.root = root
        # keep_outputs=False (bench mode, in-memory only): skip trace/fetched
        # materialization — two fewer jobs per round
        self.keep_outputs = keep_outputs or bool(root)
        self.rounds: list[int] = []
        self._frontier: DataFrame | None = None
        self._seen: DataFrame | None = None
        self._traces: list[DataFrame] = []
        self._fetched: list[DataFrame] = []
        self._lineage: list[dict] = []
        self._aux: dict[tuple[str, str], list[DataFrame]] = {}
        self._seed: dict[tuple[str, str], DataFrame] = {}
        # memory mode: this round's LAZY localCheckpoints (trace/fetched)
        # awaiting materialization in the round-closing collect job
        self._pending_force: list[DataFrame] = []
        self._last_fetched_dir: str | None = None
        # the last committed (materialized) seen delta — safe to reference
        # across rounds (checkpointed/parquet-backed, no lineage into the
        # round's soon-unpersisted intermediates)
        self.last_seen_delta: DataFrame | None = None
        self._seen_base: dict | None = None
        self._aux_base: dict | None = None
        if root:
            os.makedirs(root, exist_ok=True)
            self.rounds = self._read_manifest()

    # -- manifest ------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> list[int]:
        try:
            with open(self._manifest_path()) as f:
                m = json.load(f)
        except FileNotFoundError:
            self._seen_base = None
            self._aux_base = None
            return []
        # seen_base: {"gen": N, "upto": R} — rounds <= R live in the
        # compacted base generation, not the per-round partitions
        self._seen_base = m.get("seen_base")
        # aux_base: same contract for the interface match tables
        self._aux_base = m.get("aux_base")
        return m["rounds"]

    def _commit_manifest(self) -> None:
        payload: dict = {"rounds": self.rounds}
        if getattr(self, "_seen_base", None):
            payload["seen_base"] = self._seen_base
        if getattr(self, "_aux_base", None):
            payload["aux_base"] = self._aux_base
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._manifest_path())  # atomic visibility

    # -- round commit ----------------------------------------------------
    # Two-phase: commit_round materializes the round's outputs and returns
    # the next frontier (so the caller can count it and derive the last
    # lineage fields via flow conservation — no extra jobs); finalize_round
    # then makes the round visible (manifest / lineage append). A crash
    # between the two leaves an invisible partial round: resume-safe.
    def commit_round(
        self,
        round_no: int,
        frontier: DataFrame,
        seen_delta: DataFrame,
        trace: DataFrame,
        fetched: DataFrame,
    ) -> DataFrame:
        # Partition hygiene: round outputs are unions whose partition counts
        # would otherwise accumulate every round (O(rounds^2) tasks over a
        # crawl). Bound them at the commit boundary — at cluster scale this
        # coalesce becomes repartition(P, "host_bucket") to preserve
        # co-location with the per-bucket seen/Bloom state.
        n_part = max(8, self.spark.sparkContext.defaultParallelism)
        frontier = frontier.coalesce(n_part)
        seen_delta = seen_delta.coalesce(8)
        if self.root:
            d = os.path.join(self.root, f"round={round_no}")
            frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
            # ONE seen table partitioned by (round, host_bucket) — the
            # physical substrate for two prunings: the discovery-dedup probe
            # (engine/round.py step 7) joins seen on (url_id, host_bucket)
            # against the broadcast discovery set, so DPP reads only the
            # buckets present in it; resume reads only the manifest's
            # committed rounds. Dynamic partition overwrite makes a re-run
            # of a crashed round replace exactly its own partitions (the
            # idempotent-insert analog, `search.rs:120-124`).
            (
                seen_delta.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("round", "host_bucket")
                .parquet(self._seen_dir())
            )
            # A zero-row delta (an all-retry or fully politeness-deferred
            # round) writes NO round=r partition; commit an empty marker dir
            # so seen()'s per-round resolution can tell a committed-empty
            # round from a lost partition (which stays a hard error). The
            # Iceberg analog: a snapshot that adds no data files still
            # commits.
            os.makedirs(
                os.path.join(self._seen_dir(), f"round={round_no}"), exist_ok=True
            )
            trace.write.mode("overwrite").parquet(os.path.join(d, "trace"))
            fetched.write.mode("overwrite").parquet(os.path.join(d, "fetched"))
            self._last_fetched_dir = os.path.join(d, "fetched")
            self._frontier = self.spark.read.parquet(os.path.join(d, "frontier"))
            self.last_seen_delta = self._read_seen().filter(F.col("round") == round_no)
            self._seen = None
        else:
            # the superseded frontier's checkpoint blocks are freed by the
            # ContextCleaner once this reassignment drops the last reference
            self._frontier = frontier.localCheckpoint(eager=True)
            # LAZY checkpoint: the delta's blocks are saved when the crawl
            # loop's single lineage-collect job (which counts it) first
            # computes it — one job per round instead of two. It reads the
            # att cache materialized by the frontier checkpoint above, so
            # the deferred computation is cheap and crash-safe semantics
            # are unchanged (memory mode is not resumable anyway).
            delta_ck = seen_delta.localCheckpoint(eager=False)
            self.last_seen_delta = delta_ck
            seen = self.seen().unionByName(delta_ck)
            # periodic re-checkpoint keeps the union chain (and its partition
            # count) shallow
            if round_no % 8 == 0:
                seen = seen.coalesce(n_part).localCheckpoint(eager=True)
            self._seen = seen
            if self.keep_outputs:
                # LAZY like the seen delta: one eager checkpoint per table
                # would fire one driver job each, per round. All of them
                # materialize together inside the round-closing collect
                # (pending_force_aggs), while the round's persisted
                # intermediates are still alive.
                t_ck = trace.localCheckpoint(eager=False)
                f_ck = fetched.localCheckpoint(eager=False)
                self._traces.append(t_ck)
                self._fetched.append(f_ck)
                self._pending_force += [t_ck, f_ck]
        return self._frontier

    # CONTRACT (memory mode): commit_round leaves this round's trace/fetched
    # checkpoints LAZY. The caller must compute them while the round's
    # persisted inputs are still cached — either by crossJoining
    # pending_force_aggs() into its round-closing collect (the crawl loop
    # does) or implicitly via finalize_round, which forces any leftovers as
    # the commit boundary. Skipping both would be correct but silently
    # expensive: later reads would recompute the round subtree after its
    # persist()s are gone. (Measured: the lazy calls fire at most the trace
    # window's one exchange-stage job at commit; the result stages fold into
    # the closing collect. Aux plans shuffle more — see commit_aux for why
    # they skip checkpointing entirely.)
    def pending_force_aggs(self) -> list[DataFrame]:
        """One-row count aggs over this round's lazy checkpoints; crossJoin
        them into one collect to materialize everything in a single job."""
        out, self._pending_force = self._pending_force, []
        return [d.agg(F.count("*").alias(f"_n_force_{i}")) for i, d in enumerate(out)]

    # -- aux (interface match) tables: written before finalize_round, so
    # they share the round's atomic visibility (P10 transaction analog) ----
    def commit_aux(self, round_no: int, iface: str, table: str, df: DataFrame) -> None:
        """Memory mode stores the PLAN, not a checkpoint: `df` must be built
        over this round's checkpointed fetched table (last_fetched()), so it
        is shallow, deterministic, and recompute-safe after the round's
        persisted intermediates are released. With all three interfaces
        attached, an eager checkpoint here cost ~10 extra driver jobs per
        round (round 2) — and a lazy one is no better: under AQE even
        localCheckpoint(eager=False) synchronously materializes every
        exchange stage at call time. Deferring the whole extract to read
        time is the only genuinely job-free commit."""
        if self.root:
            d = os.path.join(self.root, f"round={round_no}", "aux", iface, table)
            df.coalesce(8).write.mode("overwrite").parquet(d)
        else:
            self._aux.setdefault((iface, table), []).append(df)

    def last_fetched(self) -> DataFrame | None:
        """This round's committed fetched table (checkpoint/parquet-backed
        leaves) — the input interface extracts must build on."""
        if self.root:
            if not self._last_fetched_dir:
                return None
            return self.spark.read.parquet(self._last_fetched_dir)
        return self._fetched[-1] if self._fetched else None

    # -- seeded dimension tables (interface init(), e.g. si_info_types —
    # the reference's CREATE TABLE + INSERT IGNORE bootstrap,
    # crawler_si/src/interface.rs:71-77). Idempotent overwrite. -----------
    def commit_seed(self, iface: str, table: str, df: DataFrame) -> None:
        if self.root:
            d = os.path.join(self.root, "seed", iface, table)
            df.coalesce(1).write.mode("overwrite").parquet(d)
        else:
            self._seed[(iface, table)] = df.localCheckpoint(eager=True)

    def seed(self, iface: str, table: str) -> DataFrame | None:
        if self.root:
            d = os.path.join(self.root, "seed", iface, table)
            return self.spark.read.parquet(d) if os.path.isdir(d) else None
        return self._seed.get((iface, table))

    def _aux_base_dir(self, gen: int, iface: str, table: str) -> str:
        return os.path.join(self.root, "aux_base", f"gen={gen}", iface, table)

    def aux(self, iface: str, table: str) -> DataFrame | None:
        if self.root:
            upto = self._aux_base["upto"] if self._aux_base else 0
            paths = []
            if self._aux_base:
                b = self._aux_base_dir(self._aux_base["gen"], iface, table)
                if os.path.isdir(b):
                    paths.append(b)
            paths += [
                p
                for r in self.rounds
                if r > upto
                and os.path.isdir(p := os.path.join(self.root, f"round={r}", "aux", iface, table))
            ]
            return self.spark.read.parquet(*paths) if paths else None
        parts = self._aux.get((iface, table), [])
        if not parts:
            return None
        out = parts[0]
        for t in parts[1:]:
            out = out.unionByName(t)
        return out

    def finalize_round(self, round_no: int, lineage_row: dict) -> None:
        if self.root:
            d = os.path.join(self.root, f"round={round_no}")
            with open(os.path.join(d, "lineage.json"), "w") as f:
                json.dump(lineage_row, f)
            self.rounds.append(round_no)
            self._commit_manifest()
        else:
            if self._pending_force:
                # commit boundary: a caller that did not fold the lazy
                # checkpoints into its own collect pays one job here instead
                # of silently recomputing the round subtree later
                aggs = self.pending_force_aggs()
                row = aggs[0]
                for a in aggs[1:]:
                    row = row.crossJoin(a)
                row.collect()
            self.rounds.append(round_no)
            self._lineage.append(dict(lineage_row))

    # -- reads -----------------------------------------------------------
    def last_round(self) -> int:
        return self.rounds[-1] if self.rounds else 0

    def frontier(self) -> DataFrame | None:
        if self._frontier is not None:
            return self._frontier
        if self.root and self.rounds:
            f = self.spark.read.parquet(
                os.path.join(self.root, f"round={self.last_round()}", "frontier")
            )
            # migration: checkpoints written before the depth column default
            # to depth 0 instead of failing the resume
            if "depth" not in f.columns:
                from pyspark.sql import functions as F

                f = f.withColumn("depth", F.lit(0))
            self._frontier = f
            return self._frontier
        return None

    def _seen_dir(self) -> str:
        return os.path.join(self.root, "seen")

    def _read_seen(self) -> DataFrame:
        """Partition-discovered read of the seen table with an EXPLICIT
        schema (column order stays SEEN_SCHEMA regardless of the physical
        data/partition-column split; an all-empty table reads as empty
        instead of failing inference)."""
        return self.spark.read.schema(SEEN_SCHEMA).parquet(self._seen_dir())

    def _base_gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, "seen_base", f"gen={gen}")

    def seen(self) -> DataFrame:
        if self._seen is not None:
            return self._seen
        if self.root and self.rounds:
            upto = self._seen_base["upto"] if self._seen_base else 0
            parts: list[DataFrame] = []
            if self._seen_base:
                # compacted base: partitioned by host_bucket only (O(1) files
                # per bucket instead of O(rounds)); `round` rides inside the
                # files so parity/time-travel semantics are unchanged
                parts.append(
                    self.spark.read.schema(SEEN_SCHEMA).parquet(
                        self._base_gen_dir(self._seen_base["gen"])
                    )
                )
            live = [r for r in self.rounds if r > upto]
            if live:
                # Resolve PER ROUND, not per layout: a store checkpointed
                # under the pre-round-3 layout (plain round=r/seen_delta
                # dirs) may gain new-layout partitions on its first resumed
                # commit — reading only seen/ would silently drop every
                # legacy round's rows (re-enqueues + oracle divergence).
                new_rounds = [
                    r
                    for r in live
                    if os.path.isdir(os.path.join(self._seen_dir(), f"round={r}"))
                ]
                legacy = []
                for r in live:
                    if r in new_rounds:
                        continue
                    p = os.path.join(self.root, f"round={r}", "seen_delta")
                    if os.path.isdir(p):
                        legacy.append(p)
                        continue
                    # Migration: stores written BEFORE the empty-round marker
                    # (commit_round above) have no seen/round=r dir when the
                    # round's delta had zero rows. The round's own lineage
                    # proves whether that is the case — delta rows are
                    # exactly fetched + exhausted + denied — so a provably
                    # empty round self-heals (marker created), while a round
                    # the lineage says had rows stays a hard error.
                    lp = os.path.join(self.root, f"round={r}", "lineage.json")
                    if os.path.isfile(lp):
                        with open(lp) as f:
                            row = json.load(f)
                        keys = ("n_fetched", "n_exhausted", "n_denied")
                        # the counters must be PRESENT to prove emptiness —
                        # a lineage row missing them proves nothing and the
                        # round stays a hard error
                        if all(k in row for k in keys) and not any(
                            row[k] or 0 for k in keys
                        ):
                            os.makedirs(
                                os.path.join(self._seen_dir(), f"round={r}"),
                                exist_ok=True,
                            )
                            continue
                    raise FileNotFoundError(
                        f"seen rows for committed round {r} missing from both "
                        f"the partitioned table and the legacy layout under "
                        f"{self.root} — store is corrupt; restore or re-crawl"
                    )
                if new_rounds:
                    # manifest filter = snapshot isolation: a crashed round's
                    # orphan partitions are pruned out, never read
                    parts.append(self._read_seen().filter(F.col("round").isin(new_rounds)))
                if legacy:
                    parts.append(self.spark.read.schema(SEEN_SCHEMA).parquet(*legacy))
            out = parts[0] if parts else self.spark.createDataFrame([], SEEN_SCHEMA)
            for p in parts[1:]:
                out = out.unionByName(p)
            self._seen = out
        else:
            self._seen = self.spark.createDataFrame([], SEEN_SCHEMA)
        return self._seen

    def seen_as_of(self, round_no: int) -> DataFrame:
        """Snapshot time-travel: the seen set as it stood after `round_no`
        was committed (Iceberg `VERSION AS OF` analog). Works across
        compaction because compact_seen keeps `round` as a data column."""
        return self.seen().filter(F.col("round") <= round_no)

    # -- seen-table maintenance (Iceberg rewrite_data_files analog) -------
    def compact_seen(self) -> None:
        """Rewrite every committed seen row into one base generation
        partitioned by host_bucket only. The per-(round, host_bucket) layout
        appends O(rounds) files per bucket over a crawl — at a 10^10-URL
        frontier and thousands of rounds that is small-files death for the
        discovery probe. Compaction collapses each bucket to one file
        (repartition("host_bucket") puts a bucket's rows in exactly one
        task) while keeping `round` inside the files, so seen-set parity,
        seen_as_of and DPP bucket pruning are all unchanged. Visibility is
        atomic: the new generation directory is written first, then the
        manifest swap points readers at it; a crash in between leaves an
        orphan gen dir that no manifest references (the next compaction
        overwrites it). Call vacuum_seen() afterwards to reclaim the
        superseded files."""
        if not self.root or not self.rounds:
            return
        gen = (self._seen_base["gen"] + 1) if self._seen_base else 1
        (
            self.seen()
            .repartition("host_bucket")
            .write.mode("overwrite")
            .partitionBy("host_bucket")
            .parquet(self._base_gen_dir(gen))
        )
        self._seen_base = {"gen": gen, "upto": self.last_round()}
        self._commit_manifest()
        self._seen = None

    def _aux_tables_on_disk(self) -> set[tuple[str, str]]:
        """(iface, table) pairs present in any committed round's aux dir or
        in the current base generation (a table whose interface stopped
        matching still has base rows to carry forward)."""
        pairs: set[tuple[str, str]] = set()
        roots = [
            os.path.join(self.root, f"round={r}", "aux") for r in self.rounds
        ]
        if self._aux_base:
            roots.append(
                os.path.join(self.root, "aux_base", f"gen={self._aux_base['gen']}")
            )
        for d in roots:
            if not os.path.isdir(d):
                continue
            for iface in os.listdir(d):
                fd = os.path.join(d, iface)
                if os.path.isdir(fd):
                    pairs.update((iface, t) for t in os.listdir(fd))
        return pairs

    def compact_aux(self) -> None:
        """Rewrite the interface match tables (commit_aux appends one dir
        per table per round — with all three interfaces that is ~10 new dirs
        a round, the same small-files growth the seen table had) into one
        base generation per table under ``aux_base/gen=N/<iface>/<table>``.
        `round` is already a data column in every aux schema
        (engine/interfaces.py), so read semantics — including per-round
        filters — are unchanged. Atomicity matches compact_seen: all tables'
        gen dirs are written first, then ONE manifest swap flips every
        table at once; a crash in between leaves an invisible orphan gen."""
        if not self.root or not self.rounds:
            return
        pairs = self._aux_tables_on_disk()
        if not pairs:
            return
        gen = (self._aux_base["gen"] + 1) if self._aux_base else 1
        for iface, table in sorted(pairs):
            df = self.aux(iface, table)
            if df is None:
                continue
            # aux tables have no host_bucket; bound the file count instead.
            # At cluster scale this becomes repartition on the table's join
            # key (file_id / match_id) to keep downstream joins co-located.
            df.coalesce(8).write.mode("overwrite").parquet(
                self._aux_base_dir(gen, iface, table)
            )
        self._aux_base = {"gen": gen, "upto": self.last_round()}
        self._commit_manifest()

    def vacuum_aux(self) -> None:
        """Delete files superseded by compact_aux: older base generations
        and per-round aux dirs at or below the compacted watermark."""
        import shutil

        if not self.root or not self._aux_base:
            return
        gen, upto = self._aux_base["gen"], self._aux_base["upto"]
        base_root = os.path.join(self.root, "aux_base")
        if os.path.isdir(base_root):
            for entry in os.listdir(base_root):
                if entry.startswith("gen=") and int(entry.split("=", 1)[1]) != gen:
                    shutil.rmtree(os.path.join(base_root, entry))
        for r in self.rounds:
            if r <= upto:
                d = os.path.join(self.root, f"round={r}", "aux")
                if os.path.isdir(d):
                    shutil.rmtree(d)

    def vacuum_frontiers(self, keep_last: int = 1) -> None:
        """Delete superseded frontier snapshots. Every commit_round writes a
        FULL frontier snapshot under round=R/frontier — at a 10^10-URL
        frontier that is the single largest per-round artifact, and resume
        only ever reads the LAST committed one (trace/fetched/lineage stay
        per-round and are untouched). keep_last >= 1 guards the snapshot a
        resume needs; keep more to retain manual-rollback points."""
        import shutil

        if not self.root or keep_last < 1:
            return
        for r in self.rounds[:-keep_last]:
            d = os.path.join(self.root, f"round={r}", "frontier")
            if os.path.isdir(d):
                shutil.rmtree(d)

    def vacuum_seen(self) -> None:
        """Physically delete files superseded by compact_seen: older base
        generations and per-round seen partitions at or below the compacted
        watermark. Safe at any point after the manifest commit — a reader of
        the current manifest never touches these paths."""
        import shutil

        if not self.root or not self._seen_base:
            return
        gen, upto = self._seen_base["gen"], self._seen_base["upto"]
        base_root = os.path.join(self.root, "seen_base")
        for entry in os.listdir(base_root):
            if entry.startswith("gen=") and int(entry.split("=", 1)[1]) != gen:
                shutil.rmtree(os.path.join(base_root, entry))
        sd = self._seen_dir()
        if os.path.isdir(sd):
            for entry in os.listdir(sd):
                if entry.startswith("round=") and int(entry.split("=", 1)[1]) <= upto:
                    shutil.rmtree(os.path.join(sd, entry))
        # legacy layout (pre round-3): per-round seen_delta dirs the base
        # generation now covers
        for r in self.rounds:
            if r <= upto:
                d = os.path.join(self.root, f"round={r}", "seen_delta")
                if os.path.isdir(d):
                    shutil.rmtree(d)

    def traces(self) -> DataFrame:
        if self.root and self.rounds:
            return self.spark.read.parquet(
                *[os.path.join(self.root, f"round={r}", "trace") for r in self.rounds]
            )
        if self._traces:
            out = self._traces[0]
            for t in self._traces[1:]:
                out = out.unionByName(t)
            return out
        return self.spark.createDataFrame([], TRACE_SCHEMA)

    def fetched(self) -> DataFrame | None:
        if self.root and self.rounds:
            return self.spark.read.parquet(
                *[os.path.join(self.root, f"round={r}", "fetched") for r in self.rounds]
            )
        if self._fetched:
            out = self._fetched[0]
            for t in self._fetched[1:]:
                out = out.unionByName(t)
            return out
        return None

    def lineage_rows(self) -> list[dict]:
        if self.root:
            # disk is authoritative: a resumed store must include pre-resume
            # rounds; counters added after a row was written default to 0
            from ..oracle import LINEAGE_COLS

            rows = []
            for r in self.rounds:
                with open(os.path.join(self.root, f"round={r}", "lineage.json")) as f:
                    rows.append({**dict.fromkeys(LINEAGE_COLS, 0), **json.load(f)})
            return rows
        return list(self._lineage)
