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
        # the last committed (materialized) seen delta — safe to reference
        # across rounds (checkpointed/parquet-backed, no lineage into the
        # round's soon-unpersisted intermediates)
        self.last_seen_delta: DataFrame | None = None
        if root:
            os.makedirs(root, exist_ok=True)
            self.rounds = self._read_manifest()

    # -- manifest ------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> list[int]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)["rounds"]
        except FileNotFoundError:
            return []

    def _commit_manifest(self) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"rounds": self.rounds}, f)
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
            seen_delta.write.mode("overwrite").parquet(os.path.join(d, "seen_delta"))
            trace.write.mode("overwrite").parquet(os.path.join(d, "trace"))
            fetched.write.mode("overwrite").parquet(os.path.join(d, "fetched"))
            self._frontier = self.spark.read.parquet(os.path.join(d, "frontier"))
            self.last_seen_delta = self.spark.read.parquet(os.path.join(d, "seen_delta"))
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
                self._traces.append(trace.localCheckpoint(eager=True))
                self._fetched.append(fetched.localCheckpoint(eager=True))
        return self._frontier

    # -- aux (interface match) tables: written before finalize_round, so
    # they share the round's atomic visibility (P10 transaction analog) ----
    def commit_aux(self, round_no: int, iface: str, table: str, df: DataFrame) -> None:
        if self.root:
            d = os.path.join(self.root, f"round={round_no}", "aux", iface, table)
            df.coalesce(8).write.mode("overwrite").parquet(d)
        else:
            self._aux.setdefault((iface, table), []).append(
                df.coalesce(8).localCheckpoint(eager=True)
            )

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

    def aux(self, iface: str, table: str) -> DataFrame | None:
        if self.root:
            paths = [
                p
                for r in self.rounds
                if os.path.isdir(p := os.path.join(self.root, f"round={r}", "aux", iface, table))
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

    def seen(self) -> DataFrame:
        if self._seen is not None:
            return self._seen
        if self.root and self.rounds:
            paths = [os.path.join(self.root, f"round={r}", "seen_delta") for r in self.rounds]
            self._seen = self.spark.read.parquet(*paths)
        else:
            self._seen = self.spark.createDataFrame([], SEEN_SCHEMA)
        return self._seen

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
