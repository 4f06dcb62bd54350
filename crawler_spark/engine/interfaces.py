"""Pluggable per-round match-table interfaces — the reference's `Interface`
trait lifecycle (init/preprocess/compile/intern, crawler/src/interface.rs:
65-91, dispatched `Arc<dyn Interface>` interface.rs:63) mapped to Spark:

  init       -> StateStore seed-table bootstrap (driver, once per crawl —
                the `create table` / seeded-dimension DDL of each
                interface's init())
  preprocess -> DataFrame transform of the round's fetched rows (identity
                for RebaseDL/KernelFaRer, which return Ok("") in the
                reference too)
  compile    -> match extraction (built-in exprs; RebaseDL/KernelFaRer
                synthesize + regex-parse the pass log, operators/
                rk_interface.py)
  intern     -> atomic per-round append into the store (P10 transaction
                analog: aux tables are written BEFORE finalize_round makes
                the round visible)

All three reference interfaces ship: CaptionSIInterface (full 6-table SI
catalog + seeded si_info_types, crawler_si/src/interface.rs:16-86),
RebaseDLInterface (files + maf/cu/cb matches, crawler_rebasedl/src/
interface.rs:14-45), KernelFarerInterface (line/type matches with the F8
empty-result file skip, crawler_kernel_farer/src/intern.rs:16-19). Multiple
interfaces can run in one crawl, like the reference's interface list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rk_interface import (
    kernel_log_expr,
    kernel_parse,
    rebasedl_log_expr,
    rebasedl_parse,
)
from ..operators.si_interface import annotate_remap

DETECTOR = "^i"  # matches caption tokens (image/ipsum)
PRAGMA = "#pragma "  # annotation marker (X9 analog, crawler_si pattern.rs:35)

# engine-side detectors over payload captions
RB_CAPTION_DETECTOR = "^l"  # lorem tokens play packing candidates
KF_CAPTION_DETECTOR = "^[0-9]+$"  # the numeric token plays the kernel site


def _file_id(col: str = "url_id"):
    """Deterministic file id shared by all interfaces (they share one files
    table in the reference DB — each init() issues the same CREATE IF NOT
    EXISTS); replaces uuid_short() (crawler_si/src/intern.rs:137-148)."""
    return F.xxhash64(F.concat(F.lit("file:"), F.col(col).cast("string")))


def preprocess_annotate(fetched: DataFrame, detector: str = DETECTOR) -> DataFrame:
    """X9 pragma insertion (`crawler_si/src/loops.rs:112-147`) over the
    fetched captions: annotation tokens spliced before detector matches with
    the exact original->annotated remap. Relational (shared builder with the
    gated x9 query) — no Python in the plan."""
    ann = annotate_remap(
        fetched.select("url_id", "caption"), "url_id", "caption", detector
    )
    return fetched.join(ann, "url_id", "left").withColumn(
        "n_pragmas", F.coalesce(F.col("n_pragmas"), F.lit(0))
    )


class Interface:
    """Base lifecycle; subclasses set `name`, `tables` and override hooks."""

    name = "base"
    tables: tuple[str, ...] = ()

    def init(self, spark: SparkSession, store) -> None:  # noqa: ARG002
        return None

    def preprocess(self, fetched: DataFrame) -> DataFrame:
        return fetched

    def extract(self, fetched: DataFrame) -> dict[str, DataFrame]:
        raise NotImplementedError


class CaptionSIInterface(Interface):
    """Scalar-interpolation analog over fetched payload captions: tokens
    matching the detector regex are 'loops'; line/col = position/length.
    Full 6-table catalog (crawler_si/src/interface.rs:16-86) with the seeded
    si_info_types dimension (interface.rs:71-77; hard-coded type map)."""

    name = "si"
    tables = ("files", "matches", "remarks", "ir_mix", "pattern", "si_info")

    def init(self, spark: SparkSession, store) -> None:
        types = spark.createDataFrame(
            [(0, "Enabled"), (1, "Disabled"), (2, "Floating Point"), (3, "Control Flow")],
            "type_id int, name string",
        )
        store.commit_seed(self.name, "si_info_types", types)

    def preprocess(self, fetched: DataFrame) -> DataFrame:
        return preprocess_annotate(fetched)

    def extract(self, fetched: DataFrame) -> dict[str, DataFrame]:
        """fetched columns: round, url_id, image_id, caption (payload join),
        plus preprocess extras (n_pragmas) when the lifecycle ran.
        Returns the per-round match tables, flat rows only."""
        has_pragmas = "n_pragmas" in fetched.columns
        files = fetched.select(
            _file_id().alias("file_id"),
            F.col("url_id").alias("repo_id"),
            F.col("image_id").alias("path"),
            *([F.col("n_pragmas")] if has_pragmas else []),
            "round",
        ).dropDuplicates(["file_id"])

        toks = fetched.select(
            "round",
            "url_id",
            F.posexplode(F.split(F.lower("caption"), "[^a-z0-9]+")).alias("line", "tok"),
        ).filter(F.col("tok").rlike(DETECTOR))
        matches = toks.select(
            F.xxhash64(
                F.concat(F.col("url_id").cast("string"), F.lit(":"), F.col("line").cast("string"))
            ).alias("match_id"),
            _file_id().alias("file_id"),
            "line",
            F.length("tok").alias("col"),
            "round",
            "tok",
        )
        h = F.abs(F.xxhash64("tok"))
        remarks = matches.select(
            "match_id",
            F.pmod(h, F.lit(8)).alias("vector"),
            F.col("col").alias("width"),
            F.pmod(h, F.lit(2)).alias("si"),
            "round",
        )
        # ir_mix: opcode-class tally analog over the matched token's chars
        mem = F.length(F.regexp_replace("tok", "[^aeiou]", ""))
        arith = F.length(F.regexp_replace("tok", "[^0-9]", ""))
        ir_mix = matches.select(
            "match_id",
            F.col("col").alias("count"),
            mem.alias("mem"),
            arith.alias("arith"),
            (F.col("col") - mem - arith).alias("other"),
            "round",
        )
        # pattern: per (url, tok) with >=2 matches, keyed by the first
        # match's id (start = its line) so the FK into matches holds
        w = Window.partitionBy("url_id", "tok").orderBy("line")
        gaps = toks.withColumn("gap", F.col("line") - F.lag("line").over(w))
        pattern = (
            gaps.groupBy("url_id", "tok")
            .agg(
                F.min("line").alias("start"),
                F.min("gap").alias("stride"),
                F.count("*").alias("_n"),
                F.max("round").alias("round"),  # constant within one extract
            )
            .filter(F.col("_n") >= 2)
            .select(
                F.xxhash64(
                    F.concat(F.col("url_id").cast("string"), F.lit(":"), F.col("start").cast("string"))
                ).alias("match_id"),
                "start",
                "stride",
                "round",
            )
        )
        si_info = matches.select(
            "match_id", F.pmod(h, F.lit(4)).cast("int").alias("type_id"), "round"
        )
        return {
            "files": files,
            "matches": matches.drop("tok"),
            "remarks": remarks,
            "ir_mix": ir_mix,
            "pattern": pattern,
            "si_info": si_info,
        }


class RebaseDLInterface(Interface):
    """RebaseDL analog (crawler_rebasedl/src/interface.rs:14-45): the
    compile hook synthesizes the pass log per fetched caption and the intern
    parses it back with the reference regexes (output_parser.rs:5-34).
    Files are interned unconditionally — rebasedl's intern_matches calls
    ensure_file before checking the candidate list (intern.rs:11-27)."""

    name = "rebasedl"
    tables = ("files", "matches")

    def extract(self, fetched: DataFrame) -> dict[str, DataFrame]:
        files = fetched.select(
            _file_id().alias("file_id"),
            F.col("url_id").alias("repo_id"),
            F.col("image_id").alias("path"),
            "round",
        ).dropDuplicates(["file_id"])
        logs = fetched.select(
            "round",
            "url_id",
            F.expr(rebasedl_log_expr("caption", RB_CAPTION_DETECTOR)).alias("log"),
        )
        m = rebasedl_parse(logs, ["round", "url_id"])
        matches = m.select(
            F.xxhash64(
                F.concat(F.lit("rb:"), F.col("url_id").cast("string"), F.lit(":"), F.col("line").cast("string"))
            ).alias("match_id"),
            _file_id().alias("file_id"),
            "line",
            "col",
            "maf",
            "cu",
            "cb",
            "round",
        )
        return {"files": files, "matches": matches}


class KernelFarerInterface(Interface):
    """KernelFaRer analog (crawler_kernel_farer/src/interface.rs:14-42):
    X14 regex parse of the replacer-pass log. Files with an EMPTY match list
    are skipped entirely — the F8 empty-result skip (intern.rs:16-19) — so
    the files table is derived FROM the matches."""

    name = "kernel_farer"
    tables = ("files", "matches")

    def extract(self, fetched: DataFrame) -> dict[str, DataFrame]:
        logs = fetched.select(
            "round",
            "url_id",
            F.col("image_id").alias("path"),
            F.expr(kernel_log_expr("caption", KF_CAPTION_DETECTOR)).alias("log"),
        )
        m = kernel_parse(logs, ["round", "url_id", "path"])
        matches = m.select(
            F.xxhash64(
                F.concat(F.lit("kf:"), F.col("url_id").cast("string"), F.lit(":"), F.col("line").cast("string"))
            ).alias("match_id"),
            _file_id().alias("file_id"),
            "line",
            "type",
            "round",
        )
        # F8: ensure_file only runs for non-empty results -> derive files
        # from the surviving matches
        files = (
            m.select(
                _file_id().alias("file_id"),
                F.col("url_id").alias("repo_id"),
                "path",
                "round",
            ).dropDuplicates(["file_id"])
        )
        return {"files": files, "matches": matches.drop("path")}


ALL_INTERFACES = {
    "si": CaptionSIInterface,
    "rebasedl": RebaseDLInterface,
    "kernel_farer": KernelFarerInterface,
}
