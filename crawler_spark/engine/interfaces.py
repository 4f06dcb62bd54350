"""Pluggable per-round match-table interfaces — the reference's `Interface`
trait lifecycle (init/preprocess/compile/intern, crawler/src/interface.rs:
65-91, dispatched `Arc<dyn Interface>` interface.rs:63) mapped to Spark:

  init       -> StateStore aux-table bootstrap (driver)
  preprocess -> DataFrame transform of the round's fetched rows
  compile    -> match extraction (built-in exprs / vectorized UDFs)
  intern     -> atomic per-round append into the store (P10 transaction
                analog: aux tables are written BEFORE finalize_round makes
                the round visible)

Ships the SI analog (files/matches/remarks over fetched captions, schema
catalog SURVEY §1.4) — other interfaces implement the same two methods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DETECTOR = "^i"  # matches caption tokens (image/ipsum)


class CaptionSIInterface:
    """Scalar-interpolation analog over fetched payload captions: tokens
    matching the detector regex are 'loops'; line/col = position/length.
    Deterministic xxhash64 ids replace uuid_short()
    (crawler_si/src/intern.rs:137-148)."""

    name = "si"
    tables = ("files", "matches", "remarks")

    def extract(self, fetched: DataFrame) -> dict[str, DataFrame]:
        """fetched columns: round, url_id, image_id, caption (payload join).
        Returns the per-round match tables, flat rows only."""
        files = fetched.select(
            F.xxhash64(F.concat(F.lit("file:"), F.col("url_id").cast("string"))).alias("file_id"),
            F.col("url_id").alias("repo_id"),
            F.col("image_id").alias("path"),
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
            F.xxhash64(F.concat(F.lit("file:"), F.col("url_id").cast("string"))).alias("file_id"),
            "line",
            F.length("tok").alias("col"),
            "round",
            "tok",
        )
        h = F.abs(F.xxhash64("tok"))
        remarks = matches.withColumn("vector", F.pmod(h, F.lit(8))).withColumn(
            "width", F.col("col")
        ).withColumn("si", F.pmod(h, F.lit(2))).select(
            "match_id", "vector", "width", "si", "round"
        )
        return {
            "files": files,
            "matches": matches.drop("tok"),
            "remarks": remarks,
        }
