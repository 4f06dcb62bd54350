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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DETECTOR = "^i"  # matches caption tokens (image/ipsum)
PRAGMA = "#pragma "  # annotation marker (X9 analog, crawler_si pattern.rs:35)

PREPROCESS_SCHEMA = (
    "url_id long, caption string, annotated string, n_pragmas int, line_map string"
)


def preprocess_annotate(fetched: DataFrame, detector: str = DETECTOR) -> DataFrame:
    """X9 pragma insertion (`crawler_si/src/loops.rs:112-147`): splice an
    annotation line before every detector-matching line of the payload text,
    tracking the original->annotated line remap (`post_row` delta logic).
    Runs as an Arrow-batched mapInPandas — the `preprocess` hook of the
    Interface lifecycle."""
    import re

    det = re.compile(detector)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ["url_id", "caption", "annotated", "n_pragmas", "line_map"]}
            for url_id, caption in zip(pdf["url_id"], pdf["caption"]):
                words = str(caption).split(" ")
                new_words, remap, delta = [], [], 0
                for i, wrd in enumerate(words):
                    if det.match(wrd):
                        new_words.append(PRAGMA.strip())
                        delta += 1
                    new_words.append(wrd)
                    remap.append(f"{i}:{i + delta}")
                out["url_id"].append(url_id)
                out["caption"].append(caption)
                out["annotated"].append(" ".join(new_words))
                out["n_pragmas"].append(delta)
                out["line_map"].append(",".join(remap))
            yield pd.DataFrame(out)

    return fetched.select("url_id", "caption").mapInPandas(run, schema=PREPROCESS_SCHEMA)


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
