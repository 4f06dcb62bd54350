"""Structured-Streaming surface.

The reference is strictly batch-iterative (SURVEY §2.10): its outer loops
are driver-side and frontier snapshots are taken at round start, which is
why the core engine is a driver loop over DataFrames (engine/crawl.py), NOT
a stream. This module is the beyond-reference streaming mapping for the
same operators, for deployments where discoveries arrive continuously:

  * stream_link_extract — the X1 link extractor as a stateless streaming
    transform (readStream -> canonicalize -> xxhash64 id), usable with
    foreachBatch to feed the batch engine's frontier MERGE.
  * stream_windowed_lineage — per-window lineage counters with a watermark
    for late events (the G3 stats analog, tumbling windows).

Both are plain transformations on unbounded DataFrames: the driver runs
them with `trigger(availableNow=True)` in tests so semantics are asserted
against a finite input without wall-clock dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import canon


def stream_link_extract(links_stream: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Input (streaming or batch) columns: src_url string, href string,
    href_kind string, ts timestamp. Output: canonical discovered URLs with
    deterministic ids, system-kind hrefs dropped (F4 semantics)."""
    return (
        links_stream.filter(F.col("href_kind") != "system")
        .withColumn("url", canon.canon_url(F.col("href")))
        .withColumn("url_id", F.xxhash64("url"))
        .withColumn("host", canon.host_of(F.col("url")))
        .withColumn("host_bucket", canon.host_bucket(F.col("host"), n_buckets))
        .select("url_id", "url", "host", "host_bucket", "ts")
    )


def stream_windowed_lineage(discovered: DataFrame, window: str = "10 seconds",
                            watermark: str = "30 seconds") -> DataFrame:
    """Tumbling-window per-host-bucket discovery counters with late-data
    handling — the streaming twin of the per-round lineage table."""
    return (
        discovered.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "host_bucket")
        .agg(
            F.count("*").alias("n_discovered"),
            F.approx_count_distinct("url_id").alias("n_distinct_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "host_bucket",
            "n_discovered",
            "n_distinct_approx",
        )
    )
