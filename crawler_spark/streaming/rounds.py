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
  * stream_first_seen — the J1/J6 seen-gate as a CUSTOM STATEFUL operator
    (`applyInPandasWithState`): per-host_bucket state holds the ids seen so
    far and each url_id is emitted exactly once across micro-batches.

All are transformations on unbounded DataFrames: the driver runs them with
`trigger(availableNow=True)` in tests so semantics are asserted against a
finite input without wall-clock dependence.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
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


def stream_first_seen(discovered: DataFrame) -> DataFrame:
    """Stateful first-seen gate — the streaming twin of the batch engine's
    seen anti-join (J1): each url_id passes through exactly ONCE across the
    life of the stream; later arrivals (any micro-batch) are dropped.

    State is keyed by host_bucket — the same partitioning as the batch
    Bloom filter — and holds the bucket's seen ids as an array<long>.
    Membership checks are vectorized (pandas isin per Arrow batch). At
    10^10-id scale the state store backend would be RocksDB with the ids
    bit-packed exactly like engine/seen_filter.py's per-bucket bitsets; the
    operator shape (grouped state + vectorized probe) is unchanged.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen_ids,) = state.get if state.exists else ([],)
        seen = set(seen_ids)
        for pdf in pdfs:
            fresh = pdf.loc[~pdf["url_id"].isin(seen), "url_id"].drop_duplicates()
            if len(fresh):
                seen.update(int(u) for u in fresh)
                yield pd.DataFrame(
                    {"url_id": fresh.to_numpy(), "host_bucket": int(key[0])}
                )
        state.update((list(seen),))

    return (
        discovered.select("url_id", "host_bucket")
        .groupBy("host_bucket")
        .applyInPandasWithState(
            gate,
            outputStructType="url_id long, host_bucket int",
            stateStructType="ids array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
