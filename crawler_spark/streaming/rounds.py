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

import importlib.util
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import canon


def _has_protobuf() -> bool:
    """find_spec imports parent packages, so a missing `google` namespace
    raises instead of returning None — treat both as absent."""
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


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
    Bloom filter — and holds the bucket's seen ids BIT-PACKED as one binary
    blob (little-endian int64 array, the seen_filter.py layout idea applied
    to exact ids): state (de)serialization is one O(|seen|·8B) memcpy per
    bucket per batch, with no per-element Python boxing, and membership
    checks are vectorized numpy (`np.isin` per Arrow batch). Grouped state
    still rewrites the whole blob each batch — the per-KEY incremental
    variant below (`stream_first_seen_rocksdb`) is the 10^10-id scale path.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (packed,) = state.get if state.exists else (None,)
        seen = (
            np.frombuffer(packed, dtype="<i8") if packed else np.empty(0, dtype="<i8")
        )
        for pdf in pdfs:
            ids = pdf["url_id"].to_numpy(dtype="<i8")
            fresh = np.unique(ids[~np.isin(ids, seen)])
            if len(fresh):
                seen = np.concatenate([seen, fresh])
                yield pd.DataFrame({"url_id": fresh, "host_bucket": int(key[0])})
        state.update((bytearray(seen.tobytes()),))

    return (
        discovered.select("url_id", "host_bucket")
        .groupBy("host_bucket")
        .applyInPandasWithState(
            gate,
            outputStructType="url_id long, host_bucket int",
            stateStructType="ids binary",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: Declared ValueState schema of `stream_first_seen_rocksdb` — ONE boolean
#: per url_id key. Module-level so the protobuf-free guard test can assert
#: the documented state shape even in containers where the processor itself
#: cannot run (see tests/test_streaming.py).
ROCKSDB_STATE_SCHEMA = "emitted boolean"


def stream_first_seen_rocksdb(discovered: DataFrame) -> DataFrame:
    """The 10^10-id first-seen gate: `transformWithStateInPandas` keyed by
    url_id with a per-key ValueState in the RocksDB state store. Unlike
    `stream_first_seen` (bucket-keyed, rewrites the bucket's whole id array
    every micro-batch), per-key state is INCREMENTAL — each batch touches
    only its own keys' entries, so state I/O is O(batch), not O(|seen|),
    and total state is bounded by RocksDB spill, not executor memory.

    Expected state shape (``ROCKSDB_STATE_SCHEMA``): one RocksDB entry per
    DISTINCT url_id ever emitted — key = the 8-byte url_id, value = a single
    boolean — so resident state is O(#distinct ids · (8 B key + 1 B value +
    fixed store overhead)) with no per-micro-batch growth for redelivered
    ids, and a micro-batch writes only its own fresh keys.

    Requires `spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider` (set before starting the query).
    Semantics are identical to `stream_first_seen`: each url_id is emitted
    exactly once across the life of the stream.

    Runtime requirement: `transformWithStateInPandas` drives its stateful
    processor through a protobuf channel, so the `protobuf` package must be
    importable on driver and executors (it is not in this sandbox — the
    guard below fails fast with a clear message instead of the runner's
    opaque worker-crash error; the test suite skips accordingly).
    """
    if not _has_protobuf():
        raise ModuleNotFoundError(
            "stream_first_seen_rocksdb needs the 'protobuf' package: "
            "transformWithStateInPandas's Python runner imports "
            "google.protobuf.descriptor. Install protobuf, or use "
            "stream_first_seen (applyInPandasWithState, no protobuf "
            "dependency) at test scale."
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", ROCKSDB_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._seen.exists():
                # already emitted in an earlier batch; drain and drop
                for _ in rows:
                    pass
                return
            bucket = None
            for pdf in rows:
                if bucket is None and len(pdf):
                    bucket = int(pdf["host_bucket"].iloc[0])
            self._seen.update((True,))
            yield pd.DataFrame({"url_id": [int(key[0])], "host_bucket": [bucket]})

        def close(self) -> None:
            pass

    return (
        discovered.select("url_id", "host_bucket")
        .groupBy("url_id")
        .transformWithStateInPandas(
            FirstSeen(),
            outputStructType="url_id long, host_bucket int",
            outputMode="Update",
            timeMode="None",
        )
    )


def stream_decontaminate(docs_stream: DataFrame, eval_grams: DataFrame,
                         k: int | None = None) -> DataFrame:
    """Streaming twin of `operators.text.decontaminate` — benchmark
    decontamination for documents that arrive continuously (the ingest-time
    scrub: flag contaminated docs as they land instead of re-scanning the
    corpus per eval-suite release).

    `docs_stream` (streaming): (doc_id long, text string).
    `eval_grams` (STATIC batch): distinct k-gram hashes `h` of the held-out
    eval suite — MBs even for large suites, so it rides the stream-static
    join as a broadcast: the per-gram path is STATELESS (tokenize → explode
    → hash → broadcast-probe, no shuffle before the join survivors).

    State exists only past the join and only for contaminated docs:
    dropDuplicates(doc_id, h) makes redelivered input idempotent
    (at-least-once sources re-emitting a document cannot inflate its
    count), and the per-doc aggregate then counts the surviving distinct
    grams (streaming forbids countDistinct; after the dedup, count IS
    distinct). Run with outputMode("update"); the latest row per doc_id is
    its current n_eval_grams. Both stateful stages key on a tiny fraction
    of the stream (only grams that hit the eval suite), so state stays
    O(contamination), not O(corpus); add `.withWatermark` on an event-time
    column upstream to bound it further in a long-lived deployment."""
    from ..operators.text import DECONTAM_K, gram_hashes

    # default k follows the batch twin so the two scrubs cannot silently
    # diverge on gram width if DECONTAM_K is retuned
    hits = gram_hashes(docs_stream, DECONTAM_K if k is None else k).join(
        F.broadcast(eval_grams.select("h").distinct()), "h"
    )
    return (
        hits.dropDuplicates(["doc_id", "h"])
        .groupBy("doc_id")
        .agg(F.count("h").alias("n_eval_grams"))
    )


def stream_quality_gate(docs_stream: DataFrame) -> DataFrame:
    """Ingest-time text quality gate: the full fused metric set
    (tokens/quality/langid/fingerprints, `text_metrics_frame`) computed on
    documents as they arrive. Every column is a stateless per-row
    expression — no state store, no watermark, each micro-batch pays one
    tokenize pass exactly like the batch scan. Filter on `keep` (or any
    metric) downstream; pairs with `stream_decontaminate` for the
    ingest-time half of the corpus pipeline."""
    from ..operators.text import text_metrics_frame

    return text_metrics_frame(docs_stream)


def stream_gopher_gate(docs_stream: DataFrame) -> DataFrame:
    """Ingest-time Gopher named-rule gate (`text_gopher_rules_frame`):
    like the quality gate, every rule is a stateless per-row expression,
    so the gate runs on a stream unchanged — no state store, no
    watermark — and each micro-batch's verdicts equal the batch run's
    (asserted in tests/test_streaming.py)."""
    from ..operators.text import text_gopher_rules_frame

    return text_gopher_rules_frame(docs_stream)


def stream_c4_gate(docs_stream: DataFrame) -> DataFrame:
    """Ingest-time C4 line-level cleaning gate (`text_c4_rules_frame`):
    the rules are per-line-LOCAL and the batch frame is already a zero-
    exchange per-row projection (filter() HOF + array_join), so it runs
    on a stream unchanged — no state store, no watermark — and each
    micro-batch's verdicts equal the batch run's (asserted in
    tests/test_streaming.py)."""
    from ..operators.text import text_c4_rules_frame

    return text_c4_rules_frame(docs_stream)


def stream_nbq_gate(docs_stream: DataFrame, weights: list,
                    prior: int, buckets: int | None = None) -> DataFrame:
    """Ingest-time NB quality classifier — the train-offline /
    serve-on-stream split production quality filters actually run:
    `operators.text.nbq_train` fits the model on a batch corpus once, and
    this gate scores arriving documents against it with ZERO state and
    ZERO shuffle. The model ships as a LITERAL int64 array (<= NBQ_BUCKETS
    entries, ~32 KB — the executors get it with the plan, no join at
    all), and the per-document score is a per-row integer fold over the
    concatenated unigram+bigram feature array:

        score = prior + sum_f weights[h32(f) % buckets]

    — the identical integers the batch scorer's broadcast-join + groupBy
    produces (int addition is order-free), asserted stream == batch in
    tests/test_streaming.py. Buckets unseen in training carry the model's
    smoothed default (see nbq_train). Zero-feature documents carry no
    evidence and are filtered (the batch convention). Columns match
    text_quality_classifier exactly."""
    from ..operators.text import NBQ_BUCKETS, SPARK_TOKENS, _spark_kgrams
    from ..operators.common import spark_h32

    n_buckets = len(weights) if buckets is None else buckets
    assert n_buckets == len(weights), (n_buckets, len(weights))
    toks = docs_stream.select(
        "doc_id", F.expr(SPARK_TOKENS).alias("toks")
    ).select(
        "doc_id",
        F.expr(f"concat(toks, {_spark_kgrams(2)})").alias("feats"),
    )
    w_arr = F.lit(weights).cast("array<bigint>")
    score = F.expr(
        f"aggregate(transform(feats, f -> element_at(W, "
        f"cast({spark_h32('f')} % {n_buckets} as int) + 1)), "
        f"cast({int(prior)} as bigint), (acc, x) -> acc + x)"
    )
    return (
        toks.withColumn("W", w_arr)
        .filter(F.size("feats") > 0)
        .select(
            "doc_id",
            F.size("feats").cast("long").alias("n_feats"),
            score.alias("score_milli"),
            (score > 0).alias("keep"),
        )
    )


def stream_sessionize(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization — the continuous twin of the batch
    `w2_events_sessionize` gap-window analysis, via the native
    `session_window` stateful operator: per-user sessions grow while events
    arrive within `gap` of the session end, and a CLOSED session emits
    exactly once (append mode) when the watermark passes its end. State is
    one open session per active user key — bounded by the watermark, not
    the stream length.

    Boundary semantics differ from the batch query by design:
    `session_window` starts a new session when the inter-event gap is >=
    the gap duration, while the batch lag-based form uses strictly >, so
    an event exactly `gap` after its predecessor lands differently. The
    parity test therefore asserts against a BATCH session_window
    aggregation (identical operator semantics, batch vs stream), which is
    the contract a deployment migrating between the two actually needs."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_rollup(events: DataFrame, fine: str = "1 hour",
                  coarse: str = "1 day", watermark: str = "2 days") -> DataFrame:
    """Streaming hierarchical rollup — the continuous twin of
    `x_rollup_hier`, as CHAINED stateful aggregations (multiple stateful
    operators in one query, the Spark 3.4+ watermark-propagation feature):
    the fine windowed count aggregates raw events, and the coarse level
    aggregates the FINE windows' outputs (grouping on
    window(window_time(fine_window), coarse)) — raw events are touched by
    exactly one stateful operator, the coarse state sees only closed fine
    windows. A coarse window emits once (append mode) when the watermark
    passes its end."""
    l1 = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", fine).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    l2 = (
        l1.groupBy(F.window(F.window_time("w"), coarse).alias("cw"), "event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
    return l2.select(
        "event_type",
        F.col("cw.start").alias("bucket_start"),
        "n_events",
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


def stream_video_quality_gate(videos_stream: DataFrame) -> DataFrame:
    """Ingest-time video quality gate (`multimodal._video_quality_rows`):
    static-content and exposure verdicts per arriving clip payload. The
    kernel is a stateless whole-batch mapInPandas over the decoded frames
    — no state store, no watermark — so each micro-batch's verdicts equal
    the batch run's (asserted in tests/test_streaming.py), completing the
    at-ingest quality serving across modalities (text: quality/gopher/
    C4/NBQ gates; image: mm admission gate's phash leg; now video+audio)."""
    from ..operators.multimodal import VIDEO_QUALITY_SCHEMA, _video_quality_rows

    return videos_stream.mapInPandas(
        _video_quality_rows, schema=VIDEO_QUALITY_SCHEMA
    )


def stream_audio_quality_gate(clips_stream: DataFrame) -> DataFrame:
    """Ingest-time audio quality gate (`multimodal._audio_quality_rows`):
    clipping/silence/noisiness verdicts per arriving PCM payload, same
    stateless shape as the video gate above."""
    from ..operators.multimodal import AUDIO_QUALITY_SCHEMA, _audio_quality_rows

    return clips_stream.mapInPandas(
        _audio_quality_rows, schema=AUDIO_QUALITY_SCHEMA
    )


def stream_mm_decontaminate(images_stream: DataFrame,
                            eval_index: DataFrame) -> DataFrame:
    """Streaming twin of `operators.multimodal.mm_decontaminate` — image
    benchmark decontamination for crawled images as they land (the
    ingest-time scrub next to `stream_decontaminate`'s text leg; the
    engine's verify stage already emits the phash per fetched image, so
    the stream rows are free).

    `images_stream` (streaming): (k long, phash long) of arriving TRAIN
    images. `eval_index` (STATIC batch): (k, phash) of the benchmark
    images — thousands of rows, so its banded fingerprints ride the
    stream-static join as a broadcast and the per-image path is STATELESS
    (band-stack → broadcast-probe → popcount, no shuffle) up to the join
    survivors. State exists only past the join and only for CONTAMINATED
    images: dropDuplicates(k, ke) makes at-least-once redelivery
    idempotent (ham is a function of the pair, so the kept row is exact),
    and the per-image aggregate counts surviving distinct eval hits
    (streaming forbids countDistinct; after the dedup, count IS distinct).
    Run with outputMode("update"); the latest row per k is its current
    (n_eval_imgs, min_ham). Stream == batch asserted in
    tests/test_streaming.py."""
    from ..operators.multimodal import PHASH_HAM_MAX, _band_stack

    evb = _band_stack(eval_index.select("k", "phash"), "phash", "k").select(
        F.col("k").alias("ke"), F.col("phash").alias("pe"), "band_no", "band_val"
    )
    trb = _band_stack(images_stream.select("k", "phash"), "phash", "k")
    hits = (
        trb.join(F.broadcast(evb), ["band_no", "band_val"])
        .withColumn("ham", F.bit_count(F.col("phash").bitwiseXOR(F.col("pe"))))
        .filter(F.col("ham") <= PHASH_HAM_MAX)
    )
    return (
        hits.dropDuplicates(["k", "ke"])
        .groupBy("k")
        .agg(
            F.count("ke").alias("n_eval_imgs"),
            F.min("ham").cast("long").alias("min_ham"),
        )
    )


def serve_mm_ingest_gate(images_stream: DataFrame, index_dir: str,
                         verdict_dir: str):
    """Admission-time image near-dup gating ON THE INGEST STREAM — the
    serving shape for `operators.multimodal.mm_dedup_incremental_frames`
    (state-in-storage, no model): each micro-batch IS one admission batch,
    exactly the protocol a continuously-crawling fetcher needs (the
    engine's verify stage already emits the phash per fetched image, so
    the stream rows are free). Per trigger, against the PERSISTED phash
    band index at `index_dir`:

      1. verdict the batch (index images + smaller-id batch siblings),
      2. write the verdicts partitioned by batch_id with dynamic-partition
         OVERWRITE — a replayed micro-batch rewrites its own partition
         instead of duplicating verdict rows,
      3. append the batch to the index (admit-then-append, the
         dedup_incremental protocol).

    Replay safety end-to-end: a redelivered batch re-appends its index
    rows, which is harmless by construction — the gate anti-joins index
    copies of the current batch out of the candidates and dedups pairs
    (pinned in tests/test_ungated_oracles.py::test_mm_incremental_replay_safe)
    — and step 2's partition overwrite makes the verdict table converge to
    the clean run's rows. `index_dir` must be seeded before the query
    starts (an empty (k, phash) frame is a valid seed). Returns the
    DataStreamWriter; the caller sets trigger/checkpoint and starts.
    Stream == sequential batch admissions asserted in
    tests/test_streaming.py."""
    from ..operators.multimodal import mm_dedup_incremental_frames

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the gate walks the batch several times (bands twice, the verdict
        # join); pin one evaluation of the ephemeral micro-batch frame
        batch = batch_df.select("k", "phash").localCheckpoint(eager=True)
        index = spark.read.parquet(index_dir)
        (
            mm_dedup_incremental_frames(batch, index)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_dir)
        )
        batch.write.mode("append").parquet(index_dir)

    return images_stream.writeStream.foreachBatch(_admit)


def serve_clip_decontam_gate(clips_stream: DataFrame, eval_index_dir: str,
                             verdict_dir: str, modality: str = "video"):
    """Clip decontamination ON THE INGEST STREAM — the video/audio legs of
    the streaming decontamination row (text: stream_decontaminate, image:
    stream_mm_decontaminate). The containment verdict needs two chained
    aggregations (per-pair unit count, then per-clip rollup), which a pure
    stream transform cannot express, so this rides foreachBatch exactly
    like `serve_mm_ingest_gate`: each micro-batch of fingerprint rows
    (k, frame_no, fphash) / (k, win_no, ahash) — a clip's unit rows ride
    ONE micro-batch, they are emitted together at ingest — is verdicted
    against the STATIC eval fingerprint index at `eval_index_dir` via the
    batch kernel (`_containment_decontam_frames`, eval bands broadcast),
    and verdicts land partitioned by batch_id with dynamic-partition
    OVERWRITE, so a replayed micro-batch rewrites its own partition and
    the verdict table converges to the clean run's rows. Returns the
    DataStreamWriter; the caller sets trigger/checkpoint and starts.
    Stream == batch asserted in tests/test_streaming.py."""
    from ..operators.multimodal import (
        AUD_MATCH_MIN,
        VID_MATCH_MIN,
        _containment_decontam_frames,
    )

    hash_col, unit_col, match_min = {
        "video": ("fphash", "frame_no", VID_MATCH_MIN),
        "audio": ("ahash", "win_no", AUD_MATCH_MIN),
    }[modality]

    def _scrub(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the kernel walks the batch twice (bands, the pair rollup); pin
        # one evaluation of the ephemeral micro-batch frame
        batch = batch_df.select("k", unit_col, hash_col).localCheckpoint(
            eager=True
        )
        ev = spark.read.parquet(eval_index_dir)
        (
            _containment_decontam_frames(batch, ev, hash_col, unit_col, match_min)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(verdict_dir)
        )

    return clips_stream.writeStream.foreachBatch(_scrub)


def stream_recrawl_schedule(fetches: DataFrame) -> DataFrame:
    """Freshness scheduling ON the fetch stream — the streaming twin of
    `operators.relational.crawl_recrawl_schedule`: per-page Poisson
    change-rate state (Cho & Garcia-Molina) maintained incrementally as
    fetch observations arrive, emitting the page's UPDATED schedule row
    each micro-batch that touches it. State per page is four int64s
    (n, changed, first_ms, last_ms) — the sufficient statistics of the
    estimator, O(1) per page forever, updated per key per batch (the
    stream_first_seen_rocksdb argument: a micro-batch touches only its own
    pages' entries). The rate/interval math is `py_mlog2` integer
    arithmetic — the SAME twin the batch operator's SQL computes,
    property-pinned in tests — so after any prefix of the stream the
    latest emitted row per page EQUALS the batch operator run over the
    observations so far (asserted across micro-batches in
    tests/test_streaming.py). Input columns: user_id, ts, event_type
    (the fetch log convention; 'click' marks content-changed)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.common import py_mlog2

    def upd(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, x, mn, mx = state.get if state.exists else (0, 0, None, None)
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n += len(pdf)
            x += int((pdf["event_type"] == "click").sum())
            bmn = int(pdf["ms"].min())
            bmx = int(pdf["ms"].max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        if touched:
            span = mx - mn
            rate = py_mlog2(2 * n + 1) - py_mlog2(2 * n - 2 * x + 1)
            yield pd.DataFrame(
                {
                    "page_id": [int(key[0])],
                    "n_obs": [n],
                    "n_changed": [x],
                    "span_ms": [span],
                    "rate_mb": [rate],
                    "interval_ms": [(span * 1000) // (n * rate + 1)],
                }
            )
        state.update((n, x, mn, mx))

    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (
        fetches.select(
            F.col("user_id").alias("page_id"), ms.alias("ms"), "event_type"
        )
        .groupBy("page_id")
        .applyInPandasWithState(
            upd,
            outputStructType=(
                "page_id long, n_obs long, n_changed long, span_ms long, "
                "rate_mb long, interval_ms long"
            ),
            stateStructType="n long, x long, mn long, mx long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
