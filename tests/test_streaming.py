"""Streaming surface: semantics asserted with availableNow triggers over a
finite parquet input (deterministic, no wall-clock)."""

from __future__ import annotations

import pandas as pd
import pytest

from crawler_spark.streaming import (
    stream_c4_gate,
    stream_first_seen,
    stream_link_extract,
    stream_windowed_lineage,
)

LINKS_SCHEMA = "src_url string, href string, href_kind string, ts timestamp"


def _links_pdf():
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(40):
        rows.append(
            (
                f"http://h{i % 4}.example/src{i}",
                f"http://H{i % 4}.example/page/p{i}#frag",  # canon noise
                "system" if i % 10 == 0 else "user",
                base + pd.Timedelta(seconds=i),
            )
        )
    return pd.DataFrame(rows, columns=["src_url", "href", "href_kind", "ts"])


def test_stream_link_extract_availablenow(spark, tmp_path):
    src = str(tmp_path / "links")
    spark.createDataFrame(_links_pdf(), LINKS_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(LINKS_SCHEMA).parquet(src)
    out = stream_link_extract(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("discovered")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from discovered").toPandas()
    assert len(got) == 36  # 4 system hrefs dropped
    assert got["url"].str.startswith("http://h").all()  # host lower-cased
    assert not got["url"].str.contains("#").any()  # fragments stripped
    # batch/stream parity: same transform on the same data as a batch DF
    batch = stream_link_extract(spark.read.schema(LINKS_SCHEMA).parquet(src)).toPandas()
    assert sorted(got["url_id"]) == sorted(batch["url_id"])


def test_stream_windowed_lineage(spark, tmp_path):
    src = str(tmp_path / "links2")
    # batch 1: the 40s of events; batch 2: a late sentinel 10 min on that
    # advances the watermark past batch 1's windows (append mode only emits
    # a window once the watermark passes its end)
    spark.createDataFrame(_links_pdf(), LINKS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    sentinel = pd.DataFrame(
        [("http://h0.example/s", "http://h0.example/late", "user",
          pd.Timestamp("2024-01-01 00:10:00"))],
        columns=["src_url", "href", "href_kind", "ts"],
    )
    spark.createDataFrame(sentinel, LINKS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = stream_link_extract(
        spark.readStream.schema(LINKS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = stream_windowed_lineage(stream, window="10 seconds", watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("lineage_w")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from lineage_w").toPandas()
    # 40s of events -> 4 closed tumbling windows; the sentinel's own window
    # stays open (held back by the watermark)
    assert got["n_discovered"].sum() == 36
    assert got["window_start"].nunique() == 4


def test_stream_first_seen_cross_batch_state(spark, tmp_path):
    """The stateful first-seen gate must dedup ACROSS micro-batches: ids
    repeated in a later batch are dropped, new ids still pass."""
    src = str(tmp_path / "ids")
    schema = "url_id long, host_bucket int, ts timestamp"
    base = pd.Timestamp("2024-01-01 00:00:00")
    batch1 = pd.DataFrame(
        {"url_id": [1, 2, 3, 4, 2], "host_bucket": [0, 0, 1, 1, 0],
         "ts": [base] * 5}
    )
    batch2 = pd.DataFrame(  # 2,3 are repeats; 5,6 are new
        {"url_id": [2, 3, 5, 6], "host_bucket": [0, 1, 0, 1],
         "ts": [base + pd.Timedelta(seconds=5)] * 4}
    )
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_first_seen(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from first_seen").toPandas()
    # each id exactly once, across both batches
    assert sorted(got["url_id"]) == [1, 2, 3, 4, 5, 6]
    assert got["url_id"].is_unique
    # bucket affinity preserved
    assert set(got.loc[got["host_bucket"] == 0, "url_id"]) == {1, 2, 5}
    assert set(got.loc[got["host_bucket"] == 1, "url_id"]) == {3, 4, 6}


def test_stream_first_seen_state_bytes_bounded(spark, tmp_path):
    """The seen-gate's per-bucket state blob must stay a COMPACT id array —
    exactly 8 bytes per distinct id, zero per-element row overhead, and no
    growth from redelivered ids. (For xxhash64 ids the key space is sparse
    over 2^64, so 8 B/id is the compact exact layout; a max_id/8 bitset
    would be 2^61 bytes.) Read back from the checkpoint via the state data
    source so the assertion covers what the store actually persists."""
    src = str(tmp_path / "ids_sz")
    ckpt = str(tmp_path / "ckpt_sz")
    schema = "url_id long, host_bucket int, ts timestamp"
    base = pd.Timestamp("2024-01-01 00:00:00")
    # 2 buckets; batch 2 redelivers ids 50..99 and adds 100..199
    b1 = pd.DataFrame(
        {"url_id": list(range(100)), "host_bucket": [i % 2 for i in range(100)],
         "ts": [base] * 100}
    )
    b2 = pd.DataFrame(
        {"url_id": list(range(50, 200)),
         "host_bucket": [i % 2 for i in range(50, 200)],
         "ts": [base + pd.Timedelta(seconds=5)] * 150}
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_first_seen(stream)
        .writeStream.format("memory")
        .queryName("first_seen_sz")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from first_seen_sz").toPandas()
    assert sorted(out["url_id"]) == list(range(200))
    state = spark.read.format("statestore").load(ckpt).toPandas()
    blobs = {
        int(r["key"]["host_bucket"]): bytes(r["value"]["groupState"]["ids"])
        for _, r in state.iterrows()
    }
    assert set(blobs) == {0, 1}
    for bucket, blob in blobs.items():
        n_ids = 100  # each bucket saw 100 distinct ids (redeliveries excluded)
        assert len(blob) == 8 * n_ids, (
            f"bucket {bucket}: state is {len(blob)} B for {n_ids} ids — "
            f"expected exactly 8 B/id (compact int64 array, no row overhead)"
        )
        ids = sorted(int.from_bytes(blob[i:i + 8], "little", signed=True)
                     for i in range(0, len(blob), 8))
        assert ids == [i for i in range(200) if i % 2 == bucket]


def test_stream_first_seen_rocksdb_state_shape_documented():
    """The RocksDB variant's declared ValueState schema must stay the
    documented one-boolean-per-key shape (protobuf-free check, so the
    container's skip of the runtime test can't hide a rot)."""
    from pyspark.sql.types import BooleanType, StructType

    from crawler_spark.streaming.rounds import ROCKSDB_STATE_SCHEMA

    st = StructType.fromDDL(ROCKSDB_STATE_SCHEMA)
    assert len(st.fields) == 1
    assert isinstance(st.fields[0].dataType, BooleanType)
    assert st.fields[0].name == "emitted"


def test_stream_quality_gate_matches_batch(spark, tmp_path):
    """The stateless quality gate must produce the batch text_metrics rows
    exactly, across micro-batches."""
    from crawler_spark.operators.text import text_metrics
    from crawler_spark.streaming import stream_quality_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "docs_q")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_quality_gate(stream)
        .writeStream.format("memory")
        .queryName("quality")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from quality")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        text_metrics(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stream_gopher_gate_matches_batch(spark, tmp_path):
    """The stateless Gopher rule gate must produce the batch
    text_gopher_rules rows exactly, across micro-batches."""
    from crawler_spark.operators.text import text_gopher_rules
    from crawler_spark.streaming import stream_gopher_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "docs_g")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_gopher_gate(stream)
        .writeStream.format("memory")
        .queryName("gopher")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from gopher")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        text_gopher_rules(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stream_c4_gate_matches_batch(spark, tmp_path):
    """The per-row C4 cleaning gate must produce the batch
    text_c4_rules_frame rows exactly, across micro-batches. Runs on a
    planted multi-line corpus (the synthetic documents table is one
    punctuation-free line per doc, so its verdicts are uniformly false —
    the planted docs make every rule fire both ways; see
    test_ungated_oracles.py::test_c4_rules_twin_on_planted_corpus for the
    per-doc semantics)."""
    from crawler_spark.operators.text import text_c4_rules_frame

    rows = [
        (1, "This line has five good words.\nAnother line with enough "
            "words here!\nA third qualifying line right here?\nshort one."),
        (2, "This page mentions javascript in a line with words."
            "\nAnother ok line with enough words.\nThird fine line with "
            "plenty words.\nFourth fine line with plenty words."),
        (3, "Lorem Ipsum dolor sit amet here.\nGood line with many more "
            "words.\nAnother good line with more words.\nThird good line "
            "with more words."),
        (4, "Brace { in this page of words.\nGood line with many more "
            "words.\nAnother good line with more words."),
        (5, "no terminal punctuation on this line\nnor on this second one"),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_c4")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_c4_gate(stream)
        .writeStream.format("memory")
        .queryName("c4gate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from c4gate")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        text_c4_rules_frame(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["keep"].tolist() == [True, True, False, False, False, False]


def test_stream_clip_quality_gates_match_batch(spark, tmp_path):
    """The stateless video/audio quality gates must produce the batch
    kernels' verdicts exactly, across micro-batches of payload rows."""
    from crawler_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        VIDEO_SCHEMA,
        _gen_audio_corpus,
        _gen_video_corpus,
        mm_audio_quality,
        mm_video_quality,
    )
    from crawler_spark.streaming import (
        stream_audio_quality_gate,
        stream_video_quality_gate,
    )

    for tag, gen, schema, gate, batch_fn, idc, n in (
        ("vid", _gen_video_corpus, VIDEO_SCHEMA, stream_video_quality_gate,
         mm_video_quality, "video_id", 125),
        ("aud", _gen_audio_corpus, AUDIO_SCHEMA, stream_audio_quality_gate,
         mm_audio_quality, "clip_id", 25),
    ):
        corpus = spark.range(0, n, 1, 4).mapInPandas(gen, schema=schema)
        src = str(tmp_path / f"payload_{tag}")
        corpus.filter(f"cast(substring({idc}, 4) as long) % 2 = 0") \
            .coalesce(1).write.mode("append").parquet(src)
        corpus.filter(f"cast(substring({idc}, 4) as long) % 2 = 1") \
            .coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            gate(stream)
            .writeStream.format("memory")
            .queryName(f"q_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = (
            spark.sql(f"select * from q_{tag}")
            .toPandas()
            .sort_values(idc)
            .reset_index(drop=True)
        )
        want = (
            batch_fn(spark, "/root/testdata/sf0.001")
            .toPandas()
            .sort_values(idc)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_stream_rollup_chained_aggs_match_batch(spark, tmp_path):
    """Chained stateful aggregations (fine window -> coarse window of
    window_time): coarse buckets closed by the watermark must emit exactly
    once and match the batch evaluation of the same chained expression."""
    from pyspark.sql import functions as F

    from crawler_spark.streaming import stream_rollup

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type")
    )
    src = str(tmp_path / "events_r")
    events.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    sentinel = pd.DataFrame(
        [(10**9, pd.Timestamp("2024-06-01 00:00:00"), 10**6, "sentinel")],
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    spark.createDataFrame(sentinel, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from rollup")
        .toPandas()
        .sort_values(["event_type", "bucket_start"])
        .reset_index(drop=True)
    )
    want = (
        stream_rollup(spark.read.schema(schema).parquet(src))
        .filter(F.col("event_type") != "sentinel")  # its bucket stays open
        .toPandas()
        .sort_values(["event_type", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(got) > 0 and got["n_events"].sum() == 1000
    pd.testing.assert_frame_equal(got, want)


def test_stream_sessionize_closed_sessions_match_batch(spark, tmp_path):
    """session_window sessions closed by the watermark must emit exactly
    once and equal a batch session_window aggregation over the same events
    (a far-future sentinel advances the watermark past every real session;
    its own still-open session is the only difference)."""
    from pyspark.sql import functions as F

    from crawler_spark.streaming import stream_sessionize

    schema = "event_id long, ts timestamp, user_id long, value double"
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value")
    )
    src = str(tmp_path / "events")
    events.coalesce(1).write.mode("append").parquet(src)
    sentinel = spark.createDataFrame(
        pd.DataFrame(
            [(10**9, pd.Timestamp("2024-06-01 00:00:00"), 10**6, 0.0)],
            columns=["event_id", "ts", "user_id", "value"],
        ),
        schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from sessions")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        stream_sessionize(spark.read.schema(schema).parquet(src))
        .filter(F.col("user_id") != 10**6)  # the sentinel's session stays open
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_stream_decontaminate_matches_batch_and_is_idempotent(spark, tmp_path):
    """The streaming overlap scrub must (a) produce the batch operator's
    exact per-doc contamination counts across micro-batches and (b) be
    idempotent under at-least-once redelivery: a batch containing already
    seen documents changes nothing."""
    from crawler_spark.operators.text import (
        DECONTAM_EVAL_MOD,
        decontaminate,
        gram_hashes,
    )
    from crawler_spark.streaming import stream_decontaminate

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    schema = "doc_id long, text string"

    # static eval side: distinct gram hashes of the held-out split
    eval_grams = (
        gram_hashes(docs.filter(f"doc_id % {DECONTAM_EVAL_MOD} = 0"))
        .select("h")
        .distinct()
    )

    # training stream in two micro-batches + a REDELIVERY of batch 1
    train = docs.filter(f"doc_id % {DECONTAM_EVAL_MOD} <> 0")
    src = str(tmp_path / "docs")
    b1 = train.filter("doc_id % 3 = 1")
    b1.coalesce(1).write.mode("append").parquet(src)
    train.filter("doc_id % 3 <> 1").coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_decontaminate(stream, eval_grams)
        .writeStream.format("memory")
        .queryName("decontam")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from decontam")
        .toPandas()
        .groupby("doc_id")["n_eval_grams"]
        .max()  # counts are monotone across updates; max avoids relying
        .sort_index()  # on memory-sink row order
    )
    want = (
        decontaminate(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")["n_eval_grams"]
        .sort_index()
    )
    assert got.astype("int64").equals(want.astype("int64"))


def test_stream_first_seen_rocksdb_guard_without_protobuf(spark):
    """In an environment without protobuf (this sandbox), the rocksdb
    variant must fail fast with an actionable error instead of the
    streaming runner's opaque worker-crash."""
    from crawler_spark.streaming import stream_first_seen_rocksdb
    from crawler_spark.streaming.rounds import _has_protobuf

    if _has_protobuf():
        pytest.skip("protobuf present — guard not reachable")

    src = spark.createDataFrame([(1, 0)], "url_id long, host_bucket int")
    with pytest.raises(ModuleNotFoundError, match="protobuf"):
        stream_first_seen_rocksdb(src)


def test_stream_first_seen_rocksdb_cross_batch_state(spark, tmp_path):
    """The transformWithStateInPandas variant (per-url_id ValueState in the
    RocksDB store — incremental state, no per-batch rewrite) must match the
    applyInPandasWithState gate's exactly-once semantics."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas's Python runner needs protobuf",
    )
    from crawler_spark.streaming import stream_first_seen_rocksdb

    src = str(tmp_path / "ids_v2")
    schema = "url_id long, host_bucket int, ts timestamp"
    base = pd.Timestamp("2024-01-01 00:00:00")
    batch1 = pd.DataFrame(
        {"url_id": [1, 2, 3, 4, 2], "host_bucket": [0, 0, 1, 1, 0],
         "ts": [base] * 5}
    )
    batch2 = pd.DataFrame(
        {"url_id": [2, 3, 5, 6], "host_bucket": [0, 1, 0, 1],
         "ts": [base + pd.Timedelta(seconds=5)] * 4}
    )
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            stream_first_seen_rocksdb(stream)
            .writeStream.format("memory")
            .queryName("first_seen_v2")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_v2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = spark.sql("select * from first_seen_v2").toPandas()
    assert sorted(got["url_id"]) == [1, 2, 3, 4, 5, 6]
    assert got["url_id"].is_unique
    assert set(got.loc[got["host_bucket"] == 0, "url_id"]) == {1, 2, 5}
    assert set(got.loc[got["host_bucket"] == 1, "url_id"]) == {3, 4, 6}


def test_stream_nbq_gate_matches_batch(spark, tmp_path):
    """Train-offline / serve-on-stream: nbq_train fits the model on the
    batch corpus, stream_nbq_gate scores the same documents arriving in
    two micro-batches with the model embedded as a literal array — every
    row must equal the batch text_quality_classifier's (the per-row
    integer fold and the broadcast-join + groupBy sum are the same
    order-free int64 arithmetic)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.text import (
        SPARK_TOKENS,
        nbq_train,
        text_quality_classifier,
    )
    from crawler_spark.streaming import stream_nbq_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    weights, prior = nbq_train(
        docs.select("doc_id", F.expr(SPARK_TOKENS).alias("toks"))
    )
    src = str(tmp_path / "docs_nbq")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_nbq_gate(stream, weights, prior)
        .writeStream.format("memory")
        .queryName("nbq")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from nbq")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        text_quality_classifier(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stream_mm_ingest_gate_matches_sequential_batches(spark, tmp_path):
    """serve_mm_ingest_gate across micro-batches == the batch admission
    API applied sequentially (admit-then-append), verdict for verdict.
    The expected side replays mm_dedup_incremental_frames over the ACTUAL
    micro-batch compositions (recovered from the batch_id partitions), so
    the assertion is order-robust no matter how the file source splits."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.multimodal import (
        _phash_index,
        mm_dedup_incremental_frames,
    )
    from crawler_spark.streaming import serve_mm_ingest_gate

    idx = _phash_index(spark, "/root/testdata/sf0.001")
    seed = idx.filter("k % 4 = 1")       # the pre-existing indexed corpus
    arriving = idx.filter("k % 4 <> 1")  # ingest side, two micro-batches
    index_dir = str(tmp_path / "index")
    verdict_dir = str(tmp_path / "verdicts")
    src = str(tmp_path / "arriving")
    seed.write.parquet(index_dir)
    arriving.filter("k % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    arriving.filter("k % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k long, phash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        serve_mm_ingest_gate(stream, index_dir, verdict_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(verdict_dir).toPandas()
    assert sorted(got.batch_id.unique()) == [0, 1], got.batch_id.unique()
    assert len(got) == arriving.count()

    # replay the admissions batch-by-batch through the batch API
    index = seed
    for bid in (0, 1):
        ks = sorted(
            int(i[3:]) for i in got.loc[got.batch_id == bid, "image_id"]
        )
        batch = idx.filter(F.col("k").isin(ks))
        assert batch.count() == len(ks)  # partitions tile the arrivals
        want = (
            mm_dedup_incremental_frames(batch, index)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        have = (
            got.loc[got.batch_id == bid]
            .drop(columns=["batch_id"])
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(have[want.columns.tolist()], want)
        index = index.unionByName(batch)

    # the persisted index now holds seed + both batches, one row per image
    assert spark.read.parquet(index_dir).count() == idx.count()


def test_stream_recrawl_schedule_matches_batch(spark, tmp_path):
    """After each observed prefix of the fetch stream, the LATEST emitted
    schedule row per page must equal the batch estimator run over the
    observations so far; asserted at the end of a 2-micro-batch stream
    against crawl_recrawl_schedule on the full events table. (The state
    carries only the four sufficient statistics, so this is a real
    cross-micro-batch accumulation test: batch 2's rows fold batch 1's
    state, not its raw observations.)"""
    from crawler_spark.operators.relational import crawl_recrawl_schedule
    from crawler_spark.streaming import stream_recrawl_schedule

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = str(tmp_path / "fetches")
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_recrawl_schedule(stream)
        .writeStream.format("memory")
        .queryName("recrawl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    upd = spark.sql("select * from recrawl").toPandas()
    # latest update per page = the row with the largest n_obs (monotone)
    got = (
        upd.sort_values(["page_id", "n_obs"])
        .groupby("page_id")
        .tail(1)
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    want = (
        crawl_recrawl_schedule(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # non-degenerate split: pages really accumulated across micro-batches
    assert (upd.groupby("page_id").size() > 1).any()


def test_stream_mm_decontaminate_matches_batch_and_is_idempotent(spark, tmp_path):
    """The image leg of the streaming overlap scrub: (a) per-image
    (n_eval_imgs, min_ham) across micro-batches must equal the batch
    operator's, (b) redelivered rows change nothing (dropDuplicates
    idempotence)."""
    from crawler_spark.operators.multimodal import (
        MM_DECONTAM_EVAL_MOD,
        _phash_index,
        mm_decontaminate,
    )
    from crawler_spark.streaming import stream_mm_decontaminate

    sf_dir = "/root/testdata/sf0.001"
    idx = _phash_index(spark, sf_dir)
    eval_index = idx.filter(f"k % {MM_DECONTAM_EVAL_MOD} = 0")

    # training stream in two micro-batches + a REDELIVERY of batch 1
    train = idx.filter(f"k % {MM_DECONTAM_EVAL_MOD} <> 0")
    src = str(tmp_path / "imgs")
    b1 = train.filter("k % 3 = 1")
    b1.coalesce(1).write.mode("append").parquet(src)
    train.filter("k % 3 <> 1").coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery

    stream = (
        spark.readStream.schema("k long, phash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_mm_decontaminate(stream, eval_index)
        .writeStream.format("memory")
        .queryName("mm_decontam")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from mm_decontam")
        .toPandas()
        .groupby("k")
        # counts grow / min_ham shrinks monotonically across updates;
        # max/min picks each image's final row without relying on
        # memory-sink ordering
        .agg(n_eval_imgs=("n_eval_imgs", "max"), min_ham=("min_ham", "min"))
        .sort_index()
    )
    want = mm_decontaminate(spark, sf_dir).toPandas()
    want["k"] = want["image_id"].str.slice(3).astype("int64")
    want = want.set_index("k")[["n_eval_imgs", "min_ham"]].sort_index()
    assert got.astype("int64").equals(want.astype("int64"))


def test_serve_clip_decontam_gate_matches_batch(spark, tmp_path):
    """The foreachBatch clip-decontamination gate: verdicts across
    micro-batches must union to the batch operator's output, and a
    redelivered batch must produce bit-identical verdict rows (the verdict
    is a pure function of the clip vs the STATIC eval index, so replay is
    harmless by construction — a consumer dedupes by clip)."""
    from crawler_spark.operators.multimodal import (
        MM_DECONTAM_EVAL_MOD,
        _video_phash_index,
        mm_video_decontaminate,
    )
    from crawler_spark.streaming import serve_clip_decontam_gate

    sf_dir = "/root/testdata/sf0.001"
    idx = _video_phash_index(spark, sf_dir)
    ev_dir = str(tmp_path / "eval_idx")
    idx.filter(f"k % {MM_DECONTAM_EVAL_MOD} = 0").write.parquet(ev_dir)

    train = idx.filter(f"k % {MM_DECONTAM_EVAL_MOD} <> 0")
    src = str(tmp_path / "clips")
    b1 = train.filter("k % 3 = 1")
    b1.coalesce(1).write.mode("append").parquet(src)
    train.filter("k % 3 <> 1").coalesce(1).write.mode("append").parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery

    verdict_dir = str(tmp_path / "verdicts")
    stream = (
        spark.readStream.schema("k long, frame_no int, fphash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        serve_clip_decontam_gate(stream, ev_dir, verdict_dir, "video")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(verdict_dir).toPandas()
    # redelivery produced duplicate rows ONLY with identical verdicts
    dedup = got.drop_duplicates(subset=["k", "n_eval_clips", "max_matched"])
    assert dedup["k"].is_unique
    # at least one clip verdicted twice (the duplicate delivery is real)
    assert got["k"].duplicated().any()

    want = mm_video_decontaminate(spark, sf_dir).toPandas()
    want_map = {
        int(r["video_id"][3:]): (int(r["n_eval_clips"]), int(r["max_matched"]))
        for _, r in want.iterrows()
    }
    got_map = {
        int(r["k"]): (int(r["n_eval_clips"]), int(r["max_matched"]))
        for _, r in dedup.iterrows()
    }
    assert got_map == want_map
