"""Physical-plan audits (SURVEY §4): the scale guarantees are properties of
the plans Catalyst produces, so they are asserted, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators import ALL_QUERIES
from crawler_spark.plans import (
    assert_no_cartesian,
    assert_pushed_filters,
    has_broadcast_join,
    scan_read_schema,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    # retired from the gated catalog in round 5 (rotation) — the plan
    # property is the point here, so the builder is referenced directly
    from crawler_spark.operators.relational import f5_priority_range

    df = f5_priority_range(spark, SF)
    assert_pushed_filters(df, ["o_totalprice", "o_orderstatus"])


def test_column_pruning(spark):
    from crawler_spark.operators.relational import g1_min_probe

    df = g1_min_probe(spark, SF)
    schemas = scan_read_schema(df)
    # the orders scan must read only the aggregated column, not all 6
    assert any(set(s) <= {"o_totalprice"} for s in schemas), schemas


def test_small_dims_broadcast(spark):
    fn, _ = ALL_QUERIES["q5_join_chain"]
    assert has_broadcast_join(fn(spark, SF))


def test_no_cartesian_in_catalog(spark):
    for name in (
        "q3_shipping_priority", "q5_join_chain", "crawl_round_schedule",
        # the ANN/near-dup scale paths must stay band-equi-joins, never a
        # cross product, and the interface extractors are single-scan
        "ann_bucket_rerank", "dedup_embedding_cosine", "mm_phash_neardup",
        "rb_matches", "kf_matches", "x9_annotate_remap",
    ):
        fn, _ = ALL_QUERIES[name]
        assert_no_cartesian(fn(spark, SF))


def test_q1_partial_aggregation_and_pushdown(spark):
    """The wide-agg scan must combine map-side (partial + final
    HashAggregate) and push the shipdate predicate into the parquet scan."""
    from crawler_spark.plans import explain_str

    fn, _ = ALL_QUERIES["q1_pricing_summary"]
    df = fn(spark, SF)
    assert explain_str(df, "simple").count("HashAggregate") >= 2
    assert_pushed_filters(df, ["l_shipdate"])


def test_decode_features_single_python_stage(spark):
    """mm_decode_features must be mapInPandas stages over Arrow batches —
    no per-row Python dispatch (BatchEvalPython) anywhere in the plan."""
    from crawler_spark.plans import explain_str

    fn, _ = ALL_QUERIES["mm_decode_features"]
    plan = explain_str(fn(spark, SF), "simple")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python UDF marker


def test_ngram_jaccard_single_shingle_scan(spark):
    """The shingle pipeline is materialized once (checkpoint leaf): the
    jaccard plan must not contain a second tokenize+shingle subtree."""
    fn, _ = ALL_QUERIES["dedup_ngram_jaccard"]
    plan = fn(spark, SF)._jdf.queryExecution().analyzed().toString()
    assert plan.count("concat_ws") == 0  # shingling happened pre-checkpoint


def test_topk_plans_as_take_ordered(spark):
    """orderBy+limit must plan as TakeOrderedAndProject (partial per-partition
    heaps), not a global sort — the O1 frontier-page scale property."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    df = orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)
    from crawler_spark.plans import explain_str

    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_boilerplate_mining_plan(spark):
    """text_boilerplate_grams' scale contract: the <= top winners are a
    materialized checkpoint leaf (they are referenced three times —
    without the checkpoint the final plan re-ran pass 1 per reference,
    measured 3 documents scans), the global top-k inside pass 1 plans as
    TakeOrderedAndProject (per-partition heaps, never a single-reducer
    sort), the string-recovery join broadcasts, and the final plan holds
    exactly ONE documents scan (pass 2; pass 1 already ran into the
    checkpoint) with no cartesian anywhere."""
    from crawler_spark.operators.common import load
    from crawler_spark.operators.text import (
        boiler_winners_plan,
        text_boilerplate_grams,
    )
    from crawler_spark.plans import explain_str

    df = text_boilerplate_grams(spark, SF)
    assert_no_cartesian(df)
    assert has_broadcast_join(df)
    assert len(scan_read_schema(df)) == 1, scan_read_schema(df)
    # the TakeOrdered property belongs to pass 1 (it is consumed by the
    # eager checkpoint, so assert it on the op's own lazy pass-1 plan)
    pass1 = boiler_winners_plan(
        load(spark, SF, "documents").select("doc_id", "source", "text")
    )
    assert "TakeOrderedAndProject" in explain_str(pass1, "simple")


def test_ann_family_single_embeddings_scan(spark):
    """ann_bucket_rerank / dedup_embedding_cosine / ann_ivf_topk draw bands,
    norms, and rerank sides from ONE materialized index (checkpoint leaf):
    their plans must contain no parquet scan of `embeddings` and at most one
    zip_with dot-product fold (the pair cosine) — round 2 measured 6 scans /
    67 folds for the rerank plan before the fix."""
    for name in ("ann_bucket_rerank", "dedup_embedding_cosine", "ann_ivf_topk"):
        fn, _ = ALL_QUERIES[name]
        plan = fn(spark, SF)._jdf.queryExecution().analyzed().toString()
        assert "parquet" not in plan.lower(), name
        assert plan.count("zip_with") <= 1, (name, plan.count("zip_with"))
    # dedup_semantic (ungated) shares the discipline: index + assignment
    # are checkpoint leaves, the pair cosine is the vectorized kernel —
    # no parquet rescan, no interpreted fold in the pair path at all
    from crawler_spark.operators.similarity import dedup_semantic

    plan = dedup_semantic(spark, SF)._jdf.queryExecution().analyzed().toString()
    assert "parquet" not in plan.lower()
    assert plan.count("zip_with") == 0, plan.count("zip_with")
    assert "mapInPandas" in plan or "MapInPandas" in plan


def test_sq8_two_stage_plan(spark):
    """ann_sq8_topk draws both stages from checkpoint leaves (the float index
    and the derived int8 codebook): no parquet rescan, and at most two dot
    folds — the quantized scan's and the exact rerank's."""
    fn, _ = ALL_QUERIES["ann_sq8_topk"]
    plan = fn(spark, SF)._jdf.queryExecution().analyzed().toString()
    assert "parquet" not in plan.lower()
    assert plan.count("zip_with") <= 2, plan.count("zip_with")


def test_sq8_stage1_bounded_per_batch(spark):
    """The quantized scan must emit at most (SQ8_SHORTLIST_MULT*TOP_K)
    candidates per query PER ARROW BATCH — not all QxN pairs — so the
    shortlist window merges a bounded stream at any corpus size. Asserted
    as a hard row-count bound: batches x Q x 3k, with batches derived from
    the per-partition row counts and the Arrow batch size. Also re-checks
    the cut is lossless: the merged shortlist equals the unbounded scan's."""
    import math

    import numpy as np

    from crawler_spark.operators.similarity import (
        N_QUERIES,
        SQ8_SHORTLIST_MULT,
        TOP_K,
        _indexed_embeddings,
        _sq8_index,
        _sq8_stage1,
    )

    base = _indexed_embeddings(spark, SF)
    qz = _sq8_index(base)
    qrows = qz.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "q8", "qn").collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["q8"] for r in qrows], dtype=np.int64)
    q_qn = np.array([r["qn"] for r in qrows], dtype=np.float64)

    stage1 = _sq8_stage1(qz, q_ids, q_mat, q_qn)
    arrow_batch = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch"))
    per_part = (
        qz.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    n_batches = sum(math.ceil(r["count"] / arrow_batch) for r in per_part)
    m = SQ8_SHORTLIST_MULT * TOP_K
    n_rows = stage1.count()
    assert n_rows <= n_batches * len(q_ids) * m, (n_rows, n_batches, len(q_ids), m)

    # lossless: global top-m over the bounded stream == top-m over all pairs
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    got = (
        stage1.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= m)
        .select("query_id", "r", "neighbor_id")
        .orderBy("query_id", "r")
        .collect()
    )
    n_corpus = qz.count()
    exp_rows = []
    all_rows = qz.select("vec_id", "q8", "qn").orderBy("vec_id").collect()
    c_ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    c_mat = np.array([r["q8"] for r in all_rows], dtype=np.int64)
    c_qn = np.array([r["qn"] for r in all_rows], dtype=np.float64)
    qcos = (q_mat @ c_mat.T).astype(np.float64) / (q_qn[:, None] * c_qn[None, :])
    qcos[q_ids[:, None] == c_ids[None, :]] = -np.inf
    for qi, qid in enumerate(q_ids):
        order = np.lexsort((c_ids, -qcos[qi]))[: min(m, n_corpus)]
        for r, j in enumerate(order, start=1):
            if np.isfinite(qcos[qi][j]):
                exp_rows.append((int(qid), r, int(c_ids[j])))
    assert [(g["query_id"], g["r"], g["neighbor_id"]) for g in got] == sorted(exp_rows)


def test_frame_sample_single_python_stage(spark):
    """mm_frame_sample must be mapInPandas stages over Arrow batches — no
    per-row Python dispatch (BatchEvalPython) anywhere in the plan."""
    from crawler_spark.plans import explain_str

    fn, _ = ALL_QUERIES["mm_frame_sample"]
    plan = explain_str(fn(spark, SF), "simple")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_phash_neardup_single_decode(spark):
    """mm_phash_neardup's (k, phash) index is materialized once (checkpoint
    leaf): the band self-join, Hamming verify, and final left join must all
    read that leaf — zero MapInPandas decode stages downstream (the
    ANN-family single-scan property applied to the image corpus)."""
    fn, _ = ALL_QUERIES["mm_phash_neardup"]
    plan = fn(spark, SF)._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan  # the checkpoint leaf


def test_seen_probe_prunes_to_discovery_buckets(spark, tmp_path):
    """The 10^10-seen design: StateStore writes seen deltas PARTITIONED by
    host_bucket, and the discovery-dedup probe joins seen on
    (url_id, host_bucket) against the broadcast discovery set — dynamic
    partition pruning then reads ONLY the buckets present in the discovery
    set (round.py step 7). Asserted on the real store layout."""
    from crawler_spark.engine.state import StateStore

    store = StateStore(spark, str(tmp_path / "state"))
    seen_delta = spark.range(10000).select(
        F.col("id").alias("url_id"),
        F.pmod("id", F.lit(16)).cast("int").alias("host_bucket"),
        F.lit("fetched").alias("status"),
        F.lit(1).cast("int").alias("round"),
    )
    empty_frontier = spark.createDataFrame(
        [], "url_id long, url string, host string, host_bucket int, priority double,"
        " depth int, discovered_round int, tries_left int"
    )
    store.commit_round(
        1,
        empty_frontier,
        seen_delta,
        spark.createDataFrame([], "round int, seq int, url_id long"),
        spark.createDataFrame([], "round int, url_id long, url string, image_id string"),
    )
    store.finalize_round(1, {"round": 1})
    seen_r = store.seen()
    # discovery-set shape from round.py: groupBy over a filtered href base
    base = spark.range(100).select(
        (F.col("id") * 7 + 1).alias("dst_url_id"),
        F.pmod("id", F.lit(3)).cast("int").alias("dst_host_bucket"),
        F.col("id").alias("_pseq"),
    ).filter("dst_url_id % 2 = 1")
    distinct_new = (
        base.groupBy("dst_url_id")
        .agg(F.min_by("dst_host_bucket", "_pseq").alias("host_bucket"))
        .withColumnRenamed("dst_url_id", "url_id")
    )
    hits_seen = seen_r.select("url_id", "host_bucket").join(
        F.broadcast(distinct_new), ["url_id", "host_bucket"], "inner"
    )
    from crawler_spark.plans import explain_str

    plan = explain_str(hits_seen)
    assert "dynamicpruning" in plan.lower(), plan
    n_hits = hits_seen.count()  # before compaction: vacuum deletes these files

    # same probe against the COMPACTED base layout (seen_base/gen=N
    # partitioned by host_bucket alone): bucket pruning must survive the
    # rewrite — that is the point of keeping host_bucket the partition key
    store.compact_seen()
    store.vacuum_seen()
    seen_c = StateStore(spark, str(tmp_path / "state")).seen()
    hits_compacted = seen_c.select("url_id", "host_bucket").join(
        F.broadcast(distinct_new), ["url_id", "host_bucket"], "inner"
    )
    plan_c = explain_str(hits_compacted)
    assert "dynamicpruning" in plan_c.lower(), plan_c
    assert hits_compacted.count() == n_hits


def test_pipeline_text_ops_plan_shapes(spark):
    """Scale-claim audits for the text-pipeline ops: sample_mixture is a
    pure map+filter (ZERO exchanges), pack_sequences shuffles exactly once
    (the per-shard window's hash partitioning — its parallelism lever), and
    decontaminate's eval side enters as a broadcast (the training corpus
    never shuffles before the post-join aggregate)."""
    from crawler_spark.operators.text import (
        decontaminate,
        pack_sequences,
        sample_mixture,
    )
    from crawler_spark.plans import explain_str, has_broadcast_join

    mix = explain_str(sample_mixture(spark, SF))
    assert "Exchange" not in mix, mix

    pack = explain_str(pack_sequences(spark, SF))
    assert pack.count("Exchange (") == 1, pack  # exactly one exchange node
    assert "hashpartitioning(shard" in pack, pack

    assert has_broadcast_join(decontaminate(spark, SF))


def test_pipeline_single_documents_scan(spark):
    """pipeline_clean_corpus reads `documents` ONCE into a checkpointed
    (doc_id, text, toks) frame; metrics, repetition, surprisal,
    decontamination grams, near-dup shingles, and exact dedup all derive
    from that leaf. The returned plan must therefore contain ZERO further
    `documents` scans (the one embeddings scan remains) and no tokenizer
    regex anywhere — the tokenize ran exactly once, inside the checkpoint."""
    from crawler_spark.operators.common import SPARK_TOKENS
    from crawler_spark.operators.pipeline import pipeline_clean_corpus

    df = pipeline_clean_corpus(spark, SF)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "documents" not in plan.lower(), plan
    # the whole-document tokenize ran exactly once, inside the checkpoint:
    # the tokenizer's regex literal appears in the plan only inside the C4
    # gate's per-LINE word count (a lambda over split lines — it cannot
    # reuse whole-document toks by construction), never over `text`
    tokenizer_regex = SPARK_TOKENS.split("'")[1]
    # two occurrences, both the C4 kept-lines array (projected once for
    # text_clean, once for n_kept); a third would mean a whole-document
    # re-tokenize crept in
    assert plan.count(tokenizer_regex) == 2, plan.count(tokenizer_regex)
    import re as _re

    assert not _re.search(
        r"split\(lower\(text#\d+\), \[\^a-z0-9\]\+", plan
    ), "tokenizer regex applied to whole-document text outside the checkpoint"
    assert "lower(lambda l#" in plan, plan
    # exactly one parquet relation survives: the embeddings coverage probe
    assert plan.lower().count("parquet") == 1, plan


def test_round3_ops_plan_shapes(spark):
    """Scale-claim audits for the round-3 additions: text_surprisal's
    unigram model must enter the doc scan as a broadcast (the corpus side
    never shuffles to meet it), text_pii_scrub is a pure per-row map (ZERO
    exchanges), sample_stratified shuffles exactly once (the per-stratum
    rank window keyed by source), and mm_pair_curation is a single Python
    kernel chain (zero exchanges, zero joins, no per-row BatchEvalPython)."""
    from crawler_spark.operators.multimodal import mm_pair_curation
    from crawler_spark.operators.text import (
        sample_stratified,
        text_pii_scrub,
        text_surprisal,
    )
    from crawler_spark.plans import explain_str, has_broadcast_join

    assert has_broadcast_join(text_surprisal(spark, SF))

    pii = explain_str(text_pii_scrub(spark, SF))
    assert "Exchange" not in pii, pii

    strat = explain_str(sample_stratified(spark, SF))
    assert strat.count("Exchange (") == 1, strat
    assert "hashpartitioning(source" in strat, strat

    pair = explain_str(mm_pair_curation(spark, SF))
    assert "Exchange" not in pair, pair
    assert "Join" not in pair, pair
    assert "BatchEvalPython" not in pair, pair


def test_line_dedup_plan_shape(spark):
    """text_line_dedup's keeper must be an AGGREGATE (min(struct) with a
    map-side partial pass that collapses hot boilerplate lines), NEVER a
    row_number window (which funnels every occurrence of a hot line
    through one un-splittable sort task). Shape: keeper agg keyed by the
    line + reassembly agg keyed by doc_id + the totals join — all fed
    from one checkpointed tokenize (zero parquet re-scans downstream),
    no cartesian."""
    from crawler_spark.operators.text import text_line_dedup
    from crawler_spark.plans import assert_no_cartesian, explain_str, scan_read_schema

    df = text_line_dedup(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "Window" not in plan, plan  # the skew-unsafe shape
    assert "hashpartitioning(line" in plan, plan
    assert "hashpartitioning(doc_id" in plan, plan
    assert plan.count("Exchange (") == 3, plan  # keeper, reassembly, totals join
    # partial + final pairs for BOTH aggregates (min(struct) is partial-able)
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 4, plan
    # the tokenize ran once, inside the eager checkpoint leaf
    assert scan_read_schema(df) == [], "expected no parquet scan downstream"


def test_asof_and_range_join_plan_shapes(spark):
    """The as-of join must be a single ordered window (no join operator at
    all); the bucketed range join must plan as an EQUI hash join on the
    derived interval id — a naive non-equi formulation would appear as
    BroadcastNestedLoopJoin, the plan that dies at scale."""
    from crawler_spark.operators.relational import x_asof_join, x_range_join
    from crawler_spark.plans import explain_str

    asof = explain_str(x_asof_join(spark, SF))
    assert "Join" not in asof, asof
    assert "Window" in asof, asof

    rng = explain_str(x_range_join(spark, SF))
    assert "NestedLoop" not in rng, rng
    assert "BroadcastHashJoin" in rng, rng


def test_dedup_incremental_gate_plan_shape(spark):
    """The admission gate's plan: band equi-joins only (no cartesian — the
    1-row integrity guard rides a broadcast), and the final plan reads the
    MATERIALIZED candidate/neighbor checkpoints instead of re-deriving the
    band self-joins per consumer (scan leaves, not three join subtrees)."""
    from crawler_spark.operators.dedup import dedup_incremental
    from crawler_spark.plans.audit import assert_no_cartesian, explain_str

    df = dedup_incremental(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df, "simple")
    # the cand/nbr_sh checkpoints appear as in-memory scans; the band
    # stack/self-join must NOT be re-planned downstream of them
    assert plan.count("ExistingRDD") >= 2 or plan.count("Scan ExistingRDD") >= 2, plan[:2000]


def test_dsir_plan_shape(spark):
    """text_dsir's scale contract: the <=DSIR_BUCKETS-row weight table
    enters the scoring pass as a BROADCAST off the histogram checkpoint
    (the corpus side never shuffles to meet it), the quota cut plans as
    TakeOrderedAndProject (per-partition top-q, no global sort), and the
    whole selection touches parquet exactly once — doc_id and text only
    (pass one's tokenize is checkpointed into the histogram)."""
    from crawler_spark.operators.text import text_dsir
    from crawler_spark.plans import (
        assert_no_cartesian,
        explain_str,
        has_broadcast_join,
        scan_read_schema,
    )

    df = text_dsir(spark, SF)
    assert_no_cartesian(df)
    assert has_broadcast_join(df)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan
    schemas = scan_read_schema(df)
    assert len(schemas) == 1, schemas  # one parquet scan in the final plan
    assert schemas[0] == ["doc_id", "text"], schemas


def test_video_neardup_single_phash_pass(spark):
    """mm_video_neardup's frame-phash index is materialized once: the band
    self-join, Hamming verify, per-pair containment count, and per-video
    rollup all read that checkpoint leaf — zero MapInPandas stages
    downstream (mm_phash_neardup's single-decode property, per frame)."""
    from crawler_spark.operators.multimodal import mm_video_neardup
    from crawler_spark.plans import assert_no_cartesian

    df = mm_video_neardup(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan  # the checkpoint leaf


def test_gopher_rules_zero_exchange(spark):
    """text_gopher_rules is a pure per-row map on the shared tokenize —
    the gate must add ZERO exchanges and no Python stage (it fuses onto
    whatever scan already carries the text)."""
    from crawler_spark.operators.text import text_gopher_rules
    from crawler_spark.plans import explain_str

    plan = explain_str(text_gopher_rules(spark, SF))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_audio_neardup_single_fingerprint_pass(spark):
    """mm_audio_neardup's window-fingerprint index is materialized once: the
    band self-join, Hamming verify, containment count, and per-clip rollup
    all read that checkpoint leaf — zero MapInPandas stages downstream
    (the same single-pass property as the image and video dedup paths,
    which share its containment kernel)."""
    from crawler_spark.operators.multimodal import mm_audio_neardup
    from crawler_spark.plans import assert_no_cartesian

    df = mm_audio_neardup(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan  # the checkpoint leaf


def test_source_rollup_plan_shape(spark):
    """source_rollup reads `documents` ONCE into the checkpointed
    (doc_id, source, text, toks) frame; metrics and the near-dup groups
    both derive from that leaf, so the returned plan has ZERO parquet
    scans and no tokenizer regex (the tokenize ran inside the checkpoint),
    and no cartesian anywhere in the composition."""
    from crawler_spark.operators.common import SPARK_TOKENS
    from crawler_spark.operators.pipeline import source_rollup
    from crawler_spark.plans import assert_no_cartesian

    df = source_rollup(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "documents" not in plan.lower(), plan
    assert SPARK_TOKENS.split("'")[1] not in plan
    assert plan.lower().count("parquet") == 0, plan


def test_substring_dedup_plan_shape(spark):
    """text_substring_dedup's first-occurrence pick must be an AGGREGATE
    (min over the packed occurrence key, partial-aggregable map-side so a
    hot boilerplate gram collapses to one row per input partition — the
    partial+final HashAggregate pair around the gram-hash exchange), NEVER
    a row_number window; the covered-position rollup exchanges on doc_id;
    the whole op reads one checkpointed tokenize (zero parquet scans
    downstream) and has no cartesian or nested-loop join anywhere. (The
    firsts side MAY broadcast here — at sf0.001 the checkpointed stats
    prove it fits, and the same stats flip the join to shuffle-on-h at
    scale; nothing in the op forces either.)"""
    from crawler_spark.operators.text import text_substring_dedup
    from crawler_spark.plans import assert_no_cartesian, explain_str, scan_read_schema

    df = text_substring_dedup(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "Window" not in plan, plan
    assert "NestedLoop" not in plan, plan
    assert "hashpartitioning(h" in plan, plan     # firsts agg keyed by gram hash
    assert "hashpartitioning(doc_id" in plan, plan  # covered-position rollup
    # partial + final pair for the firsts min() (map-side combine exists)
    assert plan.count("HashAggregate") >= 2, plan
    assert scan_read_schema(df) == [], "expected no parquet scan downstream"


def test_pq_stage1_bounded_per_batch(spark):
    """The ADC scan must emit at most (PQ_SHORTLIST_MULT*TOP_K) candidates
    per query PER ARROW BATCH — not all QxN pairs (the ann_sq8 stage1
    lesson applied from birth). Losslessness of the cut is already proven
    end-to-end by the DuckDB twin, whose stage1 window ranks the FULL QxN
    ADC scores: oracle parity would break if the per-batch cut dropped a
    global-shortlist member."""
    import math

    from crawler_spark.operators.similarity import (
        PQ_SHORTLIST_MULT,
        TOP_K,
        _indexed_embeddings,
        _pq_index,
        _pq_query_luts,
        _pq_stage1,
    )

    base = _indexed_embeddings(spark, SF)
    codes, cb = _pq_index(base)
    # the SHARED LUT builder (production path) — the test measures exactly
    # the stage1 ann_pq_topk runs
    q_ids, q_luti, q_norms = _pq_query_luts(base, cb)

    stage1 = _pq_stage1(codes, q_ids, q_luti, q_norms)
    arrow_batch = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch"))
    per_part = codes.groupBy(F.spark_partition_id().alias("p")).count().collect()
    n_batches = sum(math.ceil(r["count"] / arrow_batch) for r in per_part)
    m = PQ_SHORTLIST_MULT * TOP_K
    n_rows = stage1.count()
    assert n_rows <= n_batches * len(q_ids) * m, (n_rows, n_batches, len(q_ids), m)


def test_lm_ops_scan_budget(spark):
    """Serving-plan scan budget for the round-5 LM family (the
    pipeline_single_documents_scan discipline): the NB classifier serves
    off ONE documents scan (single concat-explode of unigram+bigram
    features against the checkpointed weight table — a union of two
    explodes cost a second full tokenize), bigram surprisal off TWO (the
    scoring explode + the first-token leg; both models are checkpoint
    leaves), and the CCNet buckets off THREE (bigram's two + the
    column-pruned lang join, which must read only doc_id/lang). All
    broadcast where a model joins, no cartesian anywhere."""
    from crawler_spark.operators.text import (
        text_bigram_surprisal,
        text_ppl_buckets,
        text_quality_classifier,
    )

    for fn, max_scans in (
        (text_quality_classifier, 1),
        (text_bigram_surprisal, 2),
        (text_ppl_buckets, 3),
    ):
        df = fn(spark, SF)
        assert_no_cartesian(df)
        assert has_broadcast_join(df)
        scans = scan_read_schema(df)
        assert len(scans) <= max_scans, (fn.__name__, scans)
    # the lang-key scan reads only the two join columns
    lang_scans = [
        s for s in scan_read_schema(text_ppl_buckets(spark, SF))
        if "lang" in s
    ]
    assert lang_scans and all(
        set(s) <= {"doc_id", "lang"} for s in lang_scans
    ), lang_scans


def test_temperature_sampling_plan_shape(spark):
    """sample_temperature's scale contract: the |langs|-row rate table is a
    checkpoint leaf BROADCAST into the serving join (broadcastable at ANY
    corpus size by construction), the corpus side never shuffles — zero
    hashpartitioning exchanges in the final plan — and the selection
    touches parquet exactly once, reading doc_id and lang only."""
    from crawler_spark.operators.text import sample_temperature
    from crawler_spark.plans import explain_str

    df = sample_temperature(spark, SF)
    assert_no_cartesian(df)
    assert has_broadcast_join(df)
    plan = explain_str(df, "simple")
    assert "hashpartitioning" not in plan, plan
    schemas = scan_read_schema(df)
    assert len(schemas) == 1, schemas
    assert schemas[0] == ["doc_id", "lang"], schemas


def test_unimax_sampling_plan_shape(spark):
    """sample_unimax shares sample_temperature's serving contract: the
    water-fill windows run over the ≤|langs|-row count table BEFORE the
    checkpoint, so the final plan is one pruned corpus scan + a broadcast
    rate join — no window, no hashpartitioning exchange, no cartesian."""
    from crawler_spark.operators.text import sample_unimax
    from crawler_spark.plans import explain_str

    df = sample_unimax(spark, SF)
    assert_no_cartesian(df)
    assert has_broadcast_join(df)
    plan = explain_str(df, "simple")
    assert "hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan
    schemas = scan_read_schema(df)
    assert len(schemas) == 1, schemas
    assert schemas[0] == ["doc_id", "lang"], schemas


def test_mm_incremental_plan_shape(spark):
    """The image admission gate bands both sides off the ONE (k, phash)
    checkpoint leaf — zero MapInPandas decode stages downstream (the
    mm_phash_neardup single-decode property) — and candidates come from
    band equi-joins only, never a cartesian."""
    from crawler_spark.operators.multimodal import mm_dedup_incremental

    df = mm_dedup_incremental(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_recrawl_schedule_plan_shape(spark):
    """The freshness schedule is ONE events scan reading exactly the three
    observation columns, collapsed by a single page-keyed exchange whose
    map-side partial agg ships one row per page — no window, no join, no
    second scan."""
    from crawler_spark.operators.relational import crawl_recrawl_schedule
    from crawler_spark.plans import explain_str

    df = crawl_recrawl_schedule(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df, "simple")
    assert plan.count("hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    schemas = scan_read_schema(df)
    assert len(schemas) == 1, schemas
    assert schemas[0] == ["ts", "user_id", "event_type"], schemas


def test_mm_best_rep_plan_shape(spark):
    """Everything downstream of the one checkpointed
    (k, phash, g_sum, g_ssq) leaf is JVM expressions: no MapInPandas decode
    stage in the serving plan, no parquet rescan, no cartesian."""
    from crawler_spark.operators.multimodal import mm_best_rep

    df = mm_best_rep(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan and "mapInPandas" not in plan
    assert "parquet" not in plan.lower()


def test_shard_pack_plan_shape(spark):
    """mm_shard_pack is ONE pruned documents scan keyed into writer streams
    by exactly ONE exchange feeding the per-stream greedy kernel
    (FlatMapGroupsInPandas) — no window, no join, no second scan."""
    from crawler_spark.operators.multimodal import mm_shard_pack
    from crawler_spark.plans import explain_str

    df = mm_shard_pack(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df, "simple")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert plan.count("hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    schemas = scan_read_schema(df)
    assert len(schemas) == 1, schemas
    assert schemas[0] == ["doc_id", "text"], schemas


def test_mm_video_incremental_plan_shape(spark):
    """The video admission gate bands both sides off the ONE
    (k, frame_no, fphash) checkpoint leaf — no MapInPandas decode stage
    downstream — and candidates come from band equi-joins only."""
    from crawler_spark.operators.multimodal import mm_video_dedup_incremental

    df = mm_video_dedup_incremental(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan and "mapInPandas" not in plan
    assert "parquet" not in plan.lower()


def test_mm_audio_incremental_plan_shape(spark):
    """The audio admission gate bands both sides off the ONE
    (k, win_no, ahash) checkpoint leaf — no Python stage downstream, no
    parquet rescan, candidates from band equi-joins only."""
    from crawler_spark.operators.multimodal import mm_audio_dedup_incremental

    df = mm_audio_dedup_incremental(spark, SF)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan and "mapInPandas" not in plan
    assert "parquet" not in plan.lower()


def test_clip_topk_plan_shape(spark):
    """The containment retrieval kernel is an index PROBE: the query side
    (n_queries x units x bands rows) broadcasts into the band equi-join —
    the corpus fingerprint index must never shuffle to meet it — and the
    only exchanges are the per-pair aggregate and the |queries|-keyed
    ranking window; no cartesian, no Python stage past the checkpointed
    fingerprint leaf."""
    from crawler_spark.operators.multimodal import mm_audio_topk, mm_video_topk
    from crawler_spark.plans import (
        assert_no_cartesian,
        explain_str,
        has_broadcast_join,
    )

    for fn in (mm_video_topk, mm_audio_topk):
        df = fn(spark, SF)
        assert_no_cartesian(df)
        assert has_broadcast_join(df), fn.__name__
        plan = explain_str(df)
        assert "Scan parquet" not in plan, fn.__name__  # checkpoint leaf
        assert "BatchEvalPython" not in plan, fn.__name__


def test_split_plan_shape(spark):
    """pipeline_split rides the checkpointed tokenize leaf: the final plan
    has ZERO parquet scans (both the shingle frame and the text join read
    the checkpoint), no Python stage, no window, no cartesian — the only
    new work over the audited groups dataflow is a per-row md5 bucket."""
    from crawler_spark.operators.pipeline import pipeline_split
    from crawler_spark.plans import assert_no_cartesian, explain_str

    df = pipeline_split(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "Scan parquet" not in plan, plan
    assert "BatchEvalPython" not in plan and "Window" not in plan, plan


def test_c4_rules_plan_shape(spark):
    """text_c4_rules reads `documents` once with ZERO exchanges: the rules
    are per-line-local, so kept lines live in a per-row filter() HOF and
    the page reassembles with array_join — nothing may explode or shuffle;
    no Python stage, no window, no cartesian."""
    from crawler_spark.operators.text import text_c4_rules
    from crawler_spark.plans import assert_no_cartesian, explain_str

    df = text_c4_rules(spark, SF)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert plan.count("Scan parquet  (") == 1, plan
    assert plan.count("Exchange (") == 0, plan
    assert "Generate" not in plan, plan
    assert "BatchEvalPython" not in plan and "Window" not in plan, plan


def test_decontam_broadcast_probe_plan(spark):
    """The decontamination row's scale contract: the eval side enters as a
    BROADCAST (the train corpus never shuffles to meet the benchmark
    suite), no cartesian anywhere, and zero Python stages past the
    checkpointed fingerprint leaf — all three modalities."""
    from crawler_spark.operators.multimodal import (
        mm_audio_decontaminate,
        mm_decontaminate,
        mm_video_decontaminate,
    )
    from crawler_spark.plans import assert_no_cartesian, has_broadcast_join

    for fn in (mm_decontaminate, mm_video_decontaminate, mm_audio_decontaminate):
        df = fn(spark, SF)
        assert has_broadcast_join(df), fn.__name__
        assert_no_cartesian(df)
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "MapInPandas" not in plan, fn.__name__
        assert "ExistingRDD" in plan or "LogicalRDD" in plan  # checkpoint leaf


def test_clip_best_rep_single_decode_pass(spark):
    """The clip argmax reps fuse fingerprint + quality signal into ONE
    decode pass: everything downstream of the checkpointed rep-index leaf
    (containment edges, components, argmax) is JVM expressions — zero
    MapInPandas stages, no cartesian."""
    from crawler_spark.operators.multimodal import (
        mm_audio_best_rep,
        mm_video_best_rep,
    )
    from crawler_spark.plans import assert_no_cartesian

    for fn in (mm_video_best_rep, mm_audio_best_rep):
        df = fn(spark, SF)
        assert_no_cartesian(df)
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "MapInPandas" not in plan, fn.__name__
        assert "ExistingRDD" in plan or "LogicalRDD" in plan  # checkpoint leaf
