"""Oracle parity for builders that are deliberately NOT catalog slots.

The driver gates at most 50 queries, so folded/retired entries lose their
standalone slot (text_fingerprint's expressions ride text_metrics' scan;
mm_binary_stats' byte-stat semantics are gated through mm_frame_sample and
mm_sample_select) — but the standalone builders keep full DuckDB-twin
verification here, so a regression cannot hide in the fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import (
    AUDIO_FEATURES_SQL,
    AUDIO_NEARDUP_SQL,
    BINARY_STATS_SQL,
    MM_BEST_REP_SQL,
    MM_SHARD_PACK_SQL,
    MM_INCREMENTAL_SQL,
    MM_AUDIO_INCREMENTAL_SQL,
    MM_VIDEO_INCREMENTAL_SQL,
    PAIR_CURATION_SQL,
    AUDIO_GROUPS_SQL,
    AUDIO_QUALITY_SQL,
    AUDIO_SPLIT_SQL,
    AUDIO_TOPK_SQL,
    MM_SPLIT_SQL,
    MM_DECONTAM_SQL,
    VIDEO_DECONTAM_SQL,
    AUDIO_DECONTAM_SQL,
    VIDEO_BEST_REP_SQL,
    AUDIO_BEST_REP_SQL,
    PHASH_GROUPS_SQL,
    VIDEO_GROUPS_SQL,
    VIDEO_QUALITY_SQL,
    VIDEO_SPLIT_SQL,
    VIDEO_TOPK_SQL,
    PHASH_TOPK_SQL,
    QUALITY_SQL,
    VIDEO_NEARDUP_SQL,
    mm_audio_features,
    mm_audio_neardup,
    mm_binary_stats,
    mm_best_rep,
    mm_shard_pack,
    mm_dedup_incremental,
    mm_audio_dedup_incremental,
    mm_video_dedup_incremental,
    mm_pair_curation,
    mm_audio_groups,
    mm_audio_best_rep,
    mm_audio_decontaminate,
    mm_audio_quality,
    mm_audio_split,
    mm_audio_topk,
    mm_decontaminate,
    mm_phash_groups,
    mm_phash_topk,
    mm_split,
    mm_video_best_rep,
    mm_video_decontaminate,
    mm_video_groups,
    mm_video_quality,
    mm_video_split,
    mm_video_topk,
    mm_quality_filter,
    mm_video_neardup,
)
from crawler_spark.operators.dedup import INCREMENTAL_SQL, dedup_incremental
from crawler_spark.operators.pipeline import (
    BEST_REP_SQL,
    CORPUS_CARD_SQL,
    PIPELINE_SQL,
    SOURCE_ROLLUP_SQL,
    SPLIT_SQL,
    corpus_card,
    dedup_best_rep,
    pipeline_clean_corpus,
    pipeline_split,
    source_rollup,
)
from crawler_spark.operators.relational import (
    ASOF_SQL,
    F5_SQL,
    G1_SQL,
    RANGE_SQL,
    RECRAWL_SQL,
    ROLLUP_SQL,
    crawl_recrawl_schedule,
    f5_priority_range,
    g1_min_probe,
    x_asof_join,
    x_range_join,
    x_rollup_hier,
)
from crawler_spark.operators.si_interface import (
    SI_INFO_SQL,
    SI_REMARKS_SQL,
    si_info,
    si_remarks,
)
from crawler_spark.operators.similarity import (
    ANN_MULTIPROBE_SQL,
    SEMDEDUP_SQL,
    ann_ivf_topk,
    ann_multiprobe_topk,
    dedup_semantic,
    ivf_sql,
)
from crawler_spark.operators.text import (
    BIGRAM_SURPRISAL_SQL,
    BM25_SQL,
    BOILERPLATE_SQL,
    C4_RULES_SQL,
    NBQ_SQL,
    PPL_BUCKETS_SQL,
    DECONTAM_SQL,
    DUP_GRAMS_SQL,
    FINGERPRINT_SQL,
    GOPHER_RULES_SQL,
    KMV_SQL,
    LINE_DEDUP_SQL,
    MIXTURE_SQL,
    PACK_SQL,
    PII_SQL,
    REPETITION_SQL,
    STRATIFIED_SQL,
    TEMPERATURE_SQL,
    UNIMAX_SQL,
    WINNOW_SQL,
    decontaminate,
    pack_sequences,
    sample_mixture,
    sample_temperature,
    sample_unimax,
    SURPRISAL_SQL,
    sample_stratified,
    text_bigram_surprisal,
    text_bm25_topk,
    text_boilerplate_grams,
    text_c4_rules,
    text_fingerprint,
    text_ppl_buckets,
    text_quality_classifier,
    text_winnow_fingerprints,
    text_dup_grams,
    text_gopher_rules,
    text_kmv_distinct,
    text_line_dedup,
    text_pii_scrub,
    text_repetition,
    text_surprisal,
)
from crawler_spark.oracle_check import compare_one, duck_connect

SF = "/root/testdata/sf0.001"


def test_ungated_builders_match_oracle(spark):
    con = duck_connect(SF)
    for name, fn, sql in [
        ("mm_binary_stats", mm_binary_stats, BINARY_STATS_SQL),
        ("text_fingerprint", text_fingerprint, FINGERPRINT_SQL),
        ("mm_audio_features", mm_audio_features, AUDIO_FEATURES_SQL),
        ("pipeline_clean_corpus", pipeline_clean_corpus, PIPELINE_SQL),
        # FineWeb-style per-source audit: near-dup and quality-keep rates
        # rolled up to the domain level, one exchange keyed by source
        ("source_rollup", source_rollup, SOURCE_ROLLUP_SQL),
        # quality-aware cluster representative: keep the best-quality
        # member per near-dup group (argmax over multi-groups only)
        ("dedup_best_rep", dedup_best_rep, BEST_REP_SQL),
        # leakage-safe split: train/val/test keyed by the duplicate CLASS
        # (group label; singletons by md5(text)) so near-dups never
        # straddle the train/eval boundary
        ("pipeline_split", pipeline_split, SPLIT_SQL),
        ("decontaminate", decontaminate, DECONTAM_SQL),
        ("sample_mixture", sample_mixture, MIXTURE_SQL),
        # τ = 2 temperature language balancing: corpus-DERIVED integer-exact
        # rates (isqrt weights), the mT5/XLM-R upgrade of sample_mixture's
        # fixed rate table
        ("sample_temperature", sample_temperature, TEMPERATURE_SQL),
        # UniMax-1 water-filling: tail languages kept verbatim, head cut to
        # one absolute water level — the epoch-capped successor knob
        ("sample_unimax", sample_unimax, UNIMAX_SQL),
        # freshness policy: per-page change-rate estimate (exact milli-bits
        # log ratio) -> next-revisit interval, one page-keyed exchange
        ("crawl_recrawl_schedule", crawl_recrawl_schedule, RECRAWL_SQL),
        ("pack_sequences", pack_sequences, PACK_SQL),
        ("ann_multiprobe_topk", ann_multiprobe_topk, ANN_MULTIPROBE_SQL),
        # multi-round Lloyd training past the gated IVF_ITERS depth:
        # re-assignment between rounds, same dataflow — the generated
        # oracle trains the identical codebook
        ("ann_ivf_topk_3iter", lambda s, d: ann_ivf_topk(s, d, n_iter=3), ivf_sql(3)),
        # SemDeDup: within-cluster epsilon-similar pairs over the same
        # trained codebook; lower-id cluster-mate wins, no transitive rescue
        ("dedup_semantic", dedup_semantic, SEMDEDUP_SQL),
        # round-5 catalog rotation: the four retired slots keep full twin
        # verification here (the round-3 procedure) while their freed gated
        # slots cover ann_pq/ann_ivfpq/text_substring_dedup/text_dsir
        ("f5_priority_range", f5_priority_range, F5_SQL),
        ("g1_min_probe", g1_min_probe, G1_SQL),
        ("si_remarks", si_remarks, SI_REMARKS_SQL),
        ("si_info", si_info, SI_INFO_SQL),
        ("text_repetition", text_repetition, REPETITION_SQL),
        ("sample_stratified", sample_stratified, STRATIFIED_SQL),
        ("text_surprisal", text_surprisal, SURPRISAL_SQL),
        # BM25 top-k retrieval: integer-exact Okapi scoring (rational
        # idf + milli-quantized length norm), the retrieval leg of
        # decontamination/audit pipelines
        ("text_bm25_topk", text_bm25_topk, BM25_SQL),
        # boilerplate mining: global top-k k-grams by document frequency,
        # hash-first two-pass (8-byte shuffle keys, strings recovered for
        # the <= top winners only)
        ("text_boilerplate_grams", text_boilerplate_grams, BOILERPLATE_SQL),
        # fastText-style hashed unigram+bigram NB quality classifier:
        # milli-bit log-odds + prior, threshold keep (the classifier leg
        # next to text_dsir's resampling leg)
        ("text_quality_classifier", text_quality_classifier, NBQ_SQL),
        # conditional bigram-LM surprisal: sees word order that the
        # unigram text_surprisal provably cannot (separation pinned below)
        ("text_bigram_surprisal", text_bigram_surprisal, BIGRAM_SURPRISAL_SQL),
        # CCNet head/middle/tail: per-language tercile split on exact
        # micro-bits-per-token under the bigram model (the trilogy's
        # third leg next to text_line_dedup and the LM score)
        ("text_ppl_buckets", text_ppl_buckets, PPL_BUCKETS_SQL),
        # winnowing fingerprints (MOSS): guaranteed-overlap sample, the
        # shuffle-thrifty sibling of text_dup_grams
        ("text_winnow_fingerprints", text_winnow_fingerprints, WINNOW_SQL),
        ("text_dup_grams", text_dup_grams, DUP_GRAMS_SQL),
        # CCNet-style span removal: globally-first occurrence of each
        # pseudo-line survives, every other copy is dropped and the
        # cleaned text is reassembled in position order
        ("text_line_dedup", text_line_dedup, LINE_DEDUP_SQL),
        ("x_asof_join", x_asof_join, ASOF_SQL),
        ("x_range_join", x_range_join, RANGE_SQL),
        ("x_rollup_hier", x_rollup_hier, ROLLUP_SQL),
        ("text_kmv_distinct", text_kmv_distinct, KMV_SQL),
        ("text_pii_scrub", text_pii_scrub, PII_SQL),
        ("mm_quality_filter", mm_quality_filter, QUALITY_SQL),
        ("mm_pair_curation", mm_pair_curation, PAIR_CURATION_SQL),
        ("mm_phash_groups", mm_phash_groups, PHASH_GROUPS_SQL),
        # leakage-safe image split: train/val/test keyed by the phash
        # duplicate class (no singleton escape hatch needed — identical
        # bytes => identical phash => Hamming-0 edge => one group)
        ("mm_split", mm_split, MM_SPLIT_SQL),
        # query-by-image retrieval: banded-LSH candidates, exact popcount
        # rerank, per-query top-k page (the image-axis ann_bucket_rerank)
        ("mm_phash_topk", mm_phash_topk, PHASH_TOPK_SQL),
        # query-by-clip retrieval: containment (n_matched, sum_ham) rank
        # over the same band CTEs as the near-dup siblings
        ("mm_video_topk", mm_video_topk, VIDEO_TOPK_SQL),
        ("mm_audio_topk", mm_audio_topk, AUDIO_TOPK_SQL),
        # transitive clip dup groups (CC over containment edges) and the
        # leakage-safe clip splits keyed on them
        ("mm_video_groups", mm_video_groups, VIDEO_GROUPS_SQL),
        ("mm_audio_groups", mm_audio_groups, AUDIO_GROUPS_SQL),
        ("mm_video_split", mm_video_split, VIDEO_SPLIT_SQL),
        ("mm_audio_split", mm_audio_split, AUDIO_SPLIT_SQL),
        # quality row of the modality matrix: static/exposure (video) and
        # clipping/silence/noisiness (audio) verdicts on exact int sums
        ("mm_video_quality", mm_video_quality, VIDEO_QUALITY_SQL),
        ("mm_audio_quality", mm_audio_quality, AUDIO_QUALITY_SQL),
        # admission-time near-dup gate: batch (doc_id % 4 == 0) against the
        # indexed rest — O(batch), no corpus rescan
        ("dedup_incremental", dedup_incremental, INCREMENTAL_SQL),
        # the image twin of that gate: incoming batch phashes vs the
        # persisted band index, in-row popcount verification
        ("mm_dedup_incremental", mm_dedup_incremental, MM_INCREMENTAL_SQL),
        # video admission gate: containment verdict vs a persisted frame index
        ("mm_video_dedup_incremental", mm_video_dedup_incremental, MM_VIDEO_INCREMENTAL_SQL),
        # audio admission gate: same _containment_gate kernel, window units
        ("mm_audio_dedup_incremental", mm_audio_dedup_incremental, MM_AUDIO_INCREMENTAL_SQL),
        # image dedup_best_rep: quality-argmax rep per phash group
        ("mm_best_rep", mm_best_rep, MM_BEST_REP_SQL),
        # WebDataset shard packing: whole-sample greedy bins per writer stream
        ("mm_shard_pack", mm_shard_pack, MM_SHARD_PACK_SQL),
        # frame-phash video copy detection: temporal-shift-tolerant
        # containment over the sampled-frame phash index
        ("mm_video_neardup", mm_video_neardup, VIDEO_NEARDUP_SQL),
        # Gopher named-rule gate: per-rule booleans + conjunction,
        # all stateless per-row expressions on the shared tokenize
        ("text_gopher_rules", text_gopher_rules, GOPHER_RULES_SQL),
        # C4 line-level cleaning gate: on this one-line punctuation-free
        # corpus every line fails the terminal-punctuation rule (keep is
        # uniformly false — real but degenerate); the discriminating twin
        # runs on the planted multi-line corpus below
        ("text_c4_rules", text_c4_rules, C4_RULES_SQL),
        # window-fingerprint audio copy detection: trim/pad-tolerant
        # containment over the sign-fingerprint index (the audio leg of
        # the image/video dedup matrix, same containment kernel)
        ("mm_audio_neardup", mm_audio_neardup, AUDIO_NEARDUP_SQL),
        # decontamination row of the modality matrix (text has
        # decontaminate): eval-overlap scrub per modality through the SAME
        # band/containment math as each near-dup sibling, eval side
        # broadcast
        ("mm_decontaminate", mm_decontaminate, MM_DECONTAM_SQL),
        ("mm_video_decontaminate", mm_video_decontaminate, VIDEO_DECONTAM_SQL),
        ("mm_audio_decontaminate", mm_audio_decontaminate, AUDIO_DECONTAM_SQL),
        # representative row for the clip modalities: quality-argmax rep
        # per transitive dup class (exposure total / Σv² energy), one
        # shared kernel + twin generator
        ("mm_video_best_rep", mm_video_best_rep, VIDEO_BEST_REP_SQL),
        ("mm_audio_best_rep", mm_audio_best_rep, AUDIO_BEST_REP_SQL),
        # cross-modality corpus card: 12 one-row aggregates over the
        # matrix views, twin generated by wrapping the component twins
        ("corpus_card", corpus_card, CORPUS_CARD_SQL),
    ]:
        ok, msg = compare_one(spark, con, name, fn, sql, SF)
        assert ok, (name, msg)


def test_line_dedup_keeper_policy(spark):
    """Pin the span-removal semantics on a hand-crafted corpus,
    independent of the DuckDB twin (a shared mis-specification would pass
    the oracle): the globally FIRST occurrence (min doc_id, then min
    position) of each pseudo-line survives; later copies are dropped both
    across documents and within one; the cleaned text preserves position
    order; a fully-duplicated doc collapses to the empty string."""
    from crawler_spark.operators.text import text_line_dedup_frame

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),   # lines (chunk=2): "a b", "a b", "c"
            (2, "c d a b"),     # lines: "c d", "a b"
            (3, "a b"),         # every line already seen -> empty doc
            (4, "? !"),         # tokenizes to nothing -> 0 pseudo-lines
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_dropped"])
        for r in text_line_dedup_frame(docs, chunk=2).collect()
    }
    assert got == {
        1: ("a b c", 2, 1),  # intra-doc repeat dropped, tail chunk kept
        2: ("c d", 1, 1),    # "a b" lost to doc 1's earlier occurrence
        3: ("", 0, 1),
        4: ("", 0, 0),       # token-less doc still emitted, not dropped
    }, got


def test_asof_randomized_vs_python(spark):
    """The as-of kernel (window carry-forward + tie ordering + tolerance)
    against a brute-force Python reference on seeded random event sets,
    with deliberate simultaneous-timestamp collisions and users who never
    view."""
    import random

    from crawler_spark.operators.relational import asof_frame

    rng = random.Random(7)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randint(0, 25)):
            # coarse ms grid -> frequent exact-timestamp collisions
            rows.append(
                (eid, user, rng.choice(["view", "purchase"]), rng.randint(0, 40) * 1000)
            )
            eid += 1

    def ref(tolerance):
        out = {}
        for pid, user, et, ms in rows:
            if et != "purchase":
                continue
            cands = [
                (vms, vid)
                for vid, vu, vet, vms in rows
                if vu == user and vet == "view" and vms <= ms
            ]
            best = max(cands, default=None)  # latest ms, then highest id
            if best and tolerance is not None and ms - best[0] > tolerance:
                best = None
            out[pid] = (best[1], ms - best[0]) if best else (None, None)
        return out

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, et string, ms long"
    )
    for tol in (None, 5000):
        got = {
            r["purchase_id"]: (r["view_id"], r["gap_ms"])
            for r in asof_frame(df, tol).collect()
        }
        assert got == ref(tol), f"tolerance={tol}"


def test_max_run_fold_randomized(spark):
    """The repetition filter's max-consecutive-run is computed by two
    different mechanisms (Spark: linear HOF fold; DuckDB oracle:
    gaps-and-islands windows — its list_reduce mis-folds repeated
    subexpressions). Check both against a pure-Python reference on seeded
    random lists plus the edge cases the corpus never hits (empty,
    singleton, all-same, alternating)."""
    import random

    import duckdb

    from crawler_spark.operators.text import _SPARK_MAX_RUN

    rng = random.Random(42)
    cases = [[], ["a"], ["a"] * 7, ["a", "b"] * 5, ["a", "a", "b", "b", "b"]]
    for _ in range(200):
        n = rng.randint(0, 30)
        cases.append([rng.choice("abc") for _ in range(n)])

    def ref(toks):
        best = run = 0
        prev = None
        for t in toks:
            run = run + 1 if t == prev else 1
            best = max(best, run)
            prev = t
        return best

    want = [ref(t) for t in cases]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i int, toks array<string>"
    )
    got = {
        r["i"]: r["mr"]
        for r in df.select("i", F.expr(_SPARK_MAX_RUN).alias("mr")).collect()
    }
    assert [got[i] for i in range(len(cases))] == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i int, toks varchar[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    duck = con.execute("""
        WITH pos AS (
          SELECT i, unnest(toks) AS tok, unnest(range(1, len(toks)+1)) AS pos FROM t
        ),
        isl AS (
          SELECT i, tok, pos - row_number() OVER (PARTITION BY i, tok ORDER BY pos) AS grp
          FROM pos
        ),
        runlen AS (SELECT i, count(*) AS rl FROM isl GROUP BY i, tok, grp)
        SELECT t.i, coalesce(max(rl), 0) FROM t LEFT JOIN runlen ON t.i = runlen.i
        GROUP BY t.i ORDER BY t.i
    """).fetchall()
    assert [int(v) for _, v in duck] == want


def test_dsir_prefers_target_like_docs(spark):
    """Pin the selection DIRECTION on a hand-crafted corpus, independent
    of the DuckDB twin (a shared sign error in the weight would pass the
    oracle): target docs (doc_id % 10 == 0) speak vocabulary A, the rest
    speak B except two B-side docs that also speak A — the quota must go
    to A-speaking docs, ordered by score before doc_id."""
    from crawler_spark.operators.text import text_dsir_frame

    a_text = "alpha beta gamma delta " * 8
    b_text = "omega sigma theta kappa " * 8
    rows = []
    for i in range(40):
        if i % 10 == 0:
            rows.append((i, a_text))          # target split: pure A
        elif i in (7, 23):
            rows.append((i, a_text))          # non-target but target-LIKE
        else:
            rows.append((i, b_text))
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')").alias("toks")
    )
    picked = [r["doc_id"] for r in text_dsir_frame(docs, quota=6).collect()]
    # every selected doc speaks A: the 4 target docs + the 2 target-like ones
    assert sorted(picked) == [0, 7, 10, 20, 23, 30], picked


def test_substring_dedup_alignment_free(spark):
    """Pin the Lee-et-al property that distinguishes text_substring_dedup
    from text_line_dedup: a duplicated 8-token span that STRADDLES the
    fixed pseudo-line boundary is still caught. Doc 1 carries the span at
    tokens [6, 14) (crossing the chunk-8 boundary at 8); doc 2 repeats it
    at [2, 10). The first occurrence (doc 1) keeps every token; doc 2
    loses exactly the 8 covered tokens and the rebuilt text stitches the
    survivors around the hole; doc 3 (no duplicated gram) is untouched."""
    from crawler_spark.operators.text import text_substring_dedup_frame

    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    d1 = "one two three four five six " + span + " tail1 tail2"
    d2 = "pre1 pre2 " + span + " post1 post2 post3"
    d3 = "totally unrelated words that never repeat anywhere at all here"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in text_substring_dedup_frame(docs).collect()
    }
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == d1, out[1]
    assert out[2]["n_removed"] == 8, out[2]
    assert out[2]["text_clean"] == "pre1 pre2 post1 post2 post3", out[2]
    assert out[3]["n_removed"] == 0 and out[3]["text_clean"] == d3, out[3]


def test_substring_dedup_randomized_vs_python(spark):
    """Randomized cross-check of the Spark builder against an independent
    pure-Python implementation of the spec (first occurrence by
    (doc_id, pos) keeps; a token is removed when ANY duplicated k-gram
    window covers it) on worlds with PLANTED duplicate spans — copied
    slices between docs, intra-doc repeats, and straddling offsets the
    synthetic corpus may not exercise. The reference keys grams by string
    where the builder keys by h32; the fixed seed produced no collision
    (verified: both agree), so the test is deterministic."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    k = 8
    docs = {}
    for d in range(40):
        docs[d] = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
    # plant cross-doc copies (random span of an earlier doc pasted at a
    # random offset) and a few intra-doc repeats
    for d in range(5, 40, 3):
        src = rng.randrange(d)
        if len(docs[src]) >= k:
            start = rng.randrange(len(docs[src]) - k + 1)
            span = docs[src][start : start + k + rng.randint(0, 4)]
            at = rng.randint(0, len(docs[d]))
            docs[d] = docs[d][:at] + span + docs[d][at:]
    for d in (7, 19):
        if len(docs[d]) >= k:
            docs[d] = docs[d] + docs[d][:k]

    first: dict[str, tuple[int, int]] = {}
    dup_occ = []
    for d in sorted(docs):
        toks = docs[d]
        for p in range(max(len(toks) - k + 1, 0)):
            g = " ".join(toks[p : p + k])
            if first.setdefault(g, (d, p)) != (d, p):
                dup_occ.append((d, p))
    cov: dict[int, set[int]] = {}
    for d, p in dup_occ:
        cov.setdefault(d, set()).update(range(p, p + k))
    expect = {
        d: (
            len(toks),
            len(cov.get(d, set())),
            " ".join(t for i, t in enumerate(toks) if i not in cov.get(d, set())),
        )
        for d, toks in docs.items()
    }

    from crawler_spark.operators.text import text_substring_dedup_frame

    sdf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in text_substring_dedup_frame(sdf, k).collect()
    }
    assert got == expect
    assert any(v[1] for v in expect.values()), "no duplication planted?"
    assert any(0 < v[1] < v[0] for v in expect.values()), "no partial removal"


def test_best_rep_policy_differs_from_min_id(spark):
    """dedup_best_rep must be a real POLICY change, not min-id in disguise:
    on the synthetic corpus at least one multi-member cluster elects a
    representative that is NOT its minimum doc_id (the best-quality member
    outranks it), every multi-group's rep has the group's max quality with
    ties broken toward the lowest id, and singletons are their own rep."""
    from crawler_spark.operators.pipeline import dedup_best_rep

    df = dedup_best_rep(spark, SF).toPandas()
    multi = df[df["group_size"] > 1]
    assert len(multi), "no multi-member clusters at this sf"
    assert (multi["rep_doc_id"] != multi["group_id"]).any(), (
        "best-quality rep never differs from the min-id rep — policy inert"
    )
    for gid, grp in multi.groupby("group_id"):
        best_q = grp["quality_score"].max()
        expect = int(grp[grp["quality_score"] == best_q]["doc_id"].min())
        assert (grp["rep_doc_id"] == expect).all(), (gid, expect)
    singles = df[df["group_size"] == 1]
    assert (singles["rep_doc_id"] == singles["doc_id"]).all()
    assert singles["is_rep"].all()


def test_gopher_symbol_rule_on_punctuated_text(spark):
    """Pin the symbol rule to the PAPER's symbol set ('#' and ellipses),
    independent of the DuckDB twin (a shared all-punctuation regex would
    pass the oracle): a normally punctuated paragraph must KEEP — periods,
    commas, and quotes are not Gopher symbols — while a '#'-ridden doc
    with the same words must fail r_symbol, and '...'/'…' must each count
    as ONE symbol."""
    from crawler_spark.operators.text import text_gopher_rules_frame

    # 30 words, ordinary punctuation: 5 periods, 4 commas, 2 quotes
    clean = (
        'the cat sat, and the dog ran. "fast" horses, they said, gallop '
        "over green hills. the sun rose. birds sang loud songs. rivers "
        "flow, time moves on."
    )
    hashy = "the cat sat and the dog ran " * 4 + "# " * 10
    dots = "the cat sat and the dog ran over green hills today " * 3 + "... … .."
    docs = spark.createDataFrame(
        [(1, clean), (2, hashy), (3, dots)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in text_gopher_rules_frame(docs).collect()}
    assert out[1]["symbol_ratio"] == 0.0 and out[1]["r_symbol"], out[1]
    assert out[1]["keep"], out[1]
    assert out[2]["symbol_ratio"] > 0.1 and not out[2]["r_symbol"], out[2]
    # one '...' + one '…' = 2 symbols over 33 words; '..' is not a symbol
    assert out[3]["symbol_ratio"] == round(2 / 33, 6), out[3]
    # the frame refuses a toks-only projection instead of crashing at plan time
    import pytest as _pytest

    with _pytest.raises(ValueError, match="text"):
        text_gopher_rules_frame(docs.selectExpr("doc_id", "split(text, ' ') as toks"))


def test_video_neardup_matches_brute_force():
    """The DuckDB twin (and hence, via oracle parity, the Spark builder)
    against an all-pairs numpy reference: for every video pair, count the
    sampled frames of the lower-id side with a band-sharing Hamming-<=4
    match anywhere in the other, threshold at VID_MATCH_MIN, and roll up
    the min-id neighborhood representative. Spark-free."""
    import collections

    import duckdb
    import numpy as np

    from crawler_spark.engine.verify import _phash_batch
    from crawler_spark.operators.multimodal import (
        FRAME_STRIDE,
        MM_SIDE,
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        VID_MATCH_MIN,
        VIDEO_NEARDUP_SQL,
        _video_pixels,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    sql = con.execute(VIDEO_NEARDUP_SQL).df().sort_values("video_id")

    n = max(con.execute("SELECT count(*) FROM documents").fetchone()[0] // 4, 1)
    ph = _phash_batch(
        _video_pixels(np.arange(n, dtype=np.int64))[:, ::FRAME_STRIDE].reshape(
            -1, MM_SIDE, MM_SIDE, 3
        )
    ).reshape(n, -1)
    u = ph.view(np.uint64)
    nf = u.shape[1]
    mask = (1 << PHASH_BAND_BITS) - 1

    def hit(x: int, y: int) -> bool:
        if bin(x ^ y).count("1") > PHASH_HAM_MAX:
            return False
        return any(
            ((x >> (PHASH_BAND_BITS * i)) & mask) == ((y >> (PHASH_BAND_BITS * i)) & mask)
            for i in range(N_PHASH_BANDS)
        )

    nb = collections.defaultdict(list)
    for a in range(n):
        for b in range(a + 1, n):
            m = sum(
                any(hit(int(u[a, fa]), int(u[b, fb])) for fb in range(nf))
                for fa in range(nf)
            )
            if m >= VID_MATCH_MIN:
                nb[a].append(b)
                nb[b].append(a)

    for _, r in sql.iterrows():
        k = int(r["video_id"][3:])
        mn = min(nb[k]) if nb[k] else k
        assert int(r["n_near"]) == len(nb[k]), (k, r["n_near"], len(nb[k]))
        assert r["rep_id"] == f"vid{min(k, mn)}", (k, r["rep_id"])
        assert bool(r["is_dup"]) == (mn < k), k
    assert len(sql) == n


def test_audio_neardup_matches_brute_force():
    """The audio twin against an all-pairs numpy reference: for every clip
    pair, count the fingerprint windows of the lower-id side with a
    band-sharing Hamming-<=4 match anywhere in the other, threshold at
    AUD_MATCH_MIN, roll up the min-id neighborhood rep. Also pins the dup
    structure the corpus was DESIGNED to carry: every same-class pair is an
    edge, no cross-class pair is, and some window matches have Hamming > 0
    (the DC-offset remaster path — the tolerance filter is load-bearing,
    not decorative). Spark-free."""
    import collections

    import duckdb
    import numpy as np

    from crawler_spark.operators.multimodal import (
        _AUD_DUP_OFFSETS,
        AUD_MATCH_MIN,
        AUD_WIN,
        AUDIO_NEARDUP_SQL,
        N_AUD_WINS,
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        _audio_dup_samples,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    sql = con.execute(AUDIO_NEARDUP_SQL).df().sort_values("clip_id")

    n = max(con.execute("SELECT count(*) FROM documents").fetchone()[0] // 4, 1)
    n_classes = max((n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS, 1)
    pcm = _audio_dup_samples(np.arange(n, dtype=np.int64), n_classes)
    bits = (pcm.astype(np.int64) > 0).reshape(n * N_AUD_WINS, AUD_WIN)
    packed = np.packbits(bits.astype(np.uint8), axis=1)
    u = packed.view(">u8")[:, 0].astype(np.uint64).reshape(n, N_AUD_WINS)
    mask = (1 << PHASH_BAND_BITS) - 1

    def hit(x: int, y: int) -> bool:
        if bin(x ^ y).count("1") > PHASH_HAM_MAX:
            return False
        return any(
            ((x >> (PHASH_BAND_BITS * i)) & mask) == ((y >> (PHASH_BAND_BITS * i)) & mask)
            for i in range(N_PHASH_BANDS)
        )

    nb = collections.defaultdict(list)
    nz_ham = 0
    for a in range(n):
        for b in range(a + 1, n):
            m = 0
            for wa in range(N_AUD_WINS):
                hits = [hit(int(u[a, wa]), int(u[b, wb])) for wb in range(N_AUD_WINS)]
                if any(hits):
                    m += 1
                    nz_ham += sum(
                        1
                        for wb in range(N_AUD_WINS)
                        if hits[wb] and u[a, wa] != u[b, wb]
                    )
            if m >= AUD_MATCH_MIN:
                assert a % n_classes == b % n_classes, (a, b, "cross-class edge")
                nb[a].append(b)
                nb[b].append(a)
    # every same-class pair IS an edge (the corpus's designed dup classes)
    by_class = collections.defaultdict(list)
    for k in range(n):
        by_class[k % n_classes].append(k)
    for ks in by_class.values():
        for i, a in enumerate(ks):
            for b in ks[i + 1 :]:
                assert b in nb[a], (a, b, "missed same-class pair")
    assert nz_ham > 0, "DC-offset remaster path never exercised Hamming > 0"

    for _, r in sql.iterrows():
        k = int(r["clip_id"][3:])
        mn = min(nb[k]) if nb[k] else k
        assert int(r["n_near"]) == len(nb[k]), (k, r["n_near"], len(nb[k]))
        assert r["rep_id"] == f"aud{min(k, mn)}", (k, r["rep_id"])
        assert bool(r["is_dup"]) == (mn < k), k
        assert int(r["n_wins"]) == N_AUD_WINS, k
    assert len(sql) == n


def test_substring_dedup_doc_id_bound_raises(spark):
    """The packed occurrence key guards BOTH factors: a doc_id >= 2^43
    (whose doc_id * 2^20 would overflow int64) must hit the designed
    raise_error diagnostic, not an opaque ANSI arithmetic overflow."""
    import pytest

    from crawler_spark.operators.text import text_substring_dedup_frame

    docs = spark.createDataFrame(
        [(1 << 43, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="out of range"):
        text_substring_dedup_frame(docs).collect()


def test_audio_flip_bound_at_bench_scale():
    """The audio dup corpus DESIGN bound, checked at sf0.1's clip count
    (1250 clips, 250 classes) instead of only the 125-clip sf0.001 corpus:
    for EVERY same-class pair and every time-aligned window overlap, the
    DC-offset remaster flips at most 2 sign bits (<= PHASH_HAM_MAX) and
    leaves at least one of the 4 16-bit bands intact — so every aligned
    window is a band-join hit and every true trim pair clears
    AUD_MATCH_MIN at the larger corpus too. Pure numpy (the corpus is a
    closed form); an all-pairs Spark run at 1250 clips is not needed to
    verify the designed dup structure."""
    import numpy as np
    import pyarrow.parquet as pq

    from crawler_spark.operators.multimodal import (
        _AUD_DUP_OFFSETS,
        AUD_MATCH_MIN,
        AUD_WIN,
        N_AUD_WINS,
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        _audio_dup_samples,
    )

    n_docs = pq.read_metadata("/root/testdata/sf0.1/documents.parquet").num_rows
    n = max(n_docs // 4, 1)
    n_classes = max((n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS, 1)
    assert n == n_classes * _AUD_DUP_OFFSETS, (n, n_classes)  # clean reshape

    pcm = _audio_dup_samples(np.arange(n, dtype=np.int64), n_classes)
    bits = (pcm.astype(np.int64) > 0).reshape(n * N_AUD_WINS, AUD_WIN)
    packed = np.packbits(bits.astype(np.uint8), axis=1)
    u = packed.view(">u8")[:, 0].astype(np.uint64).reshape(n, N_AUD_WINS)
    # clip k = offset (k // n_classes) x class (k % n_classes)
    U = u.reshape(_AUD_DUP_OFFSETS, n_classes, N_AUD_WINS)

    def popcnt(x: np.ndarray) -> np.ndarray:
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)

    band_mask = np.uint64((1 << PHASH_BAND_BITS) - 1)
    max_ham = 0
    for d in range(1, _AUD_DUP_OFFSETS):
        for oa in range(_AUD_DUP_OFFSETS - d):
            # clip (oa, c) window w aligns with clip (oa+d, c) window w-d
            x = U[oa, :, d:] ^ U[oa + d, :, : N_AUD_WINS - d]
            ham = popcnt(x)
            max_ham = max(max_ham, int(ham.max()))
            assert int(ham.max()) <= PHASH_HAM_MAX, (d, oa, int(ham.max()))
            intact = np.zeros(x.shape, dtype=bool)
            for i in range(N_PHASH_BANDS):
                intact |= ((x >> np.uint64(PHASH_BAND_BITS * i)) & band_mask) == 0
            assert intact.all(), (d, oa, "aligned window with no intact band")
            # the overlap alone clears the edge threshold
            assert N_AUD_WINS - d >= AUD_MATCH_MIN, (d,)
    # the designed flip bound: DC remaster flips at most 2 bits per window
    assert max_ham <= 2, max_ham
    assert max_ham > 0, "DC-offset path inert at this scale?"


def test_ivf_family_nondefault_width(spark):
    """The nlist_for-sized IVF family (VERDICT r4 task 1): every builder
    takes n_centroids/n_probe/cluster_cap with the oracle generated from
    the SAME parameters, so a non-default width runs the identical plan —
    parity at sf0.01 and sf0.1, widths chosen so the cap sub-bucketing is
    genuinely exercised (250 members/cluster at (sf0.1, nc=8) >> cap=25)."""
    from crawler_spark.operators.similarity import (
        IVF_ITERS,
        SEMDEDUP_TAU,
        ann_ivf_topk,
        ann_ivfpq_topk,
        dedup_semantic,
        ivf_sql,
        ivfpq_sql,
        semdedup_sql,
    )

    for sf, nc, npr, cap in (
        ("/root/testdata/sf0.01", 32, 8, 10),
        ("/root/testdata/sf0.1", 8, 3, 25),
    ):
        con = duck_connect(sf)
        for name, fn, sql in (
            (
                "ann_ivf_topk",
                lambda s, d, nc=nc, npr=npr: ann_ivf_topk(
                    s, d, n_centroids=nc, n_probe=npr
                ),
                ivf_sql(IVF_ITERS, nc, npr),
            ),
            (
                "ann_ivfpq_topk",
                lambda s, d, nc=nc, npr=npr: ann_ivfpq_topk(
                    s, d, n_centroids=nc, n_probe=npr
                ),
                ivfpq_sql(IVF_ITERS, nc, npr),
            ),
            (
                "dedup_semantic",
                lambda s, d, nc=nc, cap=cap: dedup_semantic(
                    s, d, n_centroids=nc, cluster_cap=cap
                ),
                semdedup_sql(IVF_ITERS, SEMDEDUP_TAU, nc, cap),
            ),
        ):
            ok, msg = compare_one(spark, con, name, fn, sql, sf)
            assert ok, (sf, nc, npr, cap, name, msg)


def test_semdedup_cluster_cap_bounds_pairs(spark):
    """No cluster is ever quadratic past the cap: the pair stage's
    sub-bucketing splits an oversized cluster into ceil(size/cap) buckets
    keyed by a HASH of vec_id (raw pmod would re-concentrate any cluster
    whose ids are correlated modulo n_sub — the review-caught failure
    this test's adversarial case pins). Exact against a Python replica of
    the h32 bucket on a worst-skew assignment (every vector in ONE
    cluster), on an arithmetic-progression id set (step 4 — raw pmod
    would collapse the 20-way split to gcd(4,20)=4, i.e. 5 buckets of 80
    and 15,800 pairs vs the hash split's ~3,800; a step that is a
    MULTIPLE of n_sub would land everything in one bucket, the full
    C(400,2)=79,800 blowup), and canonical ordering / no-cross-bucket
    invariants."""
    import hashlib

    from crawler_spark.operators.similarity import _semdedup_pairs

    def h32(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    def expect_pairs(ids, cap):
        n_sub = (len(ids) + cap - 1) // cap
        from collections import Counter

        sizes = Counter(h32(i) % n_sub for i in ids)
        return sum(s * (s - 1) // 2 for s in sizes.values()), n_sub, max(
            sizes.values()
        )

    n, cap = 400, 20
    for ids in (list(range(n)), list(range(0, 4 * n, 4))):
        assign = spark.createDataFrame(
            [(i, 0) for i in ids], "vec_id long, c_id int"
        )
        pairs = _semdedup_pairs(assign, cap).toPandas()
        expect, n_sub, max_bucket = expect_pairs(ids, cap)
        assert len(pairs) == expect, (len(pairs), expect)
        # the hash split stays balanced: worst bucket within ~2x the cap,
        # so the pair count stays linear-in-N regardless of how the ids
        # correlate with n_sub (raw pmod degrades by gcd(step, n_sub))
        assert max_bucket <= 2 * cap, max_bucket
        assert len(pairs) <= n * 2 * cap, len(pairs)
        assert (pairs["vec_a"] < pairs["vec_b"]).all()
        sub_a = pairs["vec_a"].map(lambda v: h32(int(v)) % n_sub)
        sub_b = pairs["vec_b"].map(lambda v: h32(int(v)) % n_sub)
        assert (sub_a == sub_b).all()
    # a cluster AT the cap is untouched: one sub-bucket, all pairs kept
    small = spark.createDataFrame(
        [(i, 0) for i in range(cap)], "vec_id long, c_id int"
    )
    assert _semdedup_pairs(small, cap).count() == cap * (cap - 1) // 2


def test_best_rep_changes_pipeline_output(spark):
    """dedup_best_rep's quality-argmax policy is CONSUMED by the pipeline
    (VERDICT r4 task 4), not computed on the side: pipeline_clean_corpus
    under rep_policy='quality' (the default) must emit a DIFFERENT output
    than 'min_id' — the manifest's is_rep column flips exactly on the docs
    where dedup_best_rep's verdict differs from the min-id keeper, and the
    quality manifest's is_rep equals dedup_best_rep's verdict doc-for-doc.
    (On this synthetic corpus every later near-dup copy is also a
    full-span duplicate, so the span gates make train_keep coincide
    between policies — the test additionally pins that train_keep under
    'quality' still requires is_rep: no flipped-off rep stays kept.)"""
    from crawler_spark.operators.pipeline import (
        dedup_best_rep,
        pipeline_clean_corpus,
    )

    q = pipeline_clean_corpus(spark, SF).toPandas().set_index("doc_id")
    m = (
        pipeline_clean_corpus(spark, SF, rep_policy="min_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert set(q.index) == set(m.index)
    flips = set(q.index[q["is_rep"] != m.loc[q.index, "is_rep"]])
    assert flips, "quality rep policy never changes the manifest"
    best = dedup_best_rep(spark, SF).toPandas().set_index("doc_id")
    disagree = set(best.index[best["is_rep"] != (best.index == best["group_id"])])
    assert flips == disagree, (flips ^ disagree)
    # the quality manifest's rep verdict IS dedup_best_rep's, doc-for-doc
    assert q["is_rep"].sort_index().equals(best["is_rep"].sort_index())
    # and train_keep consumes it: a rep flipped off is never kept
    assert not q.loc[sorted(flips & set(q.index[~q["is_rep"]])), "train_keep"].any()


def test_c4_gate_consumed_by_pipeline(spark):
    """text_c4_rules is CONSUMED by the pipeline, not computed on the
    side: the manifest always carries the `c4_keep` audit column, and
    `pipeline_clean_corpus(c4=True)` gates train_keep on it — verified
    against the twin GENERATED from the same flag (pipeline_sql(c4=True),
    the ivf_sql precedent). On this synthetic corpus the C4 verdict is
    uniformly false (one punctuation-free line per doc — every line fails
    the terminal-punctuation rule), so the pin is exact: default keeps a
    nonzero set, c4=True keeps nothing, and the flipped-off set is
    precisely the default keepers. The gate's DISCRIMINATING semantics
    are pinned on the planted corpus in
    test_c4_rules_twin_on_planted_corpus."""
    from crawler_spark.operators.pipeline import (
        pipeline_clean_corpus,
        pipeline_sql,
    )

    con = duck_connect(SF)
    ok, msg = compare_one(
        spark, con, "pipeline_c4",
        lambda s, d: pipeline_clean_corpus(s, d, c4=True),
        pipeline_sql(c4=True), SF,
    )
    assert ok, msg
    q = pipeline_clean_corpus(spark, SF).toPandas().set_index("doc_id")
    qc = pipeline_clean_corpus(spark, SF, c4=True).toPandas().set_index("doc_id")
    assert not q["c4_keep"].any() and not qc["c4_keep"].any()
    assert q["train_keep"].sum() > 0 and qc["train_keep"].sum() == 0
    flipped = set(q.index[q["train_keep"] != qc.loc[q.index, "train_keep"]])
    assert flipped == set(q.index[q["train_keep"]])


def test_split_leakage_safe(spark, tmp_path):
    """pipeline_split's whole reason to exist: no duplicate class may
    straddle the train/eval boundary. Three pins:

    1. REAL corpora (sf0.001 and the bench scale sf0.1): every multi-member
       near-dup group lands in exactly one split, and all three splits are
       non-empty with the bucket split roughly 80/10/10.
    2. Planted byte-identical SHORT docs (< 3 tokens — no shingles, so they
       sit in distinct singleton groups and group-keying alone would leak):
       the md5(text) singleton key must put them in the SAME split.
    3. Twin parity on the planted corpus (the group-vs-text key branch
       fires both ways there).
    """
    import duckdb

    from crawler_spark.operators.pipeline import SPLIT_SQL, pipeline_split

    for sf in (SF, "/root/testdata/sf0.1"):
        df = pipeline_split(spark, sf).toPandas()
        multi = df[df.group_size > 1]
        assert len(multi) > 0, sf
        assert (multi.groupby("group_id")["split"].nunique() == 1).all(), sf
        counts = df.split.value_counts()
        assert set(counts.index) == {"train", "val", "test"}, sf
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]

    # planted: 2 byte-identical 2-token docs (ids 10/11), one near-dup pair
    # with >= 3 shared tokens (ids 1/2), one unique doc (id 3)
    dup_text = "tiny pair"
    near = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, near),
        (2, near + " iota"),
        (3, "completely different words entirely here now today folks"),
        (10, dup_text),
        (11, dup_text),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ok, msg = compare_one(spark, con, "pipeline_split", pipeline_split,
                          SPLIT_SQL, sf)
    assert ok, msg
    got = pipeline_split(spark, sf).toPandas().set_index("doc_id")
    # the near-dup pair shares a group AND a split
    assert got.loc[1, "group_id"] == got.loc[2, "group_id"]
    assert got.loc[1, "split"] == got.loc[2, "split"]
    # the byte-identical short docs are singleton GROUPS (the leak the
    # text key closes) yet share a bucket and split
    assert got.loc[10, "group_size"] == got.loc[11, "group_size"] == 1
    assert got.loc[10, "group_id"] != got.loc[11, "group_id"]
    assert got.loc[10, "bucket"] == got.loc[11, "bucket"]
    assert got.loc[10, "split"] == got.loc[11, "split"]


def test_mm_split_leakage_safe(spark):
    """mm_split (the image leg): no phash duplicate class straddles the
    train/eval boundary, and the group-label hash genuinely spreads
    (every singleton's bucket is distinct at this scale — 7 singletons, 7
    buckets). NO balance assertion on the real corpus: the synthetic
    image corpus is dup-heavy BY DESIGN (a few giant re-encode groups
    hold most images — 16 multi-groups cover 93/100 at sf0.001), so
    split balance is bounded by atom size there; at web scale groups are
    tiny relative to the corpus and the uniform bucket hash yields
    80/10/10 (the text-side planted corpus pins the same hash's
    spread)."""
    from crawler_spark.operators.multimodal import mm_split

    for sf in (SF, "/root/testdata/sf0.1"):
        df = mm_split(spark, sf).toPandas()
        multi = df[df.group_size > 1]
        assert len(multi) > 0, sf
        assert (multi.groupby("group_id")["split"].nunique() == 1).all(), sf
        assert df.bucket.between(0, 99).all(), sf
        singles = df[df.group_size == 1]
        assert singles.bucket.nunique() == len(singles), sf
        # split is a pure function of bucket
        want = singles.bucket.map(
            lambda b: "train" if b < 80 else ("val" if b < 90 else "test")
        )
        assert (singles.split == want).all(), sf


def test_clip_topk_retrieval_semantics(spark):
    """The containment-ranked retrieval legs surface the DESIGNED dup
    structure at sf0.001, not just hash-equal twins:

    - audio: every query's rank-1 is a SAME-CLASS clip (the trim-offset
      copies) containing >= 15 of its 16 fingerprint windows — and
      retrieval agrees with the admission view (mm_audio_neardup marks
      the same clips dup-connected).
    - video: a query WITH a near-dup edge (n_near > 0) must have a
      full-containment rank-1 within the admission threshold (both
      matched frames <= PHASH_HAM_MAX, so sum_ham <= 2*PHASH_HAM_MAX);
      a query WITHOUT an edge may still surface a 2-frame candidate —
      that is retrieval's whole point (graded, not hidden) — but then at
      least one frame must sit BEYOND the threshold (sum_ham >
      PHASH_HAM_MAX, else the near-dup view would have admitted the
      edge), or it falls back to the best single-frame match (Hamming 0
      on this corpus). Ordering is pinned total: (n_matched DESC,
      sum_ham ASC, id ASC) within each query.
    """
    from crawler_spark.operators.multimodal import (
        _AUD_DUP_OFFSETS,
        mm_audio_neardup,
        mm_audio_topk,
        mm_video_neardup,
        mm_video_topk,
    )

    a = mm_audio_topk(spark, SF).toPandas()
    n = 125  # sf0.001: documents//4 clips
    n_cls = (n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS
    a1 = a[a["rank"] == 1]
    assert len(a1) == 8
    assert all(
        int(q[3:]) % n_cls == int(c[3:]) % n_cls
        for q, c in zip(a1.q_clip, a1.clip_id)
    )
    assert (a1.n_matched >= 15).all()

    v = mm_video_topk(spark, SF).toPandas()
    nd = mm_video_neardup(spark, SF).toPandas().set_index("video_id")
    v1 = v[v["rank"] == 1].set_index("q_video")
    assert len(v1) == 8
    from crawler_spark.operators.multimodal import PHASH_HAM_MAX

    for q in v1.index:
        has_edge = nd.loc[q, "n_near"] > 0
        if has_edge:
            assert v1.loc[q, "n_matched"] == 2, q
            assert v1.loc[q, "sum_ham"] <= 2 * PHASH_HAM_MAX, q
        elif v1.loc[q, "n_matched"] == 2:
            assert v1.loc[q, "sum_ham"] > PHASH_HAM_MAX, q
        else:
            assert v1.loc[q, "n_matched"] == 1 and v1.loc[q, "sum_ham"] == 0, q
    # ordering is the composite containment order within every query
    for df, qcol, idcol in ((v, "q_video", "video_id"), (a, "q_clip", "clip_id")):
        for _, grp in df.groupby(qcol):
            g = grp.sort_values("rank")
            ids = [int(x[3:]) for x in g[idcol]]  # numeric k, not lexical
            keys = list(zip(-g.n_matched, g.sum_ham, ids))
            assert keys == sorted(keys), qcol


def test_clip_groups_and_split_semantics(spark):
    """The transitive clip groups agree with their pairwise near-dup
    siblings and the clip splits inherit the leakage guarantee:

    - every clip the near-dup view marks dup (a smaller neighbor exists)
      is a non-representative in the groups view, and group_size == 1
      exactly when n_near == 0 (an edgeless clip is its own class);
    - the groups are TRANSITIVE: each clip's near-dup rep_id lands in the
      same group (the chain the neighborhood rollup cannot close);
    - no multi-member group straddles splits, and split is the pure
      80/10/10 function of bucket.
    """
    from crawler_spark.operators.multimodal import (
        mm_audio_groups,
        mm_audio_neardup,
        mm_audio_split,
        mm_video_groups,
        mm_video_neardup,
        mm_video_split,
    )

    for g_fn, nd_fn, s_fn, idc in (
        (mm_video_groups, mm_video_neardup, mm_video_split, "video_id"),
        (mm_audio_groups, mm_audio_neardup, mm_audio_split, "clip_id"),
    ):
        g = g_fn(spark, SF).toPandas().set_index(idc)
        nd = nd_fn(spark, SF).toPandas().set_index(idc)
        assert set(g.index) == set(nd.index)
        assert len(g[g.group_size > 1]) > 0, idc  # non-vacuous
        # pairwise-dup => not the component representative
        assert not g.loc[nd.index[nd.is_dup], "is_rep"].any(), idc
        # singleton <=> edgeless
        assert (
            (g["group_size"] == 1) == (nd.loc[g.index, "n_near"] == 0)
        ).all(), idc
        # transitivity: the neighborhood rep is in the same component
        rep_groups = g.loc[nd["rep_id"].to_numpy(), "group_id"].to_numpy()
        assert (rep_groups == g.loc[nd.index, "group_id"].to_numpy()).all(), idc

        s = s_fn(spark, SF).toPandas()
        multi = s[s.group_size > 1]
        assert (multi.groupby("group_id")["split"].nunique() == 1).all(), idc
        want = s.bucket.map(
            lambda b: "train" if b < 80 else ("val" if b < 90 else "test")
        )
        assert (s.split == want).all(), idc


def test_clip_quality_gate_semantics(spark):
    """The audio/video quality rows are LOAD-BEARING, not vacuous: every
    rule fires both ways at sf0.001 AND the bench scale, the keep verdict
    is exactly the conjunction of the negated rules, and the sf0.001
    verdict counts are pinned to the measured distribution (deterministic
    corpus — a drifted threshold or kernel change shows up as a count
    change, not a silent pass)."""
    from crawler_spark.operators.multimodal import (
        mm_audio_quality,
        mm_video_quality,
    )

    a = mm_audio_quality(spark, SF).toPandas()
    assert a[["clipped", "too_quiet", "too_noisy", "keep"]].sum().to_dict() == {
        "clipped": 8, "too_quiet": 11, "too_noisy": 9, "keep": 6,
    }
    assert (
        a.keep == (~a.clipped & ~a.too_quiet & ~a.too_noisy)
    ).all()

    v = mm_video_quality(spark, SF).toPandas()
    assert v[["too_static", "too_dark", "too_bright", "keep"]].sum().to_dict() == {
        "too_static": 53, "too_dark": 17, "too_bright": 17, "keep": 48,
    }
    assert (v.keep == (~v.too_static & ~v.too_dark & ~v.too_bright)).all()

    for fn, rules in (
        (mm_audio_quality, ["clipped", "too_quiet", "too_noisy"]),
        (mm_video_quality, ["too_static", "too_dark", "too_bright"]),
    ):
        df = fn(spark, "/root/testdata/sf0.1").toPandas()
        for r in rules + ["keep"]:
            assert 0 < df[r].sum() < len(df), (fn.__name__, r)


def test_round4_ops_twin_at_bench_scale(spark):
    """Every round-4 op gets a green twin at the BENCH scale factor
    (VERDICT r4 task 6): dedup_best_rep and mm_audio_neardup previously
    stopped at sf0.01 (COVERAGE.md); this pins them at sf0.1 — 5000 docs /
    1250 clips, the scale bench.py times."""
    sf = "/root/testdata/sf0.1"
    con = duck_connect(sf)
    for name, fn, sql in (
        ("dedup_best_rep", dedup_best_rep, BEST_REP_SQL),
        ("mm_audio_neardup", mm_audio_neardup, AUDIO_NEARDUP_SQL),
        # round-5 additions ride the same bench-scale gate from birth
        ("text_bm25_topk", text_bm25_topk, BM25_SQL),
        ("text_boilerplate_grams", text_boilerplate_grams, BOILERPLATE_SQL),
        ("text_quality_classifier", text_quality_classifier, NBQ_SQL),
        ("text_bigram_surprisal", text_bigram_surprisal, BIGRAM_SURPRISAL_SQL),
        ("text_ppl_buckets", text_ppl_buckets, PPL_BUCKETS_SQL),
        ("mm_phash_topk", mm_phash_topk, PHASH_TOPK_SQL),
        ("text_winnow_fingerprints", text_winnow_fingerprints, WINNOW_SQL),
        ("sample_temperature", sample_temperature, TEMPERATURE_SQL),
        ("sample_unimax", sample_unimax, UNIMAX_SQL),
        ("crawl_recrawl_schedule", crawl_recrawl_schedule, RECRAWL_SQL),
        ("mm_dedup_incremental", mm_dedup_incremental, MM_INCREMENTAL_SQL),
        # video admission gate: containment verdict vs a persisted frame index
        ("mm_video_dedup_incremental", mm_video_dedup_incremental, MM_VIDEO_INCREMENTAL_SQL),
        # audio admission gate: same _containment_gate kernel, window units
        ("mm_audio_dedup_incremental", mm_audio_dedup_incremental, MM_AUDIO_INCREMENTAL_SQL),
        # image dedup_best_rep: quality-argmax rep per phash group
        ("mm_best_rep", mm_best_rep, MM_BEST_REP_SQL),
        # WebDataset shard packing: whole-sample greedy bins per writer stream
        ("mm_shard_pack", mm_shard_pack, MM_SHARD_PACK_SQL),
        # C4 line gate at bench scale (degenerate-but-hashed on this corpus;
        # the discriminating verification is the planted-corpus twin)
        ("text_c4_rules", text_c4_rules, C4_RULES_SQL),
        # leakage-safe split at bench scale (5000 docs, real multi-groups)
        ("pipeline_split", pipeline_split, SPLIT_SQL),
        # its image leg at bench scale (1000 images, giant dup groups)
        ("mm_split", mm_split, MM_SPLIT_SQL),
        # clip-retrieval legs at bench scale (1250 clips each)
        ("mm_video_topk", mm_video_topk, VIDEO_TOPK_SQL),
        ("mm_audio_topk", mm_audio_topk, AUDIO_TOPK_SQL),
        # transitive clip duplicate groups + their leakage-safe splits
        # (recursive reachability twins over the same edge CTEs)
        ("mm_video_groups", mm_video_groups, VIDEO_GROUPS_SQL),
        ("mm_audio_groups", mm_audio_groups, AUDIO_GROUPS_SQL),
        ("mm_video_split", mm_video_split, VIDEO_SPLIT_SQL),
        ("mm_audio_split", mm_audio_split, AUDIO_SPLIT_SQL),
        # quality row of the modality matrix: static/exposure (video) and
        # clipping/silence/noisiness (audio) verdicts on exact int sums
        ("mm_video_quality", mm_video_quality, VIDEO_QUALITY_SQL),
        ("mm_audio_quality", mm_audio_quality, AUDIO_QUALITY_SQL),
        # decontamination row at bench scale (1000 images / 1250 clips)
        ("mm_decontaminate", mm_decontaminate, MM_DECONTAM_SQL),
        ("mm_video_decontaminate", mm_video_decontaminate, VIDEO_DECONTAM_SQL),
        ("mm_audio_decontaminate", mm_audio_decontaminate, AUDIO_DECONTAM_SQL),
        # clip representative row at bench scale
        ("mm_video_best_rep", mm_video_best_rep, VIDEO_BEST_REP_SQL),
        ("mm_audio_best_rep", mm_audio_best_rep, AUDIO_BEST_REP_SQL),
        # the audit card over all of the above
        ("corpus_card", corpus_card, CORPUS_CARD_SQL),
    ):
        ok, msg = compare_one(spark, con, name, fn, sql, sf)
        assert ok, (name, msg)


def test_bm25_ranking_semantics(spark):
    """Pin the three orderings BM25 exists to produce — each on a pair that
    isolates ONE lever (equal everything else):

      1. tf monotone: more query-term occurrences outrank fewer.
      2. length normalization: same tf, shorter document wins.
      3. idf monotone at equal tf/dl: rare > common > universal > 0.

    The third chain is the regression pin for the vacuous-idf trap: the
    first draft's integer-BIT idf (bitlen(N) - bitlen(df)) rounded df ≈ N
    to exactly 0 and produced an all-zero score column on the word-soup
    corpus while oracle parity stayed green (both twins shared the
    formula). The rational idf must keep even a 4-of-6-docs term strictly
    positive and strictly below a 1-of-6 term's contribution."""
    from crawler_spark.operators.text import text_bm25_topk_frame

    rows = [
        (1, "apple apple apple banana common"),
        (2, "apple banana banana banana common"),
        (3, "cherry banana common zz zz"),
        (4, "banana common zz zz zz"),
        (5, "common common common common common"),
        (6, "apple zz zz zz zz zz zz zz zz common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "split(text, ' ') as toks"
    )
    out = text_bm25_topk_frame(
        docs,
        queries=((1, "apple"), (2, "cherry"), (3, "banana"), (4, "common")),
        top=5,
    )
    got = {
        (r["q_id"], r["doc_id"]): (r["rank"], r["score_micro"])
        for r in out.collect()
    }
    # 1. tf: doc 1 (tf=3, dl=5) beats doc 2 (tf=1, dl=5) on 'apple'
    assert got[(1, 1)][0] == 1
    assert got[(1, 1)][1] > got[(1, 2)][1]
    # 2. length norm: doc 2 (tf=1, dl=5) beats doc 6 (tf=1, dl=10)
    assert got[(1, 2)][1] > got[(1, 6)][1]
    # 3. idf chain at tf=1, dl=5: cherry (df=1) > banana (df=4) >
    #    common (df=6 of 6) > 0 — the universal term stays positive but
    #    smallest (the rational's +1/+0.5 offsets, BM25+ style)
    assert got[(2, 3)][1] > got[(3, 4)][1] > got[(4, 4)][1] > 0
    # top=5 caps the 6 'common' matches to exactly 5 rows
    assert sum(1 for (q, _d) in got if q == 4) == 5


def test_boilerplate_mining_semantics(spark):
    """Pin what the miner exists to surface: a 6-token boilerplate span
    planted in 4 of 4 docs across 2 sources (twice in one doc) must yield
    exactly its two 5-grams at the top with df_docs=4, n_sources=2,
    n_occ=5 (the doc carrying it twice raises occurrences but not df),
    and `top` must cap the output."""
    from crawler_spark.operators.text import text_boilerplate_grams_frame

    bp = "b1 b2 b3 b4 b5 b6"
    rows = [
        (1, "src_a", f"{bp} u1 u2 u3 u4"),
        (2, "src_a", f"u5 u6 u7 u8 {bp}"),
        (3, "src_b", f"{bp} u9 ua ub uc"),
        (4, "src_b", f"{bp} ud {bp}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = text_boilerplate_grams_frame(docs, k=5, top=3).collect()
    assert len(out) == 3
    by_gram = {r["gram"]: r for r in out}
    for g in ("b1 b2 b3 b4 b5", "b2 b3 b4 b5 b6"):
        r = by_gram[g]
        assert (r["df_docs"], r["n_sources"], r["n_occ"]) == (4, 2, 5), r
        assert r["rank"] in (1, 2)
    # everything else in the corpus is strictly less document-frequent
    third = [r for r in out if r["rank"] == 3][0]
    assert third["df_docs"] < 4


def test_ivf_auto_width_parity(spark):
    """n_centroids=None auto-sizes the codebook via nlist_for(corpus
    count) — the production convenience: parity against the oracle
    generated at the same width (nlist_for(500) = 88 at sf0.01), so the
    auto path provably runs the identical plan the explicit width does."""
    from crawler_spark.operators.similarity import (
        IVF_ITERS,
        ann_ivf_topk,
        ivf_sql,
        nlist_for,
    )

    sf = "/root/testdata/sf0.01"
    con = duck_connect(sf)
    nl = nlist_for(500)
    assert nl == 88, nl
    ok, msg = compare_one(
        spark,
        con,
        "ann_ivf_topk_auto",
        lambda s, d: ann_ivf_topk(s, d, n_centroids=None),
        ivf_sql(IVF_ITERS, nl),
        sf,
    )
    assert ok, msg


def test_ivf_sampled_training_parity(spark):
    """FAISS-style subsampled Lloyd training (train_mod): the codebook is
    trained on the deterministic vec_id % train_mod == 0 sample and the
    full corpus assigned once — every training CTE in the generated
    oracle carries the same sample restriction, so the sampled codebook
    stays hash-exact across engines, composed through all three
    consumers."""
    from crawler_spark.operators.similarity import (
        IVF_ITERS,
        SEMDEDUP_TAU,
        ann_ivf_topk,
        ann_ivfpq_topk,
        dedup_semantic,
        ivf_sql,
        ivfpq_sql,
        semdedup_sql,
    )

    sf = "/root/testdata/sf0.01"
    con = duck_connect(sf)
    for name, fn, sql in (
        (
            "ann_ivf_topk_tm4",
            lambda s, d: ann_ivf_topk(s, d, train_mod=4),
            ivf_sql(IVF_ITERS, train_mod=4),
        ),
        (
            "dedup_semantic_tm4",
            lambda s, d: dedup_semantic(
                s, d, n_centroids=8, cluster_cap=10, train_mod=4
            ),
            semdedup_sql(IVF_ITERS, SEMDEDUP_TAU, 8, 10, 4),
        ),
        (
            "ann_ivfpq_topk_tm4",
            lambda s, d: ann_ivfpq_topk(
                s, d, n_centroids=32, n_probe=8, train_mod=4
            ),
            ivfpq_sql(IVF_ITERS, 32, 8, 4),
        ),
    ):
        ok, msg = compare_one(spark, con, name, fn, sql, sf)
        assert ok, (name, msg)


def test_mlog2_twin_parity(spark):
    """Property-pin the three milli-log2 twins (Spark expr / DuckDB expr /
    py_mlog2) on edge cases and random 50-bit ints: identical integers
    everywhere. This is the primitive under text_quality_classifier and
    text_bigram_surprisal — a last-ulp divergence here would skew every
    downstream weight, so it gets the ids.py-style property treatment."""
    import random

    import duckdb

    from crawler_spark.operators.common import (
        duck_mlog2,
        py_mlog2,
        spark_mlog2,
    )

    rng = random.Random(0xB17)
    vals = (
        [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 1023, 1024, 1025, (1 << 50) - 1]
        + [rng.randrange(1, 1 << 50) for _ in range(500)]
    )
    expect = {v: py_mlog2(v) for v in vals}

    got_spark = {
        r["n"]: r["m"]
        for r in spark.createDataFrame([(v,) for v in vals], "n long")
        .selectExpr("n", f"{spark_mlog2('n')} as m")
        .collect()
    }
    assert got_spark == expect

    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = dict(con.execute(f"SELECT n, {duck_mlog2('n')} FROM t").fetchall())
    assert got_duck == expect


def test_quality_classifier_separates(spark):
    """Pin the two properties the classifier exists for:

    1. SEPARATION — a planted corpus where the curated split
       (doc_id % 10 == 0) writes in vocabulary A and the background in
       vocabulary B: every A-vocab document (including a background-split
       probe the training labels as negative) must score positive / keep,
       every B-vocab document negative / drop. The probe is the point: the
       classifier generalizes from token evidence, not from the label.
    2. NON-VACUOUSNESS on the real corpus — the BM25-idf lesson: whole-bit
       weights would round this word-soup corpus's near-identical class
       histograms to all-zero and the oracle would stay green on a dead
       score column. Milli-bit weights must keep the scores spread."""
    from crawler_spark.operators.text import (
        text_quality_classifier,
        text_quality_classifier_frame,
    )

    target = "alpha beta gamma delta epsilon zeta"
    noise = "noise junk spam blah filler cruft"
    rows = (
        [(i, target) for i in (10, 20, 30)]
        + [(i, noise) for i in (1, 2, 3, 4, 5, 6)]
        + [(7, target)]  # background-labeled probe with target vocabulary
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "split(text, ' ') as toks"
    )
    got = {
        r["doc_id"]: (r["score_milli"], r["keep"])
        for r in text_quality_classifier_frame(docs).collect()
    }
    for did in (10, 20, 30, 7):
        assert got[did][0] > 0 and got[did][1], (did, got[did])
    for did in (1, 2, 3, 4, 5, 6):
        assert got[did][0] < 0 and not got[did][1], (did, got[did])

    real = text_quality_classifier(spark, SF).collect()
    scores = {r["score_milli"] for r in real}
    assert len(scores) > 10, "real-corpus scores collapsed (vacuous weights)"
    assert any(s != 0 for s in scores)


def test_bigram_surprisal_sees_word_order(spark):
    """The separation the op exists for: two documents with IDENTICAL
    token multisets (4 x's + 4 y's) — one alternating (predictable
    transitions), one sorted (rare transitions). The unigram
    text_surprisal provably ties them (it only sees the multiset); the
    bigram model must score the alternating document strictly lower.
    Expected integers derived by hand from the add-one bigram model over
    this 2-doc corpus (V=2, xy:5 yx:3 xx:3 yy:3, cnt(x)=cnt(y)=8)."""
    from crawler_spark.operators.text import (
        text_bigram_surprisal_frame,
        text_surprisal_frame,
    )

    rows = [
        (1, ["x", "y"] * 4),
        (2, ["x"] * 4 + ["y"] * 4),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, toks array<string>")

    uni = {
        r["doc_id"]: r["surprisal_bits"]
        for r in text_surprisal_frame(docs).collect()
    }
    assert uni[1] == uni[2], "unigram model must tie equal multisets"

    bi = {
        r["doc_id"]: r["bits_milli"]
        for r in text_bigram_surprisal_frame(docs).collect()
    }
    assert bi[1] == 7750 and bi[2] == 9250, bi
    assert bi[1] < bi[2]


def test_ppl_buckets_tercile_semantics(spark):
    """Pin the bucket rule on the real corpus: per language, bucket sizes
    follow the floor-tercile split (head = floor(n/3), middle =
    floor(2n/3) - floor(n/3), tail = rest), and the buckets are ORDERED —
    every head doc's ppl_micro <= every middle doc's <= every tail doc's
    within its language (ties can straddle the boundary only in doc_id
    order, so <= is the exact invariant)."""
    from collections import defaultdict

    from crawler_spark.operators.text import text_ppl_buckets

    rows = text_ppl_buckets(spark, SF).collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r["lang"]][r["bucket"]].append(r["ppl_micro"])
    assert len(by_lang) > 1
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        assert len(buckets.get("head", [])) == n // 3, (lang, n)
        assert len(buckets.get("middle", [])) == (2 * n) // 3 - n // 3
        if buckets.get("head") and buckets.get("middle"):
            assert max(buckets["head"]) <= min(buckets["middle"]), lang
        if buckets.get("middle") and buckets.get("tail"):
            assert max(buckets["middle"]) <= min(buckets["tail"]), lang


def test_phash_topk_matches_python_replica(spark):
    """Pin the retrieval semantics against an independent pure-Python
    replica of band-candidate generation + Hamming rerank over the same
    phash index (the DuckDB twin re-derives the phashes from the closed
    form, so hash parity is its job; THIS test pins the bands -> distinct
    candidates -> (hamming, ck) top-k pipeline). Also asserts the plan
    contract: query side broadcast, no cartesian, no parquet scan (the
    index is a checkpoint leaf)."""
    from crawler_spark.operators.multimodal import (
        IMG_TOP,
        N_IMG_QUERIES,
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        _phash_index,
        mm_phash_topk,
    )
    from crawler_spark.plans import (
        assert_no_cartesian,
        has_broadcast_join,
        scan_read_schema,
    )

    idx = {r["k"]: r["phash"] for r in _phash_index(spark, SF).collect()}
    mask = (1 << PHASH_BAND_BITS) - 1

    def bands(p: int) -> set:
        u = p & ((1 << 64) - 1)
        return {
            (b, (u >> (PHASH_BAND_BITS * b)) & mask)
            for b in range(N_PHASH_BANDS)
        }

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    expect = {}
    for qk in (k for k in idx if k < N_IMG_QUERIES):
        qb = bands(idx[qk])
        cands = [ck for ck in idx if ck != qk and bands(idx[ck]) & qb]
        scored = sorted((ham(idx[qk], idx[ck]), ck) for ck in cands)
        expect[f"img{qk}"] = [
            (f"img{ck}", h, r + 1) for r, (h, ck) in enumerate(scored[:IMG_TOP])
        ]

    df = mm_phash_topk(spark, SF)
    assert_no_cartesian(df)
    assert has_broadcast_join(df)
    assert scan_read_schema(df) == [], scan_read_schema(df)

    got = {}
    for r in df.collect():
        got.setdefault(r["q_img"], []).append(
            (r["image_id"], r["hamming"], r["rank"])
        )
    got = {q: sorted(v, key=lambda t: t[2]) for q, v in got.items()}
    assert got == {q: v for q, v in expect.items() if v}, (got, expect)


def test_winnow_selection_matches_python(spark):
    """Randomized cross-check of THE selection rule (leftmost window
    minimum) against a pure-Python replica, applied to literal hash
    arrays — including repeated values (tie-break), strictly
    increasing/decreasing runs, and arrays shorter than one window
    (single truncated window)."""
    import random

    from crawler_spark.operators.text import (
        WINNOW_W,
        _spark_winnow_positions,
    )

    rng = random.Random(0x5EED)
    cases = [
        [5], [5, 5], [1, 2, 3], [3, 2, 1],
        [7, 7, 7, 7, 7, 7], [9, 3, 7, 3, 5, 1, 8],
    ]
    for n in (4, 5, 9, 17, 40):
        for _ in range(6):
            cases.append([rng.randrange(0, 6) for _ in range(n)])
            cases.append([rng.randrange(0, 1 << 40) for _ in range(n)])

    def ref(hs: list, w: int = WINNOW_W) -> list:
        out, seen = [], set()
        for i in range(max(len(hs) - w + 1, 1)):
            win = hs[i:i + w]
            p = i + min(range(len(win)), key=lambda j: (win[j], j)) + 1
            if p not in seen:
                seen.add(p)
                out.append(p)
        return out

    df = spark.createDataFrame(
        list(enumerate(cases)), "i long, hs array<bigint>"
    )
    got = {
        r["i"]: r["pos"]
        for r in df.select(
            "i", F.expr(_spark_winnow_positions(WINNOW_W)).alias("pos")
        ).collect()
    }
    for i, hs in enumerate(cases):
        assert got[i] == ref(hs), (hs, got[i], ref(hs))


def test_winnow_guarantee_detects_shared_run(spark):
    """The property winnowing exists for (Schleimer et al. Thm): any
    shared token run of length >= w + k - 1 (= 8 here) between two
    documents produces at least one SHARED selected fingerprint — even
    though the sample keeps only ~2/(w+1) of the grams. Planted: docs 1
    and 2 share an 8-token run embedded in otherwise disjoint text; doc 3
    shares no k-gram with anyone and must report zero shared."""
    from crawler_spark.operators.text import text_winnow_fingerprints_frame

    shared = "the quick brown fox jumps over the lazy"  # 8 tokens
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon zeta eta theta"),
        (2, f"one two three four {shared} five six seven eight nine"),
        (3, "completely different words nowhere repeated anywhere at all"
            " more unique filler text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "split(text, ' ') as toks"
    )
    got = {
        r["doc_id"]: (r["n_fp"], r["n_shared"])
        for r in text_winnow_fingerprints_frame(docs).collect()
    }
    assert got[1][1] >= 1 and got[2][1] >= 1, got
    assert got[3][1] == 0, got
    for did in (1, 2, 3):
        assert 1 <= got[did][0], got


def test_isqrt_twin_parity(spark):
    """Property-pin the isqrt twins (Spark expr / DuckDB expr) against
    math.isqrt on edge cases and random ints up to the 2^52 cap — the
    τ = 2 temperature-sampling weight primitive. The double-sqrt seed is
    deliberately stressed around perfect squares (n², n²±1), where a
    correctly-rounded float sqrt is most likely to land one off."""
    import math
    import random

    import duckdb

    from crawler_spark.operators.common import duck_isqrt, spark_isqrt

    rng = random.Random(0x5147)
    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17, (1 << 52) - 1]
    for _ in range(200):
        r = rng.randrange(1, 1 << 26)
        vals += [r * r - 1, r * r, r * r + 1, rng.randrange(0, 1 << 52)]
    vals = sorted(set(vals))
    expect = {v: math.isqrt(v) for v in vals}

    got_spark = {
        r["n"]: r["s"]
        for r in spark.createDataFrame([(v,) for v in vals], "n long")
        .selectExpr("n", f"{spark_isqrt('n')} as s")
        .collect()
    }
    assert got_spark == expect

    con = duckdb.connect()
    con.execute("CREATE TABLE t(n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = dict(con.execute(f"SELECT n, {duck_isqrt('n')} FROM t").fetchall())
    assert got_duck == expect


def test_temperature_sampling_semantics(spark):
    """Pin sample_temperature's math against an independent pure-Python
    replica on a PLANTED skewed corpus (en 160 / fr 40 / de 10 — the real
    corpus's lang skew is mild, so the semantics pin plants a sharp one):

    1. EXACTNESS — the Spark output equals the Python replica row for row
       (integer thresholds AND md5 coins), the ids.py twin treatment.
    2. TEMPERATURE ORDER — keep-rate is anti-monotone in corpus share:
       thr(de) > thr(fr) > thr(en); with these counts de saturates at the
       10^4 cap, so the least() guard is load-bearing, not decorative.
    3. DETERMINISM — a second run reproduces the sample exactly (the
       auditability property sample_mixture established)."""
    import hashlib

    from crawler_spark.operators.text import (
        TEMP_SCALE,
        sample_temperature_frame,
    )

    counts = {"en": 160, "fr": 40, "de": 10}
    rows, did = [], 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((did, lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string")

    # pure-Python replica of the integer rate table + md5 coins
    import math

    w = {lg: math.isqrt(n) for lg, n in counts.items()}
    big_w = sum(w.values())
    n_total = sum(counts.values())
    budget = n_total // 2
    thr = {
        lg: min(TEMP_SCALE, (TEMP_SCALE * budget * w[lg]) // (big_w * counts[lg]))
        for lg in counts
    }
    assert thr["de"] == TEMP_SCALE, thr          # saturation: cap engaged
    assert thr["de"] > thr["fr"] > thr["en"], thr  # anti-monotone in share

    def coin(doc_id: int) -> int:
        h = hashlib.md5(f"temp:{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) % TEMP_SCALE

    expect = sorted(
        (d, lg, coin(d), thr[lg]) for d, lg in rows if coin(d) < thr[lg]
    )
    got1 = sorted(tuple(r) for r in sample_temperature_frame(docs).collect())
    got2 = sorted(tuple(r) for r in sample_temperature_frame(docs).collect())
    assert got1 == expect, (got1[:5], expect[:5])
    assert got2 == got1


def test_unimax_sampling_semantics(spark):
    """Pin sample_unimax's water-filling against an independent pure-Python
    replica on a PLANTED sharp skew (en 400 / fr 30 / de 10 / zh 8 — the
    real corpus's skew is too mild for any language to be fully affordable
    at B = N div 2, so this fixture makes the full branch load-bearing):

    1. EXACTNESS — Spark output equals the Python replica row for row
       (closed-form water level AND md5 coins).
    2. TAIL VERBATIM — the UniMax fairness claim: every language below the
       water level keeps thr_bp = 10^4 EXACTLY, i.e. all of zh/fr/de's
       docs appear with zero sampling noise, while en is cut to the
       absolute level t (here t = (B − 48) div 1 = 176 docs → 4400 bp).
    3. BUDGET EXHAUSTION vs TEMPERATURE — on this fixture UniMax's integer
       allocation sums to B EXACTLY (48 tail + 176 head = 224), while
       temperature's rate table loses budget: its tail thresholds saturate
       at the 10^4 cap (isqrt boosts a tiny tail past rate 1) and the
       excess is NOT reallocated — expected kept ≈ 197 < B. That silent
       under-spend is the paper's motivating defect in the knob.
    4. DETERMINISM — a second run reproduces the sample exactly."""
    import hashlib

    from crawler_spark.operators.text import (
        TEMP_SCALE,
        sample_temperature_frame,
        sample_unimax_frame,
    )

    counts = {"en": 400, "fr": 30, "de": 10, "zh": 8}
    rows, did = [], 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((did, lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string")

    # pure-Python replica: ascending-size greedy == closed-form water-fill
    n_total = sum(counts.values())
    budget = n_total // 2
    order = sorted(counts, key=lambda lg: (counts[lg], lg))
    k = len(order)
    thr, cum, m_star, cum_m = {}, 0, 0, 0
    for j, lg in enumerate(order, start=1):
        if cum + counts[lg] * (k - j + 1) <= budget:
            m_star, cum_m = j, cum + counts[lg]
        cum += counts[lg]
    t = (budget - cum_m) // (k - m_star) if m_star < k else 0
    for j, lg in enumerate(order, start=1):
        alloc = counts[lg] if j <= m_star else t
        thr[lg] = min(TEMP_SCALE, (TEMP_SCALE * alloc) // counts[lg])
    assert thr["zh"] == thr["de"] == thr["fr"] == TEMP_SCALE, thr  # tail verbatim
    assert thr["en"] == (TEMP_SCALE * 176) // 400 == 4400, thr     # head at t

    def coin(doc_id: int) -> int:
        h = hashlib.md5(f"umax:{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) % TEMP_SCALE

    expect = sorted(
        (d, lg, coin(d), thr[lg]) for d, lg in rows if coin(d) < thr[lg]
    )
    got1 = sorted(tuple(r) for r in sample_unimax_frame(docs).collect())
    got2 = sorted(tuple(r) for r in sample_unimax_frame(docs).collect())
    assert got1 == expect, (got1[:5], expect[:5])
    assert got2 == got1
    # tail docs ALL present — no coin ever rejects a fully-kept language
    kept_tail = sum(1 for _, lg, _, _ in got1 if lg != "en")
    assert kept_tail == counts["fr"] + counts["de"] + counts["zh"], kept_tail

    # 3. budget accounting vs temperature at the same budget (exact ints)
    umax_alloc = cum_m + (k - m_star) * t
    assert umax_alloc == budget == 224, (umax_alloc, budget)
    temp_thr = {
        lg: t2
        for _, lg, _, t2 in sample_temperature_frame(docs).collect()
    }
    assert temp_thr["zh"] == TEMP_SCALE, temp_thr  # cap saturated on the tail
    temp_expect_x4 = sum(
        counts[lg] * temp_thr[lg] * 4 // TEMP_SCALE for lg in counts
    )
    assert temp_expect_x4 < 4 * budget, (temp_expect_x4, budget)  # under-spend


def test_mm_incremental_matches_brute_force(spark):
    """mm_dedup_incremental vs an all-pairs Python reference over the real
    sf0.001 phash index (125 images): a batch image's eligible neighbors
    are index images plus SMALLER-id batch siblings; a neighbor qualifies
    iff it shares >= 1 of the 4 16-bit bands AND Hamming <= PHASH_HAM_MAX;
    the verdict keeps the min-id qualifier and its hamming. Also asserts
    the fixture is non-vacuous: both novel and dup verdicts occur, and at
    least one matched pair has hamming > 0 (the popcount filter and the
    tolerance are both load-bearing)."""
    from crawler_spark.operators.multimodal import (
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        _phash_index,
    )

    sf = "/root/testdata/sf0.001"
    idx = {r["k"]: r["phash"] for r in _phash_index(spark, sf).collect()}
    mask = (1 << 64) - 1
    bmask = (1 << PHASH_BAND_BITS) - 1

    def bands(p: int) -> list[int]:
        u = p & mask
        return [(u >> (b * PHASH_BAND_BITS)) & bmask for b in range(N_PHASH_BANDS)]

    def ham(a: int, b: int) -> int:
        return bin((a & mask) ^ (b & mask)).count("1")

    expect = {}
    for ka, pa in idx.items():
        if ka % 4 != 0:
            continue
        cands = [
            kb for kb, pb in idx.items()
            if (kb % 4 != 0 or kb < ka)
            and kb != ka
            and any(x == y for x, y in zip(bands(pa), bands(pb)))
            and ham(pa, pb) <= PHASH_HAM_MAX
        ]
        if cands:
            kb = min(cands)
            expect[f"img{ka}"] = (False, f"img{kb}", ham(pa, idx[kb]))
        else:
            expect[f"img{ka}"] = (True, "", -1)

    from crawler_spark.operators.multimodal import mm_dedup_incremental

    got = {
        r["image_id"]: (r["is_novel"], r["dup_of"], r["hamming"])
        for r in mm_dedup_incremental(spark, sf).collect()
    }
    assert got == expect
    verdicts = {v[0] for v in got.values()}
    assert verdicts == {True, False}, "fixture vacuous: one-sided verdicts"
    assert any(v[2] > 0 for v in got.values()), "hamming tolerance never exercised"


def test_mm_incremental_replay_safe(spark):
    """Re-admitting an already-appended batch must reproduce the clean
    run's verdicts exactly: the index's copies of the current batch
    (self-pairs and siblings) are excluded from cross candidates, so a
    sibling reached via its index copy cannot shadow internal's
    smaller-id rule (the dedup_incremental replay contract, applied to
    the image gate)."""
    from pyspark.sql import functions as SF

    from crawler_spark.operators.multimodal import (
        _phash_index,
        mm_dedup_incremental_frames,
    )

    idx = _phash_index(spark, "/root/testdata/sf0.001")
    batch = idx.filter(SF.col("k") % 4 == 0)
    index = idx.filter(SF.col("k") % 4 != 0)
    clean = sorted(
        tuple(r) for r in mm_dedup_incremental_frames(batch, index).collect()
    )
    replayed = sorted(
        tuple(r)
        for r in mm_dedup_incremental_frames(
            batch, index.unionByName(batch)
        ).collect()
    )
    assert replayed == clean


def test_recrawl_schedule_semantics(spark):
    """Pin the freshness estimator on a PLANTED fetch history (the real
    events corpus has no designed change structure) against a pure-Python
    replica of the exact integer math:

    * page 1 changed on EVERY revisit, page 3 on half, page 2 NEVER —
      rate_mb strictly orders 1 > 3 > 2 and the revisit interval inverts
      it: interval(1) < interval(3) < interval(2).
    * the never-changing page has rate_mb = 0 EXACTLY (mlog2 difference of
      equal arguments) and parks at the span*1000 horizon — the +1 in the
      divisor is load-bearing, not decorative.
    * every row equals the py_mlog2 replica integer-for-integer."""
    from datetime import datetime, timezone

    from crawler_spark.operators.common import py_mlog2
    from crawler_spark.operators.relational import crawl_recrawl_schedule_frame

    def ts(minute):
        return datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc)

    # (page_id, visit minutes, changed flags)
    hist = {
        1: ([0, 10, 20, 30], [0, 1, 1, 1]),   # changes every revisit
        2: ([0, 10, 20, 30], [0, 0, 0, 0]),   # never changes
        3: ([0, 10, 20, 30], [0, 1, 0, 1]),   # half
    }
    rows = []
    eid = 0
    for pid, (mins, chgs) in hist.items():
        for m, c in zip(mins, chgs):
            rows.append((eid, ts(m), pid, "click" if c else "view"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r.page_id: (r.n_obs, r.n_changed, r.span_ms, r.rate_mb, r.interval_ms)
        for r in crawl_recrawl_schedule_frame(ev).collect()
    }

    expect = {}
    for pid, (mins, chgs) in hist.items():
        n, x = len(mins), sum(chgs)
        span = (mins[-1] - mins[0]) * 60_000
        rate = py_mlog2(2 * n + 1) - py_mlog2(2 * n - 2 * x + 1)
        expect[pid] = (n, x, span, rate, (span * 1000) // (n * rate + 1))
    assert got == expect, (got, expect)
    assert got[2][3] == 0 and got[2][4] == hist[2][0][-1] * 60_000 * 1000
    assert got[1][3] > got[3][3] > got[2][3]
    assert got[1][4] < got[3][4] < got[2][4]


def test_mm_best_rep_policy_differs_from_min_id(spark):
    """The image quality-argmax policy must be a REAL policy change on the
    actual corpus, and exactly the argmax:

    * at least one multi-member group elects a non-min-id representative
      (measured: 15 such images at sf0.001 — the lossy re-encode's
      quantization does not monotonically lower the integer variance, so
      the winner is NOT an id accident),
    * every multi-group rep has the max score in its group with ties to
      the lowest id (verified against the collected group scores),
    * singletons self-represent with is_rep = true."""
    from crawler_spark.operators.multimodal import mm_best_rep

    rows = mm_best_rep(spark, "/root/testdata/sf0.001").collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    assert any(len(g) > 1 for g in by_group.values())
    nonmin = 0
    for gid, members in by_group.items():
        reps = [m for m in members if m.is_rep]
        if len(members) == 1:
            m = members[0]
            assert m.is_rep and m.rep_id == m.image_id and m.group_size == 1
            continue
        # exactly one rep per group, and it is the (score, -id) argmax
        assert len(reps) == 1, (gid, reps)
        best = max(members, key=lambda m: (m.score, -int(m.image_id[3:])))
        assert reps[0].image_id == best.image_id == reps[0].rep_id
        min_id = min(members, key=lambda m: int(m.image_id[3:]))
        if best.image_id != min_id.image_id:
            nonmin += 1
    assert nonmin > 0, "policy never disagreed with min-id - vacuous fixture"


def test_shard_pack_greedy_semantics(spark):
    """Pin the whole-sample greedy on PLANTED sizes that exercise every
    branch the real corpus cannot (its samples are all ~1 kB < budget):
    an exact-fit boundary (fill == budget admits), an overflow reset, and
    an OVERSIZED sample (> budget) that lands alone in its own shard with
    the next sample forced past it. Verified row-for-row against a pure-
    Python replay of the greedy, all in one stream so the sequence is
    fully determined."""
    from crawler_spark.operators.multimodal import mm_shard_pack_frame

    budget = 30
    sizes = [10, 10, 25, 5, 30, 31, 1]
    rows = [(i, 0, s) for i, s in enumerate(sizes)]
    samples = spark.createDataFrame(rows, "doc_id long, stream int, n_bytes long")
    got = sorted(
        tuple(r) for r in mm_shard_pack_frame(samples, budget).collect()
    )

    expect, fill, sh = [], 0, 0
    for i, s in enumerate(sizes):
        if i and fill + s > budget:
            sh, fill = sh + 1, 0
        expect.append((i, 0, s, sh, fill))
        fill += s
    assert got == expect, (got, expect)
    # the branch coverage the fixture exists for:
    shard_of = {d: sh for d, _, _, sh, _ in got}
    assert shard_of[3] == shard_of[2]            # 25+5 == budget: exact fit admits
    assert shard_of[4] == shard_of[3] + 1        # overflow reset
    assert [d for d, s in shard_of.items() if s == shard_of[5]] == [5]  # oversized isolated
    assert shard_of[6] == shard_of[5] + 1        # and the next sample moves past it


def test_mm_video_incremental_matches_brute_force(spark):
    """mm_video_dedup_incremental vs an all-pairs Python reference over the
    real sf0.001 frame index (125 clips x 2 sampled frames): a batch
    clip's eligible neighbors are index clips plus SMALLER-id batch
    siblings; a neighbor qualifies iff >= VID_MATCH_MIN distinct frames of
    the BATCH clip each have a band-sharing Hamming-<=PHASH_HAM_MAX match
    anywhere among the neighbor's frames (shift-tolerant containment,
    exactly mm_video_neardup's edge rule applied batch-side); the verdict
    keeps the min-id qualifier and its matched-frame count. Non-vacuous:
    both verdicts occur, and the containment floor DISCRIMINATES — at
    least one candidate pair with a single matched frame is rejected (at
    VID_MATCH_MIN = 1 it would be an edge, the mm_video_neardup lesson)."""
    from crawler_spark.operators.multimodal import (
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        VID_MATCH_MIN,
        _video_phash_index,
        mm_audio_dedup_incremental,
    mm_video_dedup_incremental,
    )

    sf = "/root/testdata/sf0.001"
    rows = _video_phash_index(spark, sf).collect()
    frames = {}
    for r in rows:
        frames.setdefault(r["k"], []).append((r["frame_no"], r["fphash"]))
    mask = (1 << 64) - 1
    bmask = (1 << PHASH_BAND_BITS) - 1

    def bands(p):
        u = p & mask
        return [(u >> (b * PHASH_BAND_BITS)) & bmask for b in range(N_PHASH_BANDS)]

    def hit(pa, pb):
        return (
            any(x == y for x, y in zip(bands(pa), bands(pb)))
            and bin(((pa & mask) ^ (pb & mask))).count("1") <= PHASH_HAM_MAX
        )

    single_frame_rejected = 0
    expect = {}
    for ka, fa in frames.items():
        if ka % 4 != 0:
            continue
        quals = {}
        for kb, fb in frames.items():
            if kb == ka or not (kb % 4 != 0 or kb < ka):
                continue
            matched = [f for f, pa in fa if any(hit(pa, pb) for _, pb in fb)]
            if len(matched) >= VID_MATCH_MIN:
                quals[kb] = len(matched)
            elif matched:
                single_frame_rejected += 1
        if quals:
            kb = min(quals)
            expect[f"vid{ka}"] = (len(fa), False, f"vid{kb}", quals[kb])
        else:
            expect[f"vid{ka}"] = (len(fa), True, "", -1)

    got = {
        r["video_id"]: (r["n_frames_sampled"], r["is_novel"], r["dup_of"], r["n_matched"])
        for r in mm_video_dedup_incremental(spark, sf).collect()
    }
    assert got == expect
    verdicts = {v[1] for v in got.values()}
    assert verdicts == {True, False}, "fixture vacuous: one-sided verdicts"
    assert single_frame_rejected > 0, "containment floor never discriminated"


def test_mm_audio_incremental_matches_brute_force(spark):
    """mm_audio_dedup_incremental vs an all-pairs Python reference over
    the real sf0.001 fingerprint index (125 clips x 16 windows), with the
    batch split recomputed independently (first trim-offset of every
    class + all of the first AUD_GATE_BATCH_CLASSES classes). Asserts the
    fixture produces all THREE verdict paths by construction: novel
    (first member of a batch-only class), dup-of-batch-sibling, and
    dup-of-index-clip."""
    from crawler_spark.operators.common import table_rows
    from crawler_spark.operators.multimodal import (
        _AUD_DUP_OFFSETS,
        AUD_GATE_BATCH_CLASSES,
        AUD_MATCH_MIN,
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        _audio_fp_index,
        mm_audio_dedup_incremental,
    )

    sf = "/root/testdata/sf0.001"
    rows = _audio_fp_index(spark, sf).collect()
    wins = {}
    for r in rows:
        wins.setdefault(r["k"], []).append(r["ahash"])
    n = max(table_rows(sf, "documents") // 4, 1)
    nc = max((n + _AUD_DUP_OFFSETS - 1) // _AUD_DUP_OFFSETS, 1)

    def in_batch(k):
        return k % nc < AUD_GATE_BATCH_CLASSES or k < nc

    mask = (1 << 64) - 1
    bmask = (1 << PHASH_BAND_BITS) - 1

    def bands(p):
        u = p & mask
        return [(u >> (b * PHASH_BAND_BITS)) & bmask for b in range(N_PHASH_BANDS)]

    def hit(pa, pb):
        return (
            any(x == y for x, y in zip(bands(pa), bands(pb)))
            and bin(((pa & mask) ^ (pb & mask))).count("1") <= PHASH_HAM_MAX
        )

    expect = {}
    for ka, wa in wins.items():
        if not in_batch(ka):
            continue
        quals = {}
        for kb, wb in wins.items():
            if kb == ka or not (not in_batch(kb) or kb < ka):
                continue
            matched = sum(1 for pa in wa if any(hit(pa, pb) for pb in wb))
            if matched >= AUD_MATCH_MIN:
                quals[kb] = matched
        if quals:
            kb = min(quals)
            expect[f"aud{ka}"] = (len(wa), False, f"aud{kb}", quals[kb])
        else:
            expect[f"aud{ka}"] = (len(wa), True, "", -1)

    got = {
        r["clip_id"]: (r["n_wins"], r["is_novel"], r["dup_of"], r["n_matched"])
        for r in mm_audio_dedup_incremental(spark, sf).collect()
    }
    assert got == expect
    novel = {c for c, v in got.items() if v[1]}
    sib = {c for c, v in got.items() if not v[1] and v[2] in got}
    idx_dup = set(got) - novel - sib
    assert novel and sib and idx_dup, (len(novel), len(sib), len(idx_dup))


def test_c4_rules_twin_on_planted_corpus(spark, tmp_path):
    """C4 gate on a corpus where EVERY rule fires both ways (the synthetic
    documents table is one punctuation-free line per doc, so the sf-dir twin
    above is real but degenerate — the BM25 vacuous-idf lesson says verify
    where the rules discriminate). Twin parity AND pinned per-rule
    semantics:

      doc 1: 3 qualifying lines + 1 short line -> page kept, line dropped
      doc 2: exactly 3 kept lines (incl. a quote-terminated one) -> kept
      doc 3: javascript LINE dropped but 3 others survive -> page kept
             (C4 removes the line, not the page)
      doc 4: 'Lorem Ipsum' page veto despite 4 good lines
      doc 5: curly-brace page veto despite 4 good lines
      doc 6: no terminal punctuation anywhere -> 0 kept lines
      doc 7: empty text -> one empty line, nothing kept
      doc 8: only 2 kept lines -> below the 3-sentence floor
    """
    import duckdb

    from crawler_spark.operators.text import C4_RULES_SQL, text_c4_rules

    rows = [
        (1, "This line has five good words.\nAnother line with enough words here!"
            "\nA third qualifying line right here?\nshort one."),
        (2, 'Good line with many words here.\nSecond good line with words too.'
            '\nThird "quoted" line of words indeed."'),
        (3, "This page mentions javascript in a line with words."
            "\nAnother ok line with enough words.\nThird fine line with plenty words."
            "\nFourth fine line with plenty words."),
        (4, "Lorem Ipsum dolor sit amet here.\nGood line with many more words."
            "\nAnother good line with more words.\nThird good line with more words."),
        (5, "Brace { in this page of words.\nGood line with many more words."
            "\nAnother good line with more words.\nThird good line with more words."),
        (6, "no terminal punctuation on this line\nnor on this second line here"
            "\nnor the third one either"),
        (7, ""),
        (8, "Only two good lines are here.\nSecond and last good line here."
            "\ntiny.\nno punct line"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ok, msg = compare_one(spark, con, "text_c4_rules", text_c4_rules,
                          C4_RULES_SQL, sf)
    assert ok, msg

    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["has_brace"],
                      r["has_lorem"], r["keep"])
        for r in text_c4_rules(spark, sf).collect()
    }
    assert got == {
        1: (4, 3, False, False, True),
        2: (3, 3, False, False, True),
        3: (4, 3, False, False, True),
        4: (4, 4, False, True, False),
        5: (4, 4, True, False, False),
        6: (3, 0, False, False, False),
        7: (1, 0, False, False, False),
        8: (4, 2, False, False, False),
    }
    clean3 = {
        r["doc_id"]: r["text_clean"] for r in text_c4_rules(spark, sf).collect()
    }[3]
    assert "javascript" not in clean3 and clean3.count("\n") == 2


def test_decontam_matches_brute_force():
    """The three modality decontamination twins (and, via oracle parity in
    the list tests, the Spark builders) against all-pairs numpy references:
    for every (train, eval) pair apply the modality's own near-dup
    criterion — band-sharing Hamming-<=4 phash match (image), >=
    VID_MATCH_MIN / AUD_MATCH_MIN units matched anywhere (video/audio) —
    and check the per-train-item (n_eval hits, min_ham / max_matched)
    aggregates exactly. Also pins non-vacuousness both ways at sf0.001:
    each scrub flags at least one item AND leaves at least one train item
    clean. Spark-free."""
    import duckdb
    import numpy as np

    from crawler_spark.engine.verify import _phash_batch
    from crawler_spark.operators import multimodal as mm

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ndocs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    mod = mm.MM_DECONTAM_EVAL_MOD
    mask = (1 << mm.PHASH_BAND_BITS) - 1

    def hit(x: int, y: int) -> int | None:
        """Band-sharing Hamming-<=max match; returns the Hamming or None."""
        ham = bin(x ^ y).count("1")
        if ham > mm.PHASH_HAM_MAX:
            return None
        shared = any(
            ((x >> (mm.PHASH_BAND_BITS * i)) & mask)
            == ((y >> (mm.PHASH_BAND_BITS * i)) & mask)
            for i in range(mm.N_PHASH_BANDS)
        )
        return ham if shared else None

    # -- image: per-train (n_eval_imgs, min_ham) ---------------------------
    n = ndocs // 5
    px = mm._pattern_pixels(np.arange(n, dtype=np.int64), mm.MM_SIDE)
    lossy = np.arange(n) % 2 == 1
    decoded = px.copy()
    decoded[lossy] = (px[lossy] >> 2 << 2) + 2
    ph = _phash_batch(decoded).view(np.uint64)
    want = {}
    for a in range(n):
        if a % mod == 0:
            continue
        hams = [
            h for e in range(0, n, mod)
            if (h := hit(int(ph[a]), int(ph[e]))) is not None
        ]
        if hams:
            want[a] = (len(hams), min(hams))
    got = con.execute(mm.MM_DECONTAM_SQL).df()
    assert {
        int(r["image_id"][3:]): (int(r["n_eval_imgs"]), int(r["min_ham"]))
        for _, r in got.iterrows()
    } == want
    assert want and len(want) < n - n // mod  # flags some, not all

    # -- clip modalities: per-train (n_eval_clips, max_matched) ------------
    def clip_expect(u: np.ndarray, match_min: int) -> dict:
        nc, nu = u.shape
        want = {}
        for a in range(nc):
            if a % mod == 0:
                continue
            ms = []
            for e in range(0, nc, mod):
                m = sum(
                    any(hit(int(u[a, w]), int(u[e, v])) is not None
                        for v in range(nu))
                    for w in range(nu)
                )
                if m >= match_min:
                    ms.append(m)
            if ms:
                want[a] = (len(ms), max(ms))
        assert want and len(want) < nc - nc // mod
        return want

    def clip_got(sql: str, id_name: str) -> dict:
        df = con.execute(sql).df()
        return {
            int(r[id_name][3:]): (int(r["n_eval_clips"]), int(r["max_matched"]))
            for _, r in df.iterrows()
        }

    nv = max(ndocs // 4, 1)
    fh = _phash_batch(
        mm._video_pixels(np.arange(nv, dtype=np.int64))[:, ::mm.FRAME_STRIDE]
        .reshape(-1, mm.MM_SIDE, mm.MM_SIDE, 3)
    ).reshape(nv, -1).view(np.uint64)
    assert clip_got(mm.VIDEO_DECONTAM_SQL, "video_id") == clip_expect(
        fh, mm.VID_MATCH_MIN
    )

    na = max(ndocs // 4, 1)
    n_classes = max((na + mm._AUD_DUP_OFFSETS - 1) // mm._AUD_DUP_OFFSETS, 1)
    pcm = mm._audio_dup_samples(np.arange(na, dtype=np.int64), n_classes)
    bits = (pcm.astype(np.int64) > 0).reshape(na * mm.N_AUD_WINS, mm.AUD_WIN)
    ah = (
        np.packbits(bits.astype(np.uint8), axis=1)
        .view(">u8")[:, 0]
        .astype(np.uint64)
        .reshape(na, mm.N_AUD_WINS)
    )
    aw = clip_expect(ah, mm.AUD_MATCH_MIN)
    assert clip_got(mm.AUDIO_DECONTAM_SQL, "clip_id") == aw
    # the audio corpus's designed classes make the expectation readable:
    # a train clip is contaminated iff its class holds an eval member,
    # and n_eval_clips IS that eval-member count (every same-class pair
    # is an edge; no cross-class pair is)
    for a in range(na):
        if a % mod == 0:
            continue
        evs = [e for e in range(0, na, mod) if e % n_classes == a % n_classes]
        assert (a in aw) == bool(evs), a
        if evs:
            assert aw[a][0] == len(evs), (a, aw[a], evs)


def test_decontam_nondefault_eval_mod(spark):
    """A different eval split keeps both engines in lockstep because the
    twins GENERATE from the same eval_mod parameter (the ivf_sql
    precedent) — pinned on the image and one clip modality at mod=7."""
    from crawler_spark.operators.multimodal import (
        _VIDEO_BAND_CTES,
        VID_MATCH_MIN,
        _containment_decontam_sql,
        _mm_decontam_sql,
    )

    con = duck_connect(SF)
    for name, fn, sql in [
        (
            "mm_decontaminate_mod7",
            lambda s, d: mm_decontaminate(s, d, eval_mod=7),
            _mm_decontam_sql(7),
        ),
        (
            "mm_video_decontaminate_mod7",
            lambda s, d: mm_video_decontaminate(s, d, eval_mod=7),
            _containment_decontam_sql(
                _VIDEO_BAND_CTES, "fphash", "f", VID_MATCH_MIN, 7,
                "vid", "video_id",
            ),
        ),
    ]:
        ok, msg = compare_one(spark, con, name, fn, sql, SF)
        assert ok, (name, msg)


def test_clip_best_rep_policy_differs_from_min_id(spark):
    """The clip-modality argmax reps are a real policy, not an id
    accident (the mm_best_rep / dedup_best_rep pin, per modality):

      1. every multi-group's rep IS the (score DESC, k ASC) argmax over
         its members (recomputed row-by-row from the op's own output);
      2. singletons self-represent with is_rep true;
      3. the group partition matches the modality's groups view exactly
         (same edges, same components — the shared-kernel guarantee);
      4. a measurable number of multi-groups elect a NON-min-id rep
         (min-id and argmax provably disagree on this corpus).
    """
    for fn, groups_fn, id_name in (
        (mm_video_best_rep, mm_video_groups, "video_id"),
        (mm_audio_best_rep, mm_audio_groups, "clip_id"),
    ):
        df = fn(spark, SF).toPandas()
        is_rep_of = dict(zip(df[id_name], df["is_rep"]))
        gv = groups_fn(spark, SF).toPandas()
        assert dict(zip(gv[id_name], gv["group_id"])) == dict(
            zip(df[id_name], df["group_id"])
        ), id_name
        nonmin = 0
        for gid, g in df.groupby("group_id"):
            rep = g["rep_id"].iloc[0]
            assert (g["rep_id"] == rep).all(), gid
            want = g.sort_values(
                ["score", id_name],
                ascending=[False, True],
                key=lambda s: s if s.name == "score" else s.str[3:].astype(int),
            ).iloc[0][id_name]
            assert rep == want, (gid, rep, want)
            assert bool(is_rep_of[rep]), rep
            assert int((g["is_rep"]).sum()) == 1, gid
            if len(g) > 1 and rep != min(g[id_name], key=lambda x: int(x[3:])):
                nonmin += 1
        assert nonmin > 0, (id_name, "argmax degenerated to min-id")


def test_corpus_card_consistent_with_component_views(spark):
    """The card must be an honest AGGREGATE of the matrix views it audits,
    not a parallel implementation: cell-by-cell cross-check against the
    component operators at sf0.001, plus shape invariants (exactly
    4 modalities x 3 stages, n_selected <= n_items everywhere, every
    funnel row non-vacuous both ways on this corpus)."""
    from crawler_spark.operators.dedup import dedup_groups
    from crawler_spark.operators.multimodal import (
        MM_DECONTAM_EVAL_MOD,
        mm_phash_groups,
        mm_video_quality,
    )

    card = corpus_card(spark, SF).toPandas()
    cell = {
        (r["modality"], r["stage"]): (int(r["n_items"]), int(r["n_selected"]))
        for _, r in card.iterrows()
    }
    assert len(cell) == 12 == len(card)
    assert {m for m, _ in cell} == {"text", "image", "video", "audio"}
    assert {s for _, s in cell} == {"dedup", "quality", "decontam"}
    for (m, s), (n, k) in cell.items():
        assert 0 < k < n or (s != "decontam" and 0 < k <= n), (m, s, n, k)

    g = dedup_groups(spark, SF).toPandas()
    assert cell[("text", "dedup")] == (len(g), int(g["is_rep"].sum()))
    pg = mm_phash_groups(spark, SF).toPandas()
    assert cell[("image", "dedup")] == (len(pg), int(pg["is_rep"].sum()))
    vq = mm_video_quality(spark, SF).toPandas()
    assert cell[("video", "quality")] == (len(vq), int(vq["keep"].sum()))
    dec = mm_decontaminate(spark, SF).toPandas()
    n_img = len(pg)
    m = MM_DECONTAM_EVAL_MOD
    train = n_img - (n_img + m - 1) // m
    assert cell[("image", "decontam")] == (train, train - len(dec))


def test_decontam_kernels_match_python_on_random_inputs(spark):
    """Randomized cross-check of the decontamination kernels against a
    pure-Python reference on ADVERSARIAL random fingerprints, independent
    of the corpora's designed dup structure: 2-bit band values make every
    candidacy/verification case occur — shared band with Hamming <= max
    (hit), shared band with Hamming > max (verified away), Hamming <= max
    with NO shared band (LSH candidacy must reject: the reference enforces
    band-share too, so a kernel that skipped the band join would FAIL
    here), and clips straddling match_min."""
    import random

    from crawler_spark.operators.multimodal import (
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        PHASH_HAM_MAX,
        _containment_decontam_frames,
        mm_decontaminate_frames,
    )

    mask = (1 << PHASH_BAND_BITS) - 1

    def band_hit(x: int, y: int) -> bool:
        if bin(x ^ y).count("1") > PHASH_HAM_MAX:
            return False
        return any(
            ((x >> (PHASH_BAND_BITS * i)) & mask)
            == ((y >> (PHASH_BAND_BITS * i)) & mask)
            for i in range(N_PHASH_BANDS)
        )

    for seed in range(5):
        rng = random.Random(seed)

        def rand_hash() -> int:
            return sum(
                rng.getrandbits(2) << (PHASH_BAND_BITS * i)
                for i in range(N_PHASH_BANDS)
            )

        # -- clip kernel: (k, unit, hash) frames, match_min = 2 ------------
        n_units, match_min = 4, 2
        tr = [(k, u, rand_hash()) for k in range(12) for u in range(n_units)]
        ev = [(k, u, rand_hash()) for k in range(5) for u in range(n_units)]
        want = {}
        for k in range(12):
            ms = []
            for e in range(5):
                m = sum(
                    any(band_hit(th, eh) for (ee, _, eh) in ev if ee == e)
                    for (tk, _, th) in tr
                    if tk == k
                )
                if m >= match_min:
                    ms.append(m)
            if ms:
                want[k] = (len(ms), max(ms))
        got = {
            r["k"]: (r["n_eval_clips"], r["max_matched"])
            for r in _containment_decontam_frames(
                spark.createDataFrame(tr, "k long, u int, h long"),
                spark.createDataFrame(ev, "k long, u int, h long"),
                "h", "u", match_min,
            ).collect()
        }
        assert got == want, (seed, got, want)
        assert want, seed  # non-vacuous at every seed

        # -- image kernel: in-corpus mod split over one (k, phash) index ---
        idx = [(k, rand_hash()) for k in range(30)]
        mod = 5
        iwant = {}
        for k, h in idx:
            if k % mod == 0:
                continue
            hams = [
                bin(h ^ eh).count("1")
                for ek, eh in idx
                if ek % mod == 0 and band_hit(h, eh)
            ]
            if hams:
                iwant[k] = (len(hams), min(hams))
        igot = {
            r["k"]: (r["n_eval_imgs"], r["min_ham"])
            for r in mm_decontaminate_frames(
                spark.createDataFrame(idx, "k long, phash long"), mod
            ).collect()
        }
        assert igot == iwant, (seed, igot, iwant)
        assert iwant, seed


def test_containment_topk_matches_python_on_random_inputs(spark):
    """Randomized cross-check of the retrieval kernel's COMPOSITE order on
    adversarial random fingerprints: per (query unit, candidate) the best
    (min) Hamming over band-sharing matches — candidacy is band share
    ALONE, no PHASH_HAM_MAX threshold (retrieval surfaces partial
    containment graded) — then (n_matched DESC, sum_ham ASC, id ASC)
    paging. Ordering bugs (ties broken on the wrong key, sum over
    non-min hams, threshold leaking in from the near-dup views) fail
    against the reference rather than hiding in the designed corpus."""
    import random

    from crawler_spark.operators.multimodal import (
        N_PHASH_BANDS,
        PHASH_BAND_BITS,
        _containment_topk,
    )

    mask = (1 << PHASH_BAND_BITS) - 1

    def share_band(x: int, y: int) -> bool:
        return any(
            ((x >> (PHASH_BAND_BITS * i)) & mask)
            == ((y >> (PHASH_BAND_BITS * i)) & mask)
            for i in range(N_PHASH_BANDS)
        )

    n_clips, n_units, n_queries, top = 14, 3, 4, 3
    for seed in range(5):
        rng = random.Random(100 + seed)
        idx = [
            (k, u, sum(rng.getrandbits(2) << (PHASH_BAND_BITS * i)
                       for i in range(N_PHASH_BANDS)))
            for k in range(n_clips)
            for u in range(n_units)
        ]
        by_k = {}
        for k, _, h in idx:
            by_k.setdefault(k, []).append(h)
        want = {}
        for qk in range(n_queries):
            cands = {}
            for ck in range(n_clips):
                if ck == qk:
                    continue
                n_matched = sum_ham = 0
                for qh in by_k[qk]:
                    hams = [
                        bin(qh ^ ch).count("1")
                        for ch in by_k[ck]
                        if share_band(qh, ch)
                    ]
                    if hams:
                        n_matched += 1
                        sum_ham += min(hams)
                if n_matched:
                    cands[ck] = (n_matched, sum_ham)
            ranked = sorted(
                cands.items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0])
            )[:top]
            want[qk] = [
                (rank + 1, ck, nm, sh)
                for rank, (ck, (nm, sh)) in enumerate(ranked)
            ]
        got = {}
        for r in _containment_topk(
            spark.createDataFrame(idx, "k long, u int, h long"),
            "h", "u", "x", "q", "c", n_queries, top,
        ).collect():
            got.setdefault(int(r["q"][1:]), []).append(
                (r["rank"], int(r["c"][1:]), r["n_matched"], r["sum_ham"])
            )
        got = {q: sorted(v) for q, v in got.items()}
        assert got == {q: v for q, v in want.items() if v}, seed
        # the adversarial space actually produced full pages + real ties
        assert any(len(v) == top for v in want.values()), seed
