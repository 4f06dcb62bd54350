"""End-to-end training-corpus pipeline: the composition a real user runs,
built purely from this repo's own operators — quality gate (text_metrics'
`keep`), repetition filter, unigram-surprisal LM gate, duplicate-span
gate (text_line_dedup's span_dup_ratio — the corpus-level analogue of
Gopher's duplicate-line-fraction rule), alignment-free duplicated-
substring gate (text_substring_dedup's removed_ratio — Lee et al. 2022),
benchmark decontamination (+ eval-split exclusion), exact dedup
(hash-groupBy representative), near-dup clustering (LSH -> verified
edges -> connected components, dedup_groups), and embedding coverage —
emitting one manifest row per document with the final `train_keep`
verdict.

Not a catalog slot (the driver gates at most 50 queries); the DuckDB twin
composes the same verified SQL blocks and is checked in
tests/test_ungated_oracles.py. Scale shape: every stage is one of the
already-audited plans (single tokenize scan, wordcount-shaped aggregates,
broadcast eval grams, band equi-joins, edge-subgraph label propagation),
composed with equi-joins on doc_id — no new shuffle pattern is introduced
by the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import SPARK_TOKENS, duck_h32, load, spark_h32
from .dedup import (
    GROUPS_SQL,
    dedup_exact_frame,
    dedup_groups_from_shingles,
    shingle_rows_from_toks,
)
from .text import (
    C4_RULES_SQL,
    DECONTAM_EVAL_MOD,
    DECONTAM_SQL,
    GOPHER_RULES_SQL,
    LINE_DEDUP_SQL,
    METRICS_SQL,
    REPETITION_SQL,
    SUBSTR_DEDUP_SQL,
    SURPRISAL_SQL,
    decontaminate_frame,
    gram_hashes,
    text_c4_rules_frame,
    text_gopher_rules_frame,
    text_line_dedup_frame,
    text_metrics_frame,
    text_repetition_frame,
    text_substring_dedup_frame,
    text_surprisal_frame,
)

# CCNet-style LM gate: drop the high-surprisal (junk) tail. 5.2 bits/token
# sits above the synthetic corpus's median (5.0) and below its max (~5.45),
# so the gate trims a small real tail at every sf.
SURPRISAL_MAX = 5.2

# Duplicate-span gate: drop documents whose pseudo-line stream is >30%
# spans already seen elsewhere in the corpus (text_line_dedup's keeper
# policy — globally-first occurrence survives). This is the CORPUS-level
# generalization of Gopher's intra-document "duplicate line fraction"
# rule (Rae et al. 2021, table A1, threshold 0.30): it additionally
# catches boilerplate-heavy documents whose spans repeat across pages
# rather than within one. Like dedup_groups' min-id representative, which
# copy of shared boilerplate trains is decided by doc_id order —
# deterministic, and consistent with the pipeline's other keeper choices.
# (A CCNet-style alternative keeps the stripped remainder instead of the
# doc-level verdict; text_line_dedup already emits that as text_clean.)
# The threshold trims a real 5-7% tail at every sf (measured: 25/500 at
# sf0.001, 333/5000 at sf0.1 exceed it).
SPAN_DUP_MAX = 0.3

# Alignment-free duplicated-substring gate (text_substring_dedup's
# removed_ratio — the Lee et al. exact-substring signal): drop documents
# more than 30% covered by >=8-token spans that occurred earlier in the
# corpus. Complements the line gate: a duplicated run straddling the
# pseudo-line boundary contributes here but is invisible there. Same
# threshold as SPAN_DUP_MAX by design (both are "fraction of the document
# that is someone else's text").
SUBSTR_DUP_MAX = 0.3


def _quality_rep(g: DataFrame, m: DataFrame) -> DataFrame:
    """(group_id, rep_doc_id) for MULTI-member near-dup groups — the
    quality-argmax representative policy defined ONCE for both consumers
    (dedup_best_rep and pipeline_clean_corpus), so a tie-break or
    null-handling change can never diverge them. The (quality, -doc_id)
    struct max is an exact total order: quality_score is the same rounded
    float64 in both engines and the negated doc_id breaks ties toward the
    lowest id. Singletons never enter the exchange; callers coalesce
    rep_doc_id to doc_id."""
    return (
        g.filter(F.col("group_size") > 1)
        .select("doc_id", "group_id")
        .join(m.select("doc_id", "quality_score"), "doc_id")
        .groupBy("group_id")
        .agg(
            F.max(
                F.struct(
                    F.col("quality_score").alias("q"),
                    (-F.col("doc_id")).alias("nd"),
                )
            ).alias("b")
        )
        .select("group_id", (-F.col("b.nd")).alias("rep_doc_id"))
    )


def _quality_rep_r_sql(src: str, mt: str | None = None) -> str:
    """The DuckDB twin of `_quality_rep`, as a CTE body: `src` supplies
    (doc_id, group_id, group_size) and `mt` (or `src` itself when None)
    supplies quality_score — ONE definition composed into BEST_REP_SQL
    and PIPELINE_SQL."""
    join = f" JOIN {mt} ON {mt}.doc_id = {src}.doc_id" if mt else ""
    q = mt or src
    return f"""SELECT group_id, doc_id AS rep_doc_id FROM (
    SELECT {src}.group_id, {src}.doc_id,
           row_number() OVER (
             PARTITION BY {src}.group_id
             ORDER BY {q}.quality_score DESC, {src}.doc_id
           ) AS rn
    FROM {src}{join}
    WHERE {src}.group_size > 1
  ) WHERE rn = 1"""


def pipeline_clean_corpus(
    spark: SparkSession,
    sf_dir: str,
    rep_policy: str = "quality",
    c4: bool = False,
) -> DataFrame:
    """train_keep = good quality AND passes the Gopher named rules AND not
    repetitive AND fluent under the unigram LM AND not mostly duplicated
    spans (line-aligned AND alignment-free) AND not in (or overlapping)
    the eval split AND near-dup representative AND exact-dup
    representative AND has an embedding.

    The near-dup representative follows `rep_policy`: "quality" (default —
    dedup_best_rep's production policy: each multi-member cluster keeps
    its highest-quality_score member, ties to the lowest doc_id, the
    FineWeb/SemDeDup shape) or "min_id" (dedup_groups' arbitrary
    min-id keeper, retained so the policy A/B in
    test_best_rep_changes_pipeline_output stays runnable). The argmax runs
    ONLY over multi-member groups — singletons never enter the exchange —
    and reuses the quality_score already computed on the shared tokenize
    checkpoint, so the policy costs one |multi-groups|-row aggregate.

    Exact dedup is NOT redundant with the near-dup groups: a document too
    short to shingle (< 3 tokens) never gets a near-dup edge, so
    byte-identical short documents are both singleton `is_rep` — the hash
    representative still drops the copy. Missing metrics (a token-less
    document) fail their gates — junk never trains by omission.

    The C4 line-cleaning verdict (`text_c4_rules_frame`'s page-level
    `keep`) rides the manifest as the `c4_keep` audit column always, and
    gates train_keep only when `c4=True`. Opt-in because the verdict is
    HONEST but maximally aggressive on the synthetic corpus: every
    document is one punctuation-free line, so C4's terminal-punctuation
    rule fails every line and c4=True keeps nothing here (on real web
    text C4 keeps a large fraction; the discriminating semantics are
    pinned on a planted corpus in test_ungated_oracles). Zero extra cost
    either way: the gate is a per-row map on the same checkpoint.

    Scan discipline: at 100 TB the tokenizer pass IS the pipeline's
    dominant cost, so `documents` is read ONCE into a checkpointed
    (doc_id, text, toks) frame and every stage derives from it — metrics,
    repetition, surprisal, and exact dedup read the tokens directly;
    decontamination and the near-dup shingles each derive one gram frame
    from the same checkpoint (the gram frame is itself checkpointed so its
    eval/train split is one pass). A plan test asserts the whole pipeline
    plan contains at most one `documents` scan."""
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text", F.expr(SPARK_TOKENS).alias("toks"))
        .localCheckpoint(eager=True)
    )
    m = text_metrics_frame(base).select(
        "doc_id", "n_tokens", "quality_score", "keep"
    )
    # the Gopher named-rule gate is a per-row map on the SAME checkpoint —
    # zero additional scans or exchanges (plan-asserted for the gate alone
    # in test_gopher_rules_zero_exchange)
    gr = text_gopher_rules_frame(base).select(
        "doc_id", F.col("keep").alias("gopher_keep")
    )
    rep = text_repetition_frame(base).select("doc_id", "repetitive")
    srp = text_surprisal_frame(base).select("doc_id", "bits_per_token")
    grams = gram_hashes(base).localCheckpoint(eager=True)
    cont = decontaminate_frame(grams).select(
        "doc_id", F.lit(True).alias("contaminated")
    )
    # NULL ratio for token-less docs (0 pseudo-lines) — the gate's
    # coalesce(..., false) fails them, and ANSI mode would otherwise raise
    # on the 0/0 division
    ld = text_line_dedup_frame(base).select(
        "doc_id",
        F.when(
            F.col("n_kept") + F.col("n_dropped") > 0,
            F.round(F.col("n_dropped") / (F.col("n_kept") + F.col("n_dropped")), 6),
        ).alias("span_dup_ratio"),
    )
    # token-less docs have removed_ratio 0 but fail the quality gate anyway
    sd = text_substring_dedup_frame(base).select(
        "doc_id", F.col("removed_ratio").alias("substr_dup_ratio")
    )
    # per-row map on the checkpoint (zero exchanges of its own); the inner
    # join through `m` keeps it one row per document
    c4g = text_c4_rules_frame(base).select(
        "doc_id", F.col("keep").alias("c4_keep")
    )
    sh = shingle_rows_from_toks(base).localCheckpoint(eager=True)
    g = dedup_groups_from_shingles(sh, base.select("doc_id"))
    if rep_policy == "quality":
        best = _quality_rep(g, m).withColumnRenamed("rep_doc_id", "best_doc_id")
        g = g.join(best, "group_id", "left").select(
            "doc_id",
            "group_id",
            "group_size",
            F.coalesce(F.col("doc_id") == F.col("best_doc_id"), F.lit(True)).alias(
                "is_rep"
            ),
        )
    ex = dedup_exact_frame(base).select(
        F.col("rep_doc_id").alias("doc_id"), F.lit(True).alias("exact_rep")
    )
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("has_embedding")
    )
    joined = (
        m.join(gr, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(srp, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(ld, "doc_id", "left")
        .join(sd, "doc_id", "left")
        .join(c4g, "doc_id", "left")
        .join(g, "doc_id")
        .join(ex, "doc_id", "left")
        .join(emb, "doc_id", "left")
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "quality_score",
        "bits_per_token",
        "span_dup_ratio",
        "substr_dup_ratio",
        "c4_keep",
        "group_id",
        "group_size",
        # the manifest carries the rep verdict itself (not just its effect
        # on train_keep): on corpora where every later near-dup copy is
        # also a full-span duplicate the two rep policies produce the same
        # train_keep set, and this column is where the policy choice is
        # visible and auditable
        "is_rep",
        (
            F.col("keep")
            & F.coalesce("gopher_keep", F.lit(False))
            & ~F.coalesce("repetitive", F.lit(True))
            & F.coalesce(F.col("bits_per_token") <= SURPRISAL_MAX, F.lit(False))
            & F.coalesce(F.col("span_dup_ratio") <= SPAN_DUP_MAX, F.lit(False))
            & F.coalesce(F.col("substr_dup_ratio") <= SUBSTR_DUP_MAX, F.lit(False))
            & (F.coalesce("c4_keep", F.lit(False)) if c4 else F.lit(True))
            & F.expr(f"doc_id % {DECONTAM_EVAL_MOD} <> 0")
            & ~F.coalesce("contaminated", F.lit(False))
            & F.col("is_rep")
            & F.coalesce("exact_rep", F.lit(False))
            & F.coalesce("has_embedding", F.lit(False))
        ).alias("train_keep"),
    )


# Per-source verdict thresholds, chosen at the measured per-source
# distribution medians so keep AND drop BOTH occur at every sf (sf0.001:
# keep_rate 0.00-0.12 median 0.04, dup_rate 0.00-0.08; sf0.1: keep_rate
# 0.052-0.104, dup_rate 0.028-0.060 median 0.052). Both rates are exact
# int64/int64 divisions, so the threshold comparisons are bit-identical
# across engines.
SOURCE_KEEP_MIN = 0.04  # quality-keep fraction a source must reach
SOURCE_DUP_MAX = 0.05   # near-dup member fraction a source may carry


def source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style per-SOURCE (per-domain) corpus audit: roll every
    per-document signal the pipeline already computes up to the `source`
    column and emit one verdict row per source — the table a curation team
    reads to decide which domains keep feeding the corpus (and the shape
    of RefinedWeb/FineWeb's domain blocklists: rates of quality failure
    and near-duplication BY origin, not per document).

    Columns: doc volume, near-dup member count/rate (non-representatives
    from the LSH->verified->connected-components groups — exact dups are
    a subset), quality-keep count/rate (text_metrics' gate), mean tokens,
    the modal PREDICTED language (the pipeline's own langid signal, a
    conditional count per language inside the same aggregate — no second
    shuffle), and the keep_source verdict.

    Scale shape: one tokenize scan (the shared checkpoint), the
    already-audited dedup-groups dataflow over the edge subgraph, one
    doc_id equi-join, then ONE exchange keyed by source whose map-side
    partial agg collapses every partition to |sources| rows before the
    shuffle — at 100 TB the rollup moves kilobytes."""
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "text", F.expr(SPARK_TOKENS).alias("toks"))
        .localCheckpoint(eager=True)
    )
    m = text_metrics_frame(base, carry=("source",)).select(
        "source", "doc_id", "n_tokens", "keep", "pred_lang"
    )
    sh = shingle_rows_from_toks(base).localCheckpoint(eager=True)
    g = dedup_groups_from_shingles(sh, base.select("doc_id")).select(
        "doc_id", "is_rep"
    )
    j = m.join(g, "doc_id")
    agg = j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((~F.col("is_rep")).cast("long")).alias("n_neardup"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum("n_tokens").alias("tok_total"),
        F.sum((F.col("pred_lang") == "en").cast("long")).alias("n_en"),
        F.sum((F.col("pred_lang") == "fr").cast("long")).alias("n_fr"),
        F.sum((F.col("pred_lang") == "de").cast("long")).alias("n_de"),
    )
    dup_rate = F.col("n_neardup") / F.col("n_docs")
    keep_rate = F.col("n_keep") / F.col("n_docs")
    return agg.select(
        "source",
        "n_docs",
        "n_neardup",
        F.round(dup_rate, 6).alias("dup_rate"),
        "n_keep",
        F.round(keep_rate, 6).alias("keep_rate"),
        F.round(F.col("tok_total") / F.col("n_docs"), 4).alias("mean_tokens"),
        F.when(
            (F.col("n_en") >= F.col("n_fr")) & (F.col("n_en") >= F.col("n_de")),
            "en",
        )
        .when(F.col("n_fr") >= F.col("n_de"), "fr")
        .otherwise("de")
        .alias("top_pred_lang"),
        ((keep_rate >= SOURCE_KEEP_MIN) & (dup_rate <= SOURCE_DUP_MAX)).alias(
            "keep_source"
        ),
    )


SOURCE_ROLLUP_SQL = f"""
WITH m AS ({METRICS_SQL}),
g AS (SELECT doc_id, is_rep FROM ({GROUPS_SQL}) gg),
d AS (SELECT doc_id, source FROM documents),
a AS (
  SELECT d.source, count(*) AS n_docs,
         sum(CASE WHEN NOT g.is_rep THEN 1 ELSE 0 END)::bigint AS n_neardup,
         sum(CASE WHEN m.keep THEN 1 ELSE 0 END)::bigint AS n_keep,
         sum(m.n_tokens)::bigint AS tok_total,
         sum(CASE WHEN m.pred_lang = 'en' THEN 1 ELSE 0 END) AS n_en,
         sum(CASE WHEN m.pred_lang = 'fr' THEN 1 ELSE 0 END) AS n_fr,
         sum(CASE WHEN m.pred_lang = 'de' THEN 1 ELSE 0 END) AS n_de
  FROM d JOIN m USING (doc_id) JOIN g USING (doc_id)
  GROUP BY d.source
)
SELECT source, n_docs::bigint AS n_docs, n_neardup,
       round(n_neardup / n_docs, 6) AS dup_rate,
       n_keep, round(n_keep / n_docs, 6) AS keep_rate,
       round(tok_total / n_docs, 4) AS mean_tokens,
       CASE WHEN n_en >= n_fr AND n_en >= n_de THEN 'en'
            WHEN n_fr >= n_de THEN 'fr' ELSE 'de' END AS top_pred_lang,
       (n_keep / n_docs >= {SOURCE_KEEP_MIN}
        AND n_neardup / n_docs <= {SOURCE_DUP_MAX}) AS keep_source
FROM a
"""


def dedup_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup representative: for each duplicate cluster,
    keep the member with the HIGHEST quality_score (ties -> lowest doc_id)
    instead of dedup_groups' arbitrary min-id — what production pipelines
    actually do when a cluster mixes a clean original with mangled copies
    (SemDeDup keeps the most-central member; FineWeb keeps by quality).

    Scale shape: the argmax runs ONLY over multi-member groups (the edge
    subgraph — singletons are their own representative by construction and
    never enter the exchange), one groupBy(group_id) max-struct whose
    map-side partial agg collapses each partition to |groups| rows. The
    (quality, -doc_id) struct max is an exact total order: quality_score
    is the same rounded float64 in both engines and the negated doc_id
    breaks ties toward the lowest id."""
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text", F.expr(SPARK_TOKENS).alias("toks"))
        .localCheckpoint(eager=True)
    )
    m = text_metrics_frame(base).select("doc_id", "quality_score")
    sh = shingle_rows_from_toks(base).localCheckpoint(eager=True)
    g = dedup_groups_from_shingles(sh, base.select("doc_id")).select(
        "doc_id", "group_id", "group_size"
    )
    j = g.join(m, "doc_id")
    best = _quality_rep(g, m)
    return j.join(best, "group_id", "left").select(
        "doc_id",
        "group_id",
        "group_size",
        F.coalesce("rep_doc_id", F.col("doc_id")).alias("rep_doc_id"),
        (F.col("doc_id") == F.coalesce("rep_doc_id", F.col("doc_id"))).alias(
            "is_rep"
        ),
        "quality_score",
    )


BEST_REP_SQL = f"""
WITH m AS ({METRICS_SQL}),
g AS (SELECT doc_id, group_id, group_size FROM ({GROUPS_SQL}) gg),
j AS (
  SELECT g.doc_id, g.group_id, g.group_size, m.quality_score
  FROM g JOIN m USING (doc_id)
),
r AS ({_quality_rep_r_sql('j')})
SELECT j.doc_id, j.group_id, j.group_size::bigint AS group_size,
       coalesce(r.rep_doc_id, j.doc_id) AS rep_doc_id,
       (j.doc_id = coalesce(r.rep_doc_id, j.doc_id)) AS is_rep,
       j.quality_score
FROM j LEFT JOIN r USING (group_id)
"""


def pipeline_sql(c4: bool = False) -> str:
    """Composed DuckDB twin of `pipeline_clean_corpus`, generated from the
    same `c4` parameter (the ivf_sql precedent: widths and flags used by a
    builder always generate the oracle, never a second hand-written
    constant)."""
    c4_gate = "\n        AND coalesce(c4g.c4_keep, false)" if c4 else ""
    return f"""
WITH m AS ({METRICS_SQL}),
gr AS (SELECT doc_id, keep AS gopher_keep FROM ({GOPHER_RULES_SQL}) qq),
rep AS (SELECT doc_id, repetitive FROM ({REPETITION_SQL}) rr),
srp AS (SELECT doc_id, bits_per_token FROM ({SURPRISAL_SQL}) ss),
cont AS (SELECT doc_id, true AS contaminated FROM ({DECONTAM_SQL}) cc),
ld AS (
  SELECT doc_id,
         CASE WHEN n_kept + n_dropped > 0
              THEN round(n_dropped * 1.0 / (n_kept + n_dropped), 6)
         END AS span_dup_ratio
  FROM ({LINE_DEDUP_SQL}) ll
),
sd AS (SELECT doc_id, removed_ratio AS substr_dup_ratio FROM ({SUBSTR_DEDUP_SQL}) sdd),
c4g AS (SELECT doc_id, keep AS c4_keep FROM ({C4_RULES_SQL}) c4q),
g AS (SELECT * FROM ({GROUPS_SQL}) gg),
r AS ({_quality_rep_r_sql('g', 'm')}),
ex AS (
  SELECT min(doc_id) AS doc_id, true AS exact_rep
  FROM documents GROUP BY md5(text)
),
e AS (SELECT vec_id AS doc_id, true AS has_embedding FROM embeddings)
SELECT m.doc_id, m.n_tokens, m.quality_score, srp.bits_per_token,
       ld.span_dup_ratio, sd.substr_dup_ratio, c4g.c4_keep,
       g.group_id, g.group_size,
       coalesce(g.doc_id = r.rep_doc_id, true) AS is_rep,
       (m.keep
        AND coalesce(gr.gopher_keep, false)
        AND NOT coalesce(rep.repetitive, true)
        AND coalesce(srp.bits_per_token <= {SURPRISAL_MAX}, false)
        AND coalesce(ld.span_dup_ratio <= {SPAN_DUP_MAX}, false)
        AND coalesce(sd.substr_dup_ratio <= {SUBSTR_DUP_MAX}, false){c4_gate}
        AND m.doc_id % {DECONTAM_EVAL_MOD} <> 0
        AND NOT coalesce(cont.contaminated, false)
        AND coalesce(g.doc_id = r.rep_doc_id, true)
        AND coalesce(ex.exact_rep, false)
        AND coalesce(e.has_embedding, false)) AS train_keep
FROM m
LEFT JOIN gr ON gr.doc_id = m.doc_id
LEFT JOIN rep ON rep.doc_id = m.doc_id
LEFT JOIN srp ON srp.doc_id = m.doc_id
LEFT JOIN cont ON cont.doc_id = m.doc_id
LEFT JOIN ld ON ld.doc_id = m.doc_id
LEFT JOIN sd ON sd.doc_id = m.doc_id
LEFT JOIN c4g ON c4g.doc_id = m.doc_id
JOIN g ON g.doc_id = m.doc_id
LEFT JOIN r ON r.group_id = g.group_id
LEFT JOIN ex ON ex.doc_id = m.doc_id
LEFT JOIN e ON e.doc_id = m.doc_id
"""


PIPELINE_SQL = pipeline_sql()


# -- Leakage-safe train/val/test split ---------------------------------------
# Deterministic corpus splitting keyed by the DUPLICATE CLASS, not the
# document: hashing doc_id (the naive split) puts two near-duplicate
# documents on opposite sides of the train/eval boundary, so the eval set
# silently overlaps training — the leakage channel decontamination papers
# (Lee et al. 2022 §6.2; Dolma/FineWeb split practice) call out. Here every
# member of a near-dup GROUP shares the group's bucket by construction
# (split_key = the group label), so a group can never straddle splits.
#
# Exact duplicates too short to shingle (< 3 tokens) never get a near-dup
# edge and sit in distinct singleton groups — hashing THEIR group_id would
# reopen the leak for byte-identical short docs. Singletons therefore key on
# md5(text) instead: byte-identical singletons collide into one bucket, and
# a singleton can never be byte-identical to a multi-group member (identical
# text >= 3 tokens shingles identically -> same group; < 3 tokens -> both
# singletons). The 'g'/'t' prefixes keep the two key namespaces disjoint.
#
# Scale shape: the groups dataflow is the already-audited LSH -> verified
# edges -> label propagation over the edge SUBGRAPH; on top of it the split
# adds one doc_id equi-join back to the checkpoint (for singleton text
# hashes) and a stateless per-row md5-slice bucket — no new shuffle pattern.
# The bucket is h32(split_key) % 100, the same md5-prefix integer both
# engines compute bit-identically, so the assignment is a pure function of
# the key: stable across engines, runs, and partitionings. (NOT frozen
# under corpus growth in general — a new member with a smaller doc_id
# re-labels its group and can move the whole group's bucket; an
# incremental corpus that needs a frozen split should persist the
# assignment, dedup_incremental-style, rather than recompute it.)

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test takes the remaining 10


def pipeline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text", F.expr(SPARK_TOKENS).alias("toks"))
        .localCheckpoint(eager=True)
    )
    sh = shingle_rows_from_toks(base).localCheckpoint(eager=True)
    g = dedup_groups_from_shingles(sh, base.select("doc_id"))
    keyed = g.join(base.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "group_id",
        "group_size",
        F.when(
            F.col("group_size") > 1,
            F.concat(F.lit("g"), F.col("group_id").cast("string")),
        )
        .otherwise(F.concat(F.lit("t"), F.md5(F.col("text"))))
        .alias("split_key"),
    )
    bucket = F.expr(spark_h32("split_key")) % 100
    return keyed.select(
        "doc_id",
        "group_id",
        "group_size",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


SPLIT_SQL = f"""
WITH g AS (SELECT * FROM ({GROUPS_SQL}) gg),
k AS (
  SELECT g.doc_id, g.group_id, g.group_size,
         CASE WHEN g.group_size > 1 THEN 'g' || g.group_id::varchar
              ELSE 't' || md5(d.text) END AS split_key
  FROM g JOIN documents d USING (doc_id)
)
SELECT doc_id, group_id, group_size,
       ({duck_h32('split_key')} % 100)::bigint AS bucket,
       CASE WHEN {duck_h32('split_key')} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {duck_h32('split_key')} % 100
                 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM k
"""


# -- cross-modality corpus card (the audit a pipeline runs nightly) ----------
def corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One audit table across the whole modality matrix: for each modality
    (text / image / video / audio) and each survival gate (dedup /
    quality / decontam), how many items enter and how many survive —

      dedup:    n_items = corpus,        n_selected = class representatives
      quality:  n_items = gated corpus,  n_selected = keep verdicts
      decontam: n_items = train split,   n_selected = uncontaminated

    built purely by AGGREGATING the already-verified matrix views (the
    pipeline_clean_corpus composition discipline, one level up): groups
    views supply is_rep, quality views keep, decontamination views the
    flagged counts. Each row states its OWN universe — the audio quality
    gate measures the feature corpus while audio dedup/decontam measure
    the dup-class corpus, so rates are never mixed across views.

    Scale shape: 12 one-row aggregates over plans whose shapes are
    individually plan-asserted elsewhere, unioned; the only new dataflow
    is one-row crossJoins (the lineage-agg idiom) for the decontam rows.
    Output: (modality, stage, n_items, n_selected), 12 rows."""
    from functools import reduce

    from .common import table_rows
    from .dedup import dedup_groups
    from .multimodal import (
        MM_DECONTAM_EVAL_MOD,
        mm_audio_decontaminate,
        mm_audio_groups,
        mm_audio_quality,
        mm_decontaminate,
        mm_phash_groups,
        mm_quality_filter,
        mm_video_decontaminate,
        mm_video_groups,
        mm_video_quality,
    )
    from .text import decontaminate, text_metrics

    def tagged(modality: str, stage: str, one_row: DataFrame) -> DataFrame:
        return one_row.select(
            F.lit(modality).alias("modality"),
            F.lit(stage).alias("stage"),
            F.col("n_items").cast("long").alias("n_items"),
            F.col("n_selected").cast("long").alias("n_selected"),
        )

    def gate(modality: str, stage: str, df: DataFrame, sel: str) -> DataFrame:
        return tagged(
            modality, stage,
            df.agg(
                F.count("*").alias("n_items"),
                F.sum(F.col(sel).cast("long")).alias("n_selected"),
            ),
        )

    def dec(modality: str, n_train: DataFrame, flagged: DataFrame) -> DataFrame:
        # two one-row frames -> one row (the bounded lineage-agg idiom)
        return tagged(
            modality, "decontam",
            n_train.crossJoin(
                flagged.agg(F.count("*").alias("n_flagged"))
            ).select(
                "n_items", (F.col("n_items") - F.col("n_flagged")).alias("n_selected")
            ),
        )

    def lit_train(n: int) -> DataFrame:
        # clip/image ids are 0..n-1 by construction, so the train-universe
        # size is the closed form n - ceil(n / eval_mod) (twin-identical)
        m = MM_DECONTAM_EVAL_MOD
        return spark.range(1).select(
            F.lit(n - (n + m - 1) // m).alias("n_items")
        )

    docs = load(spark, sf_dir, "documents")
    n_docs = table_rows(sf_dir, "documents")
    rows = [
        gate("text", "dedup", dedup_groups(spark, sf_dir), "is_rep"),
        gate("text", "quality", text_metrics(spark, sf_dir), "keep"),
        # text doc_ids are whatever the table carries - count the real split
        dec(
            "text",
            docs.filter(f"doc_id % {DECONTAM_EVAL_MOD} <> 0").agg(
                F.count("*").alias("n_items")
            ),
            decontaminate(spark, sf_dir),
        ),
        gate("image", "dedup", mm_phash_groups(spark, sf_dir), "is_rep"),
        gate("image", "quality", mm_quality_filter(spark, sf_dir), "keep"),
        dec("image", lit_train(n_docs // 5), mm_decontaminate(spark, sf_dir)),
        gate("video", "dedup", mm_video_groups(spark, sf_dir), "is_rep"),
        gate("video", "quality", mm_video_quality(spark, sf_dir), "keep"),
        dec("video", lit_train(max(n_docs // 4, 1)),
            mm_video_decontaminate(spark, sf_dir)),
        gate("audio", "dedup", mm_audio_groups(spark, sf_dir), "is_rep"),
        gate("audio", "quality", mm_audio_quality(spark, sf_dir), "keep"),
        dec("audio", lit_train(max(n_docs // 4, 1)),
            mm_audio_decontaminate(spark, sf_dir)),
    ]
    return reduce(lambda a, b: a.unionByName(b), rows)


def _corpus_card_sql() -> str:
    """Twin GENERATED by wrapping the component twins as subqueries — the
    card and the views it audits cannot drift because they ARE the same
    SQL blocks."""
    from .multimodal import (
        AUDIO_DECONTAM_SQL,
        AUDIO_GROUPS_SQL,
        AUDIO_QUALITY_SQL,
        MM_DECONTAM_EVAL_MOD,
        MM_DECONTAM_SQL,
        PHASH_GROUPS_SQL,
        QUALITY_SQL,
        VIDEO_DECONTAM_SQL,
        VIDEO_GROUPS_SQL,
        VIDEO_QUALITY_SQL,
    )

    def gate(modality: str, stage: str, sql: str, sel: str) -> str:
        return (
            f"SELECT '{modality}' AS modality, '{stage}' AS stage,\n"
            f"       count(*)::bigint AS n_items,\n"
            f"       sum(({sel})::int)::bigint AS n_selected\nFROM ({sql})"
        )

    def dec(modality: str, n_expr: str, sql: str) -> str:
        return (
            f"SELECT '{modality}' AS modality, 'decontam' AS stage,\n"
            f"       ({n_expr})::bigint AS n_items,\n"
            f"       (({n_expr}) - (SELECT count(*) FROM ({sql})))::bigint"
            f" AS n_selected"
        )

    m = MM_DECONTAM_EVAL_MOD
    text_n = (
        f"SELECT count(*) FROM documents WHERE doc_id % {DECONTAM_EVAL_MOD} <> 0"
    )
    img_n = "(SELECT count(*) // 5 FROM documents)"
    clip_n = "(SELECT greatest(count(*) // 4, 1) FROM documents)"

    def train(n: str) -> str:
        return f"({n} - ({n} + {m - 1}) // {m})"

    return "\nUNION ALL\n".join(
        [
            gate("text", "dedup", GROUPS_SQL, "is_rep"),
            gate("text", "quality", METRICS_SQL, "keep"),
            dec("text", text_n, DECONTAM_SQL),
            gate("image", "dedup", PHASH_GROUPS_SQL, "is_rep"),
            gate("image", "quality", QUALITY_SQL, "keep"),
            dec("image", train(img_n), MM_DECONTAM_SQL),
            gate("video", "dedup", VIDEO_GROUPS_SQL, "is_rep"),
            gate("video", "quality", VIDEO_QUALITY_SQL, "keep"),
            dec("video", train(clip_n), VIDEO_DECONTAM_SQL),
            gate("audio", "dedup", AUDIO_GROUPS_SQL, "is_rep"),
            gate("audio", "quality", AUDIO_QUALITY_SQL, "keep"),
            dec("audio", train(clip_n), AUDIO_DECONTAM_SQL),
        ]
    )


# CORPUS_CARD_SQL is served lazily (PEP 562): the generator imports
# multimodal's twins, and multimodal's split twin imports this module's
# split constants — an eager assignment here would be a circular import
# at package init. `from .pipeline import CORPUS_CARD_SQL` still works.
def __getattr__(name: str) -> str:
    if name == "CORPUS_CARD_SQL":
        return _corpus_card_sql()
    raise AttributeError(name)
