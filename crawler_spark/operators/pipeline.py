"""End-to-end training-corpus pipeline: the composition a real user runs,
built purely from this repo's own operators — quality gate (text_metrics'
`keep`), repetition filter, unigram-surprisal LM gate, duplicate-span
gate (text_line_dedup's span_dup_ratio — the corpus-level analogue of
Gopher's duplicate-line-fraction rule),
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

from .common import SPARK_TOKENS, load
from .dedup import (
    GROUPS_SQL,
    dedup_exact_frame,
    dedup_groups_from_shingles,
    shingle_rows_from_toks,
)
from .text import (
    DECONTAM_EVAL_MOD,
    DECONTAM_SQL,
    GOPHER_RULES_SQL,
    LINE_DEDUP_SQL,
    METRICS_SQL,
    REPETITION_SQL,
    SURPRISAL_SQL,
    decontaminate_frame,
    gram_hashes,
    text_gopher_rules_frame,
    text_line_dedup_frame,
    text_metrics_frame,
    text_repetition_frame,
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


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train_keep = good quality AND passes the Gopher named rules AND not
    repetitive AND fluent under the unigram LM AND not in (or overlapping)
    the eval split AND near-dup representative AND exact-dup
    representative AND has an embedding.

    Exact dedup is NOT redundant with the near-dup groups: a document too
    short to shingle (< 3 tokens) never gets a near-dup edge, so
    byte-identical short documents are both singleton `is_rep` — the hash
    representative still drops the copy. Missing metrics (a token-less
    document) fail their gates — junk never trains by omission.

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
    sh = shingle_rows_from_toks(base).localCheckpoint(eager=True)
    g = dedup_groups_from_shingles(sh, base.select("doc_id"))
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
        "group_id",
        "group_size",
        (
            F.col("keep")
            & F.coalesce("gopher_keep", F.lit(False))
            & ~F.coalesce("repetitive", F.lit(True))
            & F.coalesce(F.col("bits_per_token") <= SURPRISAL_MAX, F.lit(False))
            & F.coalesce(F.col("span_dup_ratio") <= SPAN_DUP_MAX, F.lit(False))
            & F.expr(f"doc_id % {DECONTAM_EVAL_MOD} <> 0")
            & ~F.coalesce("contaminated", F.lit(False))
            & F.col("is_rep")
            & F.coalesce("exact_rep", F.lit(False))
            & F.coalesce("has_embedding", F.lit(False))
        ).alias("train_keep"),
    )


PIPELINE_SQL = f"""
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
g AS (SELECT * FROM ({GROUPS_SQL}) gg),
ex AS (
  SELECT min(doc_id) AS doc_id, true AS exact_rep
  FROM documents GROUP BY md5(text)
),
e AS (SELECT vec_id AS doc_id, true AS has_embedding FROM embeddings)
SELECT m.doc_id, m.n_tokens, m.quality_score, srp.bits_per_token,
       ld.span_dup_ratio, g.group_id, g.group_size,
       (m.keep
        AND coalesce(gr.gopher_keep, false)
        AND NOT coalesce(rep.repetitive, true)
        AND coalesce(srp.bits_per_token <= {SURPRISAL_MAX}, false)
        AND coalesce(ld.span_dup_ratio <= {SPAN_DUP_MAX}, false)
        AND m.doc_id % {DECONTAM_EVAL_MOD} <> 0
        AND NOT coalesce(cont.contaminated, false)
        AND g.is_rep
        AND coalesce(ex.exact_rep, false)
        AND coalesce(e.has_embedding, false)) AS train_keep
FROM m
LEFT JOIN gr ON gr.doc_id = m.doc_id
LEFT JOIN rep ON rep.doc_id = m.doc_id
LEFT JOIN srp ON srp.doc_id = m.doc_id
LEFT JOIN cont ON cont.doc_id = m.doc_id
LEFT JOIN ld ON ld.doc_id = m.doc_id
JOIN g ON g.doc_id = m.doc_id
LEFT JOIN ex ON ex.doc_id = m.doc_id
LEFT JOIN e ON e.doc_id = m.doc_id
"""
