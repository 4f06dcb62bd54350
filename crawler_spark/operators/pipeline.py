"""End-to-end training-corpus pipeline: the composition a real user runs,
built purely from this repo's own operators — quality gate (text_metrics'
`keep`), exact dedup (hash-groupBy representative), near-dup clustering
(LSH -> verified edges -> connected components, dedup_groups), and embedding
coverage — emitting one manifest row per document with the final
`train_keep` verdict.

Not a catalog slot (the driver gates at most 50 queries); the DuckDB twin
composes the same gated SQL blocks and is verified in
tests/test_ungated_oracles.py. Scale shape: every stage is one of the
already-audited plans (single tokenize scan, band equi-joins, edge-subgraph
label propagation), composed with equi-joins on doc_id — no new shuffle
pattern is introduced by the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load
from .dedup import GROUPS_SQL, dedup_exact, dedup_groups
from .text import METRICS_SQL, text_metrics


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train_keep = good quality AND near-dup representative AND exact-dup
    representative AND has an embedding. Exact dedup is NOT redundant with
    the near-dup groups: a document too short to shingle (< 3 tokens) never
    gets a near-dup edge, so byte-identical short documents are both
    singleton `is_rep` — the hash representative still drops the copy."""
    m = text_metrics(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score", "keep"
    )
    g = dedup_groups(spark, sf_dir)
    ex = dedup_exact(spark, sf_dir).select(
        F.col("rep_doc_id").alias("doc_id"), F.lit(True).alias("exact_rep")
    )
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("has_embedding")
    )
    return (
        m.join(g, "doc_id")
        .join(ex, "doc_id", "left")
        .join(emb, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            "group_id",
            "group_size",
            (
                F.col("keep")
                & F.col("is_rep")
                & F.coalesce("exact_rep", F.lit(False))
                & F.coalesce("has_embedding", F.lit(False))
            ).alias("train_keep"),
        )
    )


PIPELINE_SQL = f"""
WITH m AS ({METRICS_SQL}),
g AS (SELECT * FROM ({GROUPS_SQL}) gg),
ex AS (
  SELECT min(doc_id) AS doc_id, true AS exact_rep
  FROM documents GROUP BY md5(text)
),
e AS (SELECT vec_id AS doc_id, true AS has_embedding FROM embeddings)
SELECT m.doc_id, m.n_tokens, m.quality_score, g.group_id, g.group_size,
       (m.keep AND g.is_rep AND coalesce(ex.exact_rep, false)
        AND coalesce(e.has_embedding, false)) AS train_keep
FROM m
JOIN g ON g.doc_id = m.doc_id
LEFT JOIN ex ON ex.doc_id = m.doc_id
LEFT JOIN e ON e.doc_id = m.doc_id
"""
