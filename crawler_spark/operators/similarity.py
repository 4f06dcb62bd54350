"""Similarity search over the `embeddings` table (array<float>, 64-dim):
brute-force cosine top-k as the correctness baseline, hyperplane-LSH bucket
assignment as the scale path, and embedding-cosine near-dup pairs with
label blocking. All arithmetic is JVM-side higher-order functions (zip_with
+ aggregate fold — sequential, so bit-comparable with DuckDB's
list_dot_product); outputs carry ids/ranks, not raw floats, to make the
value-hash robust.

Scale notes: brute-force is O(Q×N) and only for small Q (the oracle path);
the LSH variant buckets every vector with 16 hyperplane sign bits so
candidate generation is a groupBy/equi-join on bucket — the 100 TB design
is bucket-join + rerank, not the cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import load

N_PLANES = 16
TOP_K = 5
N_QUERIES = 20

# double-precision dot/norm on the float embeddings, sequential fold
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_dot_product(list_transform({a}, x -> x::DOUBLE),"
        f" list_transform({b}, x -> x::DOUBLE))"
    )


# -- brute-force cosine top-k -----------------------------------------------
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    cands = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c"))
    # broadcast the (tiny) query side; candidates stream through one pass
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="q", b="c"))
            / (
                F.sqrt(F.expr(_DOT.format(a="q", b="q")))
                * F.sqrt(F.expr(_DOT.format(a="c", b="c")))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id")
    )


ANN_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_duck_dot('q.qe', 'e.embedding')}
           / (sqrt({_duck_dot('q.qe', 'q.qe')}) * sqrt({_duck_dot('e.embedding', 'e.embedding')})) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
"""


# -- hyperplane LSH buckets -------------------------------------------------
def _spark_plane_dot(p: int) -> str:
    return (
        f"aggregate(transform(sequence(0, 63), d -> cast(embedding[d] as double) * "
        f"(((({p} * 131 + d) * 2654435761) % 1000003) / 1000003.0 - 0.5)), "
        f"0D, (acc, v) -> acc + v)"
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    bits = " + ".join(
        f"(case when ({_spark_plane_dot(p)}) > 0 then {1 << p} else 0 end)"
        for p in range(N_PLANES)
    )
    return emb.select("vec_id", F.expr(f"cast({bits} as bigint)").alias("bucket"))


def _duck_plane_dot(p: int) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(0, 64), d -> embedding[d+1]::DOUBLE * "
        f"(((({p} * 131 + d) * 2654435761) % 1000003) / 1000003.0 - 0.5))), "
        f"(acc, v) -> acc + v)"
    )


def _lsh_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN ({_duck_plane_dot(p)}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"SELECT vec_id, ({bits})::bigint AS bucket FROM embeddings"


# -- embedding-cosine near-dup pairs (label-blocked) ------------------------
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("lbl"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lbl"), F.col("embedding").alias("eb"))
    # blocking on label bounds the pair count (the LSH-bucket analog)
    return (
        a.join(b, "lbl")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="ea", b="eb"))
            / (
                F.sqrt(F.expr(_DOT.format(a="ea", b="ea")))
                * F.sqrt(F.expr(_DOT.format(a="eb", b="eb")))
            ),
        )
        .filter(F.col("cos") >= 0.3)
        .select("vec_a", "vec_b", F.col("lbl").alias("label"))
    )


EMB_COSINE_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_duck_dot('a.embedding', 'b.embedding')}
      / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
         * sqrt({_duck_dot('b.embedding', 'b.embedding')})) >= 0.3
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_TOPK_SQL),
    "ann_lsh_buckets": (ann_lsh_buckets, _lsh_sql()),
    "dedup_embedding_cosine": (dedup_embedding_cosine, EMB_COSINE_SQL),
}
