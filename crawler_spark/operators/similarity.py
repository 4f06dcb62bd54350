"""Similarity search over the `embeddings` table (array<float>, 64-dim):
brute-force cosine top-k as the correctness baseline, hyperplane-LSH bucket
assignment + banded candidate generation + cosine rerank as one scale path,
an IVF pipeline (coarse quantizer -> nprobe lists -> rerank) as the other,
and embedding-cosine near-dup pairs blocked by the LSH bands.
All arithmetic is JVM-side higher-order functions (zip_with
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

from .common import duck_h32 as _duck_h32
from .common import load

N_PLANES = 16
TOP_K = 5
N_QUERIES = 20


def ann_planes_for(corpus_size: int) -> int:
    """Hyperplane count sized to the corpus: expected bucket population is
    n / 2^planes, and the banded OR-amplification keeps recall as planes
    grow. 16 planes (the test/oracle default) suits <=1M vectors; beyond
    that add 8 planes per 256x growth to hold candidate counts sub-linear.
    All builders below take n_planes (multiple of N_BAND_BITS) so the
    production sizing reuses the exact same plan shape."""
    planes = N_PLANES
    n = corpus_size
    while n > 1_000_000:
        planes += 8
        n //= 256
    return planes

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


# norm precomputed ONCE per vector (index-time work at scale): every pair
# then pays one dot-product fold instead of three; sqrt(dot(x,x)) is the
# same expression as before, so cosine values are bit-identical and the
# rank order matches the oracles exactly
def _with_norm(emb: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
    return emb.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").alias(vec_alias),
        F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias(f"_n_{vec_alias}"),
    )


def _side(base: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
    """One join side drawn from the materialized index: (id, vec, norm)."""
    return base.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").alias(vec_alias),
        F.col("norm").alias(f"_n_{vec_alias}"),
    )


def _score_pairs(pairs: DataFrame, a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact cosine for each candidate pair, Arrow-batch vectorized.

    The per-pair 64-dim `_DOT` fold is a higher-order function — interpreted,
    not codegen'd — and is the rerank family's dominant cost once candidates
    reach ~10^5 (measured ~1s of the 2s ann_bucket_rerank at sf0.1). This
    kernel replaces it with 64 vectorized ops per batch: `acc += A[:,d] *
    B[:,d]` walks the dimensions LEFT-TO-RIGHT exactly like the fold, each
    step one IEEE-double multiply then add (numpy ufuncs, no FMA), so every
    pair's cosine is bit-identical to the interpreted fold and to DuckDB's
    sequential list_dot_product — the hash-exact oracle contract survives.
    A plain matmul/einsum would NOT (pairwise summation reorders the adds)."""
    joined = pairs.join(a, "vec_a").join(b, "vec_b")

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            A = np.stack(pdf["ea"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["eb"].to_numpy()).astype(np.float64)
            acc = np.zeros(n, dtype=np.float64)
            for d in range(A.shape[1]):
                acc += A[:, d] * B[:, d]
            cos = acc / (
                pdf["_n_ea"].to_numpy(dtype=np.float64)
                * pdf["_n_eb"].to_numpy(dtype=np.float64)
            )
            yield pd.DataFrame(
                {"vec_a": pdf["vec_a"], "vec_b": pdf["vec_b"], "cos": cos}
            )

    return joined.mapInPandas(kernel, schema="vec_a long, vec_b long, cos double")


# -- brute-force cosine top-k -----------------------------------------------
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = _with_norm(emb.filter(F.col("vec_id") < N_QUERIES), "query_id", "q")
    cands = _with_norm(emb, "neighbor_id", "c")
    # broadcast the (tiny) query side; candidates stream through one pass
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="q", b="c")) / (F.col("_n_q") * F.col("_n_c")),
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
# The hyperplane weights are a pure function of (plane, dim); computing the
# modular-hash per element per row re-evaluated it n_vectors x 16 x 64
# times. Precompute the 16x64 codebook ONCE in Python and inline the exact
# float64 literals into BOTH engines' expressions — repr() round-trips
# doubles, so the values are bit-identical.
def _plane_weight(p: int, d: int) -> float:
    return ((p * 131 + d) * 2654435761 % 1000003) / 1000003.0 - 0.5


_PLANE_W = [[_plane_weight(p, d) for d in range(64)] for p in range(N_PLANES)]


def _spark_plane_dot(p: int) -> str:
    w = ", ".join(f"{_plane_weight(p, d)!r}D" for d in range(64))
    return (
        f"aggregate(zip_with(embedding, array({w}), "
        f"(x, wt) -> cast(x as double) * wt), 0D, (acc, v) -> acc + v)"
    )


def _bits_expr(n_planes: int = N_PLANES) -> str:
    bits = " + ".join(
        f"(case when ({_spark_plane_dot(p)}) > 0 then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return f"cast({bits} as bigint)"


def ann_lsh_buckets(
    spark: SparkSession, sf_dir: str, n_planes: int = N_PLANES
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.expr(_bits_expr(n_planes)).alias("bucket"))


def _indexed_embeddings(
    spark: SparkSession, sf_dir: str, n_planes: int = N_PLANES
) -> DataFrame:
    """(vec_id, embedding, norm, bucket) materialized ONCE per query (eager
    localCheckpoint, the dedup_ngram_jaccard pattern): the hyperplane dots
    and the vector norms are the ANN family's most expensive expressions, and
    every downstream join side reads this checkpoint leaf instead of
    re-scanning `embeddings` and re-evaluating the folds per side. At 100 TB
    these columns are index-time artifacts written next to the vectors; here
    the checkpoint is their in-session analog. Blocks are freed by the
    ContextCleaner when the plan is dropped — no cache entry leaks."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "embedding",
        F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias("norm"),
        F.expr(_bits_expr(n_planes)).alias("bucket"),
    ).localCheckpoint(eager=True)


def _duck_plane_dot(p: int) -> str:
    w = ", ".join(repr(x) for x in _PLANE_W[p])
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(0, 64), d -> embedding[d+1]::DOUBLE * ([{w}])[d+1])), "
        f"(acc, v) -> acc + v)"
    )


def _lsh_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN ({_duck_plane_dot(p)}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"SELECT vec_id, ({bits})::bigint AS bucket FROM embeddings"


# -- banded LSH candidate pairs (OR-amplification) --------------------------
# The 16 sign bits split into 2 bands of 8; a pair is a candidate when it
# shares EITHER band's 8-bit value. At 100 TB this is the scale path: the
# band self-join is an equi-join on (band_no, band_val) — Spark
# hash-partitions it; no label/key skew, no cross join anywhere.
N_BAND_BITS = 8
N_VEC_BANDS = N_PLANES // N_BAND_BITS


def _band_pairs(
    emb_with_bucket: DataFrame, n_planes: int = N_PLANES, multiprobe: bool = False
) -> DataFrame:
    """Candidate pairs sharing a band value. multiprobe=True additionally
    probes every single-bit flip of the band value on ONE join side (the
    standard multi-probe LSH recall lever): a pair is then a candidate when
    some band's sketches differ by Hamming <= 1. Cost model: the probe side
    grows by a factor of N_BAND_BITS+1 (linear, no index change) and the
    candidate set by the neighbor-bucket populations — measured recall/cost
    points are recorded in COVERAGE.md. The gated queries keep
    multiprobe=False so the oracle SQL stays the exact-collision form."""
    n_vec_bands = n_planes // N_BAND_BITS
    stack_args = ", ".join(
        f"{j}, cast(shiftright(bucket, {j * N_BAND_BITS}) & {(1 << N_BAND_BITS) - 1} as bigint)"
        for j in range(n_vec_bands)
    )
    bands = emb_with_bucket.select(
        "vec_id", F.expr(f"stack({n_vec_bands}, {stack_args}) as (band_no, band_val)")
    )
    left = bands.select(F.col("vec_id").alias("vec_a"), "band_no", "band_val")
    if multiprobe:
        masks = [0] + [1 << b for b in range(N_BAND_BITS)]
        left = left.select(
            "vec_a",
            "band_no",
            F.explode(
                F.array(*[F.expr(f"cast(band_val ^ {m} as bigint)") for m in masks])
            ).alias("band_val"),
        )
    right = bands.select(F.col("vec_id").alias("vec_b"), "band_no", "band_val")
    return (
        left.join(right, ["band_no", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


def _duck_band_pairs_cte() -> str:
    bands = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS band_no, (bucket // {1 << (j * N_BAND_BITS)}) % {1 << N_BAND_BITS}"
        f" AS band_val FROM buckets"
        for j in range(N_VEC_BANDS)
    )
    return f"""
WITH buckets AS ({_lsh_sql()}),
bands AS ({bands}),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.vec_id < b.vec_id
)
"""


# -- end-to-end ANN: LSH bands -> candidate pairs -> cosine rerank ----------
def ann_bucket_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full scale-path ANN pipeline in one plan: hyperplane buckets,
    banded candidate generation, exact cosine rerank, top-k per query.
    Brute-force (`ann_cosine_topk`) stays as the small-Q oracle/rerank
    baseline; this is the one that survives 100 TB. Bands, norms, and both
    rerank sides all read the one materialized index (`_indexed_embeddings`)
    — one scan of `embeddings` total, not one per join side."""
    base = _indexed_embeddings(spark, sf_dir)
    pairs = _band_pairs(base.select("vec_id", "bucket"))
    a = _side(base, "vec_a", "ea")
    b = _side(base, "vec_b", "eb")
    # score each UNDIRECTED pair once: cos is symmetric, so directed edges
    # would double the scoring work (_score_pairs: the Arrow-vectorized,
    # rounding-identical replacement for the per-pair interpreted fold).
    # The checkpoint pins the scored pairs (3 narrow columns) so the
    # union's two branches read them instead of re-running the join+score.
    scored_once = _score_pairs(pairs, a, b).localCheckpoint(eager=True)
    # each side of a candidate pair plays the query once
    scored = scored_once.unionByName(
        scored_once.select(
            F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"), "cos"
        )
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("cos"), F.asc("vec_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(F.col("vec_a").alias("query_id"), "rank", F.col("vec_b").alias("neighbor_id"))
    )


_RERANK_TAIL_SQL = f""", edges AS (
  SELECT vec_a, vec_b FROM pairs
  UNION ALL SELECT vec_b AS vec_a, vec_a AS vec_b FROM pairs
), scored AS (
  SELECT e.vec_a, e.vec_b,
         {_duck_dot('ea.embedding', 'eb.embedding')}
           / (sqrt({_duck_dot('ea.embedding', 'ea.embedding')})
              * sqrt({_duck_dot('eb.embedding', 'eb.embedding')})) AS cos
  FROM edges e
  JOIN embeddings ea ON ea.vec_id = e.vec_a
  JOIN embeddings eb ON eb.vec_id = e.vec_b)
SELECT query_id, rank, neighbor_id FROM (
  SELECT vec_a AS query_id, vec_b AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cos DESC, vec_b ASC) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
"""


def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_bucket_rerank with multi-probe candidate generation: one join
    side additionally probes every single-bit flip of each band value, so a
    pair is a candidate when some band's sketches differ by Hamming <= 1.
    This is the linear-cost recall lever for sign-LSH (measured in
    COVERAGE.md: candidate recall ~2.1-2.9x the exact-collision form at
    ~3x candidates on this corpus) — the probe expansion multiplies ONE
    small (vec_id, band) side by N_BAND_BITS+1 rows before the same
    equi-join; the index, rerank, and top-k are unchanged."""
    base = _indexed_embeddings(spark, sf_dir)
    pairs = _band_pairs(base.select("vec_id", "bucket"), multiprobe=True)
    a = _side(base, "vec_a", "ea")
    b = _side(base, "vec_b", "eb")
    scored_once = _score_pairs(pairs, a, b).localCheckpoint(eager=True)
    scored = scored_once.unionByName(
        scored_once.select(
            F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"), "cos"
        )
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("cos"), F.asc("vec_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(F.col("vec_a").alias("query_id"), "rank", F.col("vec_b").alias("neighbor_id"))
    )


def _duck_multiprobe_pairs_cte() -> str:
    bands = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS band_no, (bucket // {1 << (j * N_BAND_BITS)}) % {1 << N_BAND_BITS}"
        f" AS band_val FROM buckets"
        for j in range(N_VEC_BANDS)
    )
    masks = ", ".join(str(m) for m in [0] + [1 << b for b in range(N_BAND_BITS)])
    return f"""
WITH buckets AS ({_lsh_sql()}),
bands AS ({bands}),
probe AS (
  SELECT vec_id, band_no, xor(band_val::BIGINT, m::BIGINT) AS band_val
  FROM bands CROSS JOIN (SELECT unnest([{masks}]) AS m) masks
),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM probe a JOIN bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.vec_id < b.vec_id
)
"""


ANN_MULTIPROBE_SQL = _duck_multiprobe_pairs_cte() + _RERANK_TAIL_SQL


ANN_BUCKET_RERANK_SQL = (
    _duck_band_pairs_cte()
    + f""", edges AS (
  SELECT vec_a, vec_b FROM pairs
  UNION ALL SELECT vec_b AS vec_a, vec_a AS vec_b FROM pairs
), scored AS (
  SELECT e.vec_a, e.vec_b,
         {_duck_dot('ea.embedding', 'eb.embedding')}
           / (sqrt({_duck_dot('ea.embedding', 'ea.embedding')})
              * sqrt({_duck_dot('eb.embedding', 'eb.embedding')})) AS cos
  FROM edges e
  JOIN embeddings ea ON ea.vec_id = e.vec_a
  JOIN embeddings eb ON eb.vec_id = e.vec_b)
SELECT query_id, rank, neighbor_id FROM (
  SELECT vec_a AS query_id, vec_b AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cos DESC, vec_b ASC) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
"""
)


# -- embedding-cosine near-dup pairs (LSH-band blocked) ---------------------
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs blocked by the hyperplane-LSH bands (NOT by label:
    a hot label is quadratic at scale — the band blocking bounds every
    block at the band-bucket population). Single-scan: bands and both pair
    sides read the materialized index."""
    base = _indexed_embeddings(spark, sf_dir)
    pairs = _band_pairs(base.select("vec_id", "bucket"))
    a = _side(base, "vec_a", "ea")
    b = _side(base, "vec_b", "eb")
    return (
        _score_pairs(pairs, a, b)
        .filter(F.col("cos") >= 0.3)
        .select("vec_a", "vec_b")
    )


EMB_COSINE_SQL = (
    _duck_band_pairs_cte()
    + f"""
SELECT p.vec_a, p.vec_b
FROM pairs p
JOIN embeddings a ON a.vec_id = p.vec_a
JOIN embeddings b ON b.vec_id = p.vec_b
WHERE {_duck_dot('a.embedding', 'b.embedding')}
      / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
         * sqrt({_duck_dot('b.embedding', 'b.embedding')})) >= 0.3
"""
)


# -- IVF: coarse quantizer -> probe lists -> rerank -------------------------
# TRAINED centroids: one deterministic Lloyd iteration from the
# pmod(vec_id, k) seed partition — centroid = per-dimension mean of its
# members. The means accumulate in INTEGER space (floor(x * 2^20 + 0.5) as
# bigint) so the sum is order-independent: bit-identical across engines,
# partitionings, and core counts, which is what makes the trained codebook
# oracle-checkable. Scale shape: the k-means fit is one extra
# groupBy(c_id, pos) pass over the (already materialized) index; centroids
# broadcast; the probe join touches only nprobe lists per query — candidate
# count is nprobe/nlist of the corpus instead of all of it. More Lloyd
# iterations = repeat the same two groupBys; the dataflow is unchanged.
#
# N_CENTROIDS/N_PROBE are the STATIC-ORACLE defaults (the gated driver runs
# a fixed SQL string, so the gated form pins one width the way ann_ivf_topk
# pins IVF_ITERS Lloyd rounds); every builder and SQL generator below takes
# n_centroids/n_probe so the production sizing — nlist_for(corpus_size) —
# runs the identical plan at any width, and the non-default widths are
# oracle-verified in tests/test_ungated_oracles.py.
N_CENTROIDS = 16
# 4 of 16 lists probed: with the 2-round Lloyd codebook this measures
# recall@5 ~0.5-0.6 overall at the test corpora — floors asserted in
# tests/test_ann_recall.py (which also pins the SIZED-width recall).
N_PROBE = 4
IVF_ITERS = 2  # gated default Lloyd rounds (ivf_sql(n) generates any depth)
_CSCALE = 1 << 20


def nlist_for(corpus_size: int) -> int:
    """IVF list count sized to the corpus — the coarse-quantizer analog of
    `ann_planes_for` (and `dedup.lsh_params_for`): nlist ~ 4*sqrt(N), the
    published FAISS guidance, floored at N_CENTROIDS so the static-oracle
    default regime is unchanged at the test corpora. Why sqrt: the expected
    list population N/nlist then grows only as sqrt(N)/4, so with a fixed
    nprobe the per-query scan cost is nprobe*sqrt(N)/4 — SUBLINEAR — where
    any constant nlist degenerates to a constant fraction of the corpus
    (nprobe/nlist of everything). The same parameter bounds SemDeDup's
    within-cluster pair step: pairs ~ nlist * (N/nlist)^2 = N^1.5/4 instead
    of N^2/nlist, and `dedup_semantic`'s cluster_cap sub-bucketing bounds
    stragglers past that expectation. At 10^9 vectors: nlist ~ 126k lists
    of ~8k vectors, the standard billion-scale IVF shape. Honest cost
    accounting: the one-time full-corpus ASSIGNMENT is still the standard
    exact N x nlist distance pass (4*N^1.5 at this sizing — what FAISS
    pays too, BLAS-batched; accelerating it with an index over the
    centroid space composes but is out of scope), and train_mod keeps the
    n_iter Lloyd TRAINING rounds off that bill entirely."""
    import math

    return max(N_CENTROIDS, 4 * math.isqrt(max(corpus_size, 0)))


# The nprobe that pairs with an nlist_for-sized codebook (FAISS practice:
# a fixed few-dozen probes, so the scanned fraction nprobe/nlist shrinks
# as the corpus grows — 32/126k ~ 0.03% at 10^9 vectors). Measured at
# sf0.1 (nlist_for(2000)=176): IVF recall@5 0.73 overall / 0.7368 in the
# cos>=0.4 regime and IVFPQ 0.60/0.7368, BOTH above the fixed-width
# default's 0.50/0.5789 and 0.40/0.5789 while scanning 18% of the corpus
# instead of 25% — the sizing lever raises recall and cuts scan cost at
# once (floors pinned in tests/test_ann_recall.py).
SIZED_NPROBE = 32


def _centroid_means(
    base: DataFrame,
    assign: DataFrame | None,
    n_centroids: int = N_CENTROIDS,
    hash_seed: bool = False,
) -> DataFrame:
    """(c_id, ce array<double>, _n_ce): per-dimension means of each
    assignment's members, accumulated in INTEGER space (order-independent,
    so bit-identical across engines and partitionings). assign=None is the
    SEED round: c_id = pmod(vec_id, k) is a per-row expression, so it
    projects straight off the index with NO join — only real
    re-assignments (later Lloyd rounds) pay the vec_id equi-join.

    hash_seed: when the caller trains on the vec_id % m == 0 subsample,
    the raw pmod seed hits only the residues {0, m, 2m, ...} mod k —
    collapsing the codebook to k/gcd(m, k) lists (a review-caught bug:
    nlist_for widths are multiples of 4, so train_mod=4 silently trained
    1/4 of the requested lists). Seeding on pmod(h32(vec_id), k) fixes
    the CLASS, not just that instance: any correlated or sparse id space
    (arithmetic progressions, hashed ids) still seeds every list with
    high probability, where a divided-id seed would only repair dense
    contiguous ids. hash_seed=False is the byte-identical legacy
    expression (the static-oracle contract for train_mod=1)."""
    from .common import spark_h32

    if assign is None:
        seed = (
            spark_h32("cast(vec_id as string)") if hash_seed else "vec_id"
        )
        exploded = base.select(
            F.pmod(F.expr(seed), F.lit(n_centroids)).alias("c_id"),
            F.posexplode("embedding").alias("pos", "x"),
        )
    else:
        exploded = base.join(assign, "vec_id").select(
            "c_id", F.posexplode("embedding").alias("pos", "x")
        )
    sums = exploded.groupBy("c_id", "pos").agg(
        F.sum(F.expr(f"cast(floor(cast(x as double) * {_CSCALE} + 0.5d) as bigint)")).alias("s"),
        F.count("*").alias("n"),
    )
    cents = sums.groupBy("c_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", (F.col("s") / (F.col("n") * float(_CSCALE))).alias("v"))
                )
            ),
            lambda t: t["v"],
        ).alias("ce")
    )
    return cents.select(
        "c_id", "ce", F.sqrt(F.expr(_DOT.format(a="ce", b="ce"))).alias("_n_ce")
    )


def _affinity_to(base: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, c_id, c_cos) for every vector x centroid, centroids broadcast."""
    vecs = _side(base, id_col, "ve")
    return vecs.join(F.broadcast(cents)).select(
        id_col,
        "c_id",
        (F.expr(_DOT.format(a="ve", b="ce")) / (F.col("_n_ve") * F.col("_n_ce"))).alias("c_cos"),
    )


def _trained_centroids(
    base: DataFrame,
    n_iter: int = 1,
    n_centroids: int = N_CENTROIDS,
    train_mod: int = 1,
) -> DataFrame:
    """The Lloyd codebook: seed partition pmod(vec_id, k), then `n_iter`
    rounds of means; rounds after the first REASSIGN each vector to its
    nearest current centroid (cosine, ties by c_id — deterministic) before
    recomputing means. Every round is the same two groupBys over the
    materialized index + one broadcast affinity join — more iterations
    repeat the dataflow, they do not change it. The gated `ann_ivf_topk`
    trains IVF_ITERS rounds over N_CENTROIDS lists (its oracle is
    ivf_sql(IVF_ITERS), generated from the same parameters); deeper and
    WIDER (nlist_for-sized) paths are verified ungated.

    train_mod > 1 trains on the deterministic 1/train_mod subsample
    (vec_id % train_mod == 0) — the FAISS convention (train on
    ~256·nlist sampled vectors, then assign everything once): each Lloyd
    round then costs (N/train_mod)·nlist affinity dots instead of
    N·nlist, turning the n_iter training rounds from the dominant
    assignment-sized cost into a constant-sized one; only the single
    final assignment in `_centroid_affinity` touches the full corpus.
    The pmod sample is expressible in both engines, so the sampled
    codebook stays oracle-checkable."""
    tbase = (
        base
        if train_mod <= 1
        else base.filter(F.pmod("vec_id", F.lit(train_mod)) == 0)
    )
    cents = _centroid_means(tbase, None, n_centroids, hash_seed=train_mod > 1)
    for _ in range(1, n_iter):
        aff = _affinity_to(tbase, cents, "vec_id")
        w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
        assign = (
            aff.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("vec_id", "c_id")
        )
        cents = _centroid_means(tbase, assign, n_centroids)
    return cents


def _centroid_affinity(
    base: DataFrame,
    id_col: str,
    n_iter: int = 1,
    n_centroids: int = N_CENTROIDS,
    train_mod: int = 1,
) -> DataFrame:
    return _affinity_to(
        base, _trained_centroids(base, n_iter, n_centroids, train_mod), id_col
    )


def _ivf_members_probes(
    aff: DataFrame, n_probe: int = N_PROBE
) -> tuple[DataFrame, DataFrame]:
    """(members, probes) off one materialized affinity: every vector's
    nearest-centroid list, and each query's n_probe nearest lists — ONE
    definition shared by ann_ivf_topk and the composed ann_ivfpq_topk so
    the coarse stage cannot drift between them."""
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    members = (
        aff.withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select(F.col("vec_id").alias("neighbor_id"), F.col("c_id").alias("list_id"))
    )
    probes = (
        aff.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), F.col("c_id").alias("list_id"))
    )
    return members, probes


def _exact_rerank(base: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact-cosine top-K over (query_id, neighbor_id) candidate pairs —
    THE one rerank tail shared by the ivf/sq8/pq/ivfpq serving paths
    (broadcast query side, (cos desc, neighbor_id asc) window, rank <=
    TOP_K), so a tiebreak or expression change cannot diverge them."""
    q = _side(base, "query_id", "qe")
    c = _side(base, "neighbor_id", "ce")
    scored = (
        pairs.select("query_id", "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="qe", b="ce")) / (F.col("_n_qe") * F.col("_n_ce")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id")
    )


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_iter: int = IVF_ITERS,
    n_centroids: int | None = N_CENTROIDS,
    n_probe: int = N_PROBE,
    train_mod: int = 1,
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest centroid list, probe the
    n_probe nearest lists per query, exact-cosine rerank the union of those
    lists. Ties broken by c_id / neighbor_id for cross-engine determinism.
    `n_iter` Lloyd rounds train the codebook over `n_centroids` lists
    (defaults = the gated form; `ivf_sql(n_iter, n_centroids, n_probe)`
    generates the matching oracle for any configuration — production sizes
    the width with `nlist_for(corpus_size)`, which keeps the per-query scan
    sublinear; the sized width is oracle-verified ungated and its recall is
    pinned in tests/test_ann_recall.py).

    Plan hygiene: the affinity table feeds BOTH `members` and `probes`, so it
    is materialized once (lazy checkpoint would do, but eager keeps the job
    accounting simple at test scale); the rerank sides read the same
    materialized index as the affinity — one `embeddings` scan end-to-end.

    n_centroids=None sizes the width automatically: nlist_for(count of the
    materialized index — one cheap job on the checkpoint leaf). The
    explicit-int path stays the static-oracle contract."""
    base = _indexed_embeddings(spark, sf_dir)
    if n_centroids is None:
        n_centroids = nlist_for(base.count())
    aff = _centroid_affinity(
        base, "vec_id", n_iter, n_centroids, train_mod
    ).localCheckpoint(eager=True)
    members, probes = _ivf_members_probes(aff, n_probe)
    cands = probes.join(members, "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _exact_rerank(base, cands)


def _ivf_cents_ctes(
    n_iter: int, n_centroids: int = N_CENTROIDS, train_mod: int = 1
) -> str:
    """CTE chain training the codebook for `n_iter` Lloyd rounds — the SQL
    twin of `_trained_centroids`: seed assign0 = vec_id % k, per-round
    integer-scaled means, cosine re-assignment between rounds; train_mod
    restricts every training CTE to the vec_id % train_mod == 0 sample
    exactly like the Spark side."""
    tw = f" WHERE vec_id % {train_mod} = 0" if train_mod > 1 else ""
    # hash-seed when sampling so every list is seeded on ANY id space —
    # the raw vec_id seed over the sample hits only k/gcd(m, k) residues
    # (_centroid_means' hash_seed twin)
    seed = _duck_h32("vec_id::VARCHAR") if train_mod > 1 else "vec_id"
    parts = [
        f"assign0 AS (SELECT vec_id, {seed} % {n_centroids} AS c_id"
        f" FROM embeddings{tw})"
    ]
    for i in range(n_iter):
        parts.append(f"""exploded{i} AS (
  SELECT a.c_id, unnest(e.embedding) AS x,
         generate_subscripts(e.embedding, 1) AS pos
  FROM embeddings e JOIN assign{i} a ON a.vec_id = e.vec_id
),
sums{i} AS (
  SELECT c_id, pos,
         sum(floor(x::DOUBLE * {_CSCALE} + 0.5)::bigint)::bigint AS s,
         count(*)::bigint AS n
  FROM exploded{i} GROUP BY c_id, pos
),
cents{i} AS (
  SELECT c_id, list(s / (n * {float(_CSCALE)!r}) ORDER BY pos) AS ce
  FROM sums{i} GROUP BY c_id
)""")
        if i + 1 < n_iter:
            parts.append(f"""caff{i} AS (
  SELECT e.vec_id, c.c_id,
         {_duck_dot('e.embedding', 'c.ce')}
           / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
              * sqrt({_duck_dot('c.ce', 'c.ce')})) AS c_cos
  FROM embeddings e CROSS JOIN cents{i} c{tw.replace('WHERE vec_id', 'WHERE e.vec_id')}
),
assign{i + 1} AS (
  SELECT vec_id, c_id FROM (
    SELECT vec_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id ASC) AS r
    FROM caff{i}) t
  WHERE r = 1
)""")
    parts.append(f"cents AS (SELECT c_id, ce FROM cents{n_iter - 1})")
    return ",\n".join(parts)


def _ivf_probe_ctes(n_probe: int = N_PROBE) -> str:
    """aff/ranked/members/probes over the trained `cents` — the coarse
    probe block shared verbatim by ivf_sql and ivfpq_sql (one definition,
    like the Spark-side _ivf_members_probes)."""
    return f"""aff AS (
  SELECT e.vec_id, c.c_id,
         {_duck_dot('e.embedding', 'c.ce')}
           / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
              * sqrt({_duck_dot('c.ce', 'c.ce')})) AS c_cos
  FROM embeddings e CROSS JOIN cents c
),
ranked AS (
  SELECT vec_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id ASC) AS r
  FROM aff
),
members AS (SELECT vec_id AS neighbor_id, c_id AS list_id FROM ranked WHERE r = 1),
probes AS (
  SELECT vec_id AS query_id, c_id AS list_id FROM ranked
  WHERE r <= {n_probe} AND vec_id < {N_QUERIES}
)"""


def ivf_sql(
    n_iter: int = 1,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    train_mod: int = 1,
) -> str:
    return f"""
WITH {_ivf_cents_ctes(n_iter, n_centroids, train_mod)},
{_ivf_probe_ctes(n_probe)},
scored AS (
  SELECT p.query_id, m.neighbor_id,
         {_duck_dot('eq.embedding', 'en.embedding')}
           / (sqrt({_duck_dot('eq.embedding', 'eq.embedding')})
              * sqrt({_duck_dot('en.embedding', 'en.embedding')})) AS cos
  FROM probes p
  JOIN members m ON m.list_id = p.list_id AND m.neighbor_id <> p.query_id
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings en ON en.vec_id = m.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
"""


ANN_IVF_SQL = ivf_sql(IVF_ITERS)


# -- SemDeDup: semantic dedup via cluster-then-compare -----------------------
# Abbas et al. 2023 ("SemDeDup"): cluster the embedding space, compare
# pairs ONLY within a cluster, and drop one side of every epsilon-similar
# pair. The cluster bound is what makes the pairwise step tractable —
# quadratic within a cluster, never across the corpus (the paper's k is
# sized so clusters stay small; here the trained Lloyd codebook from the
# IVF family is reused verbatim). Keeper policy mirrors the repo's other
# dedup ops: a vector is a duplicate iff some LOWER-id cluster-mate sits
# within the threshold (greedy, no transitive rescue — the paper's
# variant), dup_of = the smallest such mate. The paper thresholds at
# 1-eps ~ 0.95 on real normalized embeddings; this synthetic corpus's
# near-dup regime sits at cos >= ~0.3 (see dedup_embedding_cosine and the
# ann_recall caveat), so the default keeps the measured 12%/32% dup tail
# at sf0.01/sf0.1 without degenerating.
SEMDEDUP_TAU = 0.35
# Per-cluster pair bound: a cluster with more than CLUSTER_CAP members is
# deterministically split into ceil(size / CLUSTER_CAP) sub-buckets by
# pmod(h32(vec_id), n_sub) and pairs are compared WITHIN a sub-bucket only — so
# no cluster is ever quadratic past ~CLUSTER_CAP^2/2 pairs per sub-bucket,
# whatever the codebook width or skew. This is the same accept-the-miss
# trade SemDeDup itself makes at the cluster boundary (a pair split across
# clusters is never compared); sizing nlist via nlist_for keeps the
# EXPECTED cluster at sqrt(N)/4 members so the cap only fires on skewed
# clusters. 256 ~ 2x the expected population at 10^6 vectors.
SEMDEDUP_CLUSTER_CAP = 256

# the sub-bucket hash's DuckDB twin: common.duck_h32 over the decimal
# rendering of vec_id (nonnegative, so % == pmod) — the SAME helper the
# Spark side's spark_h32 is twinned with, so the definition cannot drift
_duck_h32_vec = _duck_h32("a.vec_id::VARCHAR")


def _semdedup_pairs(assign: DataFrame, cluster_cap: int) -> DataFrame:
    """(vec_a, vec_b) candidate pairs within a cluster sub-bucket: cluster
    sizes are one tiny groupBy (nlist rows, broadcast back), n_sub =
    ceil(size / cap), sub = pmod(h32(vec_id), n_sub), self-join on
    (c_id, sub). The bucket key is a HASH of vec_id, not vec_id itself —
    raw pmod re-concentrates any cluster whose member ids are correlated
    modulo n_sub (review-caught: an id progression of step s collapses
    the split to n_sub/gcd(s, n_sub) buckets of size·gcd/n_sub members
    each — fully quadratic again when s is a multiple of n_sub, where
    every member lands in ONE bucket); the md5-derived h32 twin keeps the
    split deterministic and cross-engine exact on any id structure.
    Factored out so the pair-bound test counts exactly what the operator
    compares."""
    from .common import spark_h32

    counts = assign.groupBy("c_id").agg(F.count("*").alias("_cn"))
    sub = assign.join(F.broadcast(counts), "c_id").select(
        "vec_id",
        "c_id",
        F.pmod(
            F.expr(spark_h32("cast(vec_id as string)")),
            F.expr(f"cast((_cn + {cluster_cap - 1}) div {cluster_cap} as bigint)"),
        ).alias("_sub"),
    )
    return (
        sub.select(F.col("vec_id").alias("vec_a"), "c_id", "_sub")
        .join(sub.select(F.col("vec_id").alias("vec_b"), "c_id", "_sub"), ["c_id", "_sub"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )


def dedup_semantic(spark: SparkSession, sf_dir: str,
                   n_iter: int = IVF_ITERS, tau: float = SEMDEDUP_TAU,
                   n_centroids: int | None = N_CENTROIDS,
                   cluster_cap: int = SEMDEDUP_CLUSTER_CAP,
                   train_mod: int = 1) -> DataFrame:
    """Per-vector semantic-dup verdict: (vec_id, c_id, dup_of, is_dup).

    Dataflow: ONE embeddings scan (the materialized index), the IVF
    codebook's broadcast affinity + assignment, a within-cluster self-join
    keyed by (c_id, sub-bucket) — bounded per cluster by `cluster_cap`,
    see _semdedup_pairs — the vectorized `_score_pairs` cosine kernel
    (bit-identical to the oracle's sequential fold), and one min-aggregate
    for dup_of. The threshold compare needs no rounding: both engines
    compute the identical doubles. Production sizes the codebook with
    `nlist_for(corpus_size)` (the paper's 'k is chosen so clusters stay
    small'); `semdedup_sql` generates the oracle for any configuration.
    n_centroids=None auto-sizes via nlist_for (the ann_ivf_topk
    convention); even at the fixed default width the cluster_cap keeps the
    pair step LINEAR in N (<= N*cap/2 pairs), never quadratic."""
    base = _indexed_embeddings(spark, sf_dir)
    if n_centroids is None:
        n_centroids = nlist_for(base.count())
    aff = _centroid_affinity(base, "vec_id", n_iter, n_centroids, train_mod)
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    # Lloyd training runs once: the assignment feeds both pair sides and
    # the final verdict join
    assign = (
        aff.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "c_id")
        .localCheckpoint(eager=True)
    )
    pairs = _semdedup_pairs(assign, cluster_cap)
    scored = _score_pairs(pairs, _side(base, "vec_a", "ea"), _side(base, "vec_b", "eb"))
    dup = (
        scored.filter(F.col("cos") >= tau)
        .groupBy("vec_b")
        .agg(F.min("vec_a").alias("dup_of"))
        .select(F.col("vec_b").alias("vec_id"), "dup_of")
    )
    return assign.join(dup, "vec_id", "left").select(
        "vec_id",
        "c_id",
        "dup_of",
        F.col("dup_of").isNotNull().alias("is_dup"),
    )


def semdedup_sql(n_iter: int = IVF_ITERS, tau: float = SEMDEDUP_TAU,
                 n_centroids: int = N_CENTROIDS,
                 cluster_cap: int = SEMDEDUP_CLUSTER_CAP,
                 train_mod: int = 1) -> str:
    return f"""
WITH {_ivf_cents_ctes(n_iter, n_centroids, train_mod)},
aff AS (
  SELECT e.vec_id, c.c_id,
         {_duck_dot('e.embedding', 'c.ce')}
           / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
              * sqrt({_duck_dot('c.ce', 'c.ce')})) AS c_cos
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, c_id FROM (
    SELECT vec_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id ASC) AS r
    FROM aff) t
  WHERE r = 1
),
cnts AS (SELECT c_id, count(*)::bigint AS cn FROM assign GROUP BY c_id),
suba AS (
  SELECT a.vec_id, a.c_id,
         {_duck_h32_vec} % ((t.cn + {cluster_cap - 1}) // {cluster_cap}) AS sub
  FROM assign a JOIN cnts t USING (c_id)
),
prs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM suba a JOIN suba b
    ON a.c_id = b.c_id AND a.sub = b.sub AND a.vec_id < b.vec_id
),
sc AS (
  SELECT vec_a, vec_b,
         {_duck_dot('ea.embedding', 'eb.embedding')}
           / (sqrt({_duck_dot('ea.embedding', 'ea.embedding')})
              * sqrt({_duck_dot('eb.embedding', 'eb.embedding')})) AS cos
  FROM prs
  JOIN embeddings ea ON ea.vec_id = vec_a
  JOIN embeddings eb ON eb.vec_id = vec_b
),
dup AS (
  SELECT vec_b AS vec_id, min(vec_a)::bigint AS dup_of
  FROM sc WHERE cos >= {tau} GROUP BY vec_b
)
SELECT a.vec_id::bigint AS vec_id, a.c_id::bigint AS c_id, d.dup_of,
       d.dup_of IS NOT NULL AS is_dup
FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id
"""


SEMDEDUP_SQL = semdedup_sql()


# -- SQ8: int8 scalar-quantized scan + full-precision rerank -----------------
#
# The memory/IO lever at 100 TB: a 64-dim float32 corpus scanned through an
# int8 codebook is 4x less bytes off storage and per candidate-scan cache
# line; the full-precision vectors are touched only for the shortlist. Two
# stages: (1) quantized cosine over int8 codes picks SQ8_SHORTLIST_MULT*k
# candidates per query, (2) exact float cosine reranks the shortlist. Both
# stages are deterministic across engines: the per-vector symmetric scale is
# max(|x|)/127 (max is order-independent), codes are round-half-up ints, the
# quantized dot is an exact small-integer sum (<= 64 * 127^2 << 2^53 — exact
# in float64 regardless of summation order), so qcos is bit-identical.
SQ8_SHORTLIST_MULT = 3

_SQ8_MX = "aggregate(embedding, 0D, (acc, x) -> greatest(acc, abs(cast(x as double))))"
_SQ8_CODES = (
    "transform(embedding, x -> cast(floor(cast(x as double) * 127.0D"
    " / greatest(mx, 1e-30D) + 0.5D) as int))"
)


def _sq8_index(base: DataFrame) -> DataFrame:
    """(vec_id, embedding, norm, q8, qn) materialized once — at 100 TB the
    int8 codes live next to the vectors as an index-time artifact; the
    checkpoint is their in-session analog (same pattern as
    `_indexed_embeddings`, which this derives from: one `embeddings` scan)."""
    withmx = base.select("vec_id", "embedding", "norm", F.expr(_SQ8_MX).alias("mx"))
    qz = withmx.select(
        "vec_id", "embedding", "norm", F.expr(_SQ8_CODES).alias("q8")
    )
    return qz.withColumn(
        "qn",
        F.greatest(
            F.sqrt(F.expr(_DOT.format(a="q8", b="q8"))), F.lit(1e-30)
        ),
    ).localCheckpoint(eager=True)


def _sq8_stage1(qz: DataFrame, q_ids, q_mat, q_qn) -> DataFrame:
    """Quantized candidate scan with a per-batch per-query top-m cut.

    Each Arrow batch computes one int64 GEMM (queries x batch codes) and
    emits only its LOCAL top-(SQ8_SHORTLIST_MULT*TOP_K) candidates per
    query under the exact shortlist order (qcos desc, neighbor_id asc) —
    so the global row_number window merges at most n_batches x Q x 3k rows
    instead of Q x N. The cut is lossless: the order is TOTAL (neighbor
    ids are unique), so every member of the global top-m is necessarily
    within its own batch's top-m — top-m of per-batch top-m's is the
    global top-m, bit-identical to the unbounded scan and to the DuckDB
    oracle's full window. At 100 TB this is the difference between each
    query's whole candidate stream serializing through one window task
    and a bounded merge."""
    import numpy as np

    m = SQ8_SHORTLIST_MULT * TOP_K

    def _score(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            codes = np.stack(pdf["q8"].to_numpy()).astype(np.int64)
            dots = q_mat @ codes.T  # (Q, n) exact int64
            qcos = dots.astype(np.float64) / (
                q_qn[:, None] * pdf["qn"].to_numpy(dtype=np.float64)[None, :]
            )
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # self-pairs sink below every real candidate so the cut never
            # selects them; filtered out after the take
            qcos[q_ids[:, None] == c_ids[None, :]] = -np.inf
            k = min(m, n)
            # per-row order: qcos desc, neighbor_id asc (last lexsort key
            # is primary) — the shortlist window's exact composite order
            order = np.lexsort(
                (np.broadcast_to(c_ids, qcos.shape), -qcos), axis=-1
            )[:, :k]
            qc = np.take_along_axis(qcos, order, axis=1).ravel()
            real = np.isfinite(qc)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, k)[real],
                    "neighbor_id": c_ids[order.ravel()][real],
                    "qcos": qc[real],
                }
            )

    return qz.select("vec_id", "q8", "qn").mapInPandas(
        _score, schema="query_id long, neighbor_id long, qcos double"
    )


def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN: int8 codes score all candidates (4x less data
    than the float scan), exact cosine reranks the 3k-per-query shortlist.
    The quantized stage reads only (vec_id, q8, qn); the rerank re-joins the
    checkpointed index for the float vectors — narrow shortlist edges move
    between the stages, never raw vectors.

    The quantized scan is one int64 GEMM per Arrow batch (queries x batch
    codes), the production shape for a scan-based quantized stage: the
    query block is tiny (N_QUERIES x 64 int8) and closes over the kernel —
    no join, no per-pair fold. Bit-exactness vs the DuckDB twin holds
    because every |dot| <= 127*127*64 ~ 1e6 partial sum is an exact small
    integer in both int64 and the oracle's float64 fold, and the division
    multiplies the two norms before dividing in both engines. (At sf0.1
    this shaves ~10% off the query — the eager index checkpoints dominate
    there — but the GEMM's advantage over the interpreted fold grows
    linearly with corpus x query count, which is the regime the quantized
    scan exists for.)"""
    import numpy as np

    base = _indexed_embeddings(spark, sf_dir)
    qz = _sq8_index(base)
    qrows = (
        qz.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "q8", "qn")
        .collect()  # N_QUERIES rows off the checkpoint leaf — not the corpus
    )
    if not qrows:
        # degenerate corpus with no query vectors: empty result, same
        # schema (the old join formulation yielded this implicitly)
        return qz.select(
            F.col("vec_id").alias("query_id"),
            F.lit(1).alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        ).limit(0)
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["q8"] for r in qrows], dtype=np.int64)
    q_qn = np.array([r["qn"] for r in qrows], dtype=np.float64)
    stage1 = _sq8_stage1(qz, q_ids, q_mat, q_qn)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    shortlist = (
        stage1.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= SQ8_SHORTLIST_MULT * TOP_K)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(base, shortlist)


def _duck_idot(a: str, b: str) -> str:
    return (
        f"list_dot_product(list_transform({a}, x -> x::DOUBLE),"
        f" list_transform({b}, x -> x::DOUBLE))"
    )


ANN_SQ8_SQL = f"""
WITH mx AS (
  SELECT vec_id, embedding,
         list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(embedding, x -> abs(x::DOUBLE))),
           (acc, v) -> greatest(acc, v)) AS mx
  FROM embeddings
),
qz AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
           x -> floor(x::DOUBLE * 127.0 / greatest(mx, 1e-30) + 0.5)::int) AS q8
  FROM mx
),
qn AS (
  SELECT vec_id, q8,
         greatest(sqrt({_duck_idot('q8', 'q8')}), 1e-30) AS qn
  FROM qz
),
stage1 AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_duck_idot('q.q8', 'c.q8')} / (q.qn * c.qn) AS qcos
  FROM qn q JOIN qn c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS r1
    FROM stage1) t
  WHERE r1 <= {SQ8_SHORTLIST_MULT * TOP_K}
),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         {_duck_dot('a.embedding', 'b.embedding')}
           / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
              * sqrt({_duck_dot('b.embedding', 'b.embedding')})) AS cos
  FROM short s
  JOIN embeddings a ON a.vec_id = s.query_id
  JOIN embeddings b ON b.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
"""


# -- PQ: product quantization, ADC scan + full-precision rerank --------------
#
# The billion-scale ANN compression lever (FAISS's PQ stage): split the
# 64-dim vector into PQ_M = 8 subspaces of 8 dims, Lloyd-train PQ_K = 16
# codewords per subspace, and store each vector as 8 code ids — 8 bytes of
# index against 256 bytes of float32 (4 bits/code in a packed production
# layout; int codes here keep the oracle readable). The scan is
# asymmetric-distance (ADC): per query, a (PQ_M x PQ_K) lookup table of
# query-subvector x codeword dots is built ONCE, and every candidate costs
# PQ_M table adds — no float vector is touched until the exact rerank of
# the per-query shortlist. Composes with the IVF coarse stage conceptually
# (FAISS IVFPQ); here the scan is exhaustive so recall loss is isolated to
# the quantizer itself.
#
# Cross-engine exactness: codeword components are integer-scaled Lloyd
# means (the IVF trick — order-independent sums, exact rationals in
# float64); subspace assignment maximizes dot(sub, cw) - 0.5*dot(cw, cw)
# (exact L2 argmin, constants dropped) with both dots sequential folds
# identical across engines, ties to the lower code id; and the ADC score
# is a sum of INTEGER-quantized LUT entries (floor(lut * 2^20 + 0.5) —
# both engines floor identical doubles), so the per-candidate sum is an
# exact int64 in ANY summation order. The approximate cosine divides by
# sqrt of the integer-quantized reconstruction norm — again identical
# doubles — and ties break on neighbor_id.

PQ_M = 8                      # subspaces
PQ_SUBDIM = 64 // PQ_M        # dims per subspace
PQ_K = 16                     # codewords per subspace
PQ_ITERS = 2                  # Lloyd rounds (matches IVF_ITERS' depth)
# PQ-specific rerank budget: the 32x-compressed codes rank coarsely, and
# the ADC scan is cheap precisely so the exact rerank can afford a deeper
# shortlist (production PQ reranks hundreds per query; SQ8's 3k suffices
# because int8 barely loses rank order). 20k = 100 candidates here.
PQ_SHORTLIST_MULT = 20
_PQ_LUT_SCALE = 1 << 20


def _pq_subvecs(base: DataFrame) -> DataFrame:
    """(vec_id, m, sub array<float-ish>) — one row per subspace."""
    return base.select(
        "vec_id",
        F.expr(
            f"inline(transform(sequence(0, {PQ_M - 1}), "
            f"m -> struct(m as m, slice(embedding, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}) as sub)))"
        ),
    )


def _pq_codeword_means(base: DataFrame, assign: DataFrame | None) -> DataFrame:
    """(m, c_id, cw array<double>, cn2, cn2i): per-(subspace, code) Lloyd
    means in integer space (bit-identical across engines/partitionings);
    cn2 = dot(cw, cw) (sequential fold), cn2i its 2^20 integer quantization
    (what makes the reconstruction norm an order-independent int64 sum).
    assign=None is the seed round: c_id = pmod(vec_id, PQ_K) per-row."""
    exploded = base.select("vec_id", F.posexplode("embedding").alias("pos", "x")).select(
        "vec_id",
        (F.col("pos") / PQ_SUBDIM).cast("int").alias("m"),
        F.pmod("pos", F.lit(PQ_SUBDIM)).alias("d"),
        "x",
    )
    if assign is None:
        keyed = exploded.select(
            "m", "d", "x", F.pmod("vec_id", F.lit(PQ_K)).alias("c_id")
        )
    else:
        keyed = exploded.join(assign, ["vec_id", "m"]).select("m", "d", "x", "c_id")
    sums = keyed.groupBy("m", "c_id", "d").agg(
        F.sum(
            F.expr(f"cast(floor(cast(x as double) * {_CSCALE} + 0.5d) as bigint)")
        ).alias("s"),
        F.count("*").alias("n"),
    )
    cents = sums.groupBy("m", "c_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("d", (F.col("s") / (F.col("n") * float(_CSCALE))).alias("v"))
                )
            ),
            lambda t: t["v"],
        ).alias("cw")
    )
    return cents.select(
        "m",
        "c_id",
        "cw",
        F.expr(_DOT.format(a="cw", b="cw")).alias("cn2"),
    ).withColumn(
        "cn2i",
        F.expr(f"cast(floor(cn2 * {_PQ_LUT_SCALE} + 0.5d) as bigint)"),
    )


def _pq_assign(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, c_id): nearest codeword per subspace — exact L2 argmin
    via max of dot(sub, cw) - cn2/2 (||sub||^2 is constant per (vec, m)),
    an AGGREGATE max-struct with ties to the lower code id."""
    scored = subs.join(F.broadcast(cb), "m").select(
        "vec_id",
        "m",
        "c_id",
        (F.expr(_DOT.format(a="sub", b="cw")) - F.col("cn2") / 2).alias("sc"),
    )
    return (
        scored.groupBy("vec_id", "m")
        .agg(F.max(F.struct(F.col("sc"), (-F.col("c_id")).alias("nc"))).alias("b"))
        .select("vec_id", "m", (-F.col("b.nc")).cast("int").alias("c_id"))
    )


def _pq_index(base: DataFrame, n_iter: int = PQ_ITERS) -> tuple[DataFrame, DataFrame]:
    """(codes, codebook), codes = (vec_id, code_arr array<int> ordered by m,
    pqn = sqrt(integer-quantized reconstruction norm^2)) materialized once.
    At 100 TB the code array is the index: PQ_M small ints per vector next
    to the table, scanned without ever touching the float column."""
    subs = _pq_subvecs(base).localCheckpoint(eager=True)
    cb = _pq_codeword_means(base, None)
    for _ in range(1, n_iter):
        cb = _pq_codeword_means(base, _pq_assign(subs, cb))
    cb = cb.localCheckpoint(eager=True)
    assign = _pq_assign(subs, cb)
    codes = (
        assign.join(F.broadcast(cb.select("m", "c_id", "cn2i")), ["m", "c_id"])
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", F.col("c_id").alias("c")))),
                lambda t: t["c"],
            ).alias("code_arr"),
            F.sqrt(F.sum("cn2i") / float(_PQ_LUT_SCALE)).alias("pqn"),
        )
        .localCheckpoint(eager=True)
    )
    return codes, cb


def _pq_stage1(codes: DataFrame, q_ids, q_luti, q_norms) -> DataFrame:
    """ADC scan with the SQ8 per-batch per-query top-m cut: each Arrow batch
    gathers PQ_M int64 LUT entries per (query, candidate) — no float vector
    reads — and emits only its local top-(PQ_SHORTLIST_MULT*TOP_K) under
    the exact (qcos desc, neighbor_id asc) order, so the global window
    merges n_batches x Q x 100 rows instead of Q x N (the ann_sq8 lesson)."""
    import numpy as np

    m_cut = PQ_SHORTLIST_MULT * TOP_K

    def _score(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            C = np.stack(pdf["code_arr"].to_numpy()).astype(np.int64)  # (n, M)
            S = np.zeros((len(q_ids), n), dtype=np.int64)
            for m in range(PQ_M):
                S += q_luti[:, m, C[:, m]]  # exact int64 adds, any order
            qcos = S.astype(np.float64) / (
                float(_PQ_LUT_SCALE)
                * q_norms[:, None]
                * pdf["pqn"].to_numpy(dtype=np.float64)[None, :]
            )
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            qcos[q_ids[:, None] == c_ids[None, :]] = -np.inf
            k = min(m_cut, n)
            order = np.lexsort(
                (np.broadcast_to(c_ids, qcos.shape), -qcos), axis=-1
            )[:, :k]
            qc = np.take_along_axis(qcos, order, axis=1).ravel()
            real = np.isfinite(qc)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, k)[real],
                    "neighbor_id": c_ids[order.ravel()][real],
                    "qcos": qc[real],
                }
            )

    return codes.select("vec_id", "code_arr", "pqn").mapInPandas(
        _score, schema="query_id long, neighbor_id long, qcos double"
    )


def _pq_query_luts(base: DataFrame, cb: DataFrame):
    """(q_ids, q_luti, q_norms) for the N_QUERIES query vectors: the
    per-query (PQ_M x PQ_K) integer LUT of query-subvector x codeword dots.
    ONE definition shared by ann_pq_topk and the stage1 plan test so the
    rounding-contract-critical pieces — the LEFT-TO-RIGHT per-dim fold
    (same order as _DOT / list_dot_product, the _score_pairs contract) and
    the floor(lut * 2^20 + 0.5) integer grid — cannot drift between the
    production path and what the test measures. Empty q_ids = degenerate
    corpus with no query vectors."""
    import numpy as np

    cw = np.zeros((PQ_M, PQ_K, PQ_SUBDIM), dtype=np.float64)
    for r in cb.select("m", "c_id", "cw").collect():  # PQ_M*PQ_K tiny rows
        cw[r["m"], r["c_id"]] = r["cw"]
    qrows = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding", "norm")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norms = np.array([r["norm"] for r in qrows], dtype=np.float64)
    qs = q_mat.reshape(len(q_ids), PQ_M, PQ_SUBDIM)
    lut = np.zeros((len(q_ids), PQ_M, PQ_K), dtype=np.float64)
    for d in range(PQ_SUBDIM):
        lut += qs[:, :, None, d] * cw[None, :, :, d]
    q_luti = np.floor(lut * _PQ_LUT_SCALE + 0.5).astype(np.int64)
    return q_ids, q_luti, q_norms


def ann_pq_topk(spark: SparkSession, sf_dir: str, n_iter: int = PQ_ITERS) -> DataFrame:
    """Product-quantized ANN: train the per-subspace codebooks, encode the
    corpus to PQ_M code ids + a quantized reconstruction norm, ADC-scan the
    codes with per-query integer LUTs, exact-cosine rerank the shortlist.
    The scan stage reads ONLY (vec_id, code_arr, pqn); the float vectors
    are touched for N_QUERIES LUT builds and the 100-per-query rerank."""
    base = _indexed_embeddings(spark, sf_dir)
    codes, cb = _pq_index(base, n_iter)
    q_ids, q_luti, q_norms = _pq_query_luts(base, cb)
    if not len(q_ids):
        return codes.select(
            F.col("vec_id").alias("query_id"),
            F.lit(1).alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        ).limit(0)
    stage1 = _pq_stage1(codes, q_ids, q_luti, q_norms)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    shortlist = (
        stage1.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= PQ_SHORTLIST_MULT * TOP_K)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(base, shortlist)


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str,
                   n_iter: int = IVF_ITERS,
                   n_centroids: int | None = N_CENTROIDS,
                   n_probe: int = N_PROBE,
                   train_mod: int = 1) -> DataFrame:
    """IVF + PQ composed — the full FAISS IVFPQ architecture from the two
    already-verified stages: the IVF coarse quantizer restricts candidates
    to the n_probe nearest lists per query (nprobe/nlist of the corpus,
    never all of it), the PQ codes ADC-score ONLY those candidates, and
    the exact rerank touches the shortlist. At 100 TB this is the
    standard billion-vector serving shape: with nlist sized by
    `nlist_for` the scan cost is nprobe x (N/nlist) x 8 LUT adds per
    query — sublinear in N — over an 8-byte-per-vector index
    (`ivfpq_sql(n_iter, n_centroids, n_probe)` generates the oracle for
    any configuration; the sized width's recall is pinned in
    tests/test_ann_recall.py).

    Unlike the exhaustive ann_pq_topk (whose GEMM-style kernel scans every
    code), the candidate set here is per-query, so the ADC is the JVM-side
    shape: posexplode the 8 codes, equi-join the broadcast (query, m,
    code) integer LUT [N_QUERIES x PQ_M x PQ_K rows], and sum — an exact
    order-independent int64, zero Python in the scoring path. Ties break
    on neighbor_id; determinism matches the DuckDB twin clause for
    clause."""
    base = _indexed_embeddings(spark, sf_dir)
    if n_centroids is None:  # auto-size, the ann_ivf_topk convention
        n_centroids = nlist_for(base.count())
    # IVF coarse stage — the SHARED _ivf_members_probes, so the coarse
    # assignment cannot drift from ann_ivf_topk's
    aff = _centroid_affinity(
        base, "vec_id", n_iter, n_centroids, train_mod
    ).localCheckpoint(eager=True)
    members, probes = _ivf_members_probes(aff, n_probe)
    # PQ codes + per-query integer LUTs
    codes, cb = _pq_index(base)
    q_ids, q_luti, q_norms = _pq_query_luts(base, cb)
    if not len(q_ids):
        return codes.select(
            F.col("vec_id").alias("query_id"),
            F.lit(1).alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        ).limit(0)
    lut_rows = [
        (int(q_ids[qi]), m, c, int(q_luti[qi, m, c]), float(q_norms[qi]))
        for qi in range(len(q_ids))
        for m in range(PQ_M)
        for c in range(PQ_K)
    ]
    lut = spark.createDataFrame(
        lut_rows, "query_id long, m int, c_id int, li long, qnorm double"
    )
    cands = (
        probes.join(members, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(codes, codes["vec_id"] == F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "code_arr", "pqn")
    )
    adc = (
        cands.select(
            "query_id", "neighbor_id", "pqn",
            F.posexplode("code_arr").alias("m", "c_id"),
        )
        .join(F.broadcast(lut), ["query_id", "m", "c_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum("li").alias("si"),
            F.first("pqn").alias("pqn"),
            F.first("qnorm").alias("qnorm"),
        )
        .withColumn(
            "qcos",
            F.col("si")
            / (float(_PQ_LUT_SCALE) * F.col("qnorm") * F.col("pqn")),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    shortlist = (
        adc.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= PQ_SHORTLIST_MULT * TOP_K)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(base, shortlist)


def _pq_cb_ctes(n_iter: int) -> str:
    """CTE chain training the per-subspace codebooks for `n_iter` Lloyd
    rounds — the SQL twin of _pq_index's training loop."""
    sub = f"e.embedding[(s.m * {PQ_SUBDIM} + 1):((s.m + 1) * {PQ_SUBDIM})]"
    parts = [
        f"ms AS (SELECT range AS m FROM range(0, {PQ_M}))",
        f"passign0 AS (SELECT vec_id, m, vec_id % {PQ_K} AS c_id FROM embeddings, ms)",
        f"""eexp AS (
  SELECT vec_id,
         (generate_subscripts(embedding, 1) - 1) // {PQ_SUBDIM} AS m,
         (generate_subscripts(embedding, 1) - 1) % {PQ_SUBDIM} AS d,
         unnest(embedding) AS x
  FROM embeddings
)""",
    ]
    for i in range(n_iter):
        parts.append(f"""pexp{i} AS (
  SELECT a.m, a.c_id, ee.d, ee.x
  FROM eexp ee JOIN passign{i} a ON a.vec_id = ee.vec_id AND a.m = ee.m
),
psums{i} AS (
  SELECT m, c_id, d,
         sum(floor(x::DOUBLE * {_CSCALE} + 0.5)::bigint)::bigint AS s,
         count(*)::bigint AS n
  FROM pexp{i} GROUP BY m, c_id, d
),
pcb{i} AS (
  SELECT m, c_id, list(s / (n * {float(_CSCALE)!r}) ORDER BY d) AS cw
  FROM psums{i} GROUP BY m, c_id
)""")
        if i + 1 < n_iter:
            parts.append(f"""pscore{i} AS (
  SELECT e.vec_id, s.m, s.c_id,
         {_duck_dot(sub, 's.cw')} - {_duck_dot('s.cw', 's.cw')} / 2 AS sc
  FROM embeddings e CROSS JOIN pcb{i} s
),
passign{i + 1} AS (
  SELECT vec_id, m, c_id FROM (
    SELECT vec_id, m, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, c_id ASC) AS r
    FROM pscore{i}) t
  WHERE r = 1
)""")
    parts.append(
        f"""pcb AS (
  SELECT m, c_id, cw,
         {_duck_dot('cw', 'cw')} AS cn2,
         floor({_duck_dot('cw', 'cw')} * {_PQ_LUT_SCALE} + 0.5)::bigint AS cn2i
  FROM pcb{n_iter - 1}
)"""
    )
    return ",\n".join(parts)


def _pq_serve_ctes() -> str:
    """fassign/pqn/qn/luti — the PQ serving blocks (encode + norms + query
    LUTs) shared verbatim by pq_sql and ivfpq_sql."""
    sub = f"e.embedding[(s.m * {PQ_SUBDIM} + 1):((s.m + 1) * {PQ_SUBDIM})]"
    qsub = f"eq.embedding[(s.m * {PQ_SUBDIM} + 1):((s.m + 1) * {PQ_SUBDIM})]"
    return f"""fscore AS (
  SELECT e.vec_id, s.m, s.c_id,
         {_duck_dot(sub, 's.cw')} - s.cn2 / 2 AS sc
  FROM embeddings e CROSS JOIN pcb s
),
fassign AS (
  SELECT vec_id, m, c_id FROM (
    SELECT vec_id, m, c_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, c_id ASC) AS r
    FROM fscore) t
  WHERE r = 1
),
pqn AS (
  SELECT a.vec_id, sqrt(sum(b.cn2i)::DOUBLE / {_PQ_LUT_SCALE}) AS pqn
  FROM fassign a JOIN pcb b ON b.m = a.m AND b.c_id = a.c_id
  GROUP BY a.vec_id
),
qn AS (
  SELECT vec_id, sqrt({_duck_dot('embedding', 'embedding')}) AS qnorm
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
luti AS (
  SELECT eq.vec_id AS query_id, s.m, s.c_id,
         floor({_duck_dot(qsub, 's.cw')} * {_PQ_LUT_SCALE} + 0.5)::bigint AS li
  FROM embeddings eq CROSS JOIN pcb s
  WHERE eq.vec_id < {N_QUERIES}
)"""


def _pq_rerank_tail() -> str:
    """stage1 -> shortlist cut -> exact rerank -> final top-K, shared
    verbatim by pq_sql and ivfpq_sql (the twin of _exact_rerank +
    shortlist window on the Spark side)."""
    return f"""stage1 AS (
  SELECT adc.query_id, adc.neighbor_id,
         adc.si::DOUBLE / ({_PQ_LUT_SCALE} * q.qnorm * p.pqn) AS qcos
  FROM adc
  JOIN qn q ON q.vec_id = adc.query_id
  JOIN pqn p ON p.vec_id = adc.neighbor_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS r1
    FROM stage1) t
  WHERE r1 <= {PQ_SHORTLIST_MULT * TOP_K}
),
scored AS (
  SELECT s.query_id, s.neighbor_id,
         {_duck_dot('a.embedding', 'b.embedding')}
           / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
              * sqrt({_duck_dot('b.embedding', 'b.embedding')})) AS cos
  FROM short s
  JOIN embeddings a ON a.vec_id = s.query_id
  JOIN embeddings b ON b.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
"""


def pq_sql(n_iter: int = PQ_ITERS) -> str:
    return f"""
WITH {_pq_cb_ctes(n_iter)},
{_pq_serve_ctes()},
adc AS (
  SELECT l.query_id, a.vec_id AS neighbor_id, sum(l.li)::bigint AS si
  FROM fassign a JOIN luti l ON l.m = a.m AND l.c_id = a.c_id
  WHERE a.vec_id <> l.query_id
  GROUP BY l.query_id, a.vec_id
),
{_pq_rerank_tail()}"""


ANN_PQ_SQL = pq_sql(PQ_ITERS)


def ivfpq_sql(n_iter: int = IVF_ITERS, n_centroids: int = N_CENTROIDS,
              n_probe: int = N_PROBE, train_mod: int = 1) -> str:
    """IVFPQ twin: composed from the SAME shared blocks as its parents —
    _ivf_cents_ctes + _ivf_probe_ctes (the coarse stage, verbatim
    ivf_sql's), _pq_cb_ctes + _pq_serve_ctes + _pq_rerank_tail (the PQ
    stage, verbatim pq_sql's; disjoint CTE names) — with only the `cand`
    restriction and the candidate-limited `adc` of its own, so a fix to
    either parent's math flows here by construction."""
    return f"""
WITH {_ivf_cents_ctes(n_iter, n_centroids, train_mod)},
{_pq_cb_ctes(PQ_ITERS)},
{_ivf_probe_ctes(n_probe)},
{_pq_serve_ctes()},
cand AS (
  SELECT p.query_id, m.neighbor_id
  FROM probes p JOIN members m
    ON m.list_id = p.list_id AND m.neighbor_id <> p.query_id
),
adc AS (
  SELECT c.query_id, c.neighbor_id, sum(l.li)::bigint AS si
  FROM cand c
  JOIN fassign a ON a.vec_id = c.neighbor_id
  JOIN luti l ON l.query_id = c.query_id AND l.m = a.m AND l.c_id = a.c_id
  GROUP BY c.query_id, c.neighbor_id
),
{_pq_rerank_tail()}"""


ANN_IVFPQ_SQL = ivfpq_sql(IVF_ITERS)


# -- ANN recall audit (not a gated query: a measurement) ---------------------
def ann_recall(
    spark: SparkSession,
    sf_dir: str,
    sim_floor: float = 0.5,
    extra: dict | None = None,
    only: list[str] | None = None,
) -> dict:
    """Recall@k of the two approximate paths vs the exact brute-force top-k
    over the same N_QUERIES query vectors (the quality number an ANN index
    is tuned by; the oracle gates prove both engines compute the SAME
    approximate answer, this measures how approximate it is).

    Reported twice: over ALL exact top-k pairs, and restricted to pairs with
    cosine >= sim_floor — the near-dup regime the pipeline actually acts on.
    On a corpus where most 'nearest' neighbors sit barely above the random
    noise floor (cos ~0.2 at 64 dims), no sublinear index can recall them —
    sign-LSH band collisions and IVF list assignments carry no signal there
    by construction — so the high-similarity recall is the meaningful
    number. CAVEAT: an EMPTY regime reads as 1.0 — callers asserting a
    floor must check the n_exact_cos>= count first (tests/test_ann_recall.py
    does; both test corpora are empty above cos 0.5). Recorded per corpus
    in COVERAGE.md alongside lsh_recall."""
    emb = load(spark, sf_dir, "embeddings")
    queries = _with_norm(emb.filter(F.col("vec_id") < N_QUERIES), "query_id", "q")
    cands = _with_norm(emb, "neighbor_id", "c")
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(_DOT.format(a="q", b="c")) / (F.col("_n_q") * F.col("_n_c")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos")
        .localCheckpoint(eager=True)
    )
    exact_hi = exact.filter(F.col("cos") >= sim_floor).localCheckpoint(eager=True)
    total, total_hi = exact.count(), exact_hi.count()
    out = {"n_exact": total, f"n_exact_cos>={sim_floor}": total_hi}
    paths = {
        "ivf": ann_ivf_topk,
        "bucket_rerank": ann_bucket_rerank,
        "multiprobe": ann_multiprobe_topk,
        "sq8": ann_sq8_topk,
        "pq": ann_pq_topk,
        "ivfpq": ann_ivfpq_topk,
    }
    # `extra` adds named non-default configurations (e.g. the
    # nlist_for-sized IVF width); `only` restricts the measured set so a
    # targeted floor doesn't pay for every path.
    paths.update(extra or {})
    for name, fn in paths.items():
        if only is not None and name not in only:
            continue
        approx = fn(spark, sf_dir).filter(F.col("query_id") < N_QUERIES)
        approx = approx.localCheckpoint(eager=True)
        hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        hit_hi = exact_hi.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        out[f"recall_{name}"] = round(hit / total, 4) if total else 1.0
        out[f"recall_{name}_cos>={sim_floor}"] = (
            round(hit_hi / total_hi, 4) if total_hi else 1.0
        )
    # candidate recall/cost of the band stage itself, with and without
    # multi-probe (exact cosine rerank cannot demote a true top-k neighbor
    # below rank k, so candidate recall ~ end recall; candidates are what
    # the rerank pays for)
    if only is not None and "band" not in only:
        return out
    base = _indexed_embeddings(spark, sf_dir)
    exact_pairs = exact.select(
        F.least("query_id", "neighbor_id").alias("vec_a"),
        F.greatest("query_id", "neighbor_id").alias("vec_b"),
    ).distinct().localCheckpoint(eager=True)
    n_pairs = exact_pairs.count()
    for name, mp in (("band", False), ("band_multiprobe", True)):
        cands = _band_pairs(base.select("vec_id", "bucket"), multiprobe=mp)
        cands = cands.localCheckpoint(eager=True)
        caught = exact_pairs.join(cands, ["vec_a", "vec_b"], "left_semi").count()
        out[f"cand_recall_{name}"] = round(caught / n_pairs, 4) if n_pairs else 1.0
        out[f"n_cands_{name}"] = cands.count()
    return out


# ann_lsh_buckets is not a standalone gated entry (the driver checks at most
# 50): its bucket math is verified through ann_bucket_rerank, whose oracle
# recomputes the same plane-literal buckets in DuckDB — any bucket mismatch
# changes the candidate pair set and fails the rerank value-hash.
QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_TOPK_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_SQL),
    "ann_bucket_rerank": (ann_bucket_rerank, ANN_BUCKET_RERANK_SQL),
    "ann_sq8_topk": (ann_sq8_topk, ANN_SQ8_SQL),
    # gated in round 5 (rotated in for retired f5/g1/si_remarks/si_info):
    # the PQ compression lever and the composed IVFPQ serving architecture
    # are the highest-value ANN shapes — the driver's rows+schema+hash
    # check at sf0.01 is the strongest gate in the harness
    "ann_pq_topk": (ann_pq_topk, ANN_PQ_SQL),
    "ann_ivfpq_topk": (ann_ivfpq_topk, ANN_IVFPQ_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, EMB_COSINE_SQL),
}
