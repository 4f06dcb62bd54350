"""Enforced ANN recall floors (VERDICT r3 item 4): the oracle gates prove
both engines compute the SAME approximate answer, so a recall regression
both engines share (e.g. a hyperplane-literal typo) would pass every gate.
These floors pin the measured quality so such a regression fails loudly.

Regime choice matters: NEITHER test corpus has an exact top-5 pair at
cos >= 0.5 (the 64-dim noise floor puts top neighbors at ~0.25-0.49), so a
0.5-regime assertion would be VACUOUSLY true — `ann_recall` returns 1.0 on
an empty regime. Each floor below asserts its regime is non-empty first,
and sits at the top of the measured cosine range (cos >= 0.35 at sf0.01:
25 ground-truth pairs; cos >= 0.4 at sf0.1: 19 pairs).

All numbers are DETERMINISTIC (fixed corpus, integer/bit-exact kernels), so
the floors sit just below the measured values — any drop is a real change:

  regime recall   sf0.01@0.35: ivf 0.64, bucket 0.28, multiprobe 0.48, sq8 1.0,
                  pq 0.96, ivfpq 0.64
                  sf0.1 @0.40: ivf 0.5789, bucket 0.1053, multiprobe 0.2632,
                  sq8 1.0, pq 0.8947, ivfpq 0.5789
  overall @5      ivf 0.60/0.50, bucket 0.18/0.16, multiprobe 0.46/0.33,
                  sq8 1.0/1.0, pq 0.86/0.60, ivfpq 0.60/0.40 (sf0.01/sf0.1,
                  IVF at N_PROBE=4 x IVF_ITERS=2, PQ at 8x16 codes reranking
                  20k; ivfpq's regime recall EQUALS ivf's — the PQ ranking
                  loses nothing inside the probed lists in the regime, the
                  loss is all in the coarse stage)

The band paths are honestly weak in these regimes — sign-LSH carries little
signal at cos ~0.4 in 64 dims; the floors exist to catch regressions, not
to certify absolute quality (COVERAGE.md records the analysis).
"""

from __future__ import annotations

from crawler_spark.operators.similarity import ann_recall

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def test_recall_floors_sf001(spark):
    r = ann_recall(spark, SF_SMALL, sim_floor=0.35)
    # regime must be NON-VACUOUS or the floor means nothing
    assert r["n_exact_cos>=0.35"] >= 20, r
    # regime floors (measured 0.64 / 0.28 / 0.48 / 1.0)
    assert r["recall_ivf_cos>=0.35"] >= 0.60, r
    assert r["recall_bucket_rerank_cos>=0.35"] >= 0.25, r
    assert r["recall_multiprobe_cos>=0.35"] >= 0.45, r
    assert r["recall_sq8_cos>=0.35"] == 1.0, r
    assert r["recall_pq_cos>=0.35"] >= 0.92, r  # measured 0.96
    assert r["recall_ivfpq_cos>=0.35"] >= 0.60, r  # measured 0.64 (= ivf)
    # overall recall@5 floors (measured 0.60 / 0.18 / 0.46 / 1.0 / 0.86 / 0.60)
    assert r["recall_ivf"] >= 0.55, r
    assert r["recall_bucket_rerank"] >= 0.15, r
    assert r["recall_multiprobe"] >= 0.40, r
    assert r["recall_sq8"] == 1.0, r
    assert r["recall_pq"] >= 0.80, r
    assert r["recall_ivfpq"] >= 0.55, r


def test_recall_floors_sf01(spark):
    r = ann_recall(spark, SF_BIG, sim_floor=0.4)
    assert r["n_exact_cos>=0.4"] >= 15, r
    # regime floors (measured 0.5789 / 0.1053 / 0.2632 / 1.0)
    assert r["recall_ivf_cos>=0.4"] >= 0.55, r
    assert r["recall_bucket_rerank_cos>=0.4"] >= 0.10, r
    assert r["recall_multiprobe_cos>=0.4"] >= 0.25, r
    assert r["recall_sq8_cos>=0.4"] == 1.0, r
    assert r["recall_pq_cos>=0.4"] >= 0.84, r  # measured 0.8947
    assert r["recall_ivfpq_cos>=0.4"] >= 0.55, r  # measured 0.5789 (= ivf)
    # overall recall@5 floors (measured 0.50 / 0.16 / 0.33 / 1.0 / 0.60 / 0.40)
    assert r["recall_ivf"] >= 0.45, r
    assert r["recall_bucket_rerank"] >= 0.15, r
    assert r["recall_multiprobe"] >= 0.30, r
    assert r["recall_sq8"] == 1.0, r
    assert r["recall_pq"] >= 0.55, r
    assert r["recall_ivfpq"] >= 0.35, r


def test_recall_floors_sized_width_sf01(spark):
    """The production sizing (nlist_for + SIZED_NPROBE) must BEAT the
    fixed-width default, not merely exist: at sf0.1 the sized IVF scans
    32/176 = 18% of the corpus (vs the default's 4/16 = 25%) and still
    clears the default's recall on every number — IVF 0.73/0.7368 vs
    0.50/0.5789, IVFPQ 0.60/0.7368 vs 0.40/0.5789 (regime = IVF's exactly:
    the PQ ranking still loses nothing inside the probed lists). Floors
    sit just below the deterministic measured values. (sf0.01 sized,
    recorded not asserted: IVF 0.85/0.96, IVFPQ 0.83/0.92.)"""
    from crawler_spark.operators.similarity import (
        SIZED_NPROBE,
        ann_ivf_topk,
        ann_ivfpq_topk,
        nlist_for,
    )

    nl = nlist_for(2000)  # the sf0.1 embeddings corpus
    assert nl == 176, nl
    r = ann_recall(
        spark,
        SF_BIG,
        sim_floor=0.4,
        extra={
            "ivf_sized": lambda s, d: ann_ivf_topk(
                s, d, n_centroids=nl, n_probe=SIZED_NPROBE
            ),
            "ivfpq_sized": lambda s, d: ann_ivfpq_topk(
                s, d, n_centroids=nl, n_probe=SIZED_NPROBE
            ),
        },
        only=["ivf_sized", "ivfpq_sized"],
    )
    assert r["n_exact_cos>=0.4"] >= 15, r
    assert r["recall_ivf_sized"] >= 0.70, r            # measured 0.73
    assert r["recall_ivf_sized_cos>=0.4"] >= 0.70, r   # measured 0.7368
    assert r["recall_ivfpq_sized"] >= 0.55, r          # measured 0.60
    assert r["recall_ivfpq_sized_cos>=0.4"] >= 0.70, r # measured 0.7368
    # the sized config must dominate the fixed default's measured numbers
    assert r["recall_ivf_sized"] > 0.50 and r["recall_ivfpq_sized"] > 0.40, r


def test_recall_floors_production_config_sf01(spark):
    """The full production configuration — nlist_for-sized width,
    SIZED_NPROBE probes, AND FAISS-style subsampled Lloyd training
    (train_mod=4: codebook trained on the deterministic 1/4 sample, full
    corpus assigned once). Two STRUCTURAL guards come first — they are
    what caught the round-5 seed bug (a pmod seed over the pmod sample
    collapsed the codebook to nlist/gcd lists, and recall looked GREAT
    because 32-of-44 effective lists meant a 73% corpus scan):

      1. every requested list is populated (176/176 effective), and
      2. the measured candidate fraction stays ~nprobe/nlist (<= 0.20),

    then the recall floors. The sampled codebook seeds on h32(vec_id)
    (any id structure, not just dense-contiguous), so balls-in-bins
    leaves a FEW lists unseeded by design — 167/176 measured, matching
    the 176·(1−1/176)^500 ≈ 166 expectation — hence the >= 90% guard,
    not equality. Honest quality accounting: at this corpus the 1/4
    sample is ~2.8 training vectors per list — far under the FAISS >=
    39/list guidance (at 10^9 vectors the same train_mod gives
    ~2000/list, where sampling is free quality-wise) — so sampled
    training measures IVF 0.63/0.6842-regime and IVFPQ 0.53/0.6842 vs
    full training's 0.73/0.7368: a real small-corpus cost, still above
    the fixed-width default (0.50/0.5789 and 0.40/0.5789) while scanning
    ~19% instead of 25%. The ivf_prod recall reuses the guard's coarse
    stage (ONE Lloyd training, review finding: the first version trained
    the same codebook three times); ivfpq_prod runs the full composed
    builder — that composition is what it verifies."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import (
        IVF_ITERS,
        N_QUERIES,
        SIZED_NPROBE,
        _centroid_affinity,
        _exact_rerank,
        _indexed_embeddings,
        _ivf_members_probes,
        ann_ivfpq_topk,
        nlist_for,
    )

    nl = nlist_for(2000)
    assert nl == 176, nl
    base = _indexed_embeddings(spark, SF_BIG)
    n = base.count()
    aff = _centroid_affinity(base, "vec_id", IVF_ITERS, nl, 4).localCheckpoint(
        eager=True
    )
    members, probes = _ivf_members_probes(aff, SIZED_NPROBE)
    assert members.select("list_id").distinct().count() >= int(0.9 * nl)
    cands = probes.join(members, "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cands = cands.localCheckpoint(eager=True)
    frac = cands.count() / (N_QUERIES * n)
    assert frac <= 0.21, frac  # measured 0.189 ~ nprobe/nlist

    r = ann_recall(
        spark,
        SF_BIG,
        sim_floor=0.4,
        extra={
            "ivf_prod": lambda s, d: _exact_rerank(base, cands),
            "ivfpq_prod": lambda s, d: ann_ivfpq_topk(
                s, d, n_centroids=nl, n_probe=SIZED_NPROBE, train_mod=4
            ),
        },
        only=["ivf_prod", "ivfpq_prod"],
    )
    assert r["n_exact_cos>=0.4"] >= 15, r
    assert r["recall_ivf_prod"] >= 0.60, r             # measured 0.63
    assert r["recall_ivf_prod_cos>=0.4"] >= 0.65, r    # measured 0.6842
    assert r["recall_ivfpq_prod"] >= 0.50, r           # measured 0.53
    assert r["recall_ivfpq_prod_cos>=0.4"] >= 0.65, r  # measured 0.6842
