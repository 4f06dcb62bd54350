"""dedup_groups semantics: connected components over verified near-dup
pairs must be TRANSITIVE (a~b, b~c => one group even when jaccard(a,c) is
below threshold) and every document must land in exactly one group with a
deterministic min-id representative. The cross-engine (recursive-CTE
oracle) check runs in test_driver_contract / the driver gate; this test
pins the graph semantics on a hand-built world where the expected
components are known by construction.
"""

from __future__ import annotations

from crawler_spark.operators.dedup import dedup_groups


def _doc(lo: int, hi: int) -> str:
    return " ".join(f"tok{k}" for k in range(lo, hi))


def test_groups_are_transitive_with_min_id_rep(spark, tmp_path):
    # 40-token docs sliding by 8: consecutive jaccard ~0.65 (>= 0.5 edge),
    # doc0 vs doc2 ~0.41 (< 0.5, no direct edge) -> one component ONLY via
    # transitivity. doc3 shares nothing -> singleton.
    rows = [
        (0, _doc(0, 40)),
        (1, _doc(8, 48)),
        (2, _doc(16, 56)),
        (3, _doc(100, 140)),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in dedup_groups(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    # one transitive component {0,1,2} with min-id representative 0
    assert out[0]["group_id"] == out[1]["group_id"] == out[2]["group_id"] == 0
    assert out[0]["group_size"] == 3 and out[0]["is_rep"]
    assert not out[1]["is_rep"] and not out[2]["is_rep"]
    # disjoint doc is its own singleton representative
    assert out[3]["group_id"] == 3 and out[3]["group_size"] == 1 and out[3]["is_rep"]


def test_min_label_components_nonconvergence_raises(spark):
    """A component whose diameter exceeds the iteration budget must fail
    loudly — silently split components would diverge from the oracles'
    unbounded transitive closures."""
    import pytest

    from crawler_spark.operators.dedup import min_label_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    # local_max_edges=0 forces the DISTRIBUTED loop (the in-core
    # union-find path has no iteration budget to exhaust)
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain, max_iters=2, local_max_edges=0)
    # a sufficient budget resolves the same chain into one component
    labels = min_label_components(chain, max_iters=16, local_max_edges=0)
    assert {r["label"] for r in labels.collect()} == {0}


def test_local_and_distributed_components_agree(spark):
    """The in-core union-find and the distributed propagation are twins:
    identical (doc_id, label) output on a graph with chains, a clique,
    and an isolated edge."""
    import random

    from crawler_spark.operators.dedup import min_label_components

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(30)]                      # long chain
    edges += [(100 + a, 100 + b) for a in range(8) for b in range(a)]  # clique
    edges += [(500, 501)]
    edges += [(rng.randrange(200, 260), rng.randrange(200, 260)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    local = {
        (r["doc_id"], r["label"])
        for r in min_label_components(df).collect()
    }
    dist = {
        (r["doc_id"], r["label"])
        for r in min_label_components(df, max_iters=64, local_max_edges=0).collect()
    }
    assert local == dist and local


def test_dedup_incremental_gate_semantics(spark):
    """The admission gate's greedy min-id rule on a hand-crafted world:
    identical shingle sets guarantee band collisions, so verdicts are
    deterministic. Covers cross dup, min(index, smaller-batch) tie, an
    intra-batch-only pair, a novel doc, and a shingle-less (<3-token) doc."""
    from crawler_spark.operators.dedup import _bands_df, dedup_incremental_frames

    def sh_rows(spec):  # {doc_id: iterable of shingle hashes}
        return spark.createDataFrame(
            [(d, int(h)) for d, hs in spec.items() for h in hs],
            "doc_id long, h long",
        )

    index_sh = sh_rows({1: range(1, 11), 3: range(100, 111)})
    batch_sh = sh_rows(
        {
            4: range(1, 11),     # copy of index doc 1 -> dup_of 1
            8: range(1, 11),     # matches index 1 AND batch 4 -> min id = 1
            12: range(200, 211),  # pairs only with 16 -> novel (smaller id)
            16: range(200, 211),  # -> dup_of 12
            20: range(300, 306),  # unlike anything -> novel
        }
    )
    batch_docs = spark.createDataFrame(
        [(i,) for i in (4, 8, 12, 16, 20, 24)], "doc_id long"
    )  # 24 has <3 tokens (no shingles) -> trivially novel
    out = {
        r["doc_id"]: (r["is_novel"], r["dup_of"], r["jaccard"])
        for r in dedup_incremental_frames(
            batch_docs, batch_sh, _bands_df(index_sh), index_sh
        ).collect()
    }
    assert out[4] == (False, 1, 1.0)
    assert out[8] == (False, 1, 1.0)
    assert out[12] == (True, -1, 0.0)
    assert out[16] == (False, 12, 1.0)
    assert out[20] == (True, -1, 0.0)
    assert out[24] == (True, -1, 0.0)


def test_dedup_incremental_rerun_and_torn_store(spark):
    """Two integrity properties of the gate: (1) re-running a batch whose
    bands/shingles were already appended to the index (crash between append
    and admission record) yields the same verdict as the clean run — no
    self-dups, no double-counted shingles; (2) an index doc with band rows
    but no shingle rows (torn store) fails LOUDLY instead of admitting a
    true near-dup as novel."""
    import pytest

    from crawler_spark.operators.dedup import _bands_df, dedup_incremental_frames

    def sh_rows(spec):
        return spark.createDataFrame(
            [(d, int(h)) for d, hs in spec.items() for h in hs],
            "doc_id long, h long",
        )

    batch_sh = sh_rows({4: range(1, 11), 12: range(200, 211), 16: range(200, 211)})
    batch_docs = spark.createDataFrame([(4,), (12,), (16,)], "doc_id long")

    def verdicts(index_sh):
        return {
            r["doc_id"]: (r["is_novel"], r["dup_of"], r["jaccard"])
            for r in dedup_incremental_frames(
                batch_docs, batch_sh, _bands_df(index_sh), index_sh
            ).collect()
        }

    # clean run: index holds only true doc 1
    clean = verdicts(sh_rows({1: range(1, 11)}))
    assert clean == {4: (False, 1, 1.0), 12: (True, -1, 0.0), 16: (False, 12, 1.0)}

    # (1) re-run: the index ALSO contains the whole batch (4, 12, 16).
    # Verdicts must equal the clean run's — in particular doc 12, the
    # smallest of the intra-batch pair, must stay NOVEL (the index copy of
    # sibling 16 must not shadow internal's smaller-id rule), and no doc
    # may dup itself or double-count shingles (jaccard <= 1).
    rerun = verdicts(
        sh_rows({1: range(1, 11), 4: range(1, 11),
                 12: range(200, 211), 16: range(200, 211)})
    )
    assert rerun == clean

    # (2) doc 1 banded but shingle rows lost
    torn_bands = _bands_df(sh_rows({1: range(1, 11)}))
    empty_sh = spark.createDataFrame([], "doc_id long, h long")
    with pytest.raises(Exception, match="torn"):
        dedup_incremental_frames(batch_docs, batch_sh, torn_bands, empty_sh).collect()
