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
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain, max_iters=2)
    # a sufficient budget resolves the same chain into one component
    labels = min_label_components(chain, max_iters=16)
    assert {r["label"] for r in labels.collect()} == {0}
