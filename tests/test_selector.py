"""A1 selector: reference fixture worlds (crawler/tests/{chain,many,
many-system}) re-expressed as edge lists; the grouped-UDF selector must
reproduce the known-correct outcomes (SURVEY §5)."""

from __future__ import annotations

import pandas as pd

from crawler_spark.engine.selector import enumerate_sets, select_headers

COLS = ["src", "from_node", "decl", "candidate", "cand_ok", "decl_kind"]


def _df(rows):
    return pd.DataFrame(rows, columns=COLS)


def chain_edges():
    """main.c -> a.h -> b.h: single candidates, transitive closure."""
    return _df(
        [
            ("main.c", "", "a.h", "a.h", True, "user"),
            ("main.c", "a.h", "b.h", "b.h", True, "user"),
        ]
    )


def many_edges():
    """Ambiguous decl: a/main.h contains garbage (fails), b/main.h works —
    selector must backtrack to the b choice (crawler/tests/many)."""
    return _df(
        [
            ("main.c", "", "main.h", "a/main.h", False, "user"),
            ("main.c", "", "main.h", "b/main.h", True, "user"),
            ("main.c", "", "other.h", "other.h", True, "user"),
        ]
    )


def many_system_edges():
    """System decl shadowed by a local decoy: must NOT be resolved
    (crawler/tests/many-system; compile.rs:129-132)."""
    return _df(
        [
            ("main.c", "", "stdio.h", "stdio.h", False, "system"),  # decoy
            ("main.c", "", "other.h", "other.h", True, "user"),
        ]
    )


def test_chain_single_set():
    attempts = enumerate_sets(chain_edges(), tries=10)
    assert attempts == [(["a.h", "b.h"], True)]


def test_many_backtracks_to_good_candidate():
    attempts = enumerate_sets(many_edges(), tries=10)
    # first combo includes the garbage header and fails; second succeeds
    assert len(attempts) == 2
    assert attempts[0] == (["a/main.h", "other.h"], False)
    assert attempts[1] == (["b/main.h", "other.h"], True)


def test_many_budget_exhaustion():
    attempts = enumerate_sets(many_edges(), tries=1)
    assert attempts == [(["a/main.h", "other.h"], False)]  # budget spent


def test_system_decl_never_resolved():
    attempts = enumerate_sets(many_system_edges(), tries=10)
    assert attempts == [(["other.h"], True)]  # stdio decoy excluded


def test_grouped_udf_matches_local(spark):
    edges = pd.concat(
        [
            chain_edges(),
            many_edges().assign(src="many.c"),
            many_system_edges().assign(src="sys.c"),
        ]
    )
    sdf = spark.createDataFrame(
        edges, "src string, from_node string, decl string, candidate string, cand_ok boolean, decl_kind string"
    )
    got = (
        select_headers(sdf, tries=10)
        .toPandas()
        .sort_values(["src", "attempt"])
        .reset_index(drop=True)
    )
    # winners per file
    winners = got[got["success"]].set_index("src")["headers"].to_dict()
    assert winners == {
        "main.c": "a.h|b.h",
        "many.c": "b/main.h|other.h",
        "sys.c": "other.h",
    }
    assert got.loc[got["src"] == "many.c", "attempt"].max() == 2
