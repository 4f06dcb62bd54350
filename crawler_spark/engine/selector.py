"""A1: the backtracking candidate selector (SURVEY §2.4) — the reference's
one non-relational operator (`crawler/src/miner/select.rs:10-258`): DFS over
a per-file dependency graph with choice points at multi-candidate
declarations, seen-set pruning, bounded by a retry budget, yielding
candidate sets in a deterministic order; the caller (compile loop,
`miner/compile.rs:56-103`) stops at the first set that succeeds.

Spark realization per SURVEY §2.11: the per-file graphs are small, so the
selector runs as a grouped pandas UDF (`groupBy(src).applyInPandas`) over
the edge list — a pure function of the (sorted) edges, hence deterministic
and parity-testable against the reference's fixture worlds (chain / many /
many-system, re-expressed in tests/test_selector.py).

Edge rows per group: (src, from_node, decl, candidate, cand_ok, decl_kind).
`from_node == ''` marks the root's own declarations; a chosen candidate
recursively contributes its declarations. `cand_ok=False` models the
garbage-header fixture (`crawler/tests/many/a/main.h:6`): a set containing
it fails, forcing backtracking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ATTEMPT_SCHEMA = (
    "src string, attempt int, headers string, n_headers int, success boolean"
)


def enumerate_sets(edges: pd.DataFrame, tries: int) -> list[tuple[list[str], bool]]:
    """Deterministic DFS enumeration of candidate sets for ONE source file.

    Returns up to `tries` (sorted_header_list, set_compiles) attempts, in
    exploration order, stopping early after the first success — the
    short-circuit of compile.rs:93-101. System-kind declarations are
    dropped before exploration (F4, compile.rs:129-132).
    """
    user = edges[edges["decl_kind"] != "system"]
    # decl -> ordered candidate list; node -> its outgoing decls
    cands: dict[str, list[tuple[str, bool]]] = {}
    for decl, grp in user.groupby("decl", sort=True):
        uniq = grp.drop_duplicates("candidate").sort_values("candidate")
        cands[decl] = list(zip(uniq["candidate"], uniq["cand_ok"].astype(bool)))
    decls_of: dict[str, list[str]] = {}
    for node, grp in user.groupby("from_node", sort=True):
        decls_of[node] = sorted(grp["decl"].unique())

    attempts: list[tuple[list[str], bool]] = []
    seen_combos: set[tuple[str, ...]] = set()

    def explore(pending: list[str], chosen: dict[str, str], ok: bool) -> Iterator[None]:
        """Resolve pending declarations depth-first; yield at completion."""
        if len(attempts) >= tries:
            return
        if not pending:
            combo = tuple(sorted(chosen.values()))
            if combo in seen_combos:  # U2 combo dedup, compile.rs:79-87
                return
            seen_combos.add(combo)
            attempts.append((list(combo), ok))
            yield
            return
        decl, rest = pending[0], pending[1:]
        if decl in chosen:  # seen-set pruning (select.rs:131-141)
            yield from explore(rest, chosen, ok)
            return
        for cand, cand_ok in cands.get(decl, []):
            chosen[decl] = cand
            extra = [d for d in decls_of.get(cand, []) if d not in chosen]
            yield from explore(extra + rest, chosen, ok and cand_ok)
            del chosen[decl]
            if len(attempts) >= tries or (attempts and attempts[-1][1]):
                return

    roots = decls_of.get("", [])
    for _ in explore(list(roots), {}, True):
        if attempts and attempts[-1][1]:
            break
        if len(attempts) >= tries:
            break
    return attempts


def select_headers(edges_df: DataFrame, tries: int = 10) -> DataFrame:
    """Grouped selector over all source files. Input columns:
    src, from_node, decl, candidate, cand_ok, decl_kind."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].iloc[0]
        rows = []
        for i, (headers, ok) in enumerate(enumerate_sets(pdf, tries), start=1):
            rows.append(
                {
                    "src": src,
                    "attempt": i,
                    "headers": "|".join(headers),
                    "n_headers": len(headers),
                    "success": ok,
                }
            )
        if not rows:  # no declarations: one trivially-successful empty set
            rows.append(
                {"src": src, "attempt": 1, "headers": "", "n_headers": 0, "success": True}
            )
        return pd.DataFrame(rows)

    return edges_df.groupBy("src").applyInPandas(run, schema=ATTEMPT_SCHEMA)
