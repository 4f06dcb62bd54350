"""Pure-Python host-authority rank twin + its integer-space constants.

Lives at the package root next to ids.py so the crawl oracle (oracle.py —
deliberately importable without a Spark install) can mix host rank into
priorities without transitively importing pyspark: operators/graph.py holds
the distributed implementation and re-exports these names, and both sides
share the SAME constants so the integer recurrences are bit-identical
(property-tested in tests/test_graph.py).
"""

from __future__ import annotations

RANK_SCALE = 1 << 30
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def host_rank_py(edges: set[tuple[str, str]], n_iter: int = 5) -> dict[str, int]:
    """Pure-Python replica of operators.graph.host_rank's integer
    recurrence — the test oracle (ids.py twin pattern) and the crawl
    oracle's priority-mix input."""
    nodes = {h for e in edges for h in e}
    n = len(nodes)
    if n == 0:
        return {}
    teleport = (DAMP_DEN - DAMP_NUM) * (RANK_SCALE // n) // DAMP_DEN
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = dict.fromkeys(nodes, RANK_SCALE // n)
    for _ in range(n_iter):
        inflow = dict.fromkeys(nodes, 0)
        for s, t in edges:
            inflow[t] += ranks[s] // outdeg[s]
        ranks = {h: teleport + (DAMP_NUM * inflow[h]) // DAMP_DEN for h in nodes}
    return ranks
