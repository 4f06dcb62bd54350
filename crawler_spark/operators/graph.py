"""Host-authority ranking over the crawl link graph (beyond-reference
crawl analytics): a PageRank-style iteration whose scores feed frontier
prioritization — the standing signal a production crawler mixes into the
priority the reference takes verbatim from star counts.

Determinism: ranks live in INTEGER space (scaled by 2^30) and every
per-node update is an int64 sum of integer contributions — exact and
order-independent — so the result is bit-identical across engines,
partitionings, and core counts (the same trick as the IVF centroid means,
similarity.py). Floating-point PageRank would differ in the last ulp per
partitioning and could flip rank order between runs.

Scale shape: each iteration is one equi-join (edges x ranks, both keyed by
src host) + one groupBy(dst) sum — the canonical distributed PageRank
dataflow; the edge list is the only large table and its partitioning is
reused across iterations. Lineage is truncated per iteration with an eager
localCheckpoint (driver-side iterative loop, engine/crawl.py pattern) so
the plan does not grow with n_iter. Dangling hosts (no out-links) leak
their rank mass — the standard simplification; ranks are a relative
prioritization signal here, not a probability distribution.

This is one of the genuinely non-SQL-expressible operators (iterative
fixpoint); its oracle is a pure-Python replica of the identical integer
recurrence (tests/test_graph.py), including a partitioning-invariance
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import canon

# constants + the pure-Python twin live in the Spark-free crawler_spark.rank
# so oracle.py can use them without importing pyspark; re-exported here for
# the operator's public surface
from ..rank import DAMP_DEN, DAMP_NUM, RANK_SCALE, host_rank_py  # noqa: F401


def host_edges(links: DataFrame, pages: DataFrame | None = None) -> DataFrame:
    """Distinct host->host edges from the raw links table: system-kind
    hrefs dropped and self-loops removed (the extract stage's
    canonicalization), and — when `pages` is given — dangling destinations
    dropped too (the round's dst_url_id IS NOT NULL check,
    engine/round.py): a href to a host with no fetchable page would
    otherwise become a phantom rank sink. Without `pages`, dangling hosts
    stay in the graph and absorb damped mass — fine for a pure
    link-structure view, wrong for a crawl-prioritization signal."""
    edges = (
        links.filter(F.col("href_kind") != "system")
        .select(
            canon.host_of(canon.canon_url(F.col("src_url"))).alias("src"),
            canon.host_of(canon.canon_url(F.col("href"))).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if pages is not None:
        known = (
            pages.select(
                canon.host_of(canon.canon_url(F.col("url"))).alias("dst")
            ).distinct()
        )
        edges = edges.join(F.broadcast(known), "dst", "left_semi")
    return edges


def host_rank(
    links: DataFrame, n_iter: int = 5, pages: DataFrame | None = None
) -> DataFrame:
    """(host, rank_scaled, rank): integer-scaled authority after `n_iter`
    damped iterations. rank = rank_scaled / 2^30 rounded to 9 places —
    derived from the exact integer, so it is as deterministic as the
    integer itself. Pass `pages` to exclude dangling hosts (see
    host_edges)."""
    edges = host_edges(links, pages).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("rank"),
        )
    teleport = (DAMP_DEN - DAMP_NUM) * (RANK_SCALE // n) // DAMP_DEN
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e2 = edges.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = nodes.select("host", F.lit(RANK_SCALE // n).cast("long").alias("r"))
    for _ in range(n_iter):
        contrib = e2.join(
            ranks, e2["src"] == ranks["host"]
        ).select(F.col("dst").alias("host"), F.expr("r div deg").alias("c"))
        inflow = contrib.groupBy("host").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(inflow, "host", "left")
            .select(
                "host",
                (
                    F.lit(teleport)
                    + F.expr(f"({DAMP_NUM} * coalesce(s, 0L)) div {DAMP_DEN}")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "host",
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r") / float(RANK_SCALE), 9).alias("rank"),
    )


