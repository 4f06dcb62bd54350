"""Host-authority rank: the integer-scaled PageRank-style iteration must
bit-match its pure-Python oracle (same recurrence) and be invariant to the
input's partitioning — the property float PageRank cannot give."""

from __future__ import annotations

from crawler_spark import datagen
from crawler_spark.operators.graph import host_edges, host_rank, host_rank_py


def test_host_rank_matches_python_oracle_and_partitioning(spark):
    w = datagen.make_world(n_urls=200, n_hosts=8, n_images=10, with_corpus=False)
    links = datagen.to_spark(spark, w)["links"]

    got = {r["host"]: r["rank_scaled"] for r in host_rank(links, n_iter=5).collect()}
    edges = {(r["src"], r["dst"]) for r in host_edges(links).collect()}
    want = host_rank_py(edges, n_iter=5)
    assert got == want
    assert len(got) > 1
    assert all(v > 0 for v in got.values())

    # bit-identical under a different physical partitioning
    got2 = {
        r["host"]: r["rank_scaled"]
        for r in host_rank(links.repartition(7), n_iter=5).collect()
    }
    assert got2 == got

    # authority concentrates: the max-rank host must beat the uniform start
    from crawler_spark.operators.graph import RANK_SCALE

    assert max(got.values()) > RANK_SCALE // len(got)


def test_host_rank_empty_graph(spark):
    links = spark.createDataFrame(
        [], "src_url string, href string, href_kind string"
    )
    assert host_rank(links).count() == 0
    assert host_rank_py(set()) == {}


def test_oracle_rank_path_is_spark_free():
    """oracle.simulate with rank_alpha > 0 must stay replayable without a
    Spark install: the rank twin lives in the pure crawler_spark.rank
    module, NOT behind operators.graph's module-level pyspark import.
    Asserted by importing both in a subprocess that blocks pyspark."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import sys
        class Block:
            def find_module(self, name, path=None):
                if name == "pyspark" or name.startswith("pyspark."):
                    return self
            def load_module(self, name):
                raise ImportError("pyspark blocked")
        sys.meta_path.insert(0, Block())
        from crawler_spark import datagen
        from crawler_spark.oracle import CrawlConfig, simulate
        w = datagen.make_world(n_urls=60, n_hosts=4, n_images=8,
                               with_corpus=False)
        g = simulate(w, CrawlConfig(page_size=8, tries=2, max_rounds=30,
                                    rank_alpha=8))
        assert len(g.trace) > 0
        print("OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
