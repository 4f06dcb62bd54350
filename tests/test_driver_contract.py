"""Driver-contract gate: every queries() entry matches its DuckDB oracle at
sf0.001 (fast twin of the driver's sf0.01 run), entry() smokes, and the
catalog is well-formed (names aligned, no duplicate queries)."""

from __future__ import annotations

import __spark_entry__ as entry
from crawler_spark.oracle_check import check_all

SF_DIR = "/root/testdata/sf0.001"


def test_catalog_well_formed():
    qs, osql = entry.queries(), entry.oracle_sql()
    # EXACTLY 50: the driver gates at most 50 queries per round — a 51st
    # entry would silently rotate out of the correctness gate (CLAUDE.md
    # invariant; round 2 lost x7/x13 coverage this way)
    assert len(qs) == 50, len(qs)
    assert set(osql) <= set(qs)
    # at most a couple of rows-only (non-SQL-expressible) entries
    assert len(set(qs) - set(osql)) <= 3


def test_entry_smokes(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url_id", "host", "priority", "seq"} <= set(df.columns)


def test_all_queries_match_oracle(spark):
    res = check_all(spark, SF_DIR)
    failures = {k: msg for k, (ok, msg) in res.items() if not ok}
    assert not failures, failures
