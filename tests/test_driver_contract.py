"""Driver-contract gate: every queries() entry matches its DuckDB oracle at
sf0.001 (fast twin of the driver's sf0.01 run), entry() smokes, and the
catalog is well-formed (names aligned, no duplicate queries)."""

from __future__ import annotations

import __spark_entry__ as entry
from crawler_spark.oracle_check import check_all

SF_DIR = "/root/testdata/sf0.001"


def test_catalog_well_formed():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 30
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
