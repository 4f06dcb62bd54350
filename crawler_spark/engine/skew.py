"""Hot-host skew handling (SURVEY §4, custom-work item 3).

A crawl frontier is Zipfian: one hot host can dominate a round's page, and
any stage partitioned by `host` then has one straggler task. AQE's skew
split fixes joins but NOT window functions — `row_number() OVER
(PARTITION BY host ...)` must see the whole host in one task. This module
provides an EXACT two-phase replacement:

  phase 1: rank within (host, salt) where salt = pmod(xxhash64(url_id), S)
           and keep the per-salt top-`budget` rows. Any row in the true
           per-host top-budget is necessarily in the top-budget of its own
           salt slice, so phase 1 keeps a superset (<= S * budget rows per
           host).
  phase 2: exact rank within host over the pruned superset (now bounded by
           S * budget rows per host, not the raw host row count).

Result set is IDENTICAL to the single-window selection — asserted by
tests/test_skew.py against the unsalted path and the Python oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_hot_hosts(frontier: DataFrame, factor: float = 10.0) -> DataFrame:
    """Hosts whose row count exceeds `factor` x the median host size —
    per-round observability (lineage `log()` analog for dropped/hot hosts).
    """
    counts = frontier.groupBy("host").agg(F.count("*").alias("n_urls"))
    median = counts.approxQuantile("n_urls", [0.5], 0.01)[0]
    return counts.filter(F.col("n_urls") > factor * float(median or 1.0))


def salted_politeness_select(
    candidates: DataFrame,
    budget_col: str = "_budget",
    n_salt: int = 8,
    order=None,
) -> DataFrame:
    """Budget-first rows per host, exact semantics, skew-bounded.

    Input must carry host, url_id, priority and the per-row host budget
    column. Output = input rows with `_hrank` (exact per-host rank) where
    `_hrank <= budget` — the same rows the plain window would keep.
    """
    if order is None:
        order = (F.desc("priority"), F.asc("url_id"))
    salt = F.pmod(F.xxhash64(F.col("url_id")), F.lit(n_salt))
    w_salt = Window.partitionBy("host", "_salt").orderBy(*order)
    pruned = (
        candidates.withColumn("_salt", salt)
        .withColumn("_srank", F.row_number().over(w_salt))
        .filter(F.col("_srank") <= F.col(budget_col))
        .drop("_salt", "_srank")
    )
    w_host = Window.partitionBy("host").orderBy(*order)
    return pruned.withColumn("_hrank", F.row_number().over(w_host)).filter(
        F.col("_hrank") <= F.col(budget_col)
    )
