"""Salt-on-skew: the two-phase politeness selection must be result-identical
to the plain window AND to the Python oracle, on a world with one 50x hot
host (datagen host0)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.engine.skew import detect_hot_hosts, salted_politeness_select
from crawler_spark.oracle import CrawlConfig, simulate


def test_salted_select_equals_plain_window(spark):
    w = datagen.make_world(n_urls=500, n_hosts=6, n_images=10, with_corpus=False)
    pages = spark.createDataFrame(w["pages"], datagen.WORLD_SCHEMAS["pages"]).select(
        F.xxhash64("url").alias("url_id"), "host", "priority",
        F.lit(7).alias("_budget"),
    )
    from pyspark.sql import Window

    w_host = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url_id"))
    plain = (
        pages.withColumn("_hrank", F.row_number().over(w_host))
        .filter(F.col("_hrank") <= F.col("_budget"))
        .select("url_id", "_hrank")
        .toPandas()
        .sort_values("url_id")
        .reset_index(drop=True)
    )
    salted = (
        salted_politeness_select(pages, n_salt=4)
        .select("url_id", "_hrank")
        .toPandas()
        .sort_values("url_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_crawl_parity_with_salt(spark):
    """Full engine with n_salt=4: trace/seen/lineage still EXACTLY match the
    (salt-unaware) oracle — the knob is plan-only."""
    w = datagen.make_world(n_urls=300, n_hosts=8, n_images=10, with_corpus=False)
    cfg = CrawlConfig(page_size=25, tries=2, max_rounds=100, n_salt=4)
    o = simulate(w, cfg)
    r = crawl(spark, datagen.to_spark(spark, w), cfg)
    pd.testing.assert_frame_equal(
        o.trace.astype("int64"),
        r.trace[["round", "seq", "url_id"]].astype("int64").reset_index(drop=True),
    )
    pd.testing.assert_frame_equal(
        o.seen.sort_values("url_id").reset_index(drop=True),
        r.seen.sort_values("url_id")
        .reset_index(drop=True)
        .astype({"url_id": "int64", "round": "int64"}),
    )
    pd.testing.assert_frame_equal(
        o.lineage.astype("int64"), r.lineage.astype("int64").reset_index(drop=True)
    )


def test_detect_hot_hosts(spark):
    w = datagen.make_world(n_urls=2000, n_hosts=20, n_images=10, with_corpus=False)
    frontier = spark.createDataFrame(w["pages"], datagen.WORLD_SCHEMAS["pages"])
    hot = detect_hot_hosts(frontier, factor=10.0).toPandas()
    assert "host0.example" in set(hot["host"])  # the 50x host
    assert len(hot) <= 2
