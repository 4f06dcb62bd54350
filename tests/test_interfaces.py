"""Match-table interface stage: per-round extract + atomic intern
(SURVEY §2.9 P10, §2.11). Checks table shapes, deterministic ids, FK
consistency, and that the intern shares round visibility on disk."""

from __future__ import annotations

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.engine.interfaces import CaptionSIInterface
from crawler_spark.oracle import CrawlConfig


def _run(spark, tmp=None):
    w = datagen.make_world(n_urls=200, n_hosts=6, n_images=30, with_corpus=True)
    cfg = CrawlConfig(page_size=40, tries=2, max_rounds=50)
    return crawl(
        spark,
        datagen.to_spark(spark, w),
        cfg,
        with_payload=True,
        interfaces=[CaptionSIInterface()],
        state_dir=tmp,
    )


def test_si_intern_tables(spark):
    res = _run(spark)
    files = res.store.aux("si", "files").toPandas()
    matches = res.store.aux("si", "matches").toPandas()
    remarks = res.store.aux("si", "remarks").toPandas()

    assert len(files) > 0 and len(matches) > 0
    # deterministic ids, unique per entity
    assert files["file_id"].is_unique
    assert matches["match_id"].is_unique
    # FK: every match points at an interned file
    assert set(matches["file_id"]) <= set(files["file_id"])
    # remarks 1:1 with matches, enum columns in range
    assert len(remarks) == len(matches)
    assert set(remarks["vector"].unique()) <= set(range(8))
    assert set(remarks["si"].unique()) <= {0, 1}
    # one files row per fetched URL
    assert len(files) == (res.seen["status"] == "fetched").sum()


def test_si_intern_shares_round_visibility(spark, tmp_path):
    res = _run(spark, tmp=str(tmp_path / "s"))
    files = res.store.aux("si", "files")
    assert files is not None
    # aux rounds on disk == committed rounds
    rounds = {r["round"] for r in files.select("round").distinct().collect()}
    assert rounds <= set(res.store.rounds)


def test_preprocess_annotate_line_remap(spark):
    """X9 pragma insertion: annotation lines spliced before detector tokens
    with an exact original->annotated position remap."""
    import pandas as pd

    from crawler_spark.engine.interfaces import PRAGMA, preprocess_annotate

    pdf = pd.DataFrame(
        {"url_id": [1, 2], "caption": ["image of iris flowers", "no matches here"]}
    )
    sdf = spark.createDataFrame(pdf, "url_id long, caption string")
    got = (
        preprocess_annotate(sdf.withColumn("round", sdf.url_id))
        .toPandas()
        .set_index("url_id")
    )
    assert got.loc[1, "n_pragmas"] == 2  # 'image' and 'iris'
    assert got.loc[1, "annotated"].split(" ")[0] == PRAGMA.strip()
    # remap: word 0 shifts by 1, word 2 (iris) by 2
    assert got.loc[1, "line_map"] == "0:1,1:2,2:4,3:5"
    assert got.loc[2, "n_pragmas"] == 0
    assert got.loc[2, "annotated"] == "no matches here"
