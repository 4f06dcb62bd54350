"""Match-table interface stage: per-round extract + atomic intern
(SURVEY §2.9 P10, §2.11). Checks table shapes, deterministic ids, FK
consistency, and that the intern shares round visibility on disk."""

from __future__ import annotations

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.engine.interfaces import (
    CaptionSIInterface,
    KernelFarerInterface,
    RebaseDLInterface,
)
from crawler_spark.oracle import CrawlConfig


def _run(spark, tmp=None, interfaces=None):
    w = datagen.make_world(n_urls=200, n_hosts=6, n_images=30, with_corpus=True)
    cfg = CrawlConfig(page_size=40, tries=2, max_rounds=50)
    return crawl(
        spark,
        datagen.to_spark(spark, w),
        cfg,
        with_payload=True,
        interfaces=interfaces or [CaptionSIInterface()],
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
    # preprocess (X9 annotate) flowed into the intern: every caption has
    # at least one detector token ('image'), so n_pragmas >= 1
    assert (files["n_pragmas"] >= 1).all()


def test_si_full_catalog_and_seed(spark):
    """The SI intern covers all six reference tables + the seeded
    si_info_types dimension (crawler_si/src/interface.rs:16-86)."""
    res = _run(spark)
    matches = res.store.aux("si", "matches").toPandas()
    ir_mix = res.store.aux("si", "ir_mix").toPandas()
    pattern = res.store.aux("si", "pattern").toPandas()
    si_info = res.store.aux("si", "si_info").toPandas()
    types = res.store.seed("si", "si_info_types").toPandas()

    assert len(types) == 4 and set(types["type_id"]) == {0, 1, 2, 3}
    # ir_mix / si_info are 1:1 with matches; component tally adds up
    assert len(ir_mix) == len(matches) and len(si_info) == len(matches)
    assert (ir_mix["count"] == ir_mix["mem"] + ir_mix["arith"] + ir_mix["other"]).all()
    # si_info FKs: matches + the seeded dimension
    assert set(si_info["match_id"]) <= set(matches["match_id"])
    assert set(si_info["type_id"]) <= set(types["type_id"])
    # pattern rows key the FIRST match of a repeated token (FK into matches)
    assert len(pattern) > 0
    assert set(pattern["match_id"]) <= set(matches["match_id"])
    assert (pattern["stride"] >= 1).all()


def test_multi_interface_dispatch(spark):
    """All three reference interfaces attached to ONE crawl (the Arc<dyn
    Interface> list, crawler/src/interface.rs:63): rebasedl interns files
    unconditionally, kernel_farer applies the F8 empty-result skip."""
    res = _run(
        spark,
        interfaces=[CaptionSIInterface(), RebaseDLInterface(), KernelFarerInterface()],
    )
    n_fetched = (res.seen["status"] == "fetched").sum()

    rb_files = res.store.aux("rebasedl", "files").toPandas()
    rb_matches = res.store.aux("rebasedl", "matches").toPandas()
    kf_files = res.store.aux("kernel_farer", "files").toPandas()
    kf_matches = res.store.aux("kernel_farer", "matches").toPandas()
    si_files = res.store.aux("si", "files").toPandas()

    # rebasedl: ensure_file regardless of matches (intern.rs:11-27)
    assert len(rb_files) == n_fetched
    assert {"line", "col", "maf", "cu", "cb"} <= set(rb_matches.columns)
    assert rb_matches["maf"].between(0, 1).all()
    assert set(rb_matches["file_id"]) <= set(rb_files["file_id"])
    # kernel_farer F8: only files WITH matches are interned
    # (crawler_kernel_farer/src/intern.rs:16-19)
    assert 0 < len(kf_files) < n_fetched
    assert set(kf_matches["file_id"]) == set(kf_files["file_id"])
    assert set(kf_matches["type"].unique()) <= {1, 2, 3}
    # shared deterministic file ids across interfaces (one files table in
    # the reference DB)
    assert set(rb_files["file_id"]) == set(si_files["file_id"])
    assert set(kf_files["file_id"]) <= set(rb_files["file_id"])


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


def test_commit_aux_fires_no_jobs_at_commit(spark):
    """The driver-floor contract: commit_aux (memory mode) stores the PLAN
    and fires ZERO driver jobs at commit time (round 2 paid one eager
    checkpoint job per table per round, ~10 with all three interfaces —
    and a lazy localCheckpoint is no fix: AQE materializes its exchange
    stages synchronously). The extract work runs only when aux() is read,
    over the round's checkpointed fetched table."""
    from pyspark.sql import functions as F

    from crawler_spark.engine.state import StateStore

    store = StateStore(spark, root=None)
    tracker = spark.sparkContext.statusTracker
    base = spark.range(100).select(
        F.col("id").alias("file_id"), (F.col("id") % 7).alias("line")
    )
    j0 = len(tracker().getJobIdsForGroup(None))
    for iface, table in (("si", "files"), ("rebasedl", "matches"), ("kernel_farer", "matches")):
        store.commit_aux(1, iface, table, base.groupBy("line").count())
    store.finalize_round(1, {"round": 1})
    assert len(tracker().getJobIdsForGroup(None)) == j0, "commit_aux fired a job"
    # read time pays the (shallow) extract; results are correct
    assert store.aux("si", "files").count() == 7
    assert store.aux("rebasedl", "matches").count() == 7
