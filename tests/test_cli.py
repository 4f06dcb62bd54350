"""CLI surface (reference dispatch parity, lib.rs:19-51): search commits the
seed frontier as round 0; crawl --resume continues from it."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from crawler_spark import datagen


def test_cli_search_commits_round0(tmp_path):
    world_dir = str(tmp_path / "world")
    state_dir = str(tmp_path / "state")
    datagen.write_world(
        datagen.make_world(n_urls=120, n_hosts=5, n_images=10, with_corpus=False),
        world_dir,
    )
    p = subprocess.run(
        [
            sys.executable, "-m", "crawler_spark.cli", "search",
            "--world", world_dir, "--state", state_dir, "--cores", "8",
            "--page-size", "20",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert line, p.stderr[-500:]
    out = json.loads(line[-1])
    assert out["cmd"] == "search" and out["rounds"] == 0
    assert out["lineage_tail"][0]["n_eligible"] > 0
    # round-0 frontier committed and visible via the manifest
    manifest = json.load(open(os.path.join(state_dir, "manifest.json")))
    assert manifest["rounds"] == [0]
    assert os.path.isdir(os.path.join(state_dir, "round=0", "frontier"))


def test_cli_toml_config(tmp_path):
    """Reference `crawler <CONFIG>` parity: a validated TOML file supplies
    the run configuration; explicit flags override it."""
    world_dir = str(tmp_path / "world")
    datagen.write_world(
        datagen.make_world(n_urls=100, n_hosts=5, n_images=10, with_corpus=True),
        world_dir,
    )
    cfg_file = tmp_path / "cfg.toml"
    cfg_file.write_text(
        "[crawl]\npage_size = 20\nmax_rounds = 3\nmax_depth = 2\n"
        "[runner]\ncores = 8\nintern = [\"kernel_farer\"]\n"
        f"[io]\nworld = \"{world_dir}\"\n"
    )
    p = subprocess.run(
        [
            sys.executable, "-m", "crawler_spark.cli", "crawl",
            "--config", str(cfg_file), "--max-rounds", "2",  # flag wins
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert line, p.stderr[-800:]
    out = json.loads(line[-1])
    assert out["cmd"] == "crawl" and out["rounds"] == 2
    assert out["total_fetched"] > 0

    # strict validation: unknown key is rejected (serde-panic analog)
    bad = tmp_path / "bad.toml"
    bad.write_text("[crawl]\npage_sze = 20\n")
    p2 = subprocess.run(
        [sys.executable, "-m", "crawler_spark.cli", "crawl", "--config", str(bad)],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert p2.returncode != 0 and "unknown key" in (p2.stderr + p2.stdout)


def test_cli_pipeline_manifest(tmp_path):
    """`pipeline` subcommand: run the clean-corpus composition over the
    sf0.001 tables and write the train_keep manifest; the summary counts
    must agree with the written parquet."""
    import duckdb

    out_dir = str(tmp_path / "manifest")
    p = subprocess.run(
        [
            sys.executable, "-m", "crawler_spark.cli", "pipeline",
            "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
            "--cores", "8",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert line, p.stderr[-800:]
    out = json.loads(line[-1])
    assert out["cmd"] == "pipeline" and out["n_docs"] == 500
    assert 0 < out["n_keep"] < out["n_docs"]
    got = duckdb.sql(
        f"select count(*), sum(train_keep::int) from read_parquet('{out_dir}/*.parquet')"
    ).fetchone()
    assert got == (out["n_docs"], out["n_keep"])


def test_cli_split(tmp_path):
    """`split` subcommand: write the leakage-safe assignment and verify the
    summary counts against the parquet, plus the leakage invariant (no
    multi-member group straddles splits) on the written file."""
    import duckdb

    out_dir = str(tmp_path / "split")
    p = subprocess.run(
        [
            sys.executable, "-m", "crawler_spark.cli", "split",
            "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
            "--cores", "8",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert line, p.stderr[-800:]
    out = json.loads(line[-1])
    assert out["cmd"] == "split" and not out["images"]
    assert sum(out["counts"].values()) == 500
    assert set(out["counts"]) == {"train", "val", "test"}
    got = dict(duckdb.sql(
        f"select split, count(*) from read_parquet('{out_dir}/*.parquet') "
        "group by 1"
    ).fetchall())
    assert got == out["counts"]
    straddle = duckdb.sql(
        f"select count(*) from (select group_id from "
        f"read_parquet('{out_dir}/*.parquet') where group_size > 1 "
        "group by group_id having count(distinct split) > 1)"
    ).fetchone()[0]
    assert straddle == 0


def test_cli_rank(tmp_path):
    """`rank` subcommand: deterministic host authority over a world's link
    graph; re-running must print the identical JSON (integer-space rank)."""
    world_dir = str(tmp_path / "world")
    datagen.write_world(
        datagen.make_world(n_urls=150, n_hosts=8, n_images=10, with_corpus=False),
        world_dir,
    )

    def run():
        p = subprocess.run(
            [sys.executable, "-m", "crawler_spark.cli", "rank",
             "--world", world_dir, "--cores", "8"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        assert line, p.stderr[-800:]
        return json.loads(line[-1])

    out = run()
    assert out["cmd"] == "rank" and out["n_hosts"] > 1
    hosts = [t["host"] for t in out["top"]]
    # pages-filtered graph: dangling hrefs never become phantom rank sinks
    assert all("dangling" not in h for h in hosts), hosts
    ranks = [t["rank"] for t in out["top"]]
    assert ranks == sorted(ranks, reverse=True) and ranks[0] > ranks[-1]
    assert run() == out  # bit-deterministic across runs


def test_cli_compact(tmp_path):
    """`compact` subcommand: crawl to a checkpoint, compact+vacuum it, and
    a subsequent crawl --resume must pick up from the base generation."""
    world_dir = str(tmp_path / "world")
    state_dir = str(tmp_path / "state")
    datagen.write_world(
        datagen.make_world(n_urls=120, n_hosts=5, n_images=10, with_corpus=False),
        world_dir,
    )

    def run(*argv):
        p = subprocess.run(
            [sys.executable, "-m", "crawler_spark.cli", *argv],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        assert line, p.stderr[-800:]
        return json.loads(line[-1])

    first = run(
        "crawl", "--world", world_dir, "--state", state_dir, "--cores", "8",
        "--page-size", "20", "--max-rounds", "3",
    )
    assert first["rounds"] == 3

    out = run("compact", "--state", state_dir, "--cores", "8")
    assert out == {
        "cmd": "compact", "rounds": 3, "gen": 1, "upto": 3,
        # no interfaces attached -> no aux tables to compact
        "aux_gen": None, "vacuumed": True,
    }
    manifest = json.load(open(os.path.join(state_dir, "manifest.json")))
    assert manifest["seen_base"] == {"gen": 1, "upto": 3}
    assert not os.path.isdir(os.path.join(state_dir, "seen", "round=1"))

    resumed = run(
        "crawl", "--world", world_dir, "--state", state_dir, "--cores", "8",
        "--page-size", "20", "--resume",
    )
    assert resumed["rounds"] > 3


def test_cli_decontam(tmp_path):
    """`decontam` subcommand: write the contamination manifest for a
    modality and verify the summary count against the parquet AND the
    operator's DuckDB twin (text leg: no train doc flagged is an eval doc;
    image leg exercises the modality switch)."""
    import duckdb

    for modality, id_col, twin_attr in (
        ("text", "doc_id", ("crawler_spark.operators.text", "DECONTAM_SQL")),
        ("image", "image_id",
         ("crawler_spark.operators.multimodal", "MM_DECONTAM_SQL")),
    ):
        out_dir = str(tmp_path / f"decontam_{modality}")
        p = subprocess.run(
            [
                sys.executable, "-m", "crawler_spark.cli", "decontam",
                "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
                "--cores", "8", "--modality", modality,
            ],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        assert line, p.stderr[-800:]
        out = json.loads(line[-1])
        assert out["cmd"] == "decontam" and out["modality"] == modality
        import importlib

        mod_name, attr = twin_attr
        sql = getattr(importlib.import_module(mod_name), attr)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = con.execute(sql).df().sort_values(id_col).reset_index(drop=True)
        got = (
            duckdb.sql(f"select * from read_parquet('{out_dir}/*.parquet')")
            .df()
            .sort_values(id_col)
            .reset_index(drop=True)[want.columns.tolist()]
        )
        assert out["n_contaminated"] == len(want)
        assert got.astype(str).equals(want.astype(str)), modality
        if modality == "text":
            assert (want["doc_id"] % 10 != 0).all()  # eval docs never flagged


def test_cli_card(tmp_path):
    """`card` subcommand: the 12-row cross-modality audit funnel, checked
    for shape and against the DuckDB twin's cells."""
    import duckdb

    p = subprocess.run(
        [
            sys.executable, "-m", "crawler_spark.cli", "card",
            "--sf-dir", "/root/testdata/sf0.001", "--cores", "8",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert line, p.stderr[-800:]
    out = json.loads(line[-1])
    assert out["cmd"] == "card" and len(out["rows"]) == 12
    got = {
        (r["modality"], r["stage"]): (r["n_items"], r["n_selected"])
        for r in out["rows"]
    }
    from crawler_spark.operators.pipeline import CORPUS_CARD_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        (m, s): (int(n), int(k))
        for m, s, n, k in con.execute(CORPUS_CARD_SQL).fetchall()
    }
    assert got == want
