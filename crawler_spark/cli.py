"""CLI entry — API parity with the reference's `crawler <CONFIG>
{mine <PATH> | crawl | search}` dispatch (`crawler/src/lib.rs:19-51,108-134`):

  python -m crawler_spark.cli crawl  --world DIR --state DIR [--resume] ...
  python -m crawler_spark.cli search --world DIR --state DIR           ...
  python -m crawler_spark.cli mine   --world DIR [--host HOST]         ...

crawl  = full fetch->parse->enqueue loop to frontier exhaustion (§3.1)
search = frontier build only: seed expansion committed as round 0 (§3.3)
mine   = single-round pipeline over one world (optionally one host) with
         match-table interning (§3.2)

Runs under spark-submit (`spark-submit --py-files crawler_spark.zip -m ...`)
or plain python (local mode).
"""

from __future__ import annotations

import argparse
import json
import sys

from .datagen import WORLD_SCHEMAS
from .engine.crawl import crawl
from .engine.interfaces import ALL_INTERFACES
from .engine.seen_filter import BloomSeenFilter
from .oracle import CrawlConfig
from .session import get_spark
from .sources import load_world


def _add_common(p: argparse.ArgumentParser, toml_defaults: dict) -> None:
    p.add_argument(
        "--config",
        default=None,
        help="TOML config file (reference `crawler <CONFIG>` parity, "
        "config.rs:53-74); explicit flags override its values",
    )
    p.add_argument(
        "--world",
        required="world" not in toml_defaults,
        help="dir of world parquet tables (datagen.write_world)",
    )
    p.add_argument("--state", default=None, help="checkpoint dir (enables resume)")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--page-size", type=int, default=100)
    p.add_argument("--tries", type=int, default=3)
    p.add_argument("--round-ms", type=int, default=1000)
    p.add_argument("--max-rounds", type=int, default=1000)
    p.add_argument("--n-salt", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=None, help="link-depth cap")
    p.add_argument(
        "--rank-alpha", type=int, default=0,
        help="mix host-authority rank into enqueued priority "
        "(priority + alpha*rank_scaled/2^30; 0 = off)",
    )
    p.add_argument("--rank-iters", type=int, default=5)
    # BooleanOptionalAction so a TOML `bloom = true` can still be overridden
    # back off on the command line (--no-bloom / --no-payload)
    p.add_argument(
        "--bloom",
        action=argparse.BooleanOptionalAction,
        default=False,
        help="enable the Bloom seen pre-filter",
    )
    p.add_argument(
        "--payload",
        action=argparse.BooleanOptionalAction,
        default=False,
        help="join fetched rows against the corpus",
    )
    p.add_argument(
        "--intern",
        action="append",
        choices=["si", "rebasedl", "kernel_farer"],
        default=None,
        help="attach a match-table interface (repeatable; implies --payload)",
    )
    p.add_argument(
        "--intern-si",
        action="store_true",
        help="shorthand for --intern si",
    )


def _cfg(args: argparse.Namespace, **over) -> CrawlConfig:
    base = dict(
        page_size=args.page_size, tries=args.tries, round_ms=args.round_ms,
        max_rounds=args.max_rounds, n_salt=args.n_salt, max_depth=args.max_depth,
        rank_alpha=args.rank_alpha, rank_iters=args.rank_iters,
    )
    base.update(over)
    return CrawlConfig(**base)


# TOML section/key catalog — unknown sections/keys are ERRORS, the analog of
# the reference's serde-strict config validation (config.rs:53-74 panics on
# parse failure; the language subset check is config.rs:62-66 / U3)
_TOML_SECTIONS = {
    "crawl": {"page_size", "tries", "round_ms", "max_rounds", "n_salt", "max_depth",
              "rank_alpha", "rank_iters"},
    "runner": {"cores", "bloom", "payload", "intern"},
    "io": {"world", "state"},
}


def load_config(path: str) -> dict:
    """Flatten a validated TOML config into argparse dest defaults."""
    import tomllib

    try:
        with open(path, "rb") as f:
            data = tomllib.load(f)
    except OSError as e:
        raise SystemExit(f"config: cannot read {path}: {e.strerror or e}")
    except tomllib.TOMLDecodeError as e:
        raise SystemExit(f"config: parse error in {path}: {e}")
    out = {}
    for section, keys in data.items():
        allowed = _TOML_SECTIONS.get(section)
        if allowed is None:
            raise SystemExit(f"config: unknown section [{section}]")
        if not isinstance(keys, dict):
            raise SystemExit(f"config: [{section}] must be a table")
        for k, v in keys.items():
            if k not in allowed:
                raise SystemExit(f"config: unknown key {section}.{k}")
            out[k] = v
    bad = set(out.get("intern", [])) - set(ALL_INTERFACES)
    if bad:
        raise SystemExit(f"config: unknown interfaces {sorted(bad)}")
    return out


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # two-phase parse: --config supplies DEFAULTS, explicit flags override
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    pre_args, _ = pre.parse_known_args(argv)
    toml_defaults = load_config(pre_args.config) if pre_args.config else {}

    # `intern` is an append action: feeding it through set_defaults would
    # make explicit --intern flags EXTEND the TOML list instead of
    # overriding it — handled separately below
    arg_defaults = {k: v for k, v in toml_defaults.items() if k != "intern"}
    parser = argparse.ArgumentParser(prog="crawler_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("crawl", "search", "mine"):
        p = sub.add_parser(name)
        _add_common(p, toml_defaults)
        if name == "crawl":
            p.add_argument("--resume", action="store_true")
            p.add_argument(
                "--auto-compact-every",
                type=int,
                default=None,
                help="run seen/aux compaction + vacuum every N rounds "
                "during the crawl (steady-state maintenance)",
            )
        if name == "mine":
            p.add_argument("--host", default=None, help="restrict to one host")
        p.set_defaults(**arg_defaults)
    pp = sub.add_parser(
        "pipeline",
        help="run the clean-corpus training pipeline (quality gate -> exact "
        "dedup -> near-dup representatives -> embedding coverage) over a "
        "table dir and write the per-document train_keep manifest",
    )
    pp.add_argument("--config", default=None)
    pp.add_argument("--sf-dir", required=True, help="dir of documents/embeddings parquet")
    pp.add_argument("--out", required=True, help="manifest parquet output dir")
    pp.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    pp.add_argument(
        "--c4",
        action="store_true",
        help="additionally gate train_keep on the C4 line-cleaning page "
        "verdict (aggressive on corpora without terminal punctuation)",
    )
    ps = sub.add_parser(
        "split",
        help="write the leakage-safe train/val/test assignment (near-dup "
        "classes never straddle the boundary) for the document corpus, or "
        "the image corpus with --images",
    )
    ps.add_argument("--config", default=None)
    ps.add_argument("--sf-dir", required=True, help="dir of documents parquet")
    ps.add_argument("--out", required=True, help="split parquet output dir")
    ps.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    ps.add_argument(
        "--images",
        action="store_true",
        help="split the image corpus by phash duplicate class instead",
    )
    pdc = sub.add_parser(
        "decontam",
        help="write the eval-overlap contamination manifest for one "
        "modality (the decontamination row: items whose modality-specific "
        "near-dup criterion matches the held-out eval split)",
    )
    pdc.add_argument("--config", default=None)
    pdc.add_argument("--sf-dir", required=True, help="dir of documents parquet")
    pdc.add_argument("--out", required=True, help="manifest parquet output dir")
    pdc.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    pdc.add_argument(
        "--modality",
        choices=("text", "image", "video", "audio"),
        default="text",
        help="which corpus leg to scrub (default text: k-gram overlap)",
    )
    pca = sub.add_parser(
        "card",
        help="print the cross-modality corpus audit card: the dedup / "
        "quality / decontam survival funnel per modality (12 rows)",
    )
    pca.add_argument("--config", default=None)
    pca.add_argument("--sf-dir", required=True, help="dir of documents parquet")
    pca.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    pr = sub.add_parser(
        "recall",
        help="measure ANN recall@k (band/multiprobe/IVF/SQ8 vs exact "
        "brute force) and LSH near-dup candidate recall over a table dir "
        "— the tuning numbers for the approximate indexes",
    )
    pr.add_argument("--config", default=None)
    pr.add_argument("--sf-dir", required=True, help="dir of documents/embeddings parquet")
    pr.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    pk = sub.add_parser(
        "rank",
        help="host-authority rank over a world's link graph (deterministic "
        "integer PageRank) — a frontier-prioritization signal",
    )
    pk.add_argument("--config", default=None)
    pk.add_argument(
        "--world",
        default=toml_defaults.get("world"),
        required="world" not in toml_defaults,
        help="dir of world parquet tables (needs links)",
    )
    pk.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    pk.add_argument("--n-iter", type=int, default=5)
    pk.add_argument("--top", type=int, default=10)
    pc = sub.add_parser(
        "compact",
        help="seen-table maintenance: rewrite committed rounds into one "
        "base generation (StateStore.compact_seen) and reclaim files",
    )
    pc.add_argument("--config", default=None)
    pc.add_argument(
        "--state",
        default=toml_defaults.get("state"),
        required="state" not in toml_defaults,
        help="checkpoint dir to compact",
    )
    pc.add_argument("--cores", type=int, default=toml_defaults.get("cores"))
    pc.add_argument(
        "--vacuum",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="delete superseded files after the manifest swap",
    )
    args = parser.parse_args(argv)

    if args.cmd == "rank":
        from pyspark.sql import functions as F

        from .operators.graph import host_rank

        spark = get_spark(cores=args.cores)
        world = load_world(spark, args.world)
        if "links" not in world:
            print(f"world dir {args.world} has no links table", file=sys.stderr)
            return 2
        ranks = host_rank(
            world["links"], n_iter=args.n_iter, pages=world.get("pages")
        )
        top = [
            {"host": r["host"], "rank": r["rank"]}
            for r in ranks.orderBy(
                F.desc("rank_scaled"), F.asc("host")
            ).limit(args.top).collect()
        ]
        print(
            json.dumps(
                {
                    "cmd": "rank",
                    "n_hosts": ranks.count(),
                    "n_iter": args.n_iter,
                    "top": top,
                }
            )
        )
        spark.stop()
        return 0

    if args.cmd == "recall":
        from .operators.dedup import lsh_recall
        from .operators.similarity import ann_recall

        spark = get_spark(cores=args.cores)
        out = {
            "cmd": "recall",
            "ann": ann_recall(spark, args.sf_dir),
            "lsh": lsh_recall(spark, args.sf_dir),
        }
        print(json.dumps(out))
        spark.stop()
        return 0

    if args.cmd == "pipeline":
        from pyspark.sql import functions as F

        from .operators.pipeline import pipeline_clean_corpus

        spark = get_spark(cores=args.cores)
        pipeline_clean_corpus(spark, args.sf_dir, c4=args.c4).coalesce(8).write.mode(
            "overwrite"
        ).parquet(args.out)
        manifest = spark.read.parquet(args.out)
        row = manifest.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("train_keep").cast("int")).alias("n_keep"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "cmd": "pipeline",
                    "out": args.out,
                    "n_docs": int(row["n_docs"]),
                    "n_keep": int(row["n_keep"]),
                }
            )
        )
        spark.stop()
        return 0

    if args.cmd == "split":
        from pyspark.sql import functions as F

        from .operators.multimodal import mm_split
        from .operators.pipeline import pipeline_split

        spark = get_spark(cores=args.cores)
        fn = mm_split if args.images else pipeline_split
        fn(spark, args.sf_dir).coalesce(8).write.mode("overwrite").parquet(
            args.out
        )
        counts = {
            r["split"]: int(r["n"])
            for r in spark.read.parquet(args.out)
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        print(
            json.dumps(
                {
                    "cmd": "split",
                    "out": args.out,
                    "images": bool(args.images),
                    "counts": counts,
                }
            )
        )
        spark.stop()
        return 0

    if args.cmd == "card":
        from .operators.pipeline import corpus_card

        spark = get_spark(cores=args.cores)
        rows = corpus_card(spark, args.sf_dir).collect()  # bounded: 12 rows
        print(
            json.dumps(
                {
                    "cmd": "card",
                    "rows": [
                        {
                            "modality": r["modality"],
                            "stage": r["stage"],
                            "n_items": int(r["n_items"]),
                            "n_selected": int(r["n_selected"]),
                        }
                        for r in rows
                    ],
                }
            )
        )
        spark.stop()
        return 0

    if args.cmd == "decontam":
        from .operators.multimodal import (
            mm_audio_decontaminate,
            mm_decontaminate,
            mm_video_decontaminate,
        )
        from .operators.text import decontaminate

        fns = {
            "text": decontaminate,
            "image": mm_decontaminate,
            "video": mm_video_decontaminate,
            "audio": mm_audio_decontaminate,
        }
        spark = get_spark(cores=args.cores)
        fns[args.modality](spark, args.sf_dir).coalesce(8).write.mode(
            "overwrite"
        ).parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(
            json.dumps(
                {
                    "cmd": "decontam",
                    "out": args.out,
                    "modality": args.modality,
                    "n_contaminated": int(n),
                }
            )
        )
        spark.stop()
        return 0

    if args.cmd == "compact":
        from .engine.state import StateStore

        spark = get_spark(cores=args.cores)
        store = StateStore(spark, args.state)
        if not store.rounds:
            print(f"compact: no committed rounds under {args.state}", file=sys.stderr)
            return 2
        store.compact_seen()
        store.compact_aux()
        if args.vacuum:
            store.vacuum_seen()
            store.vacuum_aux()
            store.vacuum_frontiers()
        print(
            json.dumps(
                {
                    "cmd": "compact",
                    "rounds": len(store.rounds),
                    "gen": store._seen_base["gen"],
                    "upto": store._seen_base["upto"],
                    "aux_gen": store._aux_base["gen"] if store._aux_base else None,
                    "vacuumed": bool(args.vacuum),
                }
            )
        )
        spark.stop()
        return 0

    if args.intern is None and "intern" in toml_defaults:
        args.intern = list(toml_defaults["intern"])

    if getattr(args, "auto_compact_every", None) and not args.state:
        print(
            "--auto-compact-every requires --state (there is no checkpoint "
            "to compact without one)",
            file=sys.stderr,
        )
        return 2

    spark = get_spark(cores=args.cores)
    world = load_world(spark, args.world)
    missing = {"pages", "links", "robots", "seeds"} - set(world)
    if missing:
        print(f"world dir missing tables: {sorted(missing)}", file=sys.stderr)
        return 2

    if args.cmd == "mine" and args.host:
        world["pages"] = world["pages"].filter(world["pages"].host == args.host)
        world["seeds"] = world["seeds"].filter(
            world["seeds"].url.contains(args.host)
        )

    over = {}
    if args.cmd == "search":
        over["max_rounds"] = 0  # seed expansion only: commit the frontier, no fetch
    if args.cmd == "mine":
        over["max_rounds"] = 1  # single round (§3.2)

    iface_names = list(dict.fromkeys(args.intern or []))  # order-stable dedupe
    if args.intern_si and "si" not in iface_names:
        iface_names.append("si")
    if iface_names and "corpus" not in world:
        print("--intern requires a corpus table (payload captions)", file=sys.stderr)
        return 2
    res = crawl(
        spark,
        world,
        _cfg(args, **over),
        state_dir=args.state,
        resume=getattr(args, "resume", False),
        seen_prefilter=BloomSeenFilter(spark) if args.bloom else None,
        # interfaces extract from payload captions -> payload implied
        with_payload=(args.payload or bool(iface_names)) and "corpus" in world,
        interfaces=[ALL_INTERFACES[n]() for n in iface_names] or None,
        collect_outputs=False,
        auto_compact_every=getattr(args, "auto_compact_every", None),
    )
    summary = {
        "cmd": args.cmd,
        "rounds": res.rounds,
        "wall_s": round(res.wall_s, 2),
        "lineage_tail": res.lineage.tail(1).to_dict("records"),
        "total_fetched": int(res.lineage["n_fetched"].sum()) if len(res.lineage) else 0,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
