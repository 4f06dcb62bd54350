"""One crawl round as pure DataFrame ops (the SURVEY.md §7 minimum slice).

Implements EXACTLY the spec in ``crawler_spark/oracle.py`` (authoritative):
snapshot -> dedup(seen) -> robots -> priority top-k page -> politeness
budgets -> fetch (bounded retry) -> parse/enqueue -> commit. Reference
lifecycle: `crawler/src/runner/run.rs:57-203`, `search.rs:62-141`.

Scale notes (100 TB / 10^10-frontier design):
 * The global page top-k uses ``orderBy(...).limit(k)`` which Spark plans as
   TakeOrderedAndProject — per-partition partial top-k + driver merge of
   k-sized heaps; no full sort, no single-partition shuffle.
 * The seen anti-join is the only frontier-sized shuffle per round; with the
   Bloom pre-filter (seen_filter.py) only the maybe-seen fraction shuffles.
 * Everything downstream of the top-k operates on <= page_size rows and is
   broadcast back against the frontier (no second frontier shuffle).
 * Politeness is deferral-based (no sleeps): rows over a host's budget stay
   in the frontier — vectorized analog of `search.rs:170-190`.
 * Robots rules are a broadcast join (small dim side).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..oracle import LINEAGE_COLS, CrawlConfig
from . import canon

FRONTIER_COLS = ["url_id", "url", "host", "host_bucket", "priority", "depth", "discovered_round", "tries_left"]


@dataclass
class World:
    """Static crawl-world tables, canonicalized + id-stamped once at start."""

    pages: DataFrame   # url_id, url, host, host_bucket, priority, image_id, ok
    links: DataFrame   # src_url_id, href_kind, dst_url_id (null = dangling),
                       # dst_url, dst_host, dst_host_bucket, dst_priority
    robots: DataFrame  # host, disallow_prefixes, budget
    corpus: DataFrame | None = None  # image_id, bytes, w, h, fmt, caption, phash
    host_ranks: DataFrame | None = None  # host, rank_scaled (cfg.rank_alpha > 0)


def prepare_world(spark: SparkSession, raw: dict[str, DataFrame], cfg: CrawlConfig) -> World:
    """Canonicalize urls, stamp xxhash64 ids and host buckets, resolve the
    static link graph once (X1/J3 analog), precompute politeness budgets."""
    pages = (
        raw["pages"]
        .withColumn("url", canon.canon_url(F.col("url")))
        .withColumn("url_id", F.xxhash64("url"))
        .withColumn("host_bucket", canon.host_bucket(F.col("host"), cfg.n_buckets))
        .select("url_id", "url", "host", "host_bucket", "priority", "image_id", "ok")
    )
    # budget = page_size if delay<=0 else max(1, round_ms // delay)
    robots = raw["robots"].withColumn(
        "budget",
        F.when(F.col("crawl_delay_ms") <= 0, F.lit(cfg.page_size)).otherwise(
            F.greatest(F.lit(1), (F.lit(cfg.round_ms) / F.col("crawl_delay_ms")).cast("long"))
        ),
    )
    links = (
        raw["links"]
        .withColumn("src_url_id", canon.url_id(F.col("src_url")))
        .withColumn("dst_canon", canon.canon_url(F.col("href")))
        .withColumn("dst_url_id_raw", F.xxhash64("dst_canon"))
        .join(
            pages.select(
                F.col("url_id").alias("dst_url_id"),
                F.col("url").alias("dst_url"),
                F.col("host").alias("dst_host"),
                F.col("host_bucket").alias("dst_host_bucket"),
                F.col("priority").alias("dst_priority"),
            ),
            F.col("dst_url_id_raw") == F.col("dst_url_id"),
            "left",
        )
        .select("src_url_id", "href_kind", "dst_url_id", "dst_url", "dst_host", "dst_host_bucket", "dst_priority")
    )
    corpus = raw.get("corpus")
    host_ranks = None
    if cfg.rank_alpha:
        # integer host-authority rank over the static link graph, computed
        # ONCE per crawl (checkpoint-truncated iterations inside host_rank);
        # the table is host-cardinality — the broadcast side at any scale
        from ..operators.graph import host_rank

        host_ranks = host_rank(
            raw["links"], n_iter=cfg.rank_iters, pages=raw["pages"]
        ).select("host", "rank_scaled")
    return World(
        pages=pages, links=links, robots=robots, corpus=corpus, host_ranks=host_ranks
    )


def seeds_frontier(spark: SparkSession, raw_seeds: DataFrame, world: World, cfg: CrawlConfig) -> DataFrame:
    """Initial frontier = seeds resolved against pages (dangling seeds drop)."""
    ids = raw_seeds.select(canon.url_id(F.col("url")).alias("url_id")).distinct()
    return (
        ids.join(world.pages, "url_id")
        .select(
            "url_id", "url", "host", "host_bucket", "priority",
            F.lit(0).alias("depth"),
            F.lit(0).alias("discovered_round"),
            F.lit(cfg.tries).alias("tries_left"),
        )
    )


@dataclass
class RoundResult:
    frontier: DataFrame    # next round's frontier
    seen_delta: DataFrame  # url_id, status, round, host_bucket
    trace: DataFrame       # round, seq, url_id
    fetched: DataFrame     # round, url_id, url, image_id
    counts: DataFrame      # ONE-row cross-joined lineage aggregates (lazy —
                           # the crawl loop collects it together with the
                           # next-frontier count in a single job)
    round_no: int
    _cached: list = None   # persisted intermediates; unpersist after commit

    def release(self) -> None:
        for df in self._cached or []:
            df.unpersist()
        self._cached = []

    def lineage_from(self, row, n_next: int) -> dict:
        """Populate the round's lineage from the collected counts row; the
        last two fields come from flow conservation on n_next (no extra
        jobs): next = eligible - dedup - denied - fetched - exhausted
        + discovered."""
        ln = dict.fromkeys(LINEAGE_COLS, 0)
        ln["round"] = self.round_no
        ln["n_eligible"] = row["n_eligible"] or 0
        ln["n_dedup"] = row["n_dedup"] or 0
        ln["n_denied"] = row["n_denied"] or 0
        ln["n_deferred"] = row["n_deferred"] or 0
        ln["n_attempts"] = (row["n_cand"] or 0) - ln["n_deferred"]
        ln["n_fetched"] = row["n_fetched"] or 0
        ln["n_retry"] = row["n_retry"] or 0
        ln["n_exhausted"] = row["n_exhausted"] or 0
        ln["n_system"] = row["n_system"] or 0
        ln["n_dangling"] = row["n_dangling"] or 0
        ln["n_depth_capped"] = row["n_depth_capped"] or 0
        n_distinct = int(row["n_distinct"] or 0)
        ln["n_dup_in_round"] = int(row["n_valid"] or 0) - n_distinct
        ln["n_discovered"] = n_next - (
            ln["n_eligible"] - ln["n_dedup"] - ln["n_denied"] - ln["n_fetched"] - ln["n_exhausted"]
        )
        ln["n_dup_known"] = n_distinct - ln["n_discovered"]
        return ln


def run_round(
    spark: SparkSession,
    frontier: DataFrame,
    seen_ids: DataFrame,
    world: World,
    cfg: CrawlConfig,
    round_no: int,
    seen_prefilter=None,
) -> RoundResult:
    # -- 2+3: dedup vs seen (J1 anti-join semantics, run.rs:74-89) and robots
    # denial, computed in one annotated pass so lineage needs ONE aggregate.
    # seen joins use (url_id, host_bucket) keys: the bucket is functionally
    # dependent on url_id (identical result), but state stored partitioned
    # by host_bucket then satisfies the join's clustering requirement with
    # no exchange — the partitioning-reuse design the probe shares.
    seen_keyed = seen_ids.select("url_id", "host_bucket").withColumn("_seen", F.lit(True))
    if seen_prefilter is not None:
        # Bloom pre-split: definitely-new rows skip the exact anti-join.
        maybe, definitely_new = seen_prefilter.split(frontier)
        checked = maybe.join(seen_keyed, ["url_id", "host_bucket"], "left")
        marked = checked.unionByName(definitely_new.withColumn("_seen", F.lit(None).cast("boolean")))
    else:
        marked = frontier.join(seen_keyed, ["url_id", "host_bucket"], "left")
    marked = (
        marked.join(F.broadcast(world.robots.select("host", "disallow_prefixes", "budget")), "host", "left")
        .withColumn(
            "_denied",
            F.coalesce(
                F.exists(
                    F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
                    lambda p: canon.path_of(F.col("url")).startswith(p),
                ),
                F.lit(False),
            ),
        )
    ).persist()

    counts_m = marked.agg(
        F.count("*").alias("n_eligible"),
        F.sum(F.when(F.col("_seen"), 1).otherwise(0)).alias("n_dedup"),
        F.sum(F.when(F.col("_seen").isNull() & F.col("_denied"), 1).otherwise(0)).alias("n_denied"),
    )

    alive = marked.filter(F.col("_seen").isNull() & ~F.col("_denied"))
    denied_delta = (
        marked.filter(F.col("_seen").isNull() & F.col("_denied"))
        .select("url_id", "host_bucket")
        .withColumn("status", F.lit("denied"))
        .withColumn("round", F.lit(round_no))
    )

    # -- 4: global priority page (TakeOrderedAndProject — scalable top-k; O1)
    candidates = (
        alive.select("url_id", "url", "host", "host_bucket", "priority", "depth", "tries_left", "budget")
        .orderBy(F.desc("priority"), F.asc("url_id"))
        .limit(cfg.page_size)
    )

    # -- 5+6: politeness budgets per host (P6, deferral not sleep) and fetch
    # outcomes in ONE annotated pass over the <= page_size candidate rows, so
    # all candidate/attempt lineage needs a single aggregate.
    # window spec leads with host_bucket (host determines its bucket, so the
    # grouping is identical) — an upstream host_bucket partitioning then
    # satisfies the window's clustering requirement without an exchange
    w_host = Window.partitionBy("host_bucket", "host").orderBy(
        F.desc("priority"), F.asc("url_id")
    )
    cand = candidates.withColumn("_budget", F.coalesce(F.col("budget"), F.lit(cfg.page_size)))
    if cfg.n_salt > 1:
        # hot-host skew: two-phase salted ranking (engine/skew.py) — a row
        # beyond its salt-slice budget is beyond the host budget a fortiori,
        # so phase 2's exact window sees <= n_salt * budget rows per host
        w_salt = Window.partitionBy("host_bucket", "host", "_salt").orderBy(
            F.desc("priority"), F.asc("url_id")
        )
        s1 = cand.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("url_id")), F.lit(cfg.n_salt))
        ).withColumn("_srank", F.row_number().over(w_salt))
        surv = (
            s1.filter(F.col("_srank") <= F.col("_budget"))
            .withColumn("_hrank", F.row_number().over(w_host))
        )
        early_deferred = s1.filter(F.col("_srank") > F.col("_budget")).withColumn(
            "_hrank", F.lit(None).cast("int")
        )
        cand = surv.unionByName(early_deferred).drop("_salt", "_srank")
        over_budget = F.col("_hrank").isNull() | (F.col("_hrank") > F.col("_budget"))
    else:
        cand = cand.withColumn("_hrank", F.row_number().over(w_host))
        over_budget = F.col("_hrank") > F.col("_budget")
    att = (
        cand.join(world.pages.select("url_id", "ok", "image_id"), "url_id")
        .withColumn(
            "disp",
            F.when(over_budget, F.lit("deferred"))
            .when(F.col("ok"), F.lit("fetched"))
            .when(F.col("tries_left") > 1, F.lit("retry"))
            .otherwise(F.lit("exhausted")),
        )
        .persist()
    )
    counts_a = att.agg(
        F.count("*").alias("n_cand"),
        F.sum(F.when(F.col("disp") == "deferred", 1).otherwise(0)).alias("n_deferred"),
        F.sum(F.when(F.col("disp") == "fetched", 1).otherwise(0)).alias("n_fetched"),
        F.sum(F.when(F.col("disp") == "retry", 1).otherwise(0)).alias("n_retry"),
        F.sum(F.when(F.col("disp") == "exhausted", 1).otherwise(0)).alias("n_exhausted"),
    )

    # Global (partition-less) window — SAFE BY CONSTRUCTION: its input is
    # `att`, already capped at cfg.page_size rows by the top-k page, so the
    # single-partition WindowExec the warning flags holds <= one page, never
    # the frontier. The global seq is the reference's strict total attempt
    # order (parity-tested); don't "fix" the warning by partitioning it.
    w_all = Window.orderBy(F.desc("priority"), F.asc("url_id"))
    attempts = att.filter(F.col("disp") != "deferred").withColumn(
        "seq", F.row_number().over(w_all)
    )
    trace = attempts.select(F.lit(round_no).alias("round"), "seq", "url_id")
    fetched = attempts.filter(F.col("disp") == "fetched").select(
        F.lit(round_no).alias("round"), "url_id", "url", "image_id"
    )

    # -- 7: parse + enqueue (X1 link extraction -> J2 discovery dedup).
    # ONE aggregate covers all parse lineage (system/dangling/depth-capped/
    # dup-in-round via count vs countDistinct of valid targets). The parent
    # rows carry (seq, depth) so discoveries inherit depth parent+1 from
    # their first non-capped parent in attempt order — exactly the oracle's
    # iteration order.
    fetched_ids = attempts.filter(F.col("disp") == "fetched").select(
        F.col("url_id").alias("src_url_id"),
        F.col("seq").alias("_pseq"),
        F.col("depth").alias("_pdepth"),
    )
    hrefs = world.links.join(F.broadcast(fetched_ids), "src_url_id")
    not_system = (F.col("href_kind") != "system") & F.col("dst_url_id").isNotNull()
    depth_ok = (
        F.lit(True) if cfg.max_depth is None
        else (F.col("_pdepth") + 1 <= F.lit(cfg.max_depth))
    )
    is_valid = not_system & depth_ok
    counts_p = hrefs.agg(
        F.sum(F.when(F.col("href_kind") == "system", 1).otherwise(0)).alias("n_system"),
        F.sum(
            F.when((F.col("href_kind") != "system") & F.col("dst_url_id").isNull(), 1).otherwise(0)
        ).alias("n_dangling"),
        F.sum(F.when(not_system & ~depth_ok, 1).otherwise(0)).alias("n_depth_capped"),
        F.sum(F.when(is_valid, 1).otherwise(0)).alias("n_valid"),
        F.countDistinct(F.when(is_valid, F.col("dst_url_id"))).alias("n_distinct"),
    )

    # ONE lazy one-row DataFrame for ALL lineage counters (cross-join of
    # three one-row aggs). The crawl loop collects it AFTER the round commit
    # — by then marked/att are cached (persist materialized by the commit's
    # checkpoint job), so the collect is one cheap job that also carries the
    # next-frontier count. Per-round job count is the scalability lever of
    # the driver loop.
    counts = counts_m.crossJoin(counts_a).crossJoin(counts_p)

    valid = hrefs.filter(is_valid)
    # min_by on the parent's attempt seq makes determinism EXPLICIT (dst
    # attributes are functionally dependent on dst_url_id, but depth is not
    # — it comes from the first non-capped parent in attempt order)
    distinct_new = (
        valid.groupBy("dst_url_id")
        .agg(
            F.min_by("dst_url", "_pseq").alias("url"),
            F.min_by("dst_host", "_pseq").alias("host"),
            F.min_by("dst_host_bucket", "_pseq").alias("host_bucket"),
            F.min_by("dst_priority", "_pseq").alias("priority"),
            (F.min_by("_pdepth", "_pseq") + 1).alias("depth"),
        )
        .withColumnRenamed("dst_url_id", "url_id")
    )

    if cfg.rank_alpha and world.host_ranks is not None:
        # authority mix on ENQUEUE (oracle step 7): one broadcast join of
        # the host-cardinality rank table + one per-row float expression —
        # exactly `priority + (alpha * rank_scaled) / 2^30` in the same op
        # order as the oracle, so the mixed double is bit-identical
        from ..operators.graph import RANK_SCALE

        distinct_new = (
            distinct_new.join(F.broadcast(world.host_ranks), "host", "left")
            .withColumn(
                "priority",
                F.col("priority")
                + (F.lit(cfg.rank_alpha) * F.coalesce(F.col("rank_scaled"), F.lit(0)))
                / F.lit(RANK_SCALE),
            )
            .drop("rank_scaled")
        )

    # known = already in seen, or surviving in the frontier (incl. this
    # round's retries/deferrals), or terminal this round. SCALE: instead of
    # anti-joining the small discovery set against the huge seen/frontier
    # tables (a full shuffle of the big side), broadcast the small side and
    # take the intersection ("hits"), then broadcast-anti-join the hits back.
    # Zero shuffle of seen/frontier on the discovery path.
    # 10^10-seen pruning: the seen side joins on (url_id, host_bucket) —
    # host_bucket is functionally dependent on url_id, so the hit set is
    # identical — and StateStore writes seen deltas PARTITIONED by
    # host_bucket, so dynamic partition pruning narrows the scan to the
    # buckets present in the (small, broadcast) discovery set; only those
    # directories are read (plan-asserted in tests/test_plans.py). A Bloom
    # pre-probe cannot help here: the bitsets answer "maybe seen", but the
    # scan cost is the read itself, which only pruning removes.
    terminal_ids = att.filter(F.col("disp").isin("fetched", "exhausted")).select("url_id")
    survivors = alive.select("url_id").join(F.broadcast(terminal_ids), "url_id", "left_anti")
    hits_seen = seen_ids.select("url_id", "host_bucket").join(
        F.broadcast(distinct_new.select("url_id", "host_bucket")),
        ["url_id", "host_bucket"],
        "inner",
    ).select("url_id")
    rest = survivors.unionByName(denied_delta.select("url_id")).unionByName(terminal_ids)
    hits_rest = rest.join(F.broadcast(distinct_new.select("url_id")), "url_id", "inner")
    hits = hits_seen.unionByName(hits_rest).select("url_id").distinct()
    enqueue = distinct_new.join(F.broadcast(hits), "url_id", "left_anti").select(
        "url_id", "url", "host", "host_bucket", "priority", "depth",
        F.lit(round_no).alias("discovered_round"),
        F.lit(cfg.tries).alias("tries_left"),
    )
    # n_discovered / n_dup_known are NOT counted here — the crawl loop
    # derives them from the next-frontier count (folded into the same
    # collect as `counts`) via flow conservation, saving two jobs per round.

    # -- 8: commit — next frontier; retry rows decrement tries (A3)
    delta = att.select("url_id", "disp")
    next_frontier = (
        alive.select(*FRONTIER_COLS)
        .join(F.broadcast(delta), "url_id", "left")
        .withColumn(
            "tries_left",
            F.when(F.col("disp") == "retry", F.col("tries_left") - 1).otherwise(F.col("tries_left")),
        )
        .filter(F.col("disp").isNull() | F.col("disp").isin("retry", "deferred"))
        .drop("disp")
        .unionByName(enqueue)
    )

    seen_delta = (
        att.filter(F.col("disp").isin("fetched", "exhausted"))
        .select(
            "url_id",
            "host_bucket",
            F.col("disp").alias("status"),
            F.lit(round_no).alias("round"),
        )
        .unionByName(denied_delta.select("url_id", "host_bucket", "status", "round"))
    )

    # caches stay alive until the caller materializes outputs (crawl.py)
    return RoundResult(
        frontier=next_frontier,
        seen_delta=seen_delta,
        trace=trace,
        fetched=fetched,
        counts=counts,
        round_no=round_no,
        _cached=[marked, att],
    )
