"""Pure-Python single-threaded reference simulator of the crawl semantics.

This is the golden oracle (SURVEY.md §5.2): a faithful, obviously-correct
re-statement of the reference crawler's fetch->parse->enqueue loop
(`crawler/src/runner/run.rs:57-71`, `search.rs:62-95`) against which the
Spark engine's per-round fetch order, seen-set, and lineage are asserted
EXACTLY, at multiple parallelism levels.

ROUND SEMANTICS (authoritative spec — engine/round.py implements the same):

Given world tables pages/links/robots/seeds (datagen.py) and config
(page_size, tries, round_ms), with url_id = xxhash64(canonical_url) and
canonical ids throughout:

  round r = 1, 2, ... while frontier non-empty and r <= max_rounds:
  1. SNAPSHOT  eligible := all frontier rows (snapshot-at-start, run.rs:32-33)
  2. DEDUP     drop rows whose url_id is in seen -> n_dedup (terminal)
  3. ROBOTS    drop rows whose url path starts with any disallow prefix of its
               host -> n_denied; denied ids enter seen with status 'denied'
  4. TOP-K     candidates := top page_size rows by (priority DESC, url_id ASC)
               (the star-descending page, search.rs:208-218 + PAGE_SIZE)
  5. POLITENESS per host budget := page_size if crawl_delay_ms <= 0
               else max(1, round_ms // crawl_delay_ms); within candidates each
               host keeps its budget-first rows by (priority DESC, url_id ASC);
               the rest are DEFERRED (stay in frontier, tries unchanged)
               -> n_deferred  (vectorized analog of search.rs:170-190)
  6. FETCH     attempts := kept rows, ordered by (priority DESC, url_id ASC);
               trace (round, seq, url_id) for seq = 1..len(attempts).
               pages.ok=true  -> FETCHED: enters seen ('fetched'), n_fetched
               pages.ok=false -> tries_left -= 1; if > 0 stays in frontier
               (n_retry) else enters seen ('exhausted'), n_exhausted
               (bounded retry, miner/compile.rs:56-103)
  7. PARSE     hrefs of links whose src_url was fetched this round:
               kind='system' -> dropped, n_system (compile.rs:129-132)
               canonicalize href; not a pages url -> n_dangling, dropped;
               if cfg.max_depth is set and parent_depth + 1 > max_depth ->
               n_depth_capped, dropped (checked BEFORE the dup checks);
               distinct by url_id within the round (extra copies of any id ->
               n_dup_in_round); distinct ids already in seen or in the
               post-fetch frontier -> n_dup_known; rest ENQUEUED with pages priority, depth parent+1,
               tries_left = cfg.tries -> n_discovered  (search.rs:113-141).
               With cfg.rank_alpha > 0 the enqueued priority is
               priority + (rank_alpha * rank_scaled(host)) / 2^30, where
               rank_scaled is the integer host-authority rank over the
               static link graph (operators/graph.py; seeds are unmixed)
  8. COMMIT    frontier := frontier - terminal(fetched|exhausted|denied|dedup)
               with decremented tries on retries, plus discoveries; lineage
               row appended; state is checkpointable between rounds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from .ids import canonicalize_url, url_host, url_id, url_path

LINEAGE_COLS = [
    "round", "n_eligible", "n_dedup", "n_denied", "n_deferred", "n_attempts",
    "n_fetched", "n_retry", "n_exhausted", "n_system", "n_dangling",
    "n_depth_capped", "n_dup_in_round", "n_dup_known", "n_discovered",
]


@dataclass
class CrawlConfig:
    page_size: int = 100
    tries: int = 3
    round_ms: int = 1000
    max_rounds: int = 1000
    n_buckets: int = 32  # host-hash partition count (engine side)
    n_salt: int = 1  # >1: two-phase salted politeness window (engine-only
    #                  skew knob — result-identical, oracle ignores it)
    max_depth: int | None = None  # link-depth cap: discoveries deeper than
    #                  this are dropped at parse time (n_depth_capped)
    rank_alpha: int = 0  # >0: mix host authority into the priority of every
    #                  ENQUEUED discovery: priority' = priority +
    #                  (rank_alpha * rank_scaled(host)) / 2^30 — the
    #                  reference's star-count priority (search.rs:208-218)
    #                  upgraded with the crawl's own link graph
    #                  (operators/graph.py host_rank). Integer rank, one
    #                  float mix per row — deterministic across engines and
    #                  partitionings. Seeds keep their page priority.
    rank_iters: int = 5  # damped PageRank iterations for the rank table

    def host_budget(self, crawl_delay_ms: int) -> int:
        if crawl_delay_ms is None or crawl_delay_ms <= 0:
            return self.page_size
        return max(1, self.round_ms // int(crawl_delay_ms))


@dataclass
class OracleResult:
    trace: pd.DataFrame      # (round, seq, url_id)
    seen: pd.DataFrame       # (url_id, status, round)
    lineage: pd.DataFrame    # LINEAGE_COLS
    fetched: pd.DataFrame    # (round, url_id, url, image_id)
    rounds: int = 0
    extras: dict = field(default_factory=dict)


def simulate(world: dict[str, pd.DataFrame], cfg: CrawlConfig) -> OracleResult:
    pages = world["pages"]
    by_url = {}
    for row in pages.itertuples(index=False):
        cu = canonicalize_url(row.url)
        by_url[cu] = (float(row.priority), row.host, row.image_id, bool(row.ok))
    id_of = {cu: url_id(cu) for cu in by_url}

    robots = {
        r.host: (list(r.disallow_prefixes), int(r.crawl_delay_ms))
        for r in world["robots"].itertuples(index=False)
    }
    out_links: dict[str, list[tuple[str, str]]] = {}
    for row in world["links"].itertuples(index=False):
        out_links.setdefault(canonicalize_url(row.src_url), []).append(
            (row.href, row.href_kind)
        )

    # host-authority priority mix (rank_alpha > 0): the same edge derivation
    # as operators/graph.host_edges (system hrefs dropped, self-host loops
    # removed, dangling destination hosts excluded) feeding the identical
    # integer recurrence (host_rank_py)
    host_ranks: dict[str, int] = {}
    if cfg.rank_alpha:
        # crawler_spark.rank is Spark-free (operators.graph is NOT — it
        # imports pyspark at module level), keeping this oracle replayable
        # without a Spark install even with the rank mix on
        from .rank import RANK_SCALE, host_rank_py

        page_hosts = {url_host(cu) for cu in by_url}
        edges = set()
        for row in world["links"].itertuples(index=False):
            if row.href_kind == "system":
                continue
            s = url_host(canonicalize_url(row.src_url))
            d = url_host(canonicalize_url(row.href))
            if s != d and d in page_hosts:
                edges.add((s, d))
        host_ranks = host_rank_py(edges, cfg.rank_iters)

    # frontier: url_id -> [url, host, priority, depth, tries_left]
    frontier: dict[int, list] = {}
    for u in world["seeds"]["url"]:
        cu = canonicalize_url(u)
        if cu in by_url:
            pr, host, _, _ = by_url[cu]
            frontier[id_of[cu]] = [cu, host, pr, 0, cfg.tries]
    seen: dict[int, tuple[str, int]] = {}  # url_id -> (status, round)

    trace_rows, lineage_rows, fetched_rows = [], [], []
    r = 0
    while frontier and r < cfg.max_rounds:
        r += 1
        ln = dict.fromkeys(LINEAGE_COLS, 0)
        ln["round"] = r
        ln["n_eligible"] = len(frontier)

        # 2. dedup vs seen (defensive; enqueue already filters)
        for uid in [u for u in frontier if u in seen]:
            del frontier[uid]
            ln["n_dedup"] += 1

        # 3. robots
        denied = []
        for uid, (u, host, _, _, _) in frontier.items():
            prefixes, _ = robots.get(host, ([], 0))
            p = url_path(u)
            if any(p.startswith(x) for x in prefixes):
                denied.append(uid)
        for uid in denied:
            del frontier[uid]
            seen[uid] = ("denied", r)
            ln["n_denied"] += 1

        # 4. global priority top-k page
        order = sorted(frontier.items(), key=lambda kv: (-kv[1][2], kv[0]))
        candidates = order[: cfg.page_size]

        # 5. politeness budgets
        taken: dict[str, int] = {}
        attempts, deferred = [], 0
        for uid, row in candidates:
            host = row[1]
            budget = cfg.host_budget(robots.get(host, ([], 0))[1])
            if taken.get(host, 0) < budget:
                taken[host] = taken.get(host, 0) + 1
                attempts.append((uid, row))
            else:
                deferred += 1
        ln["n_deferred"] = deferred
        ln["n_attempts"] = len(attempts)

        # 6. fetch
        fetched_urls = []
        for seq, (uid, row) in enumerate(attempts, start=1):
            trace_rows.append((r, seq, uid))
            u = row[0]
            _, _, image_id, ok = by_url[u]
            if ok:
                del frontier[uid]
                seen[uid] = ("fetched", r)
                fetched_rows.append((r, uid, u, image_id))
                fetched_urls.append((u, row[3]))  # (url, depth of the page)
                ln["n_fetched"] += 1
            else:
                row[4] -= 1
                if row[4] > 0:
                    ln["n_retry"] += 1
                else:
                    del frontier[uid]
                    seen[uid] = ("exhausted", r)
                    ln["n_exhausted"] += 1

        # 7. parse + enqueue (depth = parent's depth + 1; the first
        # non-capped parent in attempt order assigns it)
        seen_this_round: set[int] = set()
        for u, depth in fetched_urls:
            for href, kind in out_links.get(u, []):
                if kind == "system":
                    ln["n_system"] += 1
                    continue
                cu = canonicalize_url(href)
                if cu not in by_url:
                    ln["n_dangling"] += 1
                    continue
                if cfg.max_depth is not None and depth + 1 > cfg.max_depth:
                    ln["n_depth_capped"] += 1
                    continue
                uid = id_of[cu]
                if uid in seen_this_round:
                    ln["n_dup_in_round"] += 1
                    continue
                seen_this_round.add(uid)
                if uid in seen or uid in frontier:
                    ln["n_dup_known"] += 1
                    continue
                pr, host, _, _ = by_url[cu]
                if cfg.rank_alpha:
                    # one float mix per row, same op order as the engine:
                    # int*int exact, correctly-rounded division, one add
                    pr = pr + (cfg.rank_alpha * host_ranks.get(host, 0)) / RANK_SCALE
                frontier[uid] = [cu, host, pr, depth + 1, cfg.tries]
                ln["n_discovered"] += 1

        lineage_rows.append(ln)

    return OracleResult(
        trace=pd.DataFrame(trace_rows, columns=["round", "seq", "url_id"]),
        seen=pd.DataFrame(
            [(u, s, rr) for u, (s, rr) in sorted(seen.items())],
            columns=["url_id", "status", "round"],
        ),
        lineage=pd.DataFrame(lineage_rows, columns=LINEAGE_COLS),
        fetched=pd.DataFrame(fetched_rows, columns=["round", "url_id", "url", "image_id"]),
        rounds=r,
    )
