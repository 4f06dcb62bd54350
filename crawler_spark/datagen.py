"""Deterministic synthetic crawl-world generator (seed-driven, no wall clock).

Produces the tables in FIXTURES.md §1-2 as pandas DataFrames (written to
parquet with pyarrow so the pure-Python oracle and the Spark engine read the
exact same bytes):

  pages(url, host, priority, image_id, ok)       — what a URL resolves to
  links(src_url, href, href_kind)                — the link graph (X1 analog)
  robots(host, disallow_prefixes, crawl_delay_ms)— politeness (P6 analog)
  seeds(url)                                     — initial frontier
  corpus(image_id, bytes, w, h, fmt, caption, phash) — payload (input_hint)

World shape mirrors the reference's adversarial fixtures
(`crawler/tests/{chain,many,many-system}`): ~5% of pages fail fetch
(ok=false -> bounded retry, `miner/compile.rs:56-103`), `system`-kind hrefs
must not be enqueued (`miner/compile.rs:129-132`), hrefs carry fragments /
trailing slashes to exercise canonicalization, some hrefs dangle, one hot
host has ~50x the median page count (skew), and some hosts have robots
disallow prefixes + crawl delays (deferral).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from . import codec


def make_world(
    n_urls: int = 2000,
    n_hosts: int = 20,
    n_images: int = 200,
    seed: int = 42,
    img_side: int = 16,
    seed_frac: float = 0.05,
    fail_frac: float = 0.05,
    out_degree: float = 3.0,
    with_corpus: bool = True,
) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)

    # --- hosts: host 0 is hot (~50x weight) to exercise salt-on-skew
    weights = np.ones(n_hosts)
    weights[0] = 50.0
    weights /= weights.sum()
    host_of = rng.choice(n_hosts, size=n_urls, p=weights)
    hosts = np.array([f"host{i}.example" for i in range(n_hosts)])

    # --- pages: ~8% live under /private (robots-denied on odd hosts)
    private = rng.random(n_urls) < 0.08
    page_no = np.arange(n_urls)
    urls = np.where(
        private,
        [f"http://{hosts[h]}/private/p{k}" for h, k in zip(host_of, page_no)],
        [f"http://{hosts[h]}/page/p{k}" for h, k in zip(host_of, page_no)],
    )
    pages = pd.DataFrame(
        {
            "url": urls,
            "host": hosts[host_of],
            "priority": np.round(rng.random(n_urls) * 1000.0, 6),
            "image_id": [f"img{k % n_images}" for k in page_no],
            "ok": rng.random(n_urls) >= fail_frac,
        }
    )

    # --- links: Poisson out-degree; mostly real targets, plus canonicalization
    # noise (#fragment / trailing slash), system-kind hrefs, dangling hrefs
    deg = rng.poisson(out_degree, size=n_urls)
    src_idx = np.repeat(np.arange(n_urls), deg)
    n_links = len(src_idx)
    dst_idx = rng.integers(0, n_urls, size=n_links)
    noise = rng.random(n_links)
    hrefs = urls[dst_idx].astype(object)
    hrefs = np.where(noise < 0.10, hrefs + "#frag" + dst_idx.astype(str), hrefs)
    hrefs = np.where((noise >= 0.10) & (noise < 0.15), hrefs + "/", hrefs)
    hrefs = np.where(
        (noise >= 0.15) & (noise < 0.20),
        np.array([f"http://dangling.example/missing/{i}" for i in range(n_links)], dtype=object),
        hrefs,
    )
    kind = np.where(rng.random(n_links) < 0.10, "system", "user")
    links = pd.DataFrame({"src_url": urls[src_idx], "href": hrefs, "href_kind": kind})

    # --- robots: odd hosts disallow /private; delays cycle 0/250/500 ms
    robots = pd.DataFrame(
        {
            "host": hosts,
            "disallow_prefixes": [["/private"] if i % 2 == 1 else [] for i in range(n_hosts)],
            "crawl_delay_ms": [(i % 3) * 250 for i in range(n_hosts)],
        }
    )

    # --- seeds: deterministic sample of pages
    n_seeds = max(2, int(n_urls * seed_frac))
    seed_idx = rng.choice(n_urls, size=n_seeds, replace=False)
    seeds = pd.DataFrame({"url": np.sort(urls[seed_idx])})

    out = {"pages": pages, "links": links, "robots": robots, "seeds": seeds}
    if with_corpus:
        out["corpus"] = make_corpus(n_images, seed=seed, img_side=img_side)
    return out


def make_corpus(n_images: int, seed: int = 42, img_side: int = 16) -> pd.DataFrame:
    """Image+caption corpus per BASELINE.json input_hint schema."""
    rows = []
    for k in range(n_images):
        r = np.random.default_rng(seed * 1_000_003 + k)
        px = r.integers(0, 256, size=(img_side, img_side, 3), dtype=np.uint8)
        fmt = "jpg" if k % 2 else "png"
        rows.append(
            {
                "image_id": f"img{k}",
                "bytes": codec.encode(px, fmt),
                "w": np.int32(img_side),
                "h": np.int32(img_side),
                "fmt": fmt,
                "caption": f"caption for image {k}: {'lorem ipsum ' * (k % 4 + 1)}".strip(),
                "phash": codec.phash64(px if fmt == "png" else codec.decode(codec.encode(px, fmt))[0]),
            }
        )
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    return df


WORLD_SCHEMAS = {
    "pages": "url string, host string, priority double, image_id string, ok boolean",
    "links": "src_url string, href string, href_kind string",
    "robots": "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    "seeds": "url string",
    "corpus": "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
}


def to_spark(spark, world: dict[str, pd.DataFrame]) -> dict:
    """Convert a pandas world to Spark DataFrames with explicit schemas."""
    return {
        name: spark.createDataFrame(pdf, schema=WORLD_SCHEMAS[name])
        for name, pdf in world.items()
    }


def write_world(world: dict[str, pd.DataFrame], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, df in world.items():
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)


# --- hand-built adversarial mini-worlds (FIXTURES.md §3) -------------------

def _mini(pages_rows, links_rows, robots_rows, seed_urls):
    return {
        "pages": pd.DataFrame(pages_rows, columns=["url", "host", "priority", "image_id", "ok"]),
        "links": pd.DataFrame(links_rows, columns=["src_url", "href", "href_kind"]),
        "robots": pd.DataFrame(robots_rows, columns=["host", "disallow_prefixes", "crawl_delay_ms"]),
        "seeds": pd.DataFrame({"url": seed_urls}),
    }


def world_chain() -> dict[str, pd.DataFrame]:
    """A -> B -> C transitive enqueue (crawler/tests/chain)."""
    h = "chain.example"
    return _mini(
        [(f"http://{h}/{p}", h, pr, "img0", True) for p, pr in [("a", 3.0), ("b", 2.0), ("c", 1.0)]],
        [(f"http://{h}/a", f"http://{h}/b", "user"), (f"http://{h}/b", f"http://{h}/c", "user")],
        [(h, [], 0)],
        [f"http://{h}/a"],
    )


def world_many() -> dict[str, pd.DataFrame]:
    """Ambiguity + bounded retry: one seed links to a page that fails fetch
    (ok=false, like the garbage header crawler/tests/many/a/main.h:6) and to a
    good twin; the failing page burns its retry budget then is exhausted."""
    h = "many.example"
    return _mini(
        [
            (f"http://{h}/main", h, 9.0, "img0", True),
            (f"http://{h}/a/alt", h, 5.0, "img0", False),  # always fails
            (f"http://{h}/b/alt", h, 4.0, "img0", True),
        ],
        [
            (f"http://{h}/main", f"http://{h}/a/alt", "user"),
            (f"http://{h}/main", f"http://{h}/b/alt", "user"),
        ],
        [(h, [], 0)],
        [f"http://{h}/main"],
    )


def world_many_system() -> dict[str, pd.DataFrame]:
    """system-kind href shadowed by a same-named local page: must NOT be
    enqueued (crawler/tests/many-system; miner/compile.rs:129-132)."""
    h = "sys.example"
    return _mini(
        [
            (f"http://{h}/main", h, 9.0, "img0", True),
            (f"http://{h}/stdio", h, 8.0, "img0", True),  # local decoy
            (f"http://{h}/other", h, 7.0, "img0", True),
        ],
        [
            (f"http://{h}/main", f"http://{h}/stdio", "system"),  # must be dropped
            (f"http://{h}/main", f"http://{h}/other", "user"),
        ],
        [(h, [], 0)],
        [f"http://{h}/main"],
    )


def world_dup_storm() -> dict[str, pd.DataFrame]:
    """Same URL discovered from k sources in one round and across rounds."""
    h = "dup.example"
    pages = [(f"http://{h}/s{i}", h, 10.0 - i, "img0", True) for i in range(4)]
    pages.append((f"http://{h}/hot", h, 1.0, "img0", True))
    links = [(f"http://{h}/s{i}", f"http://{h}/hot#{i}", "user") for i in range(4)]
    return _mini(pages, links, [(h, [], 0)], [f"http://{h}/s{i}" for i in range(4)])


def world_politeness() -> dict[str, pd.DataFrame]:
    """Host with a crawl delay forcing deferral across rounds."""
    h = "slow.example"
    pages = [(f"http://{h}/p{i}", h, 100.0 - i, "img0", True) for i in range(6)]
    return _mini(pages, [], [(h, [], 500)], [p[0] for p in pages])  # budget 2/round
