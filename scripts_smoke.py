"""Throwaway smoke: engine vs oracle on mini worlds + a generated world."""
import pandas as pd

from crawler_spark import datagen
from crawler_spark.engine.crawl import crawl
from crawler_spark.oracle import CrawlConfig, simulate
from crawler_spark.session import get_spark

spark = get_spark(cores=8, shuffle_partitions=8)


def to_sdf(world):
    return datagen.to_spark(spark, world)


def compare(name, world, cfg):
    o = simulate(world, cfg)
    r = crawl(spark, to_sdf(world), cfg)
    ot = o.trace.reset_index(drop=True)
    rt = r.trace[["round", "seq", "url_id"]].astype({"round": int, "seq": int}).reset_index(drop=True)
    trace_eq = ot.equals(rt)
    os_ = o.seen.sort_values("url_id").reset_index(drop=True)
    rs = r.seen.sort_values("url_id").reset_index(drop=True).astype({"url_id": "int64", "round": "int64"})
    seen_eq = os_.equals(rs)
    ol = o.lineage.reset_index(drop=True)
    rl = r.lineage.astype("int64").reset_index(drop=True)
    lin_eq = ol.astype("int64").equals(rl)
    print(f"{name}: rounds={o.rounds}/{r.rounds} trace_eq={trace_eq} seen_eq={seen_eq} lineage_eq={lin_eq}")
    if not trace_eq:
        print("oracle trace:\n", ot.head(20), "\nengine trace:\n", rt.head(20))
    if not seen_eq:
        print("oracle seen:\n", os_.head(20), "\nengine seen:\n", rs.head(20))
    if not lin_eq:
        print("oracle lineage:\n", ol, "\nengine lineage:\n", rl)
    return trace_eq and seen_eq and lin_eq


cfg = CrawlConfig(page_size=4, tries=2, max_rounds=50)
ok = True
ok &= compare("chain", datagen.world_chain(), cfg)
ok &= compare("many", datagen.world_many(), cfg)
ok &= compare("many_system", datagen.world_many_system(), cfg)
ok &= compare("dup_storm", datagen.world_dup_storm(), cfg)
ok &= compare("politeness", datagen.world_politeness(), CrawlConfig(page_size=10, tries=2, max_rounds=50))
w = datagen.make_world(n_urls=300, n_hosts=8, n_images=20, with_corpus=False)
ok &= compare("gen300", w, CrawlConfig(page_size=20, tries=2, max_rounds=100))
print("ALL OK" if ok else "MISMATCH")
spark.stop()
