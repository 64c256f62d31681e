"""Trap-guard per-superstep overhead A/B: the bench parity crawl with
trap_max_urls=None vs a generous cap (10000 — engaged machinery, zero
drops). Interleaved A,B,A,B; min per variant reported. Run on an idle
host only."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob
from website_to_agent_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark(app_name="ab-trap", cores=CPUS, shuffle_partitions=CPUS)
docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
base_pages = entry_mod.pages_from_documents(spark, SF_DIR).localCheckpoint(True)
jobs = [
    CrawlJob(f"job{i}", f"https://docs.example.com/d/{(i * 37) % docs_n}.html",
             max_urls=15)
    for i in range(16)
]


def run(trap):
    t0 = time.time()
    res = CrawlEngine(spark, base_pages, mode="client",
                      trap_max_urls=trap).run(jobs)
    n = res.crawled.count()
    drops = res.trap_drops.count() if res.trap_drops is not None else -1
    res.unpersist()
    return time.time() - t0, n, drops


# warm both plan shapes
for trap in (None, 10000):
    r = CrawlEngine(spark, base_pages, mode="client", trap_max_urls=trap).run(
        [CrawlJob("w", "https://docs.example.com/d/0.html", max_urls=3)])
    r.crawled.count(); r.unpersist()

out = {"off": [], "on": [], "loadavg": list(os.getloadavg())}
for _ in range(3):
    t, n, _ = run(None); out["off"].append(round(t, 2))
    t, n2, drops = run(10000); out["on"].append(round(t, 2))
    assert n == n2, (n, n2)
    assert drops == 0, drops
out["rows"] = n
out["min_off"] = min(out["off"]); out["min_on"] = min(out["on"])
out["overhead_pct"] = round(100 * (out["min_on"] / out["min_off"] - 1), 1)
print(json.dumps(out))
spark.stop()
