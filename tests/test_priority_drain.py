"""Priority-queue frontier drain (north-star "priority queue realized
as score-bucketed frontier partitions drained in ranked batches"):
url- and host-scored drains, budget-gate reordering, and the
equal-scores ≡ FIFO degeneracy."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark import fixtures
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

_TS = datetime(2025, 1, 1)
HOST = "ex.com"


def _page(url, links, title="t"):
    body = "".join(f'<a href="{u}">x</a>' for u in links)
    html = (
        f"<html><head><title>{title}</title></head><body><main>"
        f"<p>content of {url} with enough words to pass guards</p>"
        f"{body}</main></body></html>"
    ).encode()
    return {"url": url, "warc_ts": _TS, "html": html, "text": None,
            "lang": None}


@pytest.fixture(scope="module")
def flat_site(spark):
    """Seed links to 6 leaves on one host; leaves link nowhere."""
    leaves = [f"https://{HOST}/p/{i}.html" for i in range(6)]
    rows = [_page(f"https://{HOST}/", leaves)] + [
        _page(u, []) for u in leaves
    ]
    return fixtures.pages_rows_to_spark(spark, rows), leaves


def _run(spark, pages, priority=None, priority_on="url", max_urls=4,
         mode="client", seed=f"https://{HOST}/", batch=8, max_depth=None):
    eng = CrawlEngine(
        spark, pages, mode=mode, batch_per_job=batch,
        priority=priority, priority_on=priority_on,
    )
    return eng.run([CrawlJob("j", seed, max_urls=max_urls,
                             max_depth=max_depth)])


def test_url_priority_reorders_budget(spark, flat_site):
    pages, leaves = flat_site
    # score leaves in REVERSE of FIFO order: p/5 best … p/0 worst
    prio = spark.createDataFrame(
        [(u, float(i)) for i, u in enumerate(leaves)], "url string, score double"
    )
    res = _run(spark, pages, priority=prio, max_urls=4)
    got = {r["url"] for r in res.crawled.filter(F.col("success")).collect()}
    # budget 4 = seed + the 3 HIGHEST-scored leaves, not the first 3
    assert got == {f"https://{HOST}/", *leaves[3:]}
    res.unpersist()


def test_fifo_without_priority(spark, flat_site):
    pages, leaves = flat_site
    res = _run(spark, pages, priority=None, max_urls=4)
    got = {r["url"] for r in res.crawled.filter(F.col("success")).collect()}
    assert got == {f"https://{HOST}/", *leaves[:3]}
    res.unpersist()


def test_equal_scores_degenerate_to_fifo(spark, flat_site):
    pages, leaves = flat_site
    prio = spark.createDataFrame(
        [(u, 7.5) for u in leaves], "url string, score double"
    )
    res_p = _run(spark, pages, priority=prio, max_urls=4)
    res_f = _run(spark, pages, priority=None, max_urls=4)
    rows_p = sorted(
        (r["url"], r["success"]) for r in res_p.crawled.collect()
    )
    rows_f = sorted(
        (r["url"], r["success"]) for r in res_f.crawled.collect()
    )
    assert rows_p == rows_f
    res_p.unpersist()
    res_f.unpersist()


def test_priority_composes_with_politeness(spark, flat_site):
    """Production config: per-host quota stays the hard constraint,
    score order decides WHICH urls spend it — 2 fetches/host/step,
    highest-scored leaves drain in the earlier supersteps."""
    pages, leaves = flat_site
    prio = spark.createDataFrame(
        [(u, float(i)) for i, u in enumerate(leaves)], "url string, score double"
    )
    robots = spark.createDataFrame(
        [(HOST, [], 0.5)],
        "host string, disallow array<string>, crawl_delay double",
    )
    eng = CrawlEngine(
        spark, pages, mode="client", robots=robots, superstep_secs=1.0,
        priority=prio,
    )
    res = eng.run([CrawlJob("j", f"https://{HOST}/", max_urls=5)])
    rows = res.crawled.filter(F.col("success")).collect()
    got = {r["url"]: r["superstep"] for r in rows}
    # budget 5 = seed + the 4 highest-scored leaves, two per superstep
    assert set(got) == {f"https://{HOST}/", *leaves[2:]}
    assert max(got[leaves[5]], got[leaves[4]]) < min(
        got[leaves[3]], got[leaves[2]]
    )
    res.unpersist()


def test_host_priority_seeder_discovery_order(spark):
    """Seeder crawl from the apex domain with two sub-hosts: the
    host-scored drain fetches the high-PageRank host's page first, so
    its unique children get the lower discovery ords."""
    hi, lo = f"hi.{HOST}", f"lo.{HOST}"
    rows = [
        _page(f"https://{HOST}/",
              [f"https://{lo}/a.html", f"https://{hi}/a.html"]),
        _page(f"https://{lo}/a.html",
              [f"https://{lo}/kid{i}.html" for i in range(3)]),
        _page(f"https://{hi}/a.html",
              [f"https://{hi}/kid{i}.html" for i in range(3)]),
    ]
    pages = fixtures.pages_rows_to_spark(spark, rows)
    prio = spark.createDataFrame(
        [(hi, 0.9), (lo, 0.1)], "host string, score double"
    )
    res = _run(
        spark, pages, priority=prio, priority_on="host", mode="seeder",
        max_urls=20, batch=1, max_depth=3,
    )
    ords = {r["url"]: r["ord"] for r in res.seen.collect()}
    # lo.a enqueued before hi.a (on-page order) — but the scored drain
    # fetches hi.a first, so hi's kids are discovered before lo's
    assert ords[f"https://{lo}/a.html"] < ords[f"https://{hi}/a.html"]
    assert max(
        ords[f"https://{hi}/kid{i}.html"] for i in range(3)
    ) < min(ords[f"https://{lo}/kid{i}.html"] for i in range(3))
    res.unpersist()
