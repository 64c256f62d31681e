"""Robots meta directives (REP): <meta name="robots"> noindex /
nofollow / none and per-anchor rel="nofollow", honored by
CrawlEngine(honor_meta_robots=True) out of the same Arrow parse the
extraction already runs. Default off = reference parity (the
reference client ignores robots meta)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark import extraction, fixtures
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

_TS = datetime(2025, 1, 1)
H = "https://www.msite.example.com"


def _page(url, links, title, meta="", nofollow_links=()):
    nf_attr = ' rel="nofollow"'
    body = "".join(
        f'<a href="{u}"{nf_attr if u in nofollow_links else ""}>l</a> '
        for u in links
    )
    html = (
        f"<html><head><title>{title}</title>{meta}</head><body><main>"
        f"<h1>{title}</h1><p>Words of {title} fill this page.</p>"
        f"{body}</main></body></html>"
    ).encode()
    return {"url": url, "warc_ts": _TS, "html": html, "text": None,
            "lang": None}


def test_extract_page_robots_fields():
    rec = extraction.extract_page(
        '<html><head><meta name="robots" content="NoIndex, nofollow">'
        '</head><body><main><a href="/a" rel="nofollow noopener">x</a>'
        '<a href="/b">y</a></main></body></html>',
        "https://m.test/",
    )
    assert rec["robots_noindex"] and rec["robots_nofollow"]
    assert rec["nofollow_links"] == ["https://m.test/a"]
    assert [u for u, _ in rec["links"]] == [
        "https://m.test/a", "https://m.test/b"
    ]
    plain = extraction.extract_page(
        "<html><body><main>hi</main></body></html>", "https://m.test/"
    )
    assert not plain["robots_noindex"] and not plain["robots_nofollow"]
    assert plain["nofollow_links"] == []
    none_rec = extraction.extract_page(
        '<html><head><meta name="robots" content="none"></head>'
        "<body><main>hi</main></body></html>",
        "https://m.test/",
    )
    assert none_rec["robots_noindex"] and none_rec["robots_nofollow"]


@pytest.fixture(scope="module")
def robots_site(spark):
    rows = [
        _page(f"{H}/seed.html",
              [f"{H}/a.html", f"{H}/b.html", f"{H}/c.html",
               f"{H}/e.html"],
              "Seed", nofollow_links=(f"{H}/b.html",)),
        _page(f"{H}/a.html", [], "A"),
        _page(f"{H}/b.html", [], "B"),
        _page(f"{H}/c.html", [f"{H}/d.html"], "C",
              meta='<meta name="robots" content="nofollow">'),
        _page(f"{H}/d.html", [], "D"),
        _page(f"{H}/e.html", [], "E",
              meta='<meta name="robots" content="noindex">'),
    ]
    return fixtures.pages_rows_to_spark(spark, rows)


def test_engine_honors_meta_robots(spark, robots_site):
    res = CrawlEngine(
        spark, robots_site, mode="client", honor_meta_robots=True
    ).run([CrawlJob("j", f"{H}/seed.html", max_urls=10)])
    urls = {r.url for r in res.crawled.collect()}
    # rel=nofollow anchor never enters the frontier
    assert f"{H}/b.html" not in urls
    # page-level nofollow: C itself crawls, its links do not
    assert f"{H}/c.html" in urls
    assert f"{H}/d.html" not in urls
    # noindex page crawls but is flagged for the index/corpus layer
    assert f"{H}/e.html" in urls
    noidx = {r.url for r in res.noindexed.collect()}
    assert noidx == {f"{H}/e.html"}
    assert f"{H}/a.html" in urls
    res.unpersist()


def test_flag_off_is_reference_parity(spark, robots_site):
    res = CrawlEngine(spark, robots_site, mode="client").run(
        [CrawlJob("j", f"{H}/seed.html", max_urls=10)]
    )
    urls = {r.url for r in res.crawled.collect()}
    # the reference client ignores robots meta: everything crawls
    assert {f"{H}/b.html", f"{H}/c.html", f"{H}/d.html",
            f"{H}/e.html"} <= urls
    assert res.noindexed is None
    res.unpersist()


def test_seeder_honors_meta_robots(spark, robots_site):
    """Seeder mode with the flag: the nofollow-meta page and the
    rel=nofollow anchor contribute no discoveries, noindex pages are
    flagged; flag off discovers everything (parity kernel)."""
    res = CrawlEngine(
        spark, robots_site, mode="seeder", honor_meta_robots=True
    ).run([CrawlJob("j", f"{H}/seed.html", max_urls=20)])
    seen = {r.url for r in res.seen.collect()}
    assert f"{H}/b.html" not in seen          # rel=nofollow anchor
    assert f"{H}/c.html" in seen              # the page itself
    assert f"{H}/d.html" not in seen          # C's links suppressed
    assert {r.url for r in res.noindexed.collect()} == {f"{H}/e.html"}
    res.unpersist()

    plain = CrawlEngine(spark, robots_site, mode="seeder").run(
        [CrawlJob("j", f"{H}/seed.html", max_urls=20)]
    )
    seen2 = {r.url for r in plain.seen.collect()}
    assert {f"{H}/b.html", f"{H}/d.html"} <= seen2
    assert plain.noindexed is None
    plain.unpersist()
