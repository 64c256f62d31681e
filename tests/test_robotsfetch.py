"""Live robots.txt source: fetch + group-aware parse into the
politeness robots table, and end-to-end gating of a live crawl."""

import http.server
import threading

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.sources import robotsfetch

ROBOTS_TXT = """\
# comment
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Crawl-delay: 2.5
"""


def test_parse_robots_star_group():
    dis, delay = robotsfetch.parse_robots_txt(ROBOTS_TXT)
    assert dis == ["/private/", "/tmp"]
    assert delay == 2.5


def test_parse_robots_specific_ua_wins():
    dis, delay = robotsfetch.parse_robots_txt(ROBOTS_TXT, user_agent="EvilBot/1.0")
    assert dis == ["/"] and delay is None


def test_parse_robots_missing_group_allows_all():
    assert robotsfetch.parse_robots_txt("User-agent: other\nDisallow: /x") == ([], None)
    assert robotsfetch.parse_robots_txt("") == ([], None)


@pytest.fixture(scope="module")
def robots_site():
    pages = {
        "/robots.txt": ROBOTS_TXT.encode(),
        "/p/0.html": (
            b'<html><head><title>R</title></head><body><main><p>root</p>'
            b'<a href="/p/1.html">ok</a> <a href="/private/x.html">no</a>'
            b"</main></body></html>"
        ),
        "/p/1.html": b"<html><body><main><p>fine</p></main></body></html>",
        "/private/x.html": b"<html><body><main><p>secret</p></main></body></html>",
    }

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = pages.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            ctype = "text/plain" if self.path.endswith(".txt") else "text/html"
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_robots_table(spark, robots_site):
    host = robots_site
    hosts = spark.createDataFrame([(host,), ("127.0.0.1:1",)], "host string")
    rows = {
        r.host: r
        for r in robotsfetch.fetch_robots(hosts, scheme="http", timeout_s=5).collect()
    }
    assert list(rows[host].disallow) == ["/private/", "/tmp"]
    assert rows[host].crawl_delay == 2.5
    # unreachable host → allow-all row, not a drop
    assert list(rows["127.0.0.1:1"].disallow) == []
    assert rows["127.0.0.1:1"].crawl_delay is None


def test_live_crawl_respects_fetched_robots(spark, robots_site):
    """LIVE crawl + LIVE robots: the disallowed link never enters the
    frontier; the allowed one is crawled."""
    from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

    host = robots_site
    robots = robotsfetch.fetch_robots(
        spark.createDataFrame([(host,)], "host string"), scheme="http", timeout_s=5
    ).localCheckpoint(eager=True)
    engine = CrawlEngine(
        spark, pages=None, mode="client", robots=robots, fetch_timeout_s=5
    )
    res = engine.run([CrawlJob("r", f"http://{host}/p/0.html", max_urls=5)])
    urls = [r.url for r in res.crawled.collect()]
    assert f"http://{host}/p/1.html" in urls
    assert not any("/private/" in u for u in urls)


def test_robots_for_frontier_uses_frontier_scheme(spark, robots_site):
    """An http-only host must be asked for robots.txt over http — the
    scheme comes from the frontier URLs, not a hardcoded https (which
    would fail and silently degrade to allow-all)."""
    host = robots_site
    frontier = spark.createDataFrame(
        [(f"http://{host}/p/0.html",), (f"http://{host}/p/1.html",)],
        "url string",
    )
    rows = {r.host: r for r in robotsfetch.robots_for_frontier(
        frontier, timeout_s=5).collect()}
    assert list(rows[host].disallow) == ["/private/", "/tmp"]
    assert rows[host].crawl_delay == 2.5


def test_robots_sitemap_discovery(spark, robots_site):
    """Sitemap: lines in robots.txt surface in the robots table so S3
    discovery can start from the host's own declared sitemaps."""
    body = ROBOTS_TXT + "\nSitemap: https://x.test/sitemap.xml\nSitemap: https://x.test/sitemap2.xml\n"
    assert robotsfetch.robots_sitemaps(body) == [
        "https://x.test/sitemap.xml", "https://x.test/sitemap2.xml",
    ]
    # live path: the fixture's robots.txt has no Sitemap lines -> []
    host = robots_site
    row = robotsfetch.fetch_robots(
        spark.createDataFrame([(host,)], "host string"),
        scheme="http", timeout_s=5,
    ).first()
    assert list(row.sitemaps) == []
