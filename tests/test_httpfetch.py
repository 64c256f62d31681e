"""Production fetch stage (S1/S2) against a local HTTP server: status
gating, content-type column, error rows, header/timeout semantics —
executor Python workers reach the server over TCP like a real fetch."""

import http.server
import threading

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.sources import httpfetch


@pytest.fixture(scope="module")
def server(site):
    html_by_path = {}
    for i, r in enumerate(site.rows[:5]):
        html_by_path[f"/p{i}.html"] = r["html"]
    seen_agents = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen_agents.append(self.headers.get("User-Agent"))
            if self.path == "/slowish.html":
                import time

                time.sleep(0.2)
            if self.path == "/plain.txt":
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(b"not html")
                return
            body = html_by_path.get(self.path)
            if body is None and self.path != "/slowish.html":
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body if body is not None else b"<html>slow</html>")

        def log_message(self, *args):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", html_by_path, seen_agents
    srv.shutdown()


def test_http_fetch_statuses_and_bodies(spark, server):
    base, html_by_path, _ = server
    urls = spark.createDataFrame(
        [(f"{base}/p0.html",), (f"{base}/p1.html",), (f"{base}/missing.html",),
         (f"{base}/plain.txt",), ("http://127.0.0.1:1/refused",)],
        "url string",
    ).repartition(3)
    rows = {r.url: r for r in httpfetch.http_fetch(urls, timeout_s=5).collect()}
    assert len(rows) == 5
    assert rows[f"{base}/p0.html"].success
    assert bytes(rows[f"{base}/p0.html"].html) == html_by_path["/p0.html"]
    assert rows[f"{base}/missing.html"].status_code == 404
    assert not rows[f"{base}/missing.html"].success
    assert rows[f"{base}/missing.html"].error == "HTTP 404"
    # content-type survives as a column for the F9 gate
    assert rows[f"{base}/plain.txt"].content_type.startswith("text/plain")
    refused = rows["http://127.0.0.1:1/refused"]
    assert not refused.success and refused.status_code is None
    assert refused.error and "Error" in refused.error
    # declarative F8/F9 gating over the fetch output
    ok_html = (
        httpfetch.http_fetch(urls, timeout_s=5)
        .filter((F.col("status_code") == 200)
                & F.col("content_type").contains("text/html"))
        .count()
    )
    assert ok_html == 2


def test_http_fetch_sends_user_agent(spark, server):
    base, _, seen_agents = server
    seen_agents.clear()
    urls = spark.createDataFrame([(f"{base}/p0.html",)], "url string")
    httpfetch.http_fetch(urls, timeout_s=5).collect()
    assert seen_agents and all(
        a == httpfetch.DEFAULT_USER_AGENT for a in seen_agents
    )


def test_http_fetch_timeout_row(spark, server):
    base, _, _ = server
    urls = spark.createDataFrame([(f"{base}/slowish.html",)], "url string")
    row = httpfetch.http_fetch(urls, timeout_s=0.05).first()
    assert not row.success
    assert "Timeout" in (row.error or "")


@pytest.fixture(scope="module")
def live_site():
    """Handcrafted site with dup/fragment/extension/external/dead links."""

    def pages_for(base):
        return {
            f"{base}/p/0.html": (
                "<html><head><title>Zero</title>"
                '<meta name="description" content="root page">'
                "</head><body><nav>chrome</nav><main><h1>Zero</h1>"
                "<p>alpha text</p>"
                '<a href="/p/1.html">one</a> <a href="/p/2.html">two</a> '
                '<a href="#frag">skip</a> <a href="/img/x.png">img</a> '
                '<a href="http://other.example/x">ext</a> '
                '<a href="/missing.html">dead</a>'
                "</main></body></html>"
            ),
            f"{base}/p/1.html": (
                "<html><head><title>One</title></head><body><main>"
                "<p>beta text</p>"
                '<a href="/p/2.html">dup</a> <a href="/p/3.html">three</a>'
                "</main></body></html>"
            ),
            f"{base}/p/2.html": (
                "<html><head><title>Two</title></head><body><main>"
                "<p>gamma text</p>"
                '<a href="/p/3.html">three</a> <a href="/p/4.html">four</a>'
                "</main></body></html>"
            ),
            f"{base}/p/3.html": (
                "<html><head><title>Three</title></head><body><main>"
                "<p>delta text</p></main></body></html>"
            ),
            f"{base}/p/4.html": (
                "<html><head><title>Four</title></head><body><main>"
                "<p>epsilon text</p></main></body></html>"
            ),
        }

    holder = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = holder["pages"].get(holder["base"] + self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    base = f"http://127.0.0.1:{srv.server_port}"
    holder["base"] = base
    holder["pages"] = pages_for(base)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield base, holder["pages"]
    srv.shutdown()


def test_live_crawl_matches_reference_simulator(spark, live_site):
    """End-to-end LIVE crawl (engine fetches over real HTTP) matches the
    sequential reference simulator byte-for-byte: same pop order, same
    failure rows, same extracted text/content."""
    from website_to_agent_spark import reference_sim
    from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

    base, pages = live_site
    seed = f"{base}/p/0.html"
    store = {u: reference_sim.StoredPage(html=h) for u, h in pages.items()}
    # HTTP never transmits fragments: a live GET of p/0.html#frag
    # returns p/0.html (what the reference's requests.get sees too) —
    # mirror that in the store-backed simulator
    store[f"{base}/p/0.html#frag"] = store[seed]
    sim = reference_sim.client_crawl(store, seed, max_urls=5)

    engine = CrawlEngine(spark, pages=None, mode="client", fetch_timeout_s=5)
    res = engine.run([CrawlJob("live", seed, max_urls=5)])
    rows = res.crawled.orderBy("fetch_ord").collect()

    assert [(r.url, bool(r.success)) for r in rows] == [
        (rec.url, rec.success) for rec in sim["records"]
    ]
    by_url = {rec.url: rec for rec in sim["records"]}
    for r in rows:
        if r.success:
            assert r.text == by_url[r.url].text, r.url
            assert r.content == by_url[r.url].content, r.url
    # the dead link is fetched live, 404s, and lands as a failure row
    assert any(r.url.endswith("/missing.html") and not r.success for r in rows)


def test_live_api_extract_website_content(spark, live_site):
    """The reference-parity API runs in live mode (pages=None): a user of
    the reference can point it at a real site unchanged."""
    from website_to_agent_spark import api

    base, _ = live_site
    out = api.extract_website_content(
        spark, None, f"{base}/p/0.html", max_urls=3
    )
    assert len(out["processed_urls"]) == 3
    assert f"{base}/p/0.html" in out["processed_urls"]
    assert "=== CONTENT FROM:" in out["llmsfulltxt"]
    assert out["llmstxt"].startswith("# Website Content:")


def test_live_seeder_scoring_pipeline(spark, live_site):
    """EP3 fully live: fetch pages over HTTP, build the pages frame,
    extract heads, BM25-score against a query, threshold + sort — the
    reference's seeded-scoring path with a live source."""
    from website_to_agent_spark.operators import seeder_pipeline

    base, pages = live_site
    urls = spark.createDataFrame([(u,) for u in pages], "url string")
    fetched = httpfetch.http_fetch(urls, timeout_s=5)
    pages_live = (
        fetched.filter(F.col("success")).select("url", "html")
        .localCheckpoint(eager=True)
    )
    out = seeder_pipeline.seed_and_score(
        pages_live, domain="127.0.0.1", source="cc",
        query="zero root page", score_threshold=0.0, max_urls=10,
    ).collect()
    assert len(out) == 5
    scores = [r.relevance_score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)
    # the page whose title+meta match the query ranks first, score 1.0
    assert out[0].url == f"{base}/p/0.html" and out[0].relevance_score == 1.0
    assert out[0].head_data.title == "Zero"
    assert out[0].head_data.meta["description"] == "root page"


@pytest.fixture(scope="module")
def seeder_site():
    """Site for seeder-mode success semantics: a mixed-case Content-Type
    HTML root, a non-HTML 2xx page, and a 404."""
    holder = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            base = holder["base"]
            if self.path == "/s/0.html":
                self.send_response(200)
                # mixed case on purpose — headers arrive in arbitrary case
                self.send_header("Content-Type", "Text/HTML; Charset=UTF-8")
                self.end_headers()
                self.wfile.write(
                    b'<html><body><main><p>root</p>'
                    b'<a href="/s/1.html">one</a> <a href="/plain.txt">txt</a> '
                    b'<a href="/missing.html">dead</a></main></body></html>'
                )
            elif self.path == "/s/1.html":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(b"<html><body><main><p>one</p></main></body></html>")
            elif self.path == "/plain.txt":
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(b'not html <a href="/s/never.html">x</a>')
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    holder["base"] = f"http://127.0.0.1:{srv.server_port}"
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield holder["base"]
    srv.shutdown()


def test_live_seeder_non_html_visited_not_failed(spark, seeder_site):
    """Reference seeder semantics (`url_seeder.py:118-140`): mixed-case
    text/html headers still count as HTML (links discovered); a non-HTML
    2xx is visited but NOT failed and contributes no links; only
    non-200/timeout/exception URLs are failures."""
    from pyspark.sql import functions as F

    from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

    base = seeder_site
    engine = CrawlEngine(spark, pages=None, mode="seeder", fetch_timeout_s=5)
    res = engine.run([CrawlJob("s", f"{base}/s/0.html", max_urls=10, max_depth=3)])
    rows = {r.url: r for r in res.crawled.collect()}

    # mixed-case Content-Type root was parsed: its links were discovered
    assert set(rows) == {
        f"{base}/s/0.html", f"{base}/s/1.html",
        f"{base}/plain.txt", f"{base}/missing.html",
    }
    # non-HTML 2xx: success (visited, not failed), but no links followed
    assert rows[f"{base}/plain.txt"].success
    assert f"{base}/s/never.html" not in rows
    # the 404 is the ONLY failure
    assert not rows[f"{base}/missing.html"].success
    failed = res.metrics.agg(F.sum("failed")).first()[0]
    assert failed == 1
