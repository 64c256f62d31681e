"""RFC 9309 robots matching: wildcards, $ anchors, Allow/Disallow
longest-match precedence, allow-on-tie, allow-on-no-match — parsed
group-aware and evaluated columnar in robots_filter."""

from pyspark.sql import functions as F

from website_to_agent_spark.operators.politeness import robots_filter
from website_to_agent_spark.sources import robotsfetch as rf

BODY = """
User-agent: *
Disallow: /private/
Allow: /private/public*
Disallow: /*.php$
Disallow: /*?session=
Allow: /
Crawl-delay: 2
"""


def test_parse_rules_and_compile():
    rules, delay = rf.parse_robots_rules(BODY)
    assert delay == 2.0
    assert ("/private/", False) in rules
    assert ("/private/public*", True) in rules
    prio, rex = rf.compile_robots_rule("/*.php$")
    assert prio == len("/*.php$") and rex == r"^/.*\.php$"
    # back-compat view keeps disallow-only
    dis, _ = rf.parse_robots_txt(BODY)
    assert dis == ["/private/", "/*.php$", "/*?session="]


def _robots_df(spark, host, body):
    rules, delay = rf.parse_robots_rules(body)
    compiled = [rf.compile_robots_rule(p) + (a,) for p, a in rules]
    return spark.createDataFrame(
        [(host, [p for p, a in rules if not a], delay, [], compiled)],
        rf.ROBOTS,
    )


def test_rfc_rules_filter(spark):
    robots = _robots_df(spark, "ex.com", BODY)
    urls = [
        ("https://ex.com/open.html", True),       # Allow: / (longest)
        ("https://ex.com/private/a.html", False), # Disallow /private/
        ("https://ex.com/private/public/x", True),# longer Allow wins
        ("https://ex.com/a/b.php", False),        # /*.php$ anchored
        ("https://ex.com/a/b.php5", True),        # $ really anchors
        ("https://ex.com/x?session=1", False),    # query matched too
        ("https://other.com/anything", True),     # no robots row
    ]
    frontier = spark.createDataFrame(
        [(u,) for u, _ in urls], "url string")
    kept = {r["url"] for r in robots_filter(frontier, robots).collect()}
    for u, want in urls:
        assert (u in kept) == want, u


def test_tie_goes_to_allow(spark):
    body = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    robots = _robots_df(spark, "ex.com", body)
    frontier = spark.createDataFrame(
        [("https://ex.com/page",)], "url string")
    assert robots_filter(frontier, robots).count() == 1


def test_fetch_robots_fills_rules(spark, tmp_path):
    """fetch_robots end-to-end (local HTTP): the rules column arrives
    compiled and robots_filter honors a wildcard from the live
    parse."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"User-agent: *\nDisallow: /*.zip$\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host = f"127.0.0.1:{srv.server_address[1]}"
        hosts = spark.createDataFrame(
            [(host, "http")], "host string, scheme string")
        robots = rf.fetch_robots(hosts, timeout_s=5.0)
        row = robots.collect()[0]
        assert row["rules"] and row["rules"][0]["re"] == r"^/.*\.zip$"
        frontier = spark.createDataFrame(
            [(f"http://{host}/a.zip",), (f"http://{host}/a.txt",)],
            "url string",
        )
        kept = {r["url"] for r in robots_filter(frontier, robots).collect()}
        assert kept == {f"http://{host}/a.txt"}
    finally:
        srv.shutdown()
