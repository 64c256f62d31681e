"""Soft-404 detection (operators/soft404.py) — probe pass + template
classification on a hand-built multi-host store."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import soft404

TOKEN = soft404.DEFAULT_TOKEN


def probe_url(host: str) -> str:
    h = hashlib.md5(f"{host}:{TOKEN}".encode()).hexdigest()
    return f"http://{host}/{h}-{TOKEN}"


# Long shared template with repeated vocabulary (strong simhash
# margins) + a per-page echoed path (the few-token difference a real
# error template produces).
_TEMPLATE = (
    "page not found the requested document does not exist on this "
    "server please check the address and try again or return to the "
    "home page and use the site search to locate the content you "
    "were looking for "
) * 6


def err_page(path: str) -> str:
    return _TEMPLATE + f" requested path {path} was not found"


_REAL = {
    "alpha": "spark dataframes shuffle partitions broadcast joins "
             "catalyst tungsten codegen adaptive execution " * 8,
    "beta": "web crawling politeness robots sitemap frontier budget "
            "superstep bloom cuckoo seen set discipline " * 8,
}


def corpus():
    """good.com: healthy (no probe row). soft.com: URL-echoing error
    template (near-identity needed). exact.net: byte-identical static
    error page (digest match suffices)."""
    store = []
    # healthy host — probe url deliberately NOT in the store
    store.append(("http://good.com/a", _REAL["alpha"]))
    store.append(("http://good.com/b", _REAL["beta"]))
    # soft-404 host with echoed path
    store.append((probe_url("soft.com"), err_page("/" + "x" * 36)))
    store.append(("http://soft.com/p1", _REAL["alpha"] + " soft variant"))
    store.append(("http://soft.com/dead1", err_page("/dead1")))
    store.append(("http://soft.com/dead2", err_page("/dead2")))
    # byte-identical template host
    static = _TEMPLATE + " static error page"
    store.append((probe_url("exact.net"), static))
    store.append(("http://exact.net/gone", static))
    store.append(("http://exact.net/live", _REAL["beta"] + " exact live"))
    return store


@pytest.fixture(scope="module")
def store_df(spark):
    df = spark.createDataFrame(
        [(u, t, t.encode()) for u, t in corpus()],
        "url string, text string, html binary",
    )
    return df.localCheckpoint(eager=True)


def test_probe_paths_deterministic(spark):
    hosts = spark.createDataFrame(
        [("Soft.COM",), ("good.com",)], "host string")
    rows = {r.host: r.probe_url
            for r in soft404.probe_paths(hosts).collect()}
    assert rows["soft.com"] == probe_url("soft.com")  # case-folded
    assert rows["good.com"] == probe_url("good.com")


def test_probe_signatures_find_soft_hosts_only(spark, store_df):
    probes = soft404.probe_signatures(store_df, text_col="text")
    got = {r.host: r for r in probes.collect()}
    assert set(got) == {"soft.com", "exact.net"}
    assert got["exact.net"].probe_digest == hashlib.md5(
        (_TEMPLATE + " static error page").encode()).hexdigest()


def test_probe_signatures_via_extraction_kernel(spark, store_df):
    # html-bytes path (no text_col): same hosts, digest over the
    # extracted text of the raw bytes
    probes = soft404.probe_signatures(store_df.drop("text"))
    assert {r.host for r in probes.collect()} == {"soft.com", "exact.net"}


def test_classify_and_drop(spark, store_df):
    probes = soft404.probe_signatures(store_df, text_col="text")
    # classify the store minus the probe rows themselves (a crawl
    # never enqueues the probe url)
    crawled = store_df.filter(~F.col("url").rlike(TOKEN + "$"))
    flagged = soft404.classify_soft404(
        crawled, probes, max_hamming=8)
    rows = {r.url: r for r in flagged.collect()}
    assert set(rows) == {u for u, _ in corpus()
                         if not u.endswith(TOKEN)}
    expect_soft = {"http://soft.com/dead1", "http://soft.com/dead2",
                   "http://exact.net/gone"}
    got_soft = {u for u, r in rows.items() if r.soft404}
    assert got_soft == expect_soft
    # echoed-path pages are near, not exact: hamming small but > 0
    assert 0 < rows["http://soft.com/dead1"].probe_hamming <= 8
    # byte-identical page: hamming 0 AND digest path both hold
    assert rows["http://exact.net/gone"].probe_hamming == 0
    # real pages on probe-positive hosts are far from the template
    assert rows["http://soft.com/p1"].probe_hamming > 20
    assert rows["http://exact.net/live"].probe_hamming > 20
    # healthy-host pages carry no hamming at all
    assert rows["http://good.com/a"].probe_hamming is None
    assert not rows["http://good.com/a"].soft404

    kept = soft404.drop_soft404(crawled, probes, max_hamming=8)
    assert {r.url for r in kept.collect()} == set(rows) - expect_soft
    assert kept.columns == crawled.columns


def test_digest_match_catches_degenerate_simhash(spark):
    # a template whose text the tokenizer reduces to nothing still
    # classifies via the exact-digest branch
    store = spark.createDataFrame(
        [(probe_url("e.org"), "!!! ???"), ("http://e.org/x", "!!! ???"),
         ("http://e.org/y", _REAL["alpha"])],
        "url string, text string",
    )
    probes = soft404.probe_signatures(store, text_col="text")
    assert probes.count() == 1  # host survives without a fingerprint
    flagged = soft404.classify_soft404(store, probes)
    got = {r.url: r.soft404 for r in flagged.collect()}
    assert got["http://e.org/x"] is True   # digest branch
    assert got["http://e.org/y"] is False


def test_partition_invariance(spark, store_df):
    probes = soft404.probe_signatures(store_df, text_col="text")
    crawled = store_df.filter(~F.col("url").rlike(TOKEN + "$"))
    a = soft404.classify_soft404(crawled, probes, max_hamming=8)
    b = soft404.classify_soft404(
        crawled.repartition(7), probes, max_hamming=8)
    assert sorted(map(tuple, a.select("url", "soft404").collect())) == \
        sorted(map(tuple, b.select("url", "soft404").collect()))


def test_healthy_branch_plan_is_map_only(spark, store_df):
    """The union's healthy branch (the overwhelming majority of the
    web) must be scan → broadcast join → filter with NO shuffle
    Exchange — the corpus-wide id join this guards against would
    Exchange+Sort the full store."""
    from website_to_agent_spark import plans

    probes = soft404.probe_signatures(store_df, text_col="text") \
        .localCheckpoint(eager=True)
    crawled = store_df.filter(~F.col("url").rlike(TOKEN + "$"))
    out = soft404.classify_soft404(crawled, probes, max_hamming=8)
    plan = plans.explain_str(out).split("== Physical Plan ==")[1]
    tree = plan.split("\n\n")[0]
    # last top-level Union child = the healthy branch
    lines = tree.splitlines()
    starts = [i for i, l in enumerate(lines) if l.startswith("   +- ")]
    healthy = "\n".join(lines[starts[-1]:])
    shuffles = [l for l in healthy.splitlines()
                if "Exchange" in l and "BroadcastExchange" not in l]
    assert shuffles == [], healthy
    probes.unpersist()


def test_duplicate_store_rows_one_probe_row(spark):
    # two snapshot copies of the probe url must not fan out the
    # classify join
    rows = [(probe_url("d.io"), _TEMPLATE), (probe_url("d.io"), _TEMPLATE),
            ("http://d.io/x", _TEMPLATE), ("http://d.io/y", _REAL["alpha"])]
    store = spark.createDataFrame(rows, "url string, text string")
    probes = soft404.probe_signatures(store, text_col="text")
    assert probes.count() == 1
    crawled = store.filter(~F.col("url").rlike(TOKEN + "$"))
    flagged = soft404.classify_soft404(crawled, probes, max_hamming=8)
    assert flagged.count() == 2
    assert {r.url: r.soft404 for r in flagged.collect()} == {
        "http://d.io/x": True, "http://d.io/y": False}
