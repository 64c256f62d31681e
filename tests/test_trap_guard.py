"""In-engine crawler-trap guard (CrawlEngine(trap_max_urls=...)):
a calendar-style template that mints new URLs every step must stop
entering the frontier once its cumulative enqueues hit the cap, while
healthy links keep crawling; every drop is recorded in
CrawlResultTables.trap_drops (no-silent-caps)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark import fixtures
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

_TS = datetime(2025, 1, 1)
HOST = "trap.com"
TEMPLATE = f"https://{HOST}/cal?day=*"


def _page(url, links):
    body = "".join(f'<a href="{u}">x</a>' for u in links)
    html = (
        f"<html><head><title>t</title></head><body><main>"
        f"<p>content of {url} with enough words to pass guards</p>"
        f"{body}</main></body></html>"
    ).encode()
    return {"url": url, "warc_ts": _TS, "html": html, "text": None,
            "lang": None}


def _cal(i):
    return f"https://{HOST}/cal?day={i}"


@pytest.fixture(scope="module")
def trap_site(spark):
    """Seed links 2 real pages + 3 calendar urls; every calendar page
    mints 3 MORE calendar urls (the trap) plus nothing real. Real
    pages link one further real page each. 40 calendar pages exist."""
    real = [f"https://{HOST}/about.html", f"https://{HOST}/docs.html"]
    deeper = [f"https://{HOST}/about2.html", f"https://{HOST}/docs2.html"]
    rows = [_page(f"https://{HOST}/", real + [_cal(i) for i in range(3)])]
    rows += [_page(u, [d]) for u, d in zip(real, deeper)]
    rows += [_page(u, []) for u in deeper]
    for i in range(40):
        rows.append(_page(_cal(i), [_cal(3 * i + j) for j in (10, 11, 12)]))
    return fixtures.pages_rows_to_spark(spark, rows)


def _run(spark, pages, trap_max_urls=None, max_urls=40):
    eng = CrawlEngine(spark, pages, mode="client", batch_per_job=4,
                      trap_max_urls=trap_max_urls)
    return eng.run([CrawlJob("j", f"https://{HOST}/", max_urls=max_urls)])


def test_trap_guard_caps_template_and_records_drops(spark, trap_site):
    res = _run(spark, trap_site, trap_max_urls=5)
    seen_urls = [r.url for r in res.seen.collect()]
    n_cal = sum("/cal?" in u for u in seen_urls)
    # cap 5, overshoot bounded by one step's yield (batch 4 pages × 3
    # links): the trap never floods the frontier
    assert n_cal <= 5 + 12
    # healthy pages on the SAME host are unaffected — all 4 crawled
    ok = {r.url for r in res.crawled.filter(F.col("success")).collect()}
    assert {f"https://{HOST}/about.html", f"https://{HOST}/docs.html",
            f"https://{HOST}/about2.html",
            f"https://{HOST}/docs2.html"} <= ok
    # drops are recorded, template-granular
    assert res.trap_drops is not None
    drops = res.trap_drops.collect()
    assert sum(r.dropped for r in drops) > 0
    assert {r.template for r in drops} == {TEMPLATE}
    assert all(r.host == HOST and r.job_id == "j" for r in drops)
    res.unpersist()


def test_guard_off_floods_and_reports_none(spark, trap_site):
    res = _run(spark, trap_site, trap_max_urls=None, max_urls=40)
    n_cal = sum("/cal?" in r.url for r in res.seen.collect())
    # without the guard the calendar template dominates the frontier
    assert n_cal > 17
    assert res.trap_drops is None
    res.unpersist()


def test_guard_never_triggered_is_noop(spark, trap_site):
    # generous cap: results identical to an unguarded crawl, drops empty
    a = _run(spark, trap_site, trap_max_urls=10_000, max_urls=10)
    b = _run(spark, trap_site, trap_max_urls=None, max_urls=10)
    rows_a = sorted((r.url, r.fetch_ord, r.success)
                    for r in a.crawled.collect())
    rows_b = sorted((r.url, r.fetch_ord, r.success)
                    for r in b.crawled.collect())
    assert rows_a == rows_b
    assert a.trap_drops.count() == 0
    a.unpersist(); b.unpersist()
