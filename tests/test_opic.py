"""OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
Preda & Cobena, WWW'03) inside the crawl engine: greedy
crawl-highest-cash drain, per-superstep cash distribution over
candidate links, history accumulation, dangling sink, and the
normalized importance estimate.  Verified against an EXACT Python
mirror of the cash algebra (same 12-dp fold rounding)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark import fixtures
from website_to_agent_spark.operators.crawl import (
    CrawlEngine, CrawlJob, opic_importance,
)

_TS = datetime(2025, 1, 1)
HOST = "op.com"


def _page(url, links):
    body = "".join(f'<a href="{u}">x</a>' for u in links)
    html = (
        f"<html><head><title>t</title></head><body><main>"
        f"<p>content of {url} with enough words to pass guards</p>"
        f"{body}</main></body></html>"
    ).encode()
    return {"url": url, "warc_ts": _TS, "html": html, "text": None,
            "lang": None}


def _u(name):
    return f"https://{HOST}/{name}.html"


# graph: cash concentrates on C (cited by both S and A), so OPIC pops
# C before B where FIFO pops B first; X is a dead link (cash sink)
GRAPH = {
    "s": ["a", "b", "c"],
    "a": ["c", "d"],
    "b": ["e", "x"],
    "c": ["d", "e"],
    "d": [],
    "e": ["a"],
}
IN_STORE = set(GRAPH)          # "x" is linked but not in the store


@pytest.fixture(scope="module")
def site(spark):
    rows = [_page(_u(n), [_u(t) for t in GRAPH[n]]) for n in GRAPH]
    return fixtures.pages_rows_to_spark(spark, rows)


def _mirror(max_urls):
    """Exact mirror of the engine's OPIC crawl at batch_per_job=1:
    greedy argmax-cash pop (12-dp rounding, ord tie-break), candidates
    = the page's anchors when the fetch succeeds AND the success
    budget is not yet exhausted by it, equal split over anchors
    (multigraph: one share per anchor), first-enqueue-wins frontier,
    dangling/failed cash to the '' sink."""
    r12 = lambda x: round(x, 12)
    cash = {_u("s"): 1.0}
    hist = {}
    frontier = [(_u("s"), 0)]
    seen = {_u("s")}
    next_ord = 1
    succ = 0
    pops = []
    while succ < max_urls and frontier:
        frontier.sort(key=lambda f: (-r12(cash.get(f[0], 0.0)), f[1]))
        cur, ord_ = frontier.pop(0)
        name = cur.rsplit("/", 1)[1][:-5]
        ok = name in IN_STORE
        pops.append((cur, ok))
        if ok:
            succ += 1
        links = ([_u(t) for t in GRAPH[name]]
                 if ok and succ < max_urls else [])
        c = cash.get(cur, 0.0)
        cash[cur] = 0.0
        hist[cur] = r12(hist.get(cur, 0.0) + c)
        if links:
            share = c / len(links)
            for dst in links:
                cash[dst] = r12(cash.get(dst, 0.0) + share)
        elif c != 0.0:
            cash[""] = r12(cash.get("", 0.0) + c)
        fresh = []
        for pos, dst in enumerate(links):
            if dst not in seen and dst not in [f for f, _p in fresh]:
                fresh.append((dst, pos))
        for dst, _pos in fresh:
            seen.add(dst)
            frontier.append((dst, next_ord))
            next_ord += 1
    return cash, hist, pops


def _run(spark, site, max_urls):
    eng = CrawlEngine(spark, site, mode="client", batch_per_job=1,
                      opic=True)
    return eng.run([CrawlJob("j", _u("s"), max_urls=max_urls)])


def test_opic_matches_mirror_exactly(spark, site):
    res = _run(spark, site, max_urls=5)
    state = {r.url: (r.cash, r.hist) for r in res.opic.collect()}
    cash, hist, pops = _mirror(5)
    want = {}
    for u in set(cash) | set(hist):
        want[u] = (round(cash.get(u, 0.0), 12), round(hist.get(u, 0.0), 12))
    # engine state rows exist for every url that ever held cash
    for u, (c, h) in want.items():
        assert u in state, u
        assert abs(state[u][0] - c) < 1e-12, (u, state[u], (c, h))
        assert abs(state[u][1] - h) < 1e-12, (u, state[u], (c, h))
    assert set(state) == set(want)

    # pop order == the mirror's greedy cash order (superstep sequence)
    got_order = [r.url for r in res.crawled.orderBy("superstep").collect()]
    assert got_order == [u for u, _ok in pops]

    # cash conservation: Σ cash over all rows (incl. the sink) == 1
    tot = sum(c for (c, _h) in state.values())
    assert abs(tot - 1.0) < 1e-9
    res.unpersist()


def test_opic_adaptive_beats_fifo(spark, site):
    # OPIC pops the doubly-cited C before the FIFO-next B
    res = _run(spark, site, max_urls=3)
    got = [r.url for r in res.crawled.orderBy("superstep").collect()]
    assert got == [_u("s"), _u("a"), _u("c")]
    fifo = CrawlEngine(spark, site, mode="client", batch_per_job=1).run(
        [CrawlJob("j", _u("s"), max_urls=3)])
    fifo_order = [r.url for r in fifo.crawled.orderBy("superstep").collect()]
    assert fifo_order == [_u("s"), _u("a"), _u("b")]
    res.unpersist()
    fifo.unpersist()


def test_opic_importance_normalizes(spark, site):
    res = _run(spark, site, max_urls=5)
    imp = {r.url: r.importance
           for r in opic_importance(res.opic).collect()}
    assert "" not in imp
    assert all(v >= 0 for v in imp.values())
    with_sink = {r.url: r.importance
                 for r in opic_importance(res.opic,
                                          include_sink=True).collect()}
    assert abs(sum(with_sink.values()) - 1.0) < 1e-9
    assert abs(sum(imp.values()) - 1.0) < 1e-9
    # the doubly-cited hub outranks the singly-cited leaf
    assert imp[_u("c")] > imp[_u("d")] or imp[_u("c")] > imp[_u("e")]
    res.unpersist()


def test_opic_deterministic_and_guarded(spark, site):
    a = _run(spark, site, max_urls=4)
    state_a = {r.url: (r.cash, r.hist) for r in a.opic.collect()}
    order_a = [r.url for r in a.crawled.orderBy("superstep").collect()]
    a.unpersist()
    b = _run(spark, fixtures.pages_rows_to_spark(
        spark, [_page(_u(n), [_u(t) for t in GRAPH[n]])
                for n in GRAPH]).repartition(7), max_urls=4)
    assert {r.url: (r.cash, r.hist)
            for r in b.opic.collect()} == state_a
    assert [r.url
            for r in b.crawled.orderBy("superstep").collect()] == order_a
    b.unpersist()

    # opic=False leaves the result field None and behavior unchanged
    plain = CrawlEngine(spark, site, mode="client", batch_per_job=1).run(
        [CrawlJob("j", _u("s"), max_urls=2)])
    assert plain.opic is None
    plain.unpersist()

    # opic and a static priority are mutually exclusive
    prio = spark.createDataFrame([(_u("a"), 1.0)], "url string, score double")
    with pytest.raises(AssertionError):
        CrawlEngine(spark, site, opic=True, priority=prio)


def test_opic_composes_with_bloom_and_budget_drain(spark, site):
    # the bloom prefilter is a pure seen-set accelerator — flipping it
    # on must not move a single pop or a single cash cell
    plain = _run(spark, site, max_urls=5)
    ref_state = {r.url: (r.cash, r.hist) for r in plain.opic.collect()}
    ref_order = [r.url for r in plain.crawled.orderBy("superstep").collect()]
    plain.unpersist()
    bloomed = CrawlEngine(spark, site, mode="client", batch_per_job=1,
                          opic=True, use_bloom=True).run(
        [CrawlJob("j", _u("s"), max_urls=5)])
    assert {r.url: (r.cash, r.hist)
            for r in bloomed.opic.collect()} == ref_state
    assert [r.url for r in
            bloomed.crawled.orderBy("superstep").collect()] == ref_order
    bloomed.unpersist()

    # budget drain (batch_per_job=None): whole cash-ranked prefixes
    # pop per superstep; the state still conserves cash exactly and
    # every url that ever held cash has a row
    res = CrawlEngine(spark, site, mode="client", opic=True).run(
        [CrawlJob("j", _u("s"), max_urls=5)])
    state = {r.url: (r.cash, r.hist) for r in res.opic.collect()}
    tot = sum(c for c, _h in state.values())
    assert abs(tot - 1.0) < 1e-9
    fetched = {r.url for r in res.crawled.collect()}
    assert fetched <= set(state) - {""}
    res.unpersist()
