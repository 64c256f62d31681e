"""Re-crawl scheduling: change-rate estimation, staleness priorities,
TTL expiry, and the expire → cuckoo-delete → re-enqueue composition."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import cuckoo, recrawl

T0 = datetime(2024, 1, 1)


def _snaps(spark):
    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        # hot: changes every observation (3 changes over 3h)
        ("https://a.com/hot", t(0), "v1"),
        ("https://a.com/hot", t(1), "v2"),
        ("https://a.com/hot", t(2), "v3"),
        ("https://a.com/hot", t(3), "v4"),
        # cold: never changes
        ("https://a.com/cold", t(0), "same"),
        ("https://a.com/cold", t(3), "same"),
        # single observation: no evidence
        ("https://a.com/once", t(1), "x"),
    ]
    return spark.createDataFrame(rows, "url string, ts timestamp, digest string")


def test_mark_changes_and_rate(spark):
    marked = recrawl.mark_changes(_snaps(spark))
    by_url = {
        (r["url"], r["ts"].hour): r["changed"] for r in marked.collect()
    }
    assert by_url[("https://a.com/hot", 0)] is False  # baseline
    assert by_url[("https://a.com/hot", 1)] is True
    assert by_url[("https://a.com/cold", 3)] is False

    rates = {r["url"]: r for r in recrawl.change_rate(marked).collect()}
    hot = rates["https://a.com/hot"]
    assert hot["n_changes"] == 3 and hot["span_s"] == 3 * 3600
    assert hot["rate"] == pytest.approx(3 / (3 * 3600))
    assert rates["https://a.com/cold"]["rate"] == 0.0
    assert rates["https://a.com/once"]["rate"] == 0.0  # span 0 guard


def test_revisit_priority_orders_by_staleness(spark):
    rates = recrawl.change_rate(recrawl.mark_changes(_snaps(spark)))
    now = datetime(2024, 1, 2)
    scores = {
        r["url"]: r["score"]
        for r in recrawl.revisit_priority(rates, now).collect()
    }
    # hot page: λ=3/3h, 21h stale; cold/once: no evidence ⇒ 0
    assert scores["https://a.com/hot"] == pytest.approx(
        (3 / (3 * 3600)) * 21 * 3600
    )
    assert scores["https://a.com/cold"] == 0.0
    # nonzero default_rate ramps unobserved pages instead of starving
    with_default = {
        r["url"]: r["score"]
        for r in recrawl.revisit_priority(rates, now, default_rate=1e-6).collect()
    }
    assert with_default["https://a.com/cold"] > 0.0
    assert with_default["https://a.com/hot"] == scores["https://a.com/hot"]


def test_recrawl_due_ttl(spark):
    rates = recrawl.change_rate(recrawl.mark_changes(_snaps(spark)))
    due = {
        r["url"]
        for r in recrawl.recrawl_due(
            rates, datetime(2024, 1, 2), ttl_s=22 * 3600
        ).collect()
    }
    # last fetches: hot 03:00 (21h old), cold 03:00 (21h), once 01:00 (23h)
    assert due == {"https://a.com/once"}


def test_expiry_reopens_cuckoo_and_seen(spark):
    """The full expiry composition: TTL-due urls leave the seen set AND
    the cuckoo filter, so the next superstep's anti-join re-enqueues
    them; everything else stays filtered."""
    rates = recrawl.change_rate(recrawl.mark_changes(_snaps(spark)))
    due = recrawl.recrawl_due(rates, datetime(2024, 1, 2), ttl_s=22 * 3600)

    dom = F.lit("a.com")
    seen = rates.select(dom.alias("reg_domain"), "url")
    table = cuckoo.build_cuckoos(seen, n_buckets=1 << 8)
    seen2 = seen.join(due, "url", "left_anti")
    table2 = cuckoo.remove_from_cuckoos(
        table, due.select(dom.alias("reg_domain"), "url"), n_buckets=1 << 8
    )

    cand = seen.select("reg_domain", "url")  # all three urls rediscovered
    new = cuckoo.cuckoo_anti_join(
        cand, seen2.select("url"), table2, join_keys=["url"],
        n_buckets=1 << 8,
    )
    assert {r["url"] for r in new.collect()} == {"https://a.com/once"}


def test_stale_by_sitemap(spark):
    from website_to_agent_spark.operators import recrawl

    entries = spark.createDataFrame(
        [
            ("https://x/changed", 0.5, "2025-06-01T00:00:00", "daily"),
            ("https://x/fresh", 0.5, "2025-01-01", None),
            ("https://x/new", 0.5, "2025-03-05", None),
            ("https://x/no-lastmod", 0.5, None, None),
        ],
        "url string, priority double, lastmod string, changefreq string",
    )
    rates = spark.createDataFrame(
        [
            ("https://x/changed", "2025-02-01 00:00:00"),
            ("https://x/fresh", "2025-02-01 00:00:00"),
        ],
        "url string, last_ts string",
    )
    got = {r.url: r.reason
           for r in recrawl.stale_by_sitemap(entries, rates).collect()}
    assert got == {"https://x/changed": "changed",
                   "https://x/new": "never_fetched"}


def test_refresh_allocation_optimal(spark):
    """Cho & Garcia-Molina TODS'03: the freshness-optimal budget split
    — conserves the budget, matches an independent mirror of the
    quantized Lagrange solve, abandons pages too hot to track (the
    paper's counterintuitive headline), and beats both uniform and
    proportional-to-λ allocations on the freshness objective."""
    import math

    lams = {f"u{i}": lam for i, lam in enumerate(
        [0.0005, 0.001, 0.002, 0.004, 0.01, 0.02, 0.05])}
    rates = spark.createDataFrame(
        [(u, 5, 3, 1000, lam) for u, lam in lams.items()],
        "url string, n_snaps long, n_changes long, span_s long, rate double")
    budget = 0.01

    out = {r.url: r for r in
           recrawl.refresh_allocation(rates, budget).collect()}
    total = sum(r.freq for r in out.values())
    assert abs(total - budget) / budget < 1e-9

    # independent mirror of the quantized solve
    def phi(r):
        return 1.0 - (1.0 + r) * math.exp(-r)

    def phi_inv(x):
        lo, hi = 0.0, 1.0
        while phi(hi) < x:
            hi *= 2
        for _ in range(80):
            m = (lo + hi) / 2
            (lo, hi) = (m, hi) if phi(m) < x else (lo, m)
        return (lo + hi) / 2

    def f_of(lam, mu):
        if lam <= 0 or mu * lam >= 1:
            return 0.0
        return lam / phi_inv(mu * lam)

    qlam = {u: math.exp(round(math.log(lam) * 64) / 64)
            for u, lam in lams.items()}

    def tot(mu):
        return sum(f_of(l, mu) for l in qlam.values())

    hi = 1.0 / min(qlam.values())
    lo = hi
    while tot(lo) < budget:
        lo /= 2
    for _ in range(200):
        m = (lo + hi) / 2
        (lo, hi) = (m, hi) if tot(m) > budget else (lo, m)
    mu = (lo + hi) / 2
    for u in lams:
        assert abs(out[u].freq - f_of(qlam[u], mu)) <= 1e-9 * max(
            1.0, f_of(qlam[u], mu)), u

    # freshness objective: optimal >= uniform and >= proportional
    def fresh(lam, f):
        if lam <= 0:
            return 1.0
        if f <= 0:
            return 0.0
        r = lam / f
        return (1.0 - math.exp(-r)) / r

    def avg_fresh(alloc):
        return sum(fresh(lams[u], alloc[u]) for u in lams) / len(lams)

    opt = avg_fresh({u: out[u].freq for u in lams})
    uni = avg_fresh({u: budget / len(lams) for u in lams})
    s = sum(lams.values())
    prop = avg_fresh({u: budget * lams[u] / s for u in lams})
    assert opt >= uni - 1e-6 and opt >= prop - 1e-6
    assert opt > prop  # proportional is strictly worse (the paper's point)

    # abandonment: a page changing 1000x faster than the whole budget
    # gets ZERO visits while the tractable page is still served
    rates2 = spark.createDataFrame(
        [("hot", 2, 2, 10, 10.0), ("cold", 2, 1, 1000, 0.001)],
        "url string, n_snaps long, n_changes long, span_s long, rate double")
    out2 = {r.url: r.freq for r in
            recrawl.refresh_allocation(rates2, 0.01).collect()}
    assert out2["hot"] == 0.0
    assert abs(out2["cold"] - 0.01) / 0.01 < 1e-9

    # no-evidence urls: rate 0 -> freq 0 (default), default_rate ramps
    rates3 = spark.createDataFrame(
        [("never", 1, 0, 0, 0.0)],
        "url string, n_snaps long, n_changes long, span_s long, rate double")
    assert recrawl.refresh_allocation(
        rates3, 1.0).collect()[0].freq == 0.0
    assert recrawl.refresh_allocation(
        rates3, 1.0, default_rate=0.01).collect()[0].freq > 0.0

    # budget 0 and repartition determinism
    assert all(r.freq == 0.0 for r in
               recrawl.refresh_allocation(rates, 0.0).collect())
    again = {r.url: r.freq for r in recrawl.refresh_allocation(
        rates.repartition(5), budget).collect()}
    assert again == {u: out[u].freq for u in lams}
