"""Scale-path equivalence: the Bloom-prefiltered anti-join and the
politeness-quota drain must never change WHAT is crawled — only when.

- bloom: exact-equivalence of the final seen set and crawl output vs
  the plain anti-join engine (FP-safety: positives get the exact check,
  negatives are definitively new).
- domain_quota: with a budget large enough to exhaust the reachable
  graph, the quota reorders the drain but the final seen/fetched SETS
  match the unthrottled run.
"""

from pyspark.sql import functions as F

from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob


def _sets(result):
    crawled = result.crawled.collect()
    return (
        {r.url for r in crawled},
        {r.url for r in crawled if r.success},
        {r.url for r in result.seen.collect()},
    )


def test_bloom_engine_equivalence(spark, pages_df, site):
    jobs = [CrawlJob("b0", site.seeds[0], max_urls=8)]
    plain = CrawlEngine(spark, pages_df, mode="client").run(jobs)
    bloomed = CrawlEngine(
        spark, pages_df, mode="client", use_bloom=True, bloom_bits=1 << 14
    ).run(jobs)
    assert _sets(plain) == _sets(bloomed)
    # order identical too (bloom must not perturb ord assignment)
    p = [(r.url, r.fetch_ord) for r in plain.crawled.orderBy("fetch_ord").collect()]
    b = [(r.url, r.fetch_ord) for r in bloomed.crawled.orderBy("fetch_ord").collect()]
    assert p == b


def test_domain_quota_preserves_final_sets(spark, pages_df, site):
    # budget 200 ≫ reachable graph (~45 urls) ⇒ both runs exhaust the frontier
    jobs = [CrawlJob("q0", site.seeds[1], max_urls=200)]
    plain = CrawlEngine(spark, pages_df, mode="client").run(jobs)
    throttled = CrawlEngine(
        spark, pages_df, mode="client", domain_quota=4
    ).run(jobs)
    assert throttled.supersteps > plain.supersteps  # it really throttled
    assert _sets(plain) == _sets(throttled)


def test_seeder_batch_quota_equivalence(spark, pages_df, site):
    """Seeder with batch 5 (reference pacing) vs whole-level drain:
    same discovered set when the budget exceeds the reachable graph."""
    jobs = [CrawlJob("s", site.seeds[2], max_urls=200, max_depth=2)]
    batched = CrawlEngine(spark, pages_df, mode="seeder").run(jobs)
    unbatched = CrawlEngine(
        spark, pages_df, mode="seeder", batch_per_job=10_000
    ).run(jobs)
    assert {r.url for r in batched.seen.collect()} == {
        r.url for r in unbatched.seen.collect()
    }


def test_robots_aware_engine(spark, pages_df, site):
    """robots disallow keeps URLs out of the frontier; crawl_delay
    throttles the per-host drain."""
    robots = spark.createDataFrame(
        [("www.site0.example0.com", ["/p/2"], 0.25)],
        "host string, disallow array<string>, crawl_delay double",
    )
    jobs = [CrawlJob("r0", site.seeds[0], max_urls=6)]
    res = CrawlEngine(
        spark, pages_df, mode="client", robots=robots, superstep_secs=1.0
    ).run(jobs)
    urls = {r.url for r in res.crawled.collect()}
    assert site.seeds[0] in urls
    assert not any("/p/2.html" in u for u in urls)   # disallowed never fetched
    # throttled: ≤ ceil(budget/quota)+ supersteps > unthrottled levels
    assert res.supersteps >= 2
