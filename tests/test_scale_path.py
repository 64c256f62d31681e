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


def test_bucketed_frontier_drain_without_shuffle(spark, tmp_path):
    """SURVEY §7.6: a frontier snapshot written hash-bucketed by job_id
    is drained (row_number window per job) WITHOUT an Exchange — the
    bucketed scan already satisfies the window's distribution. The
    unbucketed write of the same data needs the shuffle (negative
    control), and both drains return identical rows."""
    from website_to_agent_spark import plans
    from website_to_agent_spark.sources.catalog import SnapshotCatalog
    from pyspark.sql import Window

    frontier = spark.range(20000).select(
        F.concat(F.lit("job"), (F.col("id") % 64).cast("string")).alias("job_id"),
        F.concat(F.lit("https://h.test/"), F.col("id")).alias("url"),
        F.lit(1).alias("depth"),
        F.col("id").alias("ord"),
    )
    cat = SnapshotCatalog(str(tmp_path / "snap"))
    cat.commit(0, {"frontier": frontier},
               bucket={"frontier": (["job_id"], 8)})
    cat.commit(1, {"frontier": frontier})  # same data, plain parquet

    w = Window.partitionBy("job_id").orderBy("ord")

    def drain(df):
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 5)
            .drop("_rk")
        )

    bucketed = drain(cat.read(spark, 0, "frontier"))
    plain = drain(cat.read(spark, 1, "frontier"))
    assert "Exchange" not in plans.explain_str(bucketed)
    assert "Exchange" in plans.explain_str(plain)
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucket_frontier_engine_equivalence(spark, pages_df, site, tmp_path):
    """CrawlEngine(bucket_frontier=N) + checkpointing crawls the same
    pages as the plain engine."""
    jobs = [CrawlJob("bf", site.seeds[0], max_urls=8)]
    plain = CrawlEngine(spark, pages_df, mode="client").run(jobs)
    bucketed = CrawlEngine(
        spark, pages_df, mode="client",
        checkpoint_dir=str(tmp_path / "ck"), bucket_frontier=4,
    ).run(jobs)
    assert _sets(plain) == _sets(bucketed)


def test_host_bucketed_frontier_polite_drain_without_shuffle(spark, tmp_path):
    """SURVEY §7.6 (politeness flavor): a frontier snapshot carrying a
    stored host column and written bucketed BY HOST satisfies
    polite_drain's per-host window with NO Exchange; the plain-parquet
    twin shuffles. Same drained rows either way."""
    from website_to_agent_spark import plans
    from website_to_agent_spark.operators import politeness
    from website_to_agent_spark.sources.catalog import SnapshotCatalog

    frontier = spark.range(5000).select(
        F.lit("j").alias("job_id"),
        F.concat(F.lit("https://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".test/p/"), F.col("id")).alias("url"),
        F.lit(1).alias("depth"),
        F.col("id").alias("ord"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string"),
                 F.lit(".test")).alias("host"),
    )
    robots = spark.createDataFrame(
        [(f"h{i}.test", [], 0.25) for i in range(50)],
        "host string, disallow array<string>, crawl_delay double",
    )
    cat = SnapshotCatalog(str(tmp_path / "snap"))
    cat.commit(0, {"frontier": frontier}, bucket={"frontier": (["host"], 8)})
    cat.commit(1, {"frontier": frontier})

    def drain(df):
        batch, _ = politeness.polite_drain(df, robots, superstep_secs=1.0)
        return batch

    bucketed = drain(cat.read(spark, 0, "frontier"))
    plain = drain(cat.read(spark, 1, "frontier"))

    def shuffles(df):
        # the robots broadcast join adds a (harmless) BroadcastExchange;
        # the assertion targets SHUFFLE exchanges only
        return plans.explain_str(df).replace("BroadcastExchange", "")

    assert "Exchange" not in shuffles(bucketed)
    assert "Exchange" in shuffles(plain)
    got_b = sorted(r.url for r in bucketed.collect())
    got_p = sorted(r.url for r in plain.collect())
    assert got_b == got_p and len(got_b) == 50 * 4  # quota 1/0.25 per host


def test_salted_polite_drain_equivalence(spark):
    """Two-phase skew-bounded drain (salt_buckets>1) returns EXACTLY
    the rows of the plain per-host drain — on a frontier where one hot
    host holds 90% of the rows — and honors the per-host quota."""
    from website_to_agent_spark.operators import politeness

    frontier = spark.createDataFrame(
        [(f"https://hot.test/{i}", i) for i in range(900)]
        + [(f"https://cold{i}.test/x", 10_000 + i) for i in range(100)],
        "url string, ord long",
    )
    robots = spark.createDataFrame(
        [("hot.test", [], 0.1)],
        "host string, disallow array<string>, crawl_delay double",
    )
    plain_b, plain_l = politeness.polite_drain(
        frontier, robots, superstep_secs=1.0)
    salted_b, salted_l = politeness.polite_drain(
        frontier, robots, superstep_secs=1.0, salt_buckets=8)
    pb = sorted(r.url for r in plain_b.collect())
    sb = sorted(r.url for r in salted_b.collect())
    assert pb == sb
    assert sorted(r.url for r in plain_l.collect()) == sorted(
        r.url for r in salted_l.collect())
    # hot host drained to quota 10 (1s / 0.1), in ord order
    hot = [u for u in sb if "hot.test" in u]
    assert hot == [f"https://hot.test/{i}" for i in range(10)]


def test_salted_drain_engine_equivalence(spark, pages_df, site):
    """CrawlEngine(drain_salt_buckets=8) crawls exactly what the plain
    robots-throttled engine crawls."""
    robots = spark.createDataFrame(
        [("www.site0.example0.com", [], 0.25)],
        "host string, disallow array<string>, crawl_delay double",
    )
    jobs = [CrawlJob("sd", site.seeds[0], max_urls=6)]
    plain = CrawlEngine(
        spark, pages_df, mode="client", robots=robots).run(jobs)
    salted = CrawlEngine(
        spark, pages_df, mode="client", robots=robots,
        drain_salt_buckets=8).run(jobs)
    assert _sets(plain) == _sets(salted)


def test_bucketed_snapshot_fallback_without_metastore_entry(spark, tmp_path):
    """A fresh session won't have the bucketed table in its (session-
    scoped) metastore — catalog.read must fall back to the bare parquet
    path with identical rows. Simulated by dropping the table entry."""
    from website_to_agent_spark.sources.catalog import SnapshotCatalog

    frontier = spark.range(100).select(
        F.lit("j").alias("job_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(1).alias("depth"), F.col("id").alias("ord"),
    )
    cat = SnapshotCatalog(str(tmp_path / "snap"))
    cat.commit(0, {"frontier": frontier}, bucket={"frontier": (["job_id"], 4)})
    via_table = sorted(map(tuple, cat.read(spark, 0, "frontier").collect()))
    tbl = cat.manifest(0)["tables"]["frontier"]["bucketed"]["table"]
    spark.sql(f"DROP TABLE {tbl}")  # what a new session effectively sees
    via_parquet = sorted(map(tuple, cat.read(spark, 0, "frontier").collect()))
    assert via_table == via_parquet and len(via_table) == 100


def _cached_rdd_ids(spark):
    sc = spark.sparkContext
    return {
        i.id()
        for i in sc._jsc.sc().getRDDStorageInfo()
        if i.numCachedPartitions() > 0
    }


def _wait_until(cond, timeout_s=10.0):
    import time

    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if cond():
            return True
        time.sleep(0.2)
    return cond()


def test_checkpoint_storage_bounded(spark, pages_df, site, tmp_path):
    """Superseded superstep localCheckpoints must be RELEASED, not
    pinned forever (round-2 verdict's scale-killer: unbounded executor
    storage creep over a long crawl).

    - catalog-backed run: every step's state re-reads from the disk
      snapshot, so at return at most the final bloom remains pinned.
    - in-memory run: the result tables legitimately pin their backing
      step deltas; CrawlResultTables.unpersist() must free ALL of them.
    """
    jobs = [CrawlJob("st", site.seeds[0], max_urls=12)]

    before = _cached_rdd_ids(spark)
    res = CrawlEngine(
        spark, pages_df, mode="client",
        checkpoint_dir=str(tmp_path / "ck"),
        use_bloom=True, bloom_bits=1 << 14,
    ).run(jobs)
    assert res.supersteps >= 3
    # bounded across supersteps: only the final bloom may remain
    # (releases are async → poll briefly)
    assert _wait_until(lambda: len(_cached_rdd_ids(spark) - before) <= 1), (
        f"catalog run left {len(_cached_rdd_ids(spark) - before)} pinned RDDs"
    )
    n_catalog = res.crawled.count()  # catalog results stay readable
    res.unpersist(blocking=True)
    assert _wait_until(lambda: not (_cached_rdd_ids(spark) - before))

    before = _cached_rdd_ids(spark)
    res = CrawlEngine(spark, pages_df, mode="client").run(jobs)
    assert res.crawled.count() == n_catalog
    assert _cached_rdd_ids(spark) - before  # results are checkpoint-backed
    res.unpersist(blocking=True)
    assert _wait_until(lambda: not (_cached_rdd_ids(spark) - before)), (
        "in-memory run still pinned after unpersist()"
    )


def test_snapshot_catalogs_with_same_basename_do_not_collide(spark, tmp_path):
    """Two catalogs whose roots share a basename must keep separate
    metastore entries — catalog B's commit must never make catalog A
    read B's rows (round-3 advice: basename-only table names collided)."""
    from website_to_agent_spark.sources.catalog import SnapshotCatalog

    def frontier(tag, n):
        return spark.range(n).select(
            F.lit(tag).alias("job_id"),
            F.concat(F.lit(f"{tag}-u"), F.col("id")).alias("url"),
            F.lit(1).alias("depth"), F.col("id").alias("ord"),
        )

    cat_a = SnapshotCatalog(str(tmp_path / "a" / "snap"))
    cat_b = SnapshotCatalog(str(tmp_path / "b" / "snap"))
    cat_a.commit(0, {"frontier": frontier("A", 7)},
                 bucket={"frontier": (["job_id"], 4)})
    cat_b.commit(0, {"frontier": frontier("B", 11)},
                 bucket={"frontier": (["job_id"], 4)})

    a_rows = cat_a.read(spark, 0, "frontier").collect()
    b_rows = cat_b.read(spark, 0, "frontier").collect()
    assert len(a_rows) == 7 and all(r.job_id == "A" for r in a_rows)
    assert len(b_rows) == 11 and all(r.job_id == "B" for r in b_rows)

    # even if the names DID collide, read() must reject a table whose
    # location is not this snapshot's path (the belt-and-braces check)
    tbl_a = cat_a.manifest(0)["tables"]["frontier"]["bucketed"]["table"]
    path_b = cat_b.manifest(0)["tables"]["frontier"]["path"]
    assert SnapshotCatalog._location_matches(
        spark, tbl_a, cat_a.manifest(0)["tables"]["frontier"]["path"])
    assert not SnapshotCatalog._location_matches(spark, tbl_a, path_b)
