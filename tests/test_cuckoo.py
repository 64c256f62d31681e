"""Cuckoo-filter URL-seen: no false negatives ever, exact anti-join
equivalence, deletion (the re-crawl primitive), saturation degrade,
and build determinism."""

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import cuckoo

NB, SL = 1 << 8, 4  # capacity ~1k per partition


def _seen(spark, n=200, doms=("a.com", "b.com")):
    rows = [
        (doms[i % len(doms)], f"https://{doms[i % len(doms)]}/p/{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "reg_domain string, url string")


def test_no_false_negatives_and_anti_join_exact(spark):
    seen = _seen(spark, 300)
    table = cuckoo.build_cuckoos(seen, n_buckets=NB, slots=SL)
    probed = cuckoo.probe_cuckoos(seen, table, n_buckets=NB, slots=SL)
    assert probed.filter(~F.col("maybe_seen")).count() == 0

    cand = seen.unionByName(
        spark.createDataFrame(
            [("a.com", f"https://a.com/new/{i}") for i in range(150)],
            "reg_domain string, url string",
        )
    )
    got = cuckoo.cuckoo_anti_join(
        cand, seen.select("url"), table, join_keys=["url"],
        n_buckets=NB, slots=SL,
    )
    exact = cand.join(seen.select("url"), ["url"], "left_anti")
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in exact.collect()
    )


def test_fp_rate_bounded(spark):
    seen = _seen(spark, 300)
    table = cuckoo.build_cuckoos(seen, n_buckets=NB, slots=SL)
    fresh = spark.createDataFrame(
        [("a.com", f"https://a.com/unseen/{i}") for i in range(1000)],
        "reg_domain string, url string",
    )
    probed = cuckoo.probe_cuckoos(fresh, table, n_buckets=NB, slots=SL)
    fp = probed.filter(F.col("maybe_seen")).count()
    # 1-byte fingerprints, 2 buckets × 4 slots ⇒ ~3%; allow slack
    assert fp < 100


def test_delete_then_reprobe_and_delta_fold(spark):
    seen = _seen(spark, 100, doms=("a.com",))
    table = cuckoo.build_cuckoos(seen, n_buckets=NB, slots=SL)
    expired = seen.filter(F.col("url").rlike("/p/[0-4]$"))
    table2 = cuckoo.remove_from_cuckoos(
        table, expired, n_buckets=NB, slots=SL
    )
    re_probed = cuckoo.probe_cuckoos(expired, table2,
                                     n_buckets=NB, slots=SL)
    # deleted URLs test unseen again (collisions could keep a stray
    # True; with 5 urls in a near-empty table that is ~0)
    assert re_probed.filter(F.col("maybe_seen")).count() == 0
    kept = seen.join(expired, ["reg_domain", "url"], "left_anti")
    still = cuckoo.probe_cuckoos(kept, table2, n_buckets=NB, slots=SL)
    assert still.filter(~F.col("maybe_seen")).count() == 0

    # O(Δ) maintenance: folding the urls back in restores membership,
    # including for a brand-new partition key
    delta = expired.unionByName(
        spark.createDataFrame(
            [("new.com", "https://new.com/x")],
            "reg_domain string, url string",
        )
    )
    table3 = cuckoo.add_to_cuckoos(table2, delta, n_buckets=NB, slots=SL)
    back = cuckoo.probe_cuckoos(delta, table3, n_buckets=NB, slots=SL)
    assert back.filter(~F.col("maybe_seen")).count() == 0


def test_fp_collision_delete_no_false_negative(spark):
    """r3 ADVICE (medium): two DISTINCT inserted urls that collide on
    (bucket, fingerprint) must not share one slot — deleting one of
    them has to leave the other still maybe_seen. Inserts therefore
    keep duplicate fp copies (Fan et al. deletion semantics). The pair
    below collides under blake2b at n_buckets=16 (found by search,
    asserted here so a hash change can't silently devalue the test)."""
    nb, sl = 16, 4
    u_keep, u_expire = "https://c.test/p29", "https://c.test/p68"
    assert (cuckoo._fp_and_bucket(u_keep, nb)
            == cuckoo._fp_and_bucket(u_expire, nb))
    seen = spark.createDataFrame(
        [("c.test", u_keep), ("c.test", u_expire)],
        "reg_domain string, url string",
    )
    table = cuckoo.build_cuckoos(seen, n_buckets=nb, slots=sl)
    table2 = cuckoo.remove_from_cuckoos(
        table,
        spark.createDataFrame([("c.test", u_expire)],
                              "reg_domain string, url string"),
        n_buckets=nb, slots=sl,
    )
    still = cuckoo.probe_cuckoos(
        spark.createDataFrame([("c.test", u_keep)],
                              "reg_domain string, url string"),
        table2, n_buckets=nb, slots=sl,
    ).collect()
    assert still[0].maybe_seen, (
        "deleting a colliding url cleared another inserted url"
    )


def test_saturation_degrades_safely(spark):
    tiny_nb, tiny_sl = 4, 2  # capacity 8
    seen = _seen(spark, 60, doms=("a.com",))
    table = cuckoo.build_cuckoos(seen, n_buckets=tiny_nb, slots=tiny_sl)
    stats = cuckoo.cuckoo_stats(table, n_buckets=tiny_nb,
                                slots=tiny_sl).collect()[0]
    assert stats["saturated"]
    # saturated ⇒ every probe is maybe_seen (exact check catches all) —
    # never a false negative
    anything = spark.createDataFrame(
        [("a.com", "https://a.com/whatever")],
        "reg_domain string, url string",
    )
    probed = cuckoo.probe_cuckoos(anything, table, n_buckets=tiny_nb,
                                  slots=tiny_sl)
    assert probed.collect()[0]["maybe_seen"]


def test_build_deterministic_across_runs(spark):
    seen = _seen(spark, 250).repartition(7)
    b1 = {r["reg_domain"]: bytes(r["cuckoo"])
          for r in cuckoo.build_cuckoos(seen, n_buckets=NB, slots=SL).collect()}
    b2 = {r["reg_domain"]: bytes(r["cuckoo"])
          for r in cuckoo.build_cuckoos(
              seen.repartition(3), n_buckets=NB, slots=SL).collect()}
    assert b1 == b2


def test_cuckoo_engine_equivalence(spark, pages_df, site):
    """seen_filter="cuckoo" in the real superstep loop: identical
    crawled set AND order vs the exact anti-join path (the mirror of
    test_scale_path.test_bloom_engine_equivalence)."""
    from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

    jobs = [CrawlJob("c0", site.seeds[0], max_urls=8)]
    plain = CrawlEngine(spark, pages_df, mode="client").run(jobs)
    cuck = CrawlEngine(
        spark, pages_df, mode="client", seen_filter="cuckoo",
        cuckoo_buckets=1 << 8,
    ).run(jobs)
    p = [(r.url, r.fetch_ord, r.success)
         for r in plain.crawled.orderBy("fetch_ord").collect()]
    c = [(r.url, r.fetch_ord, r.success)
         for r in cuck.crawled.orderBy("fetch_ord").collect()]
    assert p == c
    assert {r.url for r in plain.seen.collect()} == \
        {r.url for r in cuck.seen.collect()}
    plain.unpersist()
    cuck.unpersist()


def test_stats_occupancy(spark):
    seen = _seen(spark, 100, doms=("a.com",))
    table = cuckoo.build_cuckoos(seen, n_buckets=NB, slots=SL)
    s = cuckoo.cuckoo_stats(table, n_buckets=NB, slots=SL).collect()[0]
    assert s["occupied"] == 100          # no collisions lost, slot-exact
    assert s["capacity"] == NB * SL
    assert s["load"] == pytest.approx(100 / (NB * SL))
    assert not s["saturated"]
