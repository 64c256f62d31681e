"""Mergeable-sketch layer (operators/sketches.py): HLL / theta
distinct sketches and the relational count–min sketch. Correctness is
pinned three ways: CMS cells against an exact Python mirror of the
same hash arithmetic, estimates against exact counts (over-count
invariant + error bound), and merge-of-shards against build-on-whole
(bit-identity for CMS, estimate-identity for HLL/theta)."""

import collections
import hashlib

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import sketches as sk

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


@pytest.fixture(scope="module")
def items(spark):
    # zipf-ish frequencies: word i appears (i+1)^2 times per block,
    # tagged with an epoch column for the shard/merge tests
    rows = []
    k = 0
    for epoch in ("a", "b"):
        for i, w in enumerate(WORDS):
            for _ in range((i + 1) ** 2):
                rows.append((k, epoch, w, f"u{k % 97}"))
                k += 1
    df = spark.createDataFrame(
        rows, "row_id long, epoch string, term string, url string")
    return df.localCheckpoint(eager=True)


def _mirror_cms(items, depth, width):
    """Exact Python mirror of the md5 CMS cell arithmetic."""
    cells = collections.Counter()
    for term in items:
        for seed in range(depth):
            h = hashlib.md5(f"{term}:{seed}".encode()).hexdigest()
            cells[(seed, int(h[:15], 16) % width)] += 1
    return cells


def test_cms_cells_match_python_mirror(spark, items):
    depth, width = 3, 64
    t = sk.cms_table(items, "term", depth=depth, width=width,
                     hash_impl="md5")
    got = {(r.seed, r.bucket): r.cnt for r in t.collect()}
    want = _mirror_cms([r.term for r in items.collect()], depth, width)
    assert got == dict(want)


@pytest.mark.parametrize("hash_impl", ["md5", "xxhash64"])
def test_cms_overestimates_and_bounds(spark, items, hash_impl):
    depth, width = 4, 256
    t = sk.cms_table(items, "term", depth=depth, width=width,
                     hash_impl=hash_impl)
    exact = collections.Counter(r.term for r in items.collect())
    n = sum(exact.values())
    probes = items.select("term").distinct()
    est = {r.term: r.est
           for r in sk.cms_lookup(t, probes, "term", depth=depth,
                                  width=width,
                                  hash_impl=hash_impl).collect()}
    for term, cnt in exact.items():
        assert est[term] >= cnt, term          # never under-counts
        # classical bound: err ≤ (e/width)·N — generous at this width
        assert est[term] - cnt <= (2.72 / width) * n + 1

    # an unseen item's estimate is pure collision noise, far below
    # the lightest real item's count
    ghost = spark.createDataFrame([("never-seen-term",)], "term string")
    g = sk.cms_lookup(t, ghost, "term", depth=depth, width=width,
                      hash_impl=hash_impl).first().est
    assert g <= (2.72 / width) * n + 1


def test_cms_merge_equals_rebuild_bitwise(spark, items):
    depth, width = 4, 128
    whole = sk.cms_table(items, "term", depth=depth, width=width,
                         hash_impl="xxhash64")
    parts = [
        sk.cms_table(items.filter(F.col("epoch") == e), "term",
                     depth=depth, width=width, hash_impl="xxhash64")
        for e in ("a", "b")
    ]
    merged = sk.cms_merge(*parts)
    key = lambda df: sorted((r.seed, r.bucket, r.cnt)
                            for r in df.collect())
    assert key(merged) == key(whole)


def test_cms_partitioning_invariant(spark, items):
    t1 = sk.cms_table(items, "term", depth=3, width=64,
                      hash_impl="xxhash64")
    t2 = sk.cms_table(items.repartition(7, "url"), "term", depth=3,
                      width=64, hash_impl="xxhash64")
    key = lambda df: sorted((r.seed, r.bucket, r.cnt)
                            for r in df.collect())
    assert key(t1) == key(t2)


def test_heavy_hitters_exact_and_audited(spark, items):
    exact = collections.Counter(r.term for r in items.collect())
    n = sum(exact.values())
    cms = sk.cms_table(items, "term", depth=4, width=256,
                       hash_impl="md5")
    hh = sk.heavy_hitters(items, "term", min_frac=0.1, cms=cms,
                          depth=4, width=256, hash_impl="md5")
    got = {r.term: (r.cnt, r.est) for r in hh.collect()}
    want = {t: c for t, c in exact.items() if c >= 0.1 * n}
    assert set(got) == set(want)
    for t, (cnt, est) in got.items():
        assert cnt == want[t]
        assert est >= cnt


def test_hll_estimates_and_shard_merge(spark, items):
    per_epoch = sk.hll_sketches(items, ["term", "url"],
                                group_cols=["epoch"], lgk=12)
    assert per_epoch.count() == 2
    total = sk.hll_rollup(per_epoch, ["term", "url"])
    row = total.first()
    exact_terms = items.select("term").distinct().count()
    exact_urls = items.select("url").distinct().count()
    # lgk=12 → ~1.6% rel std error; these cardinalities sit in the
    # sketch's exact (sparse) regime, but assert the bound not the
    # implementation detail
    assert abs(row.term_distinct - exact_terms) <= max(2, 0.05 * exact_terms)
    assert abs(row.url_distinct - exact_urls) <= max(2, 0.05 * exact_urls)
    assert row.n_rows == items.count()

    # merge-of-shards == build-on-whole (estimate identity)
    whole = sk.hll_rollup(sk.hll_sketches(items, ["term"], lgk=12),
                          ["term"])
    assert whole.first().term_distinct == row.term_distinct

    # the rollup output is itself mergeable: rolling the global row
    # again is a fixpoint
    again = sk.hll_rollup(total.select("term_hll", "url_hll", "n_rows"),
                          ["term", "url"])
    assert again.first().term_distinct == row.term_distinct


def test_theta_overlap_set_algebra(spark, items):
    # epoch a and b carry identical term sets; split urls instead:
    # a sees u0..u96 via rows, b's distinct url set equals a's, so
    # build two frames with a KNOWN overlap from the row_id space
    a = items.filter(F.col("row_id") % 3 != 0)   # 2/3 of rows
    b = items.filter(F.col("row_id") % 2 != 0)   # 1/2 of rows
    ta = sk.theta_sketches(a, ["row_id"])
    tb = sk.theta_sketches(b, ["row_id"])
    got = sk.theta_overlap(ta, tb, "row_id").first()
    sa = {r.row_id for r in a.select("row_id").collect()}
    sb = {r.row_id for r in b.select("row_id").collect()}
    tol = lambda x: max(3, 0.05 * x)
    assert abs(got.n_a - len(sa)) <= tol(len(sa))
    assert abs(got.n_b - len(sb)) <= tol(len(sb))
    assert abs(got.n_union - len(sa | sb)) <= tol(len(sa | sb))
    assert abs(got.n_intersection - len(sa & sb)) <= tol(len(sa & sb))
    assert abs(got.n_only_a - len(sa - sb)) <= tol(len(sa - sb))
    assert abs(got.n_only_b - len(sb - sa)) <= tol(len(sb - sa))


def test_plans_stay_jvm_side(spark, items):
    # zero Python in any sketch plan; CMS builder has exactly one
    # exchange (the map-side-combined groupBy)
    plans = {
        "cms": sk.cms_table(items, "term", hash_impl="xxhash64"),
        "cms_md5": sk.cms_table(items, "term", hash_impl="md5"),
        "hll": sk.hll_sketches(items, ["term"]),
        "theta": sk.theta_sketches(items, ["term"]),
        "lookup": sk.cms_lookup(
            sk.cms_table(items, "term", hash_impl="xxhash64"),
            items.select("term"), "term"),
        "hh": sk.heavy_hitters(items, "term", 0.1),
    }
    for name, df in plans.items():
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name
    cms_plan = plans["cms"]._jdf.queryExecution().executedPlan().toString()
    assert cms_plan.count("Exchange") == 1
    assert "partial_count" in cms_plan  # map-side combine before it
