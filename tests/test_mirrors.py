"""Mirror-host detection (operators/mirrors.py) vs an exact
pure-Python mirror of the Bharat-Broder pair dataflow."""

from __future__ import annotations

import itertools
from collections import defaultdict
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import mirrors


# ---------------------------------------------------------------- mirror
def py_pairs(pages, min_shared=3, min_jaccard=0.5, max_hosts=64):
    prof = defaultdict(set)
    for url, dig in pages:
        prof[urlparse(url).netloc.lower()].add(dig)
    by_dig = defaultdict(set)
    for h, digs in prof.items():
        for d in digs:
            by_dig[d].add(h)
    shared = defaultdict(int)
    for d, hosts in by_dig.items():
        if len(hosts) < 2 or len(hosts) > max_hosts:
            continue
        for a, b in itertools.combinations(sorted(hosts), 2):
            shared[(a, b)] += 1
    out = {}
    for (a, b), s in shared.items():
        if s < min_shared:
            continue
        na, nb = len(prof[a]), len(prof[b])
        j = s / (na + nb - s)
        if j >= min_jaccard:
            out[(a, b)] = (s, na, nb, round(j, 9))
    return out


# --------------------------------------------------------------- corpus
def corpus():
    """m1/m2 full mirrors (10 shared pages), m3 a partial mirror of m1
    (5 of 10 + 5 unique), u1 unrelated, plus a boilerplate digest on
    every host (the stop-digest)."""
    pages = []
    hosts = ("m1.org", "m2.net", "m3.com", "u1.io")
    for i in range(10):
        pages.append((f"http://m1.org/{i}", f"c{i}"))
        pages.append((f"http://m2.net/mirror/{i}", f"c{i}"))
    for i in range(5):
        pages.append((f"http://m3.com/copy/{i}", f"c{i}"))
        pages.append((f"http://m3.com/own/{i}", f"own{i}"))
    for i in range(10):
        pages.append((f"http://u1.io/p/{i}", f"u{i}"))
    for h in hosts:  # universal boilerplate page (404 template)
        pages.append((f"http://{h}/404", "boiler"))
    return pages


@pytest.fixture(scope="module")
def pages_df2(spark):
    return spark.createDataFrame(
        corpus(), "url string, digest string").localCheckpoint(eager=True)


def _pairs_dict(df):
    return {(r["host_a"], r["host_b"]):
            (r["shared"], r["n_a"], r["n_b"], round(r["jaccard"], 9))
            for r in df.collect()}


def test_pairs_match_mirror(spark, pages_df2):
    for ms, mj in ((3, 0.5), (1, 0.0), (5, 0.8)):
        got = _pairs_dict(mirrors.mirror_host_pairs(
            pages_df2, min_shared=ms, min_jaccard=mj, max_hosts=3))
        want = py_pairs(corpus(), min_shared=ms, min_jaccard=mj,
                        max_hosts=3)
        assert got == want, (ms, mj)


def test_full_and_partial_mirrors_found(spark, pages_df2):
    got = _pairs_dict(mirrors.mirror_host_pairs(
        pages_df2, min_shared=3, min_jaccard=0.25, max_hosts=3))
    # m1/m2 share the 10 content pages; profiles are 11 each
    # (boiler dropped as a stop-digest at max_hosts=3, but it still
    # counts in the per-host profile size)
    assert got[("m1.org", "m2.net")][0] == 10
    # m3 shares 5 of m1's pages; jaccard 5/(11+11-5) = 0.294
    assert got[("m1.org", "m3.com")][0] == 5
    assert ("m1.org", "u1.io") not in got
    assert not any("u1.io" in p for p in got)


def test_stop_digest_bound(spark, pages_df2):
    # with max_hosts=64 the boilerplate digest (on all 4 hosts) DOES
    # bucket — u1.io then shares exactly 1 digest with everyone, which
    # min_shared=3 still excludes; at min_shared=1 it appears
    got = _pairs_dict(mirrors.mirror_host_pairs(
        pages_df2, min_shared=1, min_jaccard=0.0, max_hosts=64))
    assert got[("m1.org", "u1.io")][0] == 1
    capped = _pairs_dict(mirrors.mirror_host_pairs(
        pages_df2, min_shared=1, min_jaccard=0.0, max_hosts=3))
    assert ("m1.org", "u1.io") not in capped
    assert capped == py_pairs(corpus(), 1, 0.0, 3)


def test_clusters_and_frontier_exclusion(spark, pages_df2):
    pairs = mirrors.mirror_host_pairs(
        pages_df2, min_shared=3, min_jaccard=0.25, max_hosts=3)
    clusters = mirrors.mirror_clusters(pairs)
    got = {r["host"]: r["canonical"] for r in clusters.collect()}
    # m1/m2/m3 form one cluster with m1.org (lexicographically
    # smallest) canonical; u1.io is in no cluster
    assert got == {"m1.org": "m1.org", "m2.net": "m1.org",
                   "m3.com": "m1.org"}
    frontier = spark.createDataFrame(
        [("http://m1.org/new",), ("http://m2.net/new",),
         ("http://M3.COM/new",), ("http://u1.io/new",)], "url string")
    kept = sorted(r["url"] for r in mirrors.exclude_mirror_hosts(
        frontier, clusters).collect())
    assert kept == ["http://m1.org/new", "http://u1.io/new"]


def test_partition_invariance(spark, pages_df2):
    a = _pairs_dict(mirrors.mirror_host_pairs(pages_df2))
    b = _pairs_dict(mirrors.mirror_host_pairs(pages_df2.repartition(7)))
    assert a == b
