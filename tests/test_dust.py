"""DUST rule mining (operators/dust.py) vs an exact pure-Python
mirror of the DustBuster dataflow — span generation, envelope
support/refutation counting, canonical direction, and boundary-safe
application."""

from __future__ import annotations

import itertools
import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import dust

TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9]")


# ---------------------------------------------------------------- mirror
def py_spans(url: str, max_tokens: int = 4):
    toks = TOKEN_RE.findall(url)
    n = len(toks)
    out = set()
    for i in range(n + 1):
        for ln in range(0, max_tokens + 1):
            if i + ln > n or (i == 0 and ln == n):
                continue
            pre = "".join(toks[:i])
            mid = "".join(toks[i:i + ln])
            suf = "".join(toks[i + ln:])
            out.add((pre + "\x01" + suf, mid))
    return out


def py_rules(pages, max_tokens=4, max_url_tokens=64,
             min_support=2, max_refuted=0):
    """pages: [(url, digest)] → {(find, replace): (support, refuted)}"""
    best = {}
    for url, dig in pages:
        if len(TOKEN_RE.findall(url)) > max_url_tokens:
            continue
        best[url] = max(dig, best.get(url, dig))
    env_map = defaultdict(dict)
    for url, dig in best.items():
        for env, mid in py_spans(url, max_tokens):
            env_map[env][mid] = dig
    support, refuted = defaultdict(set), defaultdict(set)
    for env, mids in env_map.items():
        if len(mids) < 2:
            continue
        for (m1, d1), (m2, d2) in itertools.combinations(
                sorted(mids.items()), 2):
            key = (m1, m2)
            (support if d1 == d2 else refuted)[key].add(env)
    rules = {}
    for (a, b), envs in support.items():
        if len(envs) >= min_support and len(refuted[(a, b)]) <= max_refuted:
            find, repl = (a, b) if len(b) < len(a) else (b, a)
            rules[(find, repl)] = (len(envs), len(refuted[(a, b)]))
    return rules


def py_apply(url: str, compiled):
    for pat, repl in compiled:
        # undo the java-replaceAll escaping, then substitute literally
        # (lambda sidesteps re.sub's own escape semantics)
        plain = repl.replace("\\$", "$").replace("\\\\", "\\")
        url = re.sub(pat, lambda _m: plain, url)
    return url


# --------------------------------------------------------------- corpus
def corpus():
    """Aliases: trailing index.html, www. host alias, ?s=7 session
    param; refuter: ?page=N with distinct content."""
    pages = []
    # trailing index.html on site1 (3 supporting envelopes)
    for p in ("alpha", "beta", "gamma"):
        pages.append((f"http://site1.com/{p}/", f"d1-{p}"))
        pages.append((f"http://site1.com/{p}/index.html", f"d1-{p}"))
    # www alias on site3 (3 supporting envelopes)
    for p in ("x", "y", "z"):
        pages.append((f"http://www.site3.com/{p}", f"d3-{p}"))
        pages.append((f"http://site3.com/{p}", f"d3-{p}"))
    # session param on site2 (3 supporting envelopes)
    for p in ("p1", "p2", "p3"):
        pages.append((f"http://site2.com/{p}?s=7", f"d2-{p}"))
        pages.append((f"http://site2.com/{p}", f"d2-{p}"))
    # refuter: pagination with DIFFERENT content each page
    for p in ("n1", "n2", "n3"):
        pages.append((f"http://site4.com/{p}?page=1", f"d4-{p}-1"))
        pages.append((f"http://site4.com/{p}?page=2", f"d4-{p}-2"))
    return pages


@pytest.fixture(scope="module")
def pages_digests(spark):
    df = spark.createDataFrame(corpus(), "url string, digest string")
    return df.localCheckpoint(eager=True)


def _rules_dict(df):
    return {(r["find"], r["replace"]): (r["support"], r["refuted"])
            for r in df.collect()}


# ---------------------------------------------------------------- tests
def test_spans_match_mirror(spark):
    urls = [u for u, _ in corpus()] + [
        "http://h.example/a/b/a/b?x=1&y=22#frag",
        "http://h.example/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        "url", F.explode(dust.url_token_spans(F.col("url"))).alias("s")
    ).select("url", "s.env", "s.mid").collect()
    by_url = defaultdict(set)
    for r in got:
        by_url[r["url"]].add((r["env"], r["mid"]))
    for u in urls:
        assert by_url[u] == py_spans(u), u


def test_rules_match_mirror_exactly(spark, pages_digests):
    got = _rules_dict(dust.dust_rules(pages_digests, max_bucket=None))
    want = py_rules(corpus())
    assert got == want
    # the three intended alias rules are learned, with full support
    assert got[("index.html", "")][0] == 3
    assert got[("www.", "")][0] == 3
    assert got[("?s=7", "")][0] == 3
    # the pagination pair is refuted out
    assert ("2", "1") not in got and ("1", "2") not in got


def test_refuted_rule_dies_even_with_some_support(spark):
    # 2 envelopes agree, 1 disagrees → max_refuted=0 kills it,
    # max_refuted=1 admits it
    rows = []
    for p in ("a", "b"):
        rows.append((f"http://s.com/{p}/v1", f"d-{p}"))
        rows.append((f"http://s.com/{p}/v2", f"d-{p}"))
    rows.append(("http://s.com/c/v1", "d-c-one"))
    rows.append(("http://s.com/c/v2", "d-c-two"))
    df = spark.createDataFrame(rows, "url string, digest string")
    strict = _rules_dict(dust.dust_rules(df, max_bucket=None))
    assert ("v2", "v1") not in strict
    lax = _rules_dict(dust.dust_rules(df, max_bucket=None, max_refuted=1))
    assert lax[("v2", "v1")] == (2, 1)
    assert _rules_dict(
        dust.dust_rules(df, max_bucket=None, max_refuted=1)
    ) == py_rules(rows, max_refuted=1)


def test_apply_canonicalizes_held_out_urls(spark, pages_digests):
    rules = dust.dust_rules(pages_digests, max_bucket=None)
    compiled = dust.compile_dust_rules(rules)
    fresh = [
        ("http://www.site3.com/new?s=7", "http://site3.com/new"),
        ("http://site1.com/fresh/index.html", "http://site1.com/fresh/"),
        ("http://site9.com/untouched?page=2",
         "http://site9.com/untouched?page=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in fresh], "url string")
    got = {r["url"]: r["canonical"]
           for r in dust.apply_dust_rules(df, compiled).collect()}
    for u, want in fresh:
        assert got[u] == want
        assert got[u] == py_apply(u, compiled)


def test_apply_is_token_boundary_safe(spark):
    # learned rule "m" → "" must not eat the inside of token "mm"
    rows = []
    for p in ("a", "b"):
        rows.append((f"http://s.com/{p}/m/", f"d-{p}"))
        rows.append((f"http://s.com/{p}/", f"d-{p}"))
    df = spark.createDataFrame(rows, "url string, digest string")
    rules = dust.dust_rules(df, max_bucket=None)
    got_rules = _rules_dict(rules)
    # the learned finds carry alnum edges ("/m", "m/") — application
    # must anchor those edges at token boundaries
    assert ("/m", "") in got_rules and ("m/", "") in got_rules
    probe = spark.createDataFrame(
        [("http://s.com/mm/",), ("http://s.com/x/m/",)], "url string")
    got = {r["url"]: r["canonical"]
           for r in dust.apply_dust_rules(probe, rules).collect()}
    # "m" inside the token "mm" is untouched (lookarounds hold)
    assert got["http://s.com/mm/"] == "http://s.com/mm/"
    # a genuine /m/ segment is stripped ("/m" → "" applies first)
    assert got["http://s.com/x/m/"] == "http://s.com/x/"
    compiled = dust.compile_dust_rules(rules)
    for u, want in got.items():
        assert py_apply(u, compiled) == want


def test_arrow_and_sql_instances_identical(spark, pages_digests):
    a = dust.dust_instances(pages_digests, impl="arrow")
    s = dust.dust_instances(pages_digests, impl="sql")
    key = lambda r: (r["url"], r["env"], r["mid"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, s.collect()))
    ra = _rules_dict(dust.dust_rules(pages_digests, max_bucket=None,
                                     impl="arrow"))
    rs = _rules_dict(dust.dust_rules(pages_digests, max_bucket=None,
                                     impl="sql"))
    assert ra == rs


def test_long_urls_excluded_from_mining(spark):
    long_url = "http://h.ex/" + "/".join(f"s{i}" for i in range(80))
    df = spark.createDataFrame(
        [(long_url, "d1"), ("http://h.ex/a", "d2")],
        "url string, digest string")
    for impl in ("arrow", "sql"):
        got = dust.dust_instances(df, impl=impl)
        assert got.filter(F.col("url") == long_url).count() == 0
        assert got.filter(F.col("url") == "http://h.ex/a").count() > 0


def test_partition_invariance(spark, pages_digests):
    base = _rules_dict(dust.dust_rules(pages_digests, max_bucket=None))
    shuffled = _rules_dict(
        dust.dust_rules(pages_digests.repartition(7), max_bucket=None))
    assert base == shuffled


def test_max_bucket_truncation_is_deterministic(spark):
    # a hot envelope (32 distinct middles, all same digest) truncated
    # to 4 members keeps the 4 smallest (mid, digest, url) structs
    rows = [(f"http://hot.com/{i:02d}", "same") for i in range(32)]
    df = spark.createDataFrame(rows, "url string, digest string")
    capped = _rules_dict(dust.dust_rules(df, max_bucket=4,
                                         min_support=1))
    # pairs only among the 4 sort-smallest middles of each envelope
    full = _rules_dict(dust.dust_rules(df, max_bucket=None,
                                       min_support=1))
    assert set(capped) <= set(full)
    assert capped == _rules_dict(
        dust.dust_rules(df.repartition(5), max_bucket=4, min_support=1))


def test_savings_report(spark, pages_digests):
    rules = dust.dust_rules(pages_digests, max_bucket=None)
    row = dust.dust_savings(pages_digests, rules).collect()[0]
    # 24 distinct urls: 9 alias pairs (site1/site2/site3) collapse to
    # 9 canonicals, the 6 pagination urls stay distinct → 15
    assert row["n_urls"] == 24
    assert row["n_canonical"] == 15
    assert row["saved_fetches"] == 9
