"""Round-4 session-3 operators: crawler-trap detection, inverted
index, TrustRank. Each is checked against an in-test brute-force
mirror (plain Python / numpy) — the same discipline as
test_properties.py — plus shape assertions on the scale path."""

import math

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import indexing, linkgraph, traps


# ---------------------------------------------------------------- traps

def _trap_urls(spark):
    rows = []
    # calendar trap: one template, many urls
    for d in range(40):
        rows.append((f"https://trap.example.com/cal?date=2020-01-{d:02d}",))
    # loop trap: repeated segments
    rows.append(("https://loop.example.com/a/b/a/b/a/b/x.html",))
    # depth bomb
    rows.append(("https://deep.example.com/" + "/".join("s%d" % i for i in range(20)),))
    # healthy pages: distinct templates
    rows.append(("https://ok.example.com/about.html",))
    rows.append(("https://ok.example.com/pricing.html",))
    # two urls, one template, below threshold
    rows.append(("https://ok.example.com/post/12",))
    rows.append(("https://ok.example.com/post/977",))
    # session-id (hex) trap
    for s in range(35):
        rows.append((f"https://sid.example.com/view?sid={'%032x' % (s * 7919)}",))
    return spark.createDataFrame(rows, "url string")


def test_url_template_collapse(spark):
    df = spark.createDataFrame(
        [
            ("https://h/x?page=3&q=abc#frag",),
            ("https://h/x?page=77&q=zzz",),
            ("https://H/x?page=&q=",),
        ],
        "url string",
    )
    t = df.select(traps.url_template(F.col("url")).alias("t")).collect()
    assert {r.t for r in t} == {"https://h/x?page=*&q=*"}


def test_trap_report_flags_each_kind(spark):
    rep = traps.trap_report(_trap_urls(spark), min_urls=32).collect()
    by_host = {}
    for r in rep:
        by_host.setdefault(r.host, []).append(r)
    cal = [r for r in by_host["trap.example.com"] if r.reasons][0]
    assert cal.n_urls == 40 and "explosion" in cal.reasons
    assert cal.example.endswith("2020-01-00")  # deterministic min
    loop = by_host["loop.example.com"][0]
    assert loop.reasons == "loop" and loop.max_seg_repeat == 3
    deep = by_host["deep.example.com"][0]
    assert "depth" in deep.reasons and deep.max_depth == 20
    sid = [r for r in by_host["sid.example.com"] if r.reasons][0]
    assert sid.n_urls == 35  # 32-hex run collapsed to {h}
    assert all(r.reasons == "" for r in by_host["ok.example.com"])


def test_exclude_traps_keeps_healthy_frontier(spark):
    urls = _trap_urls(spark)
    rep = traps.trap_report(urls, min_urls=32)
    kept = traps.exclude_traps(urls, rep)
    hosts = {r[0] for r in kept.select(
        F.lower(F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    ).collect()}
    assert hosts == {"ok.example.com"}
    assert kept.count() == 4
    # broadcast anti-join: the frontier side must not Exchange
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------- index

def test_inverted_index_matches_bruteforce(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog. The DOG!"),
        (2, ""),
        (3, "cat dog cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.term: r for r in indexing.inverted_index(df).collect()}

    ref = {}
    import re
    for doc, text in docs:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        for t in set(toks):
            ref.setdefault(t, []).append((doc, toks.count(t)))
    assert set(got) == set(ref)
    for term, posts in ref.items():
        posts.sort()
        r = got[term]
        assert r.df == len(posts)
        assert r.cf == sum(tf for _, tf in posts)
        assert r.postings == ",".join(f"{d}:{tf}" for d, tf in posts)


def test_inverted_index_max_df_prunes_visibly(spark):
    df = spark.createDataFrame(
        [(i, "common unique%d" % i) for i in range(10)],
        "doc_id long, text string",
    )
    idx = indexing.inverted_index(df, max_df=0.5)
    terms = {r.term for r in idx.select("term").collect()}
    assert "common" not in terms and "unique3" in terms
    rep = indexing.index_report(df, idx).first()
    assert rep.n_terms_pruned == 1
    assert rep.n_vocab == 11 and rep.n_tokens == 20
    assert rep.n_indexed_tokens == 10


def test_lookup_is_broadcast(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string")
    idx = indexing.inverted_index(df)
    hit = indexing.lookup(idx, ["beta"])
    rows = hit.collect()
    assert len(rows) == 1 and rows[0].df == 2
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------- trustrank

def _tr_bruteforce(edges, seeds, iters, d=0.85, dp=12):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    s = [n for n in nodes if n in seeds]
    t = {n: (1.0 / len(s) if n in s else 0.0) for n in nodes}
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0) + w
    r = {n: round(t[n], dp) for n in nodes}
    for _ in range(iters):
        contrib = {n: 0.0 for n in nodes}
        for u, v, w in edges:
            contrib[v] += r[u] * w / outw[u]
        dang = sum(r[n] for n in nodes if n not in outw)
        r = {
            n: round((1 - d) * t[n] + d * (contrib[n] + dang * t[n]), dp)
            for n in nodes
        }
    return r


def test_trustrank_matches_bruteforce_with_sink(spark):
    # c is a sink: dangling mass must flow back to the seeds only
    edges = [("a", "b", 1), ("b", "c", 2), ("c2", "a", 1), ("b", "a", 1),
             ("spamhub", "spam1", 5), ("spam1", "spamhub", 5)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r.node: r.trust
        for r in linkgraph.trustrank(
            df, ["a", "c2"], iters=12, weight_col="w").collect()
    }
    ref = _tr_bruteforce(edges, {"a", "c2"}, 12)
    assert set(got) == set(ref)
    for n in ref:
        assert got[n] == pytest.approx(ref[n], abs=1e-12), n
    # mass conservation with dangling redistribution
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)
    # the seed-unreachable spam ring holds no trust at all: with t=0
    # and no inflow from the trusted region, its mass decays to 0 —
    # the TrustRank property that raw PageRank lacks
    assert got["spamhub"] == 0.0 and got["spam1"] == 0.0
    assert min(got["a"], got["c2"]) > 0.0


def test_trustrank_no_seed_raises(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        linkgraph.trustrank(df, ["zzz"], iters=1)


# ------------------------------------------------------------------ hits

def _hits_bruteforce(edges, iters, dp=12):
    import math as m
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    hub = {n: 1.0 for n in nodes}
    nrm = m.sqrt(sum(v * v for v in hub.values()))
    hub = {n: round(v / nrm, dp) for n, v in hub.items()}
    auth = {}
    for _ in range(iters):
        auth = {n: 0.0 for n in nodes}
        for u, v, w in edges:
            auth[v] += hub[u] * w
        nrm = m.sqrt(sum(v * v for v in auth.values()))
        auth = {n: round(v / nrm, dp) if nrm > 0 else 0.0
                for n, v in auth.items()}
        hub = {n: 0.0 for n in nodes}
        for u, v, w in edges:
            hub[u] += auth[v] * w
        nrm = m.sqrt(sum(v * v for v in hub.values()))
        hub = {n: round(v / nrm, dp) if nrm > 0 else 0.0
               for n, v in hub.items()}
    return hub, auth


def test_hits_matches_bruteforce(spark):
    # hubdir links everywhere (pure hub); pop is linked by all (pure
    # authority); x/y are mixed; sink has no role
    edges = [("hubdir", "pop", 2), ("hubdir", "x", 1), ("hubdir", "y", 1),
             ("x", "pop", 1), ("y", "pop", 1), ("x", "sink", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: (r.hub, r.auth)
           for r in linkgraph.hits(df, iters=8, weight_col="w").collect()}
    hub, auth = _hits_bruteforce(edges, 8)
    assert set(got) == set(hub)
    for n in hub:
        assert got[n][0] == pytest.approx(hub[n], abs=1e-9), ("hub", n)
        assert got[n][1] == pytest.approx(auth[n], abs=1e-9), ("auth", n)
    # the structural roles separate
    assert max(got, key=lambda n: got[n][0]) == "hubdir"
    assert max(got, key=lambda n: got[n][1]) == "pop"
    assert got["hubdir"][1] == 0.0 and got["sink"][0] == 0.0


# ----------------------------------------------------------------- salsa

def _salsa_bruteforce(edges, iters, dp=12):
    hubs = sorted({u for u, _, _ in edges})
    auths = sorted({v for _, v, _ in edges})
    dout, din = {}, {}
    for u, v, w in edges:
        dout[u] = dout.get(u, 0.0) + w
        din[v] = din.get(v, 0.0) + w

    def l1(d):
        n = sum(d.values())
        return {k: round(x / n, dp) if n > 0 else 0.0
                for k, x in d.items()}

    auth = l1({a: 1.0 for a in auths})
    hub = l1({h: 1.0 for h in hubs})
    for _ in range(iters):
        t = {h: 0.0 for h in hubs}
        for u, v, w in edges:
            t[u] += auth[v] * w / din[v]
        a2 = {a: 0.0 for a in auths}
        for u, v, w in edges:
            a2[v] += t[u] * w / dout[u]
        auth = l1(a2)
        s = {a: 0.0 for a in auths}
        for u, v, w in edges:
            s[v] += hub[u] * w / dout[u]
        h2 = {h: 0.0 for h in hubs}
        for u, v, w in edges:
            h2[u] += s[v] * w / din[v]
        hub = l1(h2)
    return hub, auth


def test_salsa_matches_bruteforce_weighted(spark):
    edges = [("hubdir", "pop", 2), ("hubdir", "x", 1), ("hubdir", "y", 1),
             ("x", "pop", 1), ("y", "pop", 1), ("x", "sink", 3)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: (r.hub, r.auth)
           for r in linkgraph.salsa(df, iters=8, weight_col="w").collect()}
    hub, auth = _salsa_bruteforce([(u, v, float(w)) for u, v, w in edges], 8)
    assert set(got) == set(hub) | set(auth)
    for n in got:
        assert got[n][0] == pytest.approx(hub.get(n, 0.0), abs=1e-9), ("hub", n)
        assert got[n][1] == pytest.approx(auth.get(n, 0.0), abs=1e-9), ("auth", n)
    # pure-authority sink contributes no hub mass; pure hub no auth mass
    assert got["sink"][0] == 0.0 and got["hubdir"][1] == 0.0
    # partition invariance (deterministic to the sync rounding)
    got7 = {r.node: (r.hub, r.auth)
            for r in linkgraph.salsa(df.repartition(7), iters=8,
                                     weight_col="w").collect()}
    for n in got:
        assert got7[n][0] == pytest.approx(got[n][0], abs=1e-9)
        assert got7[n][1] == pytest.approx(got[n][1], abs=1e-9)


def test_salsa_stationary_closed_forms(spark):
    # Lempel & Moran: unweighted + connected authority-side support ⇒
    # stationary auth ∝ in-degree (hub ∝ out-degree on the hub side)
    edges = [("h1", "a", 1), ("h1", "b", 1), ("h1", "c", 1),
             ("h2", "b", 1), ("h2", "c", 1), ("h3", "c", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: (r.hub, r.auth)
           for r in linkgraph.salsa(df, iters=20).collect()}
    for n, din in [("a", 1), ("b", 2), ("c", 3)]:
        assert got[n][1] == pytest.approx(din / 6, abs=1e-9), n
    for n, dout in [("h1", 3), ("h2", 2), ("h3", 1)]:
        assert got[n][0] == pytest.approx(dout / 6, abs=1e-9), n

    # disconnected support: each component keeps its initial mass
    # share |A_j|/|A|, distributed ∝ in-degree within the component
    edges2 = [("h1", "a", 1), ("h1", "b", 1), ("h3", "b", 1),
              ("h2", "c", 1)]
    df2 = spark.createDataFrame(edges2, "src string, dst string, w long")
    got2 = {r.node: r.auth
            for r in linkgraph.salsa(df2, iters=20).collect()}
    assert got2["a"] == pytest.approx(2 / 9, abs=1e-9)
    assert got2["b"] == pytest.approx(4 / 9, abs=1e-9)
    assert got2["c"] == pytest.approx(3 / 9, abs=1e-9)

    # the link-farm contrast vs HITS: a mega-hub's mass is divided by
    # its out-degree, so farm targets cannot each inherit full weight
    # (ed1→t0 connects the support; stationary is then ∝ in-degree:
    # good 3/12 > t0 2/12 > t1..t7 1/12 — whereas HITS' mutual
    # reinforcement hands the 8-target farm the top authority slots)
    farm = [("farm", f"t{i}", 1) for i in range(8)] + \
           [("ed1", "good", 1), ("ed2", "good", 1), ("ed3", "good", 1),
            ("ed1", "t0", 1)]
    dff = spark.createDataFrame(farm, "src string, dst string, w long")
    gf = {r.node: r.auth for r in linkgraph.salsa(dff, iters=90).collect()}
    assert gf["good"] == pytest.approx(3 / 12, abs=1e-6)
    assert gf["t0"] == pytest.approx(2 / 12, abs=1e-6)
    assert gf["t1"] == pytest.approx(1 / 12, abs=1e-6)
    assert gf["good"] > gf["t0"] > gf["t1"]


# ----------------------------------------------------- host boilerplate

def _bp_docs():
    foot = "(c) 2025 Acme Corp"
    nav = "Home | Products | About"
    rows = []
    for i in range(6):
        body = f"unique article {i} body text"
        extra = "\nsubscribe box" if i < 2 else ""   # only 2/6 pages
        rows.append(("a.com", i, f"{nav}\n{body}{extra}\n{foot}"))
    rows.append(("b.com", 10, f"{nav}\nb-one"))      # nav legit on b.com:
    rows.append(("b.com", 11, "b-two only"))         # 1/2 pages < 3 pages
    rows.append(("c.com", 20, "solo page\n" + foot))  # below min_pages
    return rows


def test_host_boilerplate_detect_and_strip(spark):
    from website_to_agent_spark.operators import webtext

    docs = spark.createDataFrame(
        _bp_docs(), "host string, doc_id long, text string")
    flagged = webtext.host_boilerplate_lines(
        docs, min_frac=0.5, min_pages=3)
    rows = flagged.collect()
    # only a.com qualifies (6 pages); nav+footer on 6/6, subscribe 2/6
    assert {r.host for r in rows} == {"a.com"}
    assert len(rows) == 2 and all(r.frac == 1.0 for r in rows)

    out = {r.doc_id: r for r in webtext.strip_host_boilerplate(
        docs, flagged).collect()}
    for i in range(6):
        t = out[i].text
        assert "Acme Corp" not in t and "Products" not in t
        assert f"unique article {i}" in t
        assert out[i].n_boilerplate_removed == 2
    # subscribe box (2/6) survives; other hosts untouched
    assert "subscribe box" in out[0].text
    assert out[10].text.startswith("Home | Products")
    assert out[10].n_boilerplate_removed == 0
    assert "Acme Corp" in out[20].text


# ---------------------------------------------------- compression ratio

def test_compression_ratio_signal(spark):
    import random
    import string
    import zlib

    from website_to_agent_spark.operators import webtext

    rng = random.Random(7)
    fluent = ("the quick brown fox jumps over the lazy dog while "
              "researchers measure entropy in web corpora ") * 8
    repetitive = "subscribe now! " * 120
    noise = "".join(rng.choice(string.ascii_letters + string.digits)
                    for _ in range(1500))
    rows = [(0, fluent), (1, repetitive), (2, noise), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.cr for r in df.select(
        "doc_id",
        webtext.compression_ratio(F.col("text")).alias("cr")).collect()}
    # exact vs the same zlib call (determinism, not just ordering)
    for i, t in rows[:3]:
        raw = t.encode()
        assert got[i] == pytest.approx(len(zlib.compress(raw, 6)) / len(raw))
    assert got[1] < got[0] < got[2]
    assert got[3] == 1.0 and got[4] is None

    ok = {r.doc_id: r.ok for r in df.select(
        "doc_id", webtext.compression_ok(
            webtext.compression_ratio(F.col("text"))).alias("ok")).collect()}
    assert ok[0] is True and ok[1] is False


# ------------------------------------------------- sitemap url metadata

SITEMAP_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/p/high.html</loc>
    <lastmod>2025-06-01T12:00:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.9</priority>
  </url>
  <url><loc> https://ex.com/p/default.html </loc></url>
  <url>
    <loc>https://ex.com/p/low.html</loc>
    <priority>0.1</priority>
    <lastmod>2024-01-15</lastmod>
  </url>
</urlset>"""


def test_sitemap_url_entries_and_priority_drain(spark):
    from datetime import datetime

    from website_to_agent_spark import fixtures
    from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob
    from website_to_agent_spark.sources.seeds import sitemap_url_entries

    sm = spark.createDataFrame([(SITEMAP_XML,)], "html binary")
    ent = {r.url: r for r in sitemap_url_entries(sm).collect()}
    assert ent["https://ex.com/p/high.html"].priority == 0.9
    assert ent["https://ex.com/p/high.html"].changefreq == "daily"
    assert ent["https://ex.com/p/default.html"].priority == 0.5
    assert ent["https://ex.com/p/default.html"].lastmod is None
    assert ent["https://ex.com/p/low.html"].lastmod == "2024-01-15"

    # the site owner's priorities drive the engine's ranked drain
    def page(url, links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return {"url": url, "warc_ts": datetime(2025, 1, 1),
                "html": (f"<html><body><main><p>content {url} long "
                         f"enough</p>{body}</main></body></html>").encode(),
                "text": None, "lang": None}

    leaves = list(ent)
    pages = fixtures.pages_rows_to_spark(
        spark, [page("https://ex.com/", leaves)]
        + [page(u, []) for u in leaves])
    prio = sitemap_url_entries(sm).select(
        "url", F.col("priority").alias("score"))
    res = CrawlEngine(spark, pages, mode="client", batch_per_job=8,
                      priority=prio).run(
        [CrawlJob("j", "https://ex.com/", max_urls=3)])
    got = {r.url for r in res.crawled.filter(F.col("success")).collect()}
    # budget 3 = seed + the two highest-priority sitemap urls
    assert got == {"https://ex.com/",
                   "https://ex.com/p/high.html",
                   "https://ex.com/p/default.html"}
    res.unpersist()


# ------------------------------------------------------- rel=canonical

def test_canonical_of_and_dedup(spark):
    from website_to_agent_spark.operators import webtext

    def page(url, canon=None, order="rel_first"):
        if canon is None:
            link = ""
        elif order == "rel_first":
            link = f'<link rel="canonical" href="{canon}">'
        else:
            link = f"<link href='{canon}' rel='canonical'>"
        return (url, f"<html><head>{link}</head><body>x</body></html>"
                .encode())

    rows = [
        page("https://ex.com/a?utm_source=tw", "https://ex.com/a"),
        page("https://ex.com/a/print", "https://ex.com/a",
             order="href_first"),
        page("https://m.ex.com/a", "https://ex.com/a"),
        page("https://ex.com/b/amp", "/b"),          # root-relative
        page("https://ex.com/c"),                     # none declared
        page("https://ex.com/c?utm_source=x"),        # none → url canon
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    decl = {r.url: r.c for r in df.select(
        "url", webtext.canonical_of(F.col("html")).alias("c")).collect()}
    assert decl["https://ex.com/a?utm_source=tw"] == "https://ex.com/a"
    assert decl["https://ex.com/a/print"] == "https://ex.com/a"
    assert decl["https://ex.com/c"] is None

    out = {r.canon_url: (r.url, r.n_variants)
           for r in webtext.canonical_dedup_best(df).collect()}
    assert out["https://ex.com/a"][1] == 3
    assert out["https://ex.com/b"] == ("https://ex.com/b/amp", 1)
    # undeclared pages collapse on normalized URL (utm stripped)
    assert out["https://ex.com/c"][1] == 2
    assert len(out) == 3


# ----------------------------------------------------------- blocklist

def test_blocklist_word_boundary_and_filter(spark):
    from website_to_agent_spark.operators import webtext

    rows = [
        (0, "a perfectly clean document about assassins and classics"),
        (1, "contains the BADWORD in caps"),
        (2, "badword!"),          # punctuation-adjacent still a token
        (3, "no problems here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ok = {r.doc_id: r.ok for r in docs.select(
        "doc_id", webtext.blocklist_ok(
            F.col("text"), ["badword", "ass"]).alias("ok")).collect()}
    # token-level: "assassins"/"classics" never trip "ass"
    assert ok == {0: True, 1: False, 2: False, 3: True}

    wl = spark.createDataFrame([("badword",), ("ass",)], "w string")
    kept = {r.doc_id for r in webtext.blocklist_filter(docs, wl).collect()}
    assert kept == {0, 3}


def test_spam_mass_separates_link_farm(spark):
    # good core: seed g0 -> g1 -> g2 (a chain the trust sweep reaches);
    # link farm: f1..f4 all point at spam target s0 (high PageRank,
    # zero trusted inflow) and at each other's hub f0.
    edges = [("g0", "g1"), ("g1", "g2"), ("g2", "g0")]
    edges += [(f"f{i}", "s0") for i in range(0, 5)]
    edges += [(f"f{i}", "f0") for i in range(1, 5)]
    edges += [("f0", f"f{i}") for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    pr = linkgraph.pagerank(df, iters=12)
    tr = linkgraph.trustrank(df, ["g0"], iters=12)
    m = {r["node"]: r for r in linkgraph.spam_mass(pr, tr).collect()}

    # the farm target's rank is unreachable from the seed: rel ≈ 1
    assert m["s0"]["trust"] == pytest.approx(0.0, abs=1e-9)
    assert m["s0"]["rel_mass"] == pytest.approx(1.0, abs=1e-6)
    # the seed holds more trust than rank share: rel_mass ≤ 0
    assert m["g0"]["rel_mass"] <= 0.0
    # good chain nodes sit clearly below the farm on relative mass
    assert m["g2"]["rel_mass"] < m["s0"]["rel_mass"]
    # identity: abs_mass = rank - trust, every node
    for r in m.values():
        assert r["abs_mass"] == pytest.approx(
            r["rank"] - r["trust"], abs=1e-12)
    # paper's actionable slice — threshold rel, sort by rank — puts the
    # farm target first among high-mass nodes
    spam = sorted(
        (r for r in m.values() if r["rel_mass"] is not None
         and r["rel_mass"] >= 0.99),
        key=lambda r: -r["rank"],
    )
    assert spam and spam[0]["node"] == "s0"


def test_spam_mass_outer_join_guards(spark):
    # disjoint node sets: rank-only node gets trust 0 / rel 1; trust-
    # only node gets rank 0 and a NULL rel_mass (nothing to attribute)
    pr = spark.createDataFrame([("a", 0.6), ("b", 0.4)],
                               "node string, rank double")
    tr = spark.createDataFrame([("b", 0.2), ("c", 0.8)],
                               "node string, trust double")
    m = {r["node"]: r for r in linkgraph.spam_mass(pr, tr).collect()}
    assert m["a"]["trust"] == 0.0 and m["a"]["rel_mass"] == 1.0
    assert m["c"]["rank"] == 0.0 and m["c"]["rel_mass"] is None
    assert m["b"]["rel_mass"] == pytest.approx((0.4 - 0.2) / 0.4)
