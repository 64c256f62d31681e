"""Seed sources (S3/S4/S5/J3/F14), TTL cache (S7), EP3 seeder pipeline
(head extraction + BM25 + threshold + sort + cap), knowledge stand-in
(A11), sections (P22), snapshot diff (J6)."""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark import fixtures
from website_to_agent_spark.operators import knowledge, seeder_pipeline, snapshots
from website_to_agent_spark.operators import textquality as tq
from website_to_agent_spark.sources import seeds as seed_sources
from website_to_agent_spark.sources.cache import ResultCache, cache_key


@pytest.fixture(scope="module")
def pages_with_sitemap(spark, site):
    rows = list(site.rows)
    d0_urls = [r["url"] for r in rows if "site0" in r["url"]][:6]
    xml = seed_sources.sitemap_xml(d0_urls)
    rows.append(
        {
            "url": "https://www.site0.example0.com/sitemap.xml",
            "warc_ts": rows[0]["warc_ts"],
            "html": xml.encode(),
            "text": "",
            "lang": "en",
        }
    )
    return fixtures.pages_rows_to_spark(spark, rows).localCheckpoint(True), d0_urls


def test_sitemap_and_combined_sources(spark, pages_with_sitemap):
    pages, d0_urls = pages_with_sitemap
    sm = seed_sources.sitemap_seeds(pages, "site0.example0.com")
    assert {r.url for r in sm.collect()} == set(d0_urls)

    cc = seed_sources.cc_seeds(pages, "site0.example0.com")
    assert cc.count() > len(d0_urls)

    both = seed_sources.combined_seeds(sm, cc)
    assert both.count() == cc.count()  # sitemap ⊂ cc here
    assert both.dropDuplicates(["url"]).count() == both.count()


def test_url_list_and_live_check(spark, pages_df, site):
    urls = [site.seeds[0], "https://nope.example/x"]
    seeds = seed_sources.url_list_seeds(spark, urls)
    live = seed_sources.live_check(seeds, pages_df)
    assert {r.url for r in live.collect()} == {site.seeds[0]}


def test_result_cache_ttl_and_force(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "cache"), ttl=timedelta(days=7))
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(1, "a")], "id long, v string")

    key = cache_key(domain="x.com", source="cc")
    now = datetime(2025, 6, 1, tzinfo=timezone.utc)
    _, hit1 = cache.get_or_compute(key, compute, now=now)
    _, hit2 = cache.get_or_compute(key, compute, now=now + timedelta(days=1))
    assert (hit1, hit2) == (False, True) and len(calls) == 1
    # TTL expiry recomputes
    _, hit3 = cache.get_or_compute(key, compute, now=now + timedelta(days=8))
    assert not hit3 and len(calls) == 2
    # force bypass recomputes (`test_url_seeder.py:479-514`)
    _, hit4 = cache.get_or_compute(key, compute, force=True,
                                   now=now + timedelta(days=8))
    assert not hit4 and len(calls) == 3


@pytest.fixture(scope="module")
def head_pages(spark):
    rows = []
    for i in range(8):
        html = (
            f'<html lang="en"><head><meta charset="utf-8">'
            f"<title>Spark guide part {i}</title>"
            f'<meta name="description" content="crawl frontier doc {i}">'
            f'<meta property="og:title" content="OG {i}">'
            f'<script type="application/ld+json">{{"@type":"Article","n":{i}}}</script>'
            f"</head><body><p>body {i}</p></body></html>"
        )
        rows.append((f"https://h.test/p/{i}.html", html.encode()))
    # one page without metadata
    rows.append(("https://h.test/bare.html", b"<html><body>x</body></html>"))
    return spark.createDataFrame(rows, "url string, html binary").withColumns(
        {"warc_ts": F.lit("2025-01-01").cast("timestamp"),
         "text": F.lit(""), "lang": F.lit("en")}
    ).localCheckpoint(True)


def test_head_extraction(spark, head_pages):
    from website_to_agent_spark.functions.extract import head_udf

    row = head_pages.filter(F.col("url").endswith("/p/3.html")).select(
        head_udf(F.col("html")).alias("h")
    ).first().h
    assert row.title == "Spark guide part 3"
    assert row.charset == "utf-8"
    assert row.lang == "en"
    assert row.meta["description"] == "crawl frontier doc 3"
    assert row.meta["og:title"] == "OG 3"
    assert '"@type":"Article"' in row.jsonld[0]


def test_seeder_pipeline_scoring(spark, head_pages):
    recs = seeder_pipeline.seed_and_score(
        head_pages, "h.test", source="cc", query="spark guide",
        extract_head=True,
    ).collect()
    assert all(r.status == "valid" for r in recs)
    scores = [r.relevance_score for r in recs]
    assert max(scores) == 1.0 and min(scores) == 0.0   # normalized
    assert scores == sorted(scores, reverse=True)       # O1 sort
    # bare page scores 0 (no head text hits)
    bare = next(r for r in recs if r.url.endswith("bare.html"))
    assert bare.relevance_score == 0.0

    # empty query ⇒ all-zero (`test_url_seeder.py:221-235`)
    zero = seeder_pipeline.seed_and_score(
        head_pages, "h.test", query="", extract_head=True
    ).agg(F.max("relevance_score")).first()[0]
    assert zero == 0.0

    # no extract_head ⇒ no scores (`test_url_seeder.py:237-252`)
    ns = seeder_pipeline.seed_and_score(
        head_pages, "h.test", query="spark", extract_head=False
    ).collect()
    assert all(r.relevance_score is None for r in ns)

    # threshold + cap (F12/O2)
    top = seeder_pipeline.seed_and_score(
        head_pages, "h.test", query="spark guide",
        score_threshold=0.5, max_urls=3,
    ).collect()
    assert len(top) <= 3 and all(r.relevance_score >= 0.5 for r in top)

    # invalid source raises (`test_async_url_seeder.py:403-437`)
    with pytest.raises(ValueError):
        seeder_pipeline.seed_and_score(head_pages, "h.test", source="bogus")

    report = seeder_pipeline.score_report(
        seeder_pipeline.seed_and_score(head_pages, "h.test", query="spark guide")
    ).first()
    assert report.n_urls == 9 and report.max_score == 1.0


def test_knowledge_standins(spark):
    docs = spark.createDataFrame(
        [
            ("u1",
             "frontier frontier frontier partition partition shuffle. "
             "This is a long first sentence about crawling the web! "
             "Another insight sentence follows here.\n"
             "politeness: the per-host rate limit discipline\n"),
        ],
        "url string, text string",
    )
    dk = knowledge.extract_domain_knowledge(docs).first()
    names = [c.name for c in dk.core_concepts]
    assert names[0] == "frontier"
    assert dk.core_concepts[0].importance_score == 1.0
    assert len(dk.key_insights) >= 2
    assert dk.key_insights[0].confidence == 1.0
    assert any(t.term == "politeness" for t in dk.terminology)
    assert dk.source_url == "u1"


def test_sections_splitter(spark):
    md = "intro text\n# First\nbody one\n## Second\nbody two\nmore"
    row = spark.createDataFrame([(md,)], "md string").select(
        tq.extract_sections(F.col("md")).alias("s")
    ).first()
    secs = [(s.title, s.content) for s in row.s]
    assert secs[0] == ("Introduction", "intro text")
    assert secs[1] == ("First", "body one")
    assert secs[2] == ("Second", "body two\nmore")


def test_snapshot_diff(spark):
    base = spark.createDataFrame(
        [("u1", "same"), ("u2", "old"), ("u3", "gone")], "url string, text string"
    )
    cur = spark.createDataFrame(
        [("u1", "same"), ("u2", "new longer"), ("u4", "fresh")],
        "url string, text string",
    )
    diff = {r.url: r.change for r in snapshots.snapshot_diff(base, cur).collect()}
    assert diff == {"u2": "changed", "u3": "removed", "u4": "added"}


def test_safe_error_display(spark):
    out = spark.createDataFrame(
        [("Bad <thing> happened @ /x\n\n  twice!" + "x" * 600,)], "e string"
    ).select(tq.safe_error_display(F.col("e")).alias("s")).first().s
    assert "<" not in out and "@" not in out
    assert len(out) <= 500


def test_term_set_intersection(spark):
    df = spark.createDataFrame(
        [(["spark", "crawl", "x"], ["crawl"], ["spark", "y"])],
        "q array<string>, t array<string>, d array<string>",
    )
    got = df.select(
        tq.term_set_intersection(F.col("q"), F.col("t"), F.col("d")).alias("i")
    ).first().i
    assert got == ["crawl", "spark"]


def test_warc_roundtrip_and_crawl(spark, tmp_path, site):
    """WARC archive → pages table → CrawlEngine: bodies byte-identical
    through the writer/parser pair (plain + per-record gzip, the CC
    layout), non-response records skipped, only_ok_html filter works,
    and a crawl over the WARC-sourced store matches one over the
    original pages frame."""
    from website_to_agent_spark import fixtures
    from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob
    from website_to_agent_spark.sources import warc

    rows = site.rows[:12]
    records = [
        (r["url"], "2025-01-01T00:00:00Z", 200, "text/html; charset=utf-8",
         bytes(r["html"]))
        for r in rows
    ]
    records.append(  # non-HTML + non-200 rows for the filter
        ("https://x.test/plain.txt", "2025-01-01T00:00:00Z", 200,
         "text/plain", b"not html"))
    records.append(
        ("https://x.test/gone.html", "2025-01-01T00:00:00Z", 404,
         "text/html", b"gone"))

    plain = str(tmp_path / "a.warc")
    gz = str(tmp_path / "b.warc.gz")
    warc.write_warc(records, plain)
    warc.write_warc(records, gz, gzip_records=True)

    for path in (plain, gz):
        got = {r.url: r for r in warc.warc_pages(spark, path).collect()}
        assert len(got) == len(records)
        for url, _, status, ctype, body in records:
            assert bytes(got[url].html) == body, url
            assert got[url].status_code == status
        ok = warc.warc_pages(spark, path, only_ok_html=True)
        assert ok.count() == len(rows)

    # crawl over the WARC-backed store == crawl over the original frame
    pages_warc = warc.warc_pages(spark, plain, only_ok_html=True).select(
        "url", "html").localCheckpoint(eager=True)
    pages_orig = fixtures.pages_rows_to_spark(spark, rows).select("url", "html")
    seed = rows[0]["url"]
    a = CrawlEngine(spark, pages_warc, mode="client").run(
        [CrawlJob("w", seed, max_urls=4)])
    b = CrawlEngine(spark, pages_orig, mode="client").run(
        [CrawlJob("w", seed, max_urls=4)])
    ra = [(r.url, r.success, r.text) for r in a.crawled.orderBy("fetch_ord").collect()]
    rb = [(r.url, r.success, r.text) for r in b.crawled.orderBy("fetch_ord").collect()]
    assert ra == rb and len(ra) > 0


def test_warc_damaged_archives_skip_tail(tmp_path):
    """Real CC archives contain oddities: a truncated or malformed
    record must skip the damaged tail (keeping the intact prefix), not
    raise and fail the whole file's task. Pure-Python (no Spark)."""
    import gzip as _gzip

    from website_to_agent_spark.sources import warc

    records = [
        (f"https://x.test/{i}.html", "2025-01-01T00:00:00Z", 200,
         "text/html", f"<html>page {i} {'y' * 100}</html>".encode())
        for i in range(5)
    ]

    def archive(recs, gz=False):
        p = str(tmp_path / (f"t{len(recs)}{gz}.warc" + (".gz" if gz else "")))
        warc.write_warc(recs, p, gzip_records=gz)
        with open(p, "rb") as fh:
            return fh.read()

    whole = archive(records)
    assert len(warc.parse_warc_bytes(whole)) == 5

    # cut mid-record: records 0..k-1 intact, last one truncated
    cut = whole[: len(whole) - len(whole) // 4]
    got = warc.parse_warc_bytes(cut)
    assert 0 < len(got) < 5
    assert [g[0] for g in got] == [r[0] for r in records[: len(got)]]

    # truncated header (cut inside the WARC header block of record 3)
    hdr3 = whole.index(b"WARC/1.0", len(whole) // 2)
    got = warc.parse_warc_bytes(whole[: hdr3 + 20])
    assert 0 < len(got) < 5

    # garbage splice between records: prefix parsed, tail skipped
    mid = whole.index(b"WARC/1.0", 100)
    got = warc.parse_warc_bytes(whole[:mid] + b"GARBAGE" + whole[mid:])
    assert [g[0] for g in got] == [records[0][0]]

    # malformed content-length
    bad = whole.replace(b"Content-Length: ", b"Content-Length: zz", 1)
    assert warc.parse_warc_bytes(bad) == []  # first framing header broken

    # gzip: corrupt final member keeps the intact prefix
    gz_whole = archive(records, gz=True)
    assert len(warc.parse_warc_bytes(gz_whole)) == 5
    corrupt = gz_whole[:-40] + b"\x00" * 40
    got = warc.parse_warc_bytes(corrupt)
    assert 0 < len(got) < 5

    # truncated gzip (download cut off)
    got = warc.parse_warc_bytes(gz_whole[: len(gz_whole) // 2])
    assert 0 < len(got) < 5


def test_domain_agent_compat(spark, pages_df, site):
    """A11 compat surface: create_domain_agent composes crawl →
    knowledge extraction → the reference's system-prompt template
    (agents.py:352-425) and chats through an injected endpoint."""
    from website_to_agent_spark import agents_compat
    from website_to_agent_spark.operators.llm import DeterministicEndpoint

    agent = agents_compat.create_domain_agent(
        spark, pages_df, site.seeds[0],
        endpoint=DeterministicEndpoint(max_chars=1_000_000), max_urls=3,
    )
    sp = agent.system_prompt
    assert "## YOUR KNOWLEDGE BASE" in sp
    assert "### Core Concepts and Areas of Expertise:" in sp
    assert site.seeds[0] in sp
    assert "⭐" in sp                     # concept importance indicators
    assert "💡" in sp or "🔥" in sp or "💭" in sp  # insight indicators
    # domain name = top concept, woven into the role line
    top = agent.knowledge["core_concepts"][0]["name"]
    assert sp.startswith(
        f"You are a knowledgeable AI assistant specializing in {top}.")

    reply = agent.chat("what is this site about?")
    assert reply.startswith("OK(")       # deterministic endpoint answered

    # endpoint failure → the reference's apology contract, not a raise
    failing = agents_compat.DomainAgent(
        agent.knowledge, DeterministicEndpoint(max_chars=1))
    assert failing.chat("hi").startswith("I apologize")


def test_wet_and_generic_records(spark, tmp_path):
    """WET (CC extracted-text) round-trip: unicode text byte-exact
    through writer → wet_docs, mixed-type archives filter by record
    type, and warc_records reads any WARC-Type generically."""
    from website_to_agent_spark.sources import warc

    docs = [
        ("https://a.test/1", "2025-01-01T00:00:00Z", "plain text one"),
        ("https://a.test/2", "2025-01-01T00:00:01Z",
         "unicode: héllo — 世界 🙂\nsecond line"),
        ("https://a.test/3", "2025-01-01T00:00:02Z", ""),
    ]
    plain = str(tmp_path / "x.warc.wet")
    gz = str(tmp_path / "x.warc.wet.gz")
    warc.write_wet(docs, plain)
    warc.write_wet(docs, gz, gzip_records=True)
    for path in (plain, gz):
        got = {r.url: r.text for r in warc.wet_docs(spark, path).collect()}
        assert got == {u: t for u, t, in
                       [(u, t) for u, _, t in docs]}, path

    # a WET archive contains no response records; a WARC archive
    # contains no conversion records — the generic reader filters
    warc.write_warc(
        [("https://a.test/h", "2025-01-01T00:00:00Z", 200, "text/html",
          b"<html>x</html>")],
        str(tmp_path / "y.warc"),
    )
    both_dir = str(tmp_path)
    conv = warc.warc_records(spark, both_dir + "/*", "conversion")
    resp = warc.warc_records(spark, both_dir + "/*", "response")
    assert conv.count() == 2 * len(docs)
    assert resp.count() == 1
    body = resp.collect()[0]
    assert bytes(body.body).startswith(b"HTTP/1.1 200")


def test_sitemap_index_recursion(spark):
    """Nested sitemap indexes: index → index → urlset walks to the
    page urls, never emits child-sitemap urls as seeds, survives
    cycles, and respects max_depth."""
    from datetime import datetime

    from website_to_agent_spark.sources import seeds as seeds_mod

    def sm(url, locs, index=False):
        tag = "sitemapindex" if index else "urlset"
        body = (f'<?xml version="1.0"?><{tag}>'
                + "".join(f"<loc> {u} </loc>" for u in locs)
                + f"</{tag}>").encode()
        return (url, datetime(2025, 1, 1), body, None, None)

    H = "https://s.test"
    rows = [
        sm(f"{H}/sitemap.xml",
           [f"{H}/sm_a.xml", f"{H}/sm_idx2.xml"], index=True),
        sm(f"{H}/sm_a.xml", [f"{H}/p/1", f"{H}/p/2"]),
        sm(f"{H}/sm_idx2.xml",
           [f"{H}/sm_b.xml", f"{H}/sitemap.xml"], index=True),  # cycle!
        sm(f"{H}/sm_b.xml", [f"{H}/p/3"]),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    start = spark.createDataFrame([(f"{H}/sitemap.xml",)], "url string")
    got = {r["url"] for r in seeds_mod.sitemap_seeds_recursive(
        pages, start).collect()}
    assert got == {f"{H}/p/1", f"{H}/p/2", f"{H}/p/3"}

    # gzipped sitemaps (.xml.gz bodies) parse transparently
    import gzip as _gzip
    gz_rows = [
        (u, ts, _gzip.compress(bytes(b)) if u.endswith("sm_a.xml") else b,
         t, l)
        for (u, ts, b, t, l) in rows
    ]
    gz_pages = spark.createDataFrame(
        gz_rows, "url string, warc_ts timestamp, html binary, "
                 "text string, lang string")
    got_gz = {r["url"] for r in seeds_mod.sitemap_seeds_recursive(
        gz_pages, start).collect()}
    assert got_gz == got
    shallow = {r["url"] for r in seeds_mod.sitemap_seeds_recursive(
        pages, start, max_depth=1).collect()}
    assert shallow == set()   # level 1 is indexes only


def test_warc_sink_roundtrip_deterministic(spark, tmp_path):
    """Distributed WARC sink: pages → part-NNNNN.warc.gz shards →
    warc_pages reads back the exact rows; bytes are identical across
    re-runs and input partitionings (md5 shard + in-shard order +
    mtime=0 gzip); manifest accounts for every record; mode
    semantics."""
    import hashlib
    import os

    import pytest

    from website_to_agent_spark.sources import warc

    rows = [
        (f"https://h{i % 5}.example.com/p/{i}", f"2025-01-0{1 + i % 9}",
         200 if i % 4 else 404, "text/html",
         (f"<html><body>pagé {i} é中</body></html>"
          if i % 3 else "").encode("utf-8") + (b"\x00\xff" if i % 7 == 0
                                               else b""))
        for i in range(60)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, status_code int,"
              " content_type string, html binary")
    out = str(tmp_path / "warcs")
    man = warc.warc_sink(pages, out, n_shards=4).collect()
    assert sum(m.n_records for m in man) == 60
    files = sorted(os.listdir(out))
    assert files == sorted(os.path.basename(m.file) for m in man)
    assert all(f.startswith("part-") and f.endswith(".warc.gz")
               for f in files)

    back = warc.warc_pages(spark, out + "/*.warc.gz")
    got = {(r.url, r.warc_ts, r.status_code, r.content_type, bytes(r.html))
           for r in back.collect()}
    want = {(u, t, s, c, b) for u, t, s, c, b in rows}
    assert got == want

    def digest(d):
        h = hashlib.md5()
        for f in sorted(os.listdir(d)):
            h.update(f.encode())
            h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    d1 = digest(out)
    out2 = str(tmp_path / "warcs2")
    warc.warc_sink(pages.repartition(13), out2, n_shards=4)
    assert digest(out2) == d1  # partitioning-invariant bytes

    with pytest.raises(FileExistsError):
        warc.warc_sink(pages, out, n_shards=4)
    warc.warc_sink(pages.limit(10), out, n_shards=4, mode="overwrite")
    assert warc.warc_pages(spark, out + "/*.warc.gz").count() == 10


def test_warc_sink_cdx_index_ranged_reads(spark, tmp_path):
    """index=True returns the CDX-style per-record index; every record
    is fetchable with ONE ranged read (read_warc_member), warc_lookup
    point-reads a url set, offsets tile each file exactly, and the
    manifest equals the index aggregated."""
    from website_to_agent_spark.sources import warc

    rows = [
        (f"https://h{i % 3}.example.com/p/{i}", "2025-02-02", 200,
         "text/html", f"<html>page {i} body</html>".encode())
        for i in range(40)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, status_code int,"
              " content_type string, html binary")
    out = str(tmp_path / "warcs")
    idx = warc.warc_sink(pages, out, n_shards=3, index=True)
    irows = idx.collect()
    assert len(irows) == 40

    import os
    # offsets tile the file: sorted (offset, length) runs end-to-end
    by_file = {}
    for r in irows:
        by_file.setdefault(r.file, []).append((r.offset, r.length))
    for f, spans in by_file.items():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert pos == os.path.getsize(f)

    want = {u: (u, t, s, c, b) for u, t, s, c, b in rows}
    for r in irows:
        got = warc.read_warc_member(r.file, r.offset, r.length)
        assert got == want[got[0]]

    some = [rows[i][0] for i in (0, 7, 33)]
    looked = warc.warc_lookup(idx, some)
    assert sorted(g[0] for g in looked) == sorted(some)
    assert all(g == want[g[0]] for g in looked)

    # the manifest is the index aggregated (same write, two views)
    man = {(m.shard, m.file, m.n_records, m.n_bytes)
           for m in warc.warc_sink(pages, str(tmp_path / "w2"),
                                   n_shards=3).collect()}
    agg = {}
    for r in irows:
        n, b = agg.get((r.shard,), (0, 0))
        agg[(r.shard,)] = (n + 1, b + r.length)
    assert {(s, n, b) for (s,), (n, b) in agg.items()} == \
        {(s, n, b) for s, _, n, b in man}


def test_sitemap_sink_roundtrip_and_caps(spark, tmp_path):
    """Sitemap sink: urls + scheduling hints → protocol shards + index;
    sitemap_url_entries reads back every url with its hints; the 50k
    cap is mechanically unbreakable (tiny cap forces part-file splits);
    deterministic bytes; index lists every shard file."""
    import os

    from pyspark.sql import functions as F

    from website_to_agent_spark.sources import seeds

    rows = [(f"https://site.example.com/p/{i}?q=a&b=<c>",
             f"2025-03-{1 + i % 9:02d}", round(0.1 + (i % 9) / 10, 1),
             "daily" if i % 2 else None)
            for i in range(137)]
    urls = spark.createDataFrame(
        rows, "url string, lastmod string, priority double,"
              " changefreq string")
    out = str(tmp_path / "maps")
    man = seeds.sitemap_sink(
        urls, out, "https://site.example.com", lastmod_col="lastmod",
        priority_col="priority", changefreq_col="changefreq",
        max_per_file=25).collect()
    assert sum(m.n_urls for m in man) == 137
    assert all(m.n_urls <= 25 for m in man)

    files = sorted(os.listdir(out))
    assert "sitemap.xml" in files
    idx = open(os.path.join(out, "sitemap.xml")).read()
    for m in man:
        assert os.path.basename(m.file) in idx

    shard_docs = spark.createDataFrame(
        [(open(os.path.join(out, f), "rb").read(),)
         for f in files if f != "sitemap.xml"], "html binary")
    back = {r.url: r for r in seeds.sitemap_url_entries(shard_docs)
            .collect()}
    assert len(back) == 137
    for u, lm, pr, cf in rows:
        got = back[u]
        assert (got.lastmod, got.priority, got.changefreq) == (lm, pr, cf)

    import hashlib

    def digest(d):
        h = hashlib.md5()
        for f in sorted(os.listdir(d)):
            h.update(f.encode())
            h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    out2 = str(tmp_path / "maps2")
    seeds.sitemap_sink(
        urls.repartition(9), out2, "https://site.example.com",
        lastmod_col="lastmod", priority_col="priority",
        changefreq_col="changefreq", max_per_file=25)
    assert digest(out2) == digest(out)
