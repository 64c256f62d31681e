"""The full incremental re-crawl loop, end to end — the workflow a
long-lived crawl actually runs, every stage an operator this engine
already ships:

  crawl v1 → postings base → (site changes) → revalidate (304 pass)
  → re-crawl with snapshot reuse → postings DELTA from only the
  re-extracted docs + tombstones for gone docs → live merged view
  == a full rebuild against the new crawl.

Proves the O(Δ) maintenance story carries real content: the unchanged
pages never re-parse AND never re-index, yet search over the merged
view is exactly what a from-scratch pipeline would serve."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark import fixtures
from website_to_agent_spark.operators import indexing, recrawl
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

_TS = datetime(2025, 1, 1)
H = "https://www.inc.example.com"


def _page(url, links, title, body):
    anchors = "".join(f'<a href="{u}">l</a> ' for u in links)
    html = (
        f"<html><head><title>{title}</title></head><body><main>"
        f"<h1>{title}</h1><p>{body}</p>{anchors}</main></body></html>"
    ).encode()
    return {"url": url, "warc_ts": _TS, "html": html, "text": None,
            "lang": None}


def test_incremental_recrawl_and_index(spark):
    rows_v1 = [
        _page(f"{H}/seed.html",
              [f"{H}/a.html", f"{H}/b.html", f"{H}/c.html"],
              "Seed", "seed hub words here"),
        _page(f"{H}/a.html", [], "A", "alpha words about spark engines"),
        _page(f"{H}/b.html", [], "B", "beta words about crawl queues"),
        _page(f"{H}/c.html", [], "C", "gamma words soon removed"),
    ]
    v1 = fixtures.pages_rows_to_spark(spark, rows_v1)
    res1 = CrawlEngine(spark, v1, mode="client").run(
        [CrawlJob("j", f"{H}/seed.html", max_urls=8)]
    )
    docs1 = (
        res1.crawled.filter("success")
        .select(F.col("url").alias("doc_id"), "text")
        .localCheckpoint()
    )
    base = indexing.postings_relational(docs1).localCheckpoint()
    snap = recrawl.crawl_snapshots(res1.crawled, v1).localCheckpoint()
    res1.unpersist()

    # the site advances: B's content changes, C is gone (404), seed
    # now also links a brand-new D
    rows_v2 = [
        _page(f"{H}/seed.html",
              [f"{H}/a.html", f"{H}/b.html", f"{H}/c.html",
               f"{H}/d.html"],
              "Seed", "seed hub words here"),
        _page(f"{H}/a.html", [], "A", "alpha words about spark engines"),
        _page(f"{H}/b.html", [], "B", "beta words now rewritten fully"),
        _page(f"{H}/d.html", [], "D", "delta words newly published"),
    ]
    v2 = fixtures.pages_rows_to_spark(spark, rows_v2)

    # 304 status pass: who actually changed?
    status = {
        r.url: r.status
        for r in recrawl.revalidate(
            snap.select("url", "digest"), v2.select("url", "html")
        ).collect()
    }
    assert status[f"{H}/a.html"] == "not_modified"
    assert status[f"{H}/b.html"] == "modified"
    assert status[f"{H}/c.html"] == "gone"

    # re-crawl with snapshot reuse: seed changed (new link) so it
    # re-extracts; A reuses; B re-extracts; C fails; D is new
    res2 = CrawlEngine(spark, v2, mode="client", revalidate_with=snap).run(
        [CrawlJob("j", f"{H}/seed.html", max_urls=8)]
    )
    reused = {r.url for r in res2.revalidated.collect()}
    assert f"{H}/a.html" in reused
    assert f"{H}/b.html" not in reused
    crawled2 = res2.crawled.filter("success").localCheckpoint()
    failed2 = {r.url for r in res2.crawled.filter("NOT success").collect()}
    assert f"{H}/c.html" in failed2
    res2.unpersist()

    # index maintenance: DELTA = only the re-extracted (non-reused)
    # docs + the new ones; TOMBSTONES = gone docs. O(Δ), the corpus
    # text of unchanged pages is never re-tokenized.
    fresh = crawled2.filter(
        ~F.col("url").isin(*[u for u in reused])
    ).select(F.col("url").alias("doc_id"), "text")
    delta = indexing.postings_relational(fresh)
    tombs = spark.createDataFrame(
        [(u,) for u, s in status.items() if s == "gone"], "doc string"
    )
    live = indexing.merge_index_deltas(base, delta, tombs)

    # ground truth: a full rebuild over the v2 crawl
    rebuilt = indexing.postings_relational(
        crawled2.select(F.col("url").alias("doc_id"), "text")
    )
    live_rows = {tuple(r) for r in live.collect()}
    want_rows = {tuple(r) for r in rebuilt.collect()}
    assert live_rows == want_rows

    # and the merged view serves the new content: "rewritten" finds
    # only the fresh B, "gamma" finds nothing (C tombstoned)
    hits = {r.doc for r in live.filter(F.col("term") == "rewritten")
            .select("doc").collect()}
    assert hits == {f"{H}/b.html"}
    assert live.filter(F.col("term") == "gamma").count() == 0
    assert {r.doc for r in live.filter(F.col("term") == "delta")
            .select("doc").collect()} == {f"{H}/d.html"}
