"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a multi-job client-mode crawl over a
Common-Crawl-style ``pages`` table synthesized deterministically from
``/root/testdata/sf0.001/documents.parquet``.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (plus the training-data ops), checked against DuckDB
at sf0.01. Every computed column is aliased identically on both sides;
float aggregates go through decimal or rounding so the value-hash
comparison is exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from website_to_agent_spark.operators import ann, bm25, dedupe, sketches
from website_to_agent_spark.operators import textquality as tq
from website_to_agent_spark.operators.crawl import CrawlEngine, CrawlJob

# --------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------

_HOST = "docs.example.com"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         limit: int | None = None,
                         paragraphs: int = 1) -> DataFrame:
    """Deterministic Common-Crawl-style pages table (input_hint schema)
    built from the documents table: each doc becomes one HTML page with
    a 3-link deterministic chain (plus a dead link and a skip-extension
    link so the filter branches execute). ``paragraphs`` repeats the doc
    body to reach realistic CC page sizes for benchmarking."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    if limit:
        docs = docs.filter(F.col("doc_id") < limit)
    if paragraphs > 1:
        docs = docs.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(paragraphs)),
                    lambda i: F.concat(
                        F.lit("para "), i.cast("string"), F.lit(" "), F.col("text")
                    ),
                ),
                "</p><p>",
            ),
        )
    n = docs.count()
    url = F.format_string(f"https://{_HOST}/d/%d.html", F.col("doc_id"))
    links = F.concat(
        F.format_string('<a href="/d/%d.html">n1</a>',
                        (F.col("doc_id") * 3 + 1) % n),
        F.format_string(f'<a href="https://{_HOST}/d/%d.html">n2</a>',
                        (F.col("doc_id") * 3 + 2) % n),
        F.format_string('<a href="/d/%d.html">n3</a>',
                        (F.col("doc_id") * 3 + 3) % n),
        F.lit('<a href="/files/x.pdf">pdf</a>'),
        F.format_string('<a href="/missing/%d.html">dead</a>', F.col("doc_id")),
    )
    html = F.concat(
        F.format_string("<html><head><title>Doc %d</title></head><body>"
                        "<nav>NOISE</nav><main><h1>Doc %d</h1><p>",
                        F.col("doc_id"), F.col("doc_id")),
        F.col("text"),
        F.lit("</p>"),
        links,
        F.lit("</main></body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl two jobs over the synthesized pages store and
    return the crawled table in FIFO order."""
    sf_dir = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf_dir)
    jobs = [
        CrawlJob("job-a", f"https://{_HOST}/d/0.html", max_urls=8),
        CrawlJob("job-b", f"https://{_HOST}/d/7.html", max_urls=5),
    ]
    result = CrawlEngine(spark, pages, mode="client").run(jobs)
    return result.crawled.select(
        "job_id", "url", "fetch_ord", "depth", "success",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("text_chars"),
        F.length(F.coalesce(F.col("markdown"), F.lit(""))).alias("md_chars"),
        "title",
    ).orderBy("job_id", "fetch_ord")


# --------------------------------------------------------------------
# queries
# --------------------------------------------------------------------

_STOPS = ", ".join(f"'{w}'" for w in tq.STOP_WORDS)
_BM25_QUERY = "data table join fast"
_EN = ", ".join(f"'{w}'" for w in
                ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"))
_ES = ", ".join(f"'{w}'" for w in
                ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"))
_DE = ", ".join(f"'{w}'" for w in
                ("der", "die", "und", "das", "von", "mit", "den", "für", "ist", "im"))


def _docs_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copies of doc_id<25 (shifted ids) — a corpus with
    known duplicates for the dedup operators."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(dup)


def q_word_count(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id", tq.word_count(F.col("text")).cast("long").alias("n_words")
    )


def q_token_estimate(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id", tq.token_estimate(F.col("text")).alias("n_tokens")
    )


def q_content_length_by_source(spark, sf_dir):
    return (
        _read(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.length("text")).alias("total_chars"),
            F.count("*").alias("n_docs"),
        )
    )


def q_key_topics(spark, sf_dir):
    return tq.key_topics(_read(spark, sf_dir, "documents"), k=10).select(
        "word", "cnt", F.col("rank").cast("long").alias("rank")
    )


def q_top_docs_by_length(spark, sf_dir):
    return (
        _read(spark, sf_dir, "documents")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(5)
        .select("doc_id", "n_chars")
    )


def q_doc_hash(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("content_md5")
    )


def q_distinct_counts(spark, sf_dir):
    """Corpus cardinalities ∪ count–min heavy hitters (r5): the exact
    distinct counts (the reference's run-summary stats) plus token
    heavy hitters ≥0.5% of the corpus, each carrying BOTH its exact
    count and the md5-family CMS table's estimate — the oracle mirrors
    the sketch's cell arithmetic byte-for-byte, so the value check
    covers the whole sketch, not just the exact path. Merged-row
    sentinels: ''/-1, never NULL."""
    d = _read(spark, sf_dir, "documents")
    corpus = d.agg(
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    ).select(
        F.lit("corpus").alias("kind"), F.lit("").alias("term"),
        F.lit(-1).cast("long").alias("cnt"),
        F.lit(-1).cast("long").alias("est"),
        "n_sources", "n_langs",
    )
    toks = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term")
    ).filter(F.col("term") != "")
    cms = sketches.cms_table(toks, "term", depth=4, width=512,
                             hash_impl="md5")
    hh = sketches.heavy_hitters(toks, "term", 0.005, cms=cms,
                                depth=4, width=512, hash_impl="md5")
    return corpus.unionByName(hh.select(
        F.lit("cms_hh").alias("kind"), "term",
        F.col("cnt").cast("long"), F.col("est").cast("long"),
        F.lit(-1).cast("long").alias("n_sources"),
        F.lit(-1).cast("long").alias("n_langs"),
    ))


def q_event_stats(spark, sf_dir):
    v = F.col("value").cast("decimal(28,8)")
    return (
        _read(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(v), 4).cast("double").alias("total_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


def q_success_rate(spark, sf_dir):
    return _read(spark, sf_dir, "events").agg(
        F.count("*").alias("total_requests"),
        F.round(
            F.avg(F.when(F.col("event_type") == "error", 0.0).otherwise(1.0)), 6
        ).alias("success_rate"),
    )


def q_event_success_stats(spark, sf_dir):
    """event_stats + success_rate as one tagged union (r4
    consolidation — frees grid slots, constituents stay
    value-verified)."""
    ev = q_event_stats(spark, sf_dir).select(
        F.col("event_type").alias("key"),
        F.col("n"),
        F.col("total_value").alias("m1"),
        F.col("min_value").alias("m2"),
        F.col("max_value").alias("m3"),
        F.lit("by_type").alias("method"),
    )
    sr = q_success_rate(spark, sf_dir).select(
        F.lit("ALL").alias("key"),
        F.col("total_requests").alias("n"),
        F.col("success_rate").alias("m1"),
        F.lit(0.0).alias("m2"),
        F.lit(0.0).alias("m3"),
        F.lit("success_rate").alias("method"),
    )
    return ev.unionByName(sr)


def q_top_events_per_type(spark, sf_dir):
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _read(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", F.round("value", 6).alias("value"),
                F.col("rn").cast("long").alias("rn"))
    )


def q_topk_reports(spark, sf_dir):
    """key_topics + top_docs_by_length + top_events_per_type merged
    (r4 grid consolidation — all three are small top-k reports):
    (key, item, metric, rk, method) with ''/-1 sentinels, never NULL
    (NULL cells break row-sort comparators)."""
    topics = q_key_topics(spark, sf_dir).select(
        F.col("word").alias("key"), F.lit("").alias("item"),
        F.col("cnt").cast("double").alias("metric"),
        F.col("rank").alias("rk"), F.lit("topics").alias("method"),
    )
    docs = q_top_docs_by_length(spark, sf_dir).select(
        F.lit("").alias("key"),
        F.col("doc_id").cast("string").alias("item"),
        F.col("n_chars").cast("double").alias("metric"),
        F.lit(-1).cast("long").alias("rk"), F.lit("docs").alias("method"),
    )
    events = q_top_events_per_type(spark, sf_dir).select(
        F.col("event_type").alias("key"),
        F.col("event_id").cast("string").alias("item"),
        F.col("value").alias("metric"),
        F.col("rn").alias("rk"), F.lit("events").alias("method"),
    )
    return topics.unionByName(docs).unionByName(events)


def q_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py) over a
    deterministic synthetic redirect graph on the documents ids:
    ids ending 1-4 hop down to the 0-anchor (chains of ≤4), ids
    ending 6/7 form a 2-cycle (TooManyRedirects at the hop cap).
    Value-exact vs a DuckDB bounded-walk CTE."""
    from website_to_agent_spark.operators import redirects as rd

    d = _read(spark, sf_dir, "documents").select("doc_id")
    url = F.format_string(
        "https://r.example.com/p/%d.html", F.col("doc_id")
    )
    m10 = F.col("doc_id") % 10
    target = (
        F.when(
            m10.isin(1, 2, 3, 4),
            F.format_string(
                "https://r.example.com/p/%d.html", F.col("doc_id") - 1
            ),
        )
        .when(
            m10 == 6,
            F.format_string(
                "https://r.example.com/p/%d.html", F.col("doc_id") + 1
            ),
        )
        .when(
            m10 == 7,
            F.format_string(
                "https://r.example.com/p/%d.html", F.col("doc_id") - 1
            ),
        )
    )
    pages = d.select(url.alias("url"), target.alias("redirect_to"))
    return rd.final_destinations(pages).select(
        "url", "final_url", F.col("n_hops").cast("long").alias("n_hops"),
        "redirect_ok",
    )


def q_revalidate_status(spark, sf_dir):
    """Conditional-GET revalidation statuses (recrawl.revalidate):
    snapshots of every doc (ids ≡1 mod 3 carry a stale digest), the
    'current web' lacking ids ≡0 mod 7 → not_modified / modified /
    gone. '' sentinel for the gone rows' new_digest (never NULL)."""
    from website_to_agent_spark.operators import recrawl

    d = _read(spark, sf_dir, "documents")
    url = F.format_string(
        "https://v.example.com/d/%d.html", F.col("doc_id")
    )
    snaps = d.select(
        url.alias("url"),
        F.when(
            F.col("doc_id") % 3 == 1,
            F.md5(F.encode(F.concat(F.col("text"), F.lit("OLD")), "UTF-8")),
        )
        .otherwise(F.md5(F.encode(F.col("text"), "UTF-8")))
        .alias("digest"),
    )
    pages = d.filter(F.col("doc_id") % 7 != 0).select(
        url.alias("url"), F.encode(F.col("text"), "UTF-8").alias("html")
    )
    return recrawl.revalidate(snaps, pages).select(
        "url", "digest",
        F.coalesce(F.col("new_digest"), F.lit("")).alias("new_digest"),
        "status",
    )


def q_sanitize_markdown(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id", tq.sanitize_markdown(F.col("text")).alias("safe_text")
    )


def q_trim_intelligently(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id", tq.trim_intelligently(F.col("text"), 50).alias("trimmed")
    )


def q_title_from_markdown(spark, sf_dir):
    md = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.format_string("# Doc %d\n", F.col("doc_id")),
        ).otherwise(F.lit("")),
        F.col("text"),
    )
    return _read(spark, sf_dir, "documents").select(
        "doc_id", tq.title_from_markdown(md).alias("title")
    )


def q_bm25_scores(spark, sf_dir):
    """Flat BM25 (the reference's rank-bm25 semantics) PLUS BM25F
    (Robertson & Zaragoza 2004) as one tagged union (r5): the fielded
    form scores body/title/anchor as separate evidence streams —
    per-field length normalization and weights, combined BEFORE the
    shared k1 saturation. Fields are synthesized deterministically
    from the documents table (title = first 80 chars; anchor text
    injected on doc_id % 7 / % 5) so the oracle can mirror them."""
    d = _read(spark, sf_dir, "documents")
    flat = bm25.bm25_scores(d, _BM25_QUERY).select(
        F.lit("flat").alias("tag"), "doc_id",
        F.round("score", 5).alias("score"))
    fielded = d.select(
        "doc_id",
        F.col("text").alias("body"),
        F.substring("text", 1, 80).alias("title"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("data table fast"))
        .when(F.col("doc_id") % 5 == 0, F.lit("join query speed"))
        .otherwise(F.lit("")).alias("anchor"),
    )
    fsc = bm25.bm25f_scores(
        fielded, _BM25_QUERY,
        fields={"body": 1.0, "title": 3.0, "anchor": 2.0},
        b={"body": 0.75, "title": 0.5, "anchor": 0.4},
    )
    return flat.unionByName(fsc.select(
        F.lit("bm25f").alias("tag"), "doc_id",
        F.round("score", 5).alias("score")))


def q_dedup_exact(spark, sf_dir):
    """Exact-dedup groups over the dup corpus, PLUS the incremental
    against-prior path (r4): the corpus is split at doc_id 250 into a
    'prior snapshot' and a 'new batch' (the batch carries copies of
    prior docs AND within-batch copies of 250..259); survivors and the
    updated seen-state size are value-checked alongside the groups."""
    corpus = _docs_dup_corpus(spark, sf_dir)
    groups = (
        corpus.groupBy(F.md5("text").alias("dup_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
        .select(F.lit("groups").alias("part"), "dup_hash", "n_dups",
                "min_doc_id", "max_doc_id")
    )
    prior = corpus.filter(F.col("doc_id") < 250)
    newb = corpus.filter(F.col("doc_id") >= 250).unionByName(
        corpus.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 260))
        .select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    seen = dedupe.exact_digests(prior, hash_fn="md5")
    survivors, updated = dedupe.dedup_against_exact(
        newb, seen, hash_fn="md5")
    inc = survivors.select(
        F.lit("inc_survivor").alias("part"),
        F.md5("text").alias("dup_hash"),
        F.lit(1).cast("long").alias("n_dups"),
        F.col("doc_id").alias("min_doc_id"),
        F.col("doc_id").alias("max_doc_id"),
    )
    state = updated.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("seen_count").alias("part"),
        F.lit("x").alias("dup_hash"),
        F.col("n").alias("n_dups"),
        F.lit(0).cast("long").alias("min_doc_id"),
        F.lit(0).cast("long").alias("max_doc_id"),
    )
    return groups.unionByName(inc).unionByName(state)


def q_ngram_jaccard(spark, sf_dir):
    corpus = _docs_dup_corpus(spark, sf_dir)
    return dedupe.ngram_jaccard_pairs(corpus, threshold=0.9).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_ann_cosine_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ann.cosine_topk(emb, queries, k=5)
    return out.select(
        "q_id", "vec_id", F.round("cos_sim", 5).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_lang_id_counts(spark, sf_dir):
    return (
        _read(spark, sf_dir, "documents")
        .select(tq.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n"))
    )


def q_quality_scores(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id", tq.quality_score(F.col("text")).alias("quality")
    )


def q_tpch_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    dec = lambda c: F.col(c).cast("decimal(28,8)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 3).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(28,8)") - dec("l_discount"))), 3
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(28,8)")
    rev = li.withColumn(
        "rev", dec("l_extendedprice") * (F.lit(1).cast("decimal(28,8)") - dec("l_discount"))
    )
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 3).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


def q_snapshot_diff(spark, sf_dir):
    """J6: change detection across two deterministic snapshots derived
    from documents."""
    from website_to_agent_spark.operators import snapshots

    d = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    baseline = d
    current = (
        d.filter(F.col("url").cast("long") % 11 != 0)
        .withColumn(
            "text",
            F.when(F.col("url").cast("long") % 7 == 0,
                   F.concat(F.col("text"), F.lit(" v2"))).otherwise(F.col("text")),
        )
        .unionByName(
            d.filter(F.col("url").cast("long") < 10).select(
                F.concat(F.lit("new-"), F.col("url")).alias("url"), "text"
            )
        )
    )
    return snapshots.snapshot_diff(baseline, current).select(
        "url", "change", "delta_chars"
    )


def q_safe_error_display(spark, sf_dir):
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        tq.safe_error_display(
            F.concat(F.lit("Error <code=500> @ "), F.col("text"))
        ).alias("safe_msg"),
    )


def q_term_intersection(spark, sf_dir):
    q_terms = F.array(F.lit("data"), F.lit("table"), F.lit("join"))
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda t: t != "")
    title_terms = F.array_distinct(F.slice(toks, 1, 5))
    desc_terms = F.array_distinct(F.slice(toks, 6, 5))
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(
            tq.term_set_intersection(q_terms, title_terms, desc_terms), ","
        ).alias("matched_terms"),
    )


# ----- every contract query in this group now has a value-exact
# oracle: seeder_records, simhash + minhash (md5 variants),
# extract_sections, domain_knowledge, the ann_* queries,
# crawl_seeder_discovery (recursive-CTE BFS mirror) AND
# crawl_client_fifo (recursive-CTE FIFO mirror — text_chars is
# SQL-computable because pages_from_documents templates the HTML, so
# the extracted text is exactly 'Doc {d}\n{text}\n' + the 5 anchor
# labels; validated row-for-row against reference_sim.client_crawl).

def q_crawl_client_fifo(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir, limit=40)
    jobs = [CrawlJob("fifo", f"https://{_HOST}/d/0.html", max_urls=6)]
    res = CrawlEngine(spark, pages, mode="client").run(jobs)
    return res.crawled.select(
        "url", "fetch_ord", "success",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("text_chars"),
    ).orderBy("fetch_ord")


def q_crawl_seeder_discovery(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir, limit=40)
    jobs = [CrawlJob("disc", f"https://{_HOST}/d/1.html", max_urls=15, max_depth=2)]
    res = CrawlEngine(spark, pages, mode="seeder").run(jobs)
    return res.seen.select("url", "ord", "depth").orderBy("ord")


# ----- link-graph analytics (operators/linkgraph.py): the crawl-
# prioritization layer. The deterministic edge rule — doc i links to
# (i² + j) mod n for j ∈ {1,2,3} — is the quadratic cousin of
# pages_from_documents' link chain: SQL-computable in both engines,
# non-uniform in-degree (i² mod n collides), non-regular host graph
# (hosts are `source` = 'src' || doc_id % 20, and i² mod 20 depends
# only on i mod 20, so each host fans out to exactly 3 others with
# unequal in-mass → a non-trivial PageRank fixpoint).

def _doc_page_edges(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    return (
        docs.select(
            "doc_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
        )
        .select(
            F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("src"),
            F.concat(
                F.lit("d"),
                ((F.col("doc_id") * F.col("doc_id") + F.col("j")) % F.lit(n))
                .cast("string"),
            ).alias("dst"),
            F.col("j"),
            F.col("doc_id"),
        )
    )


def q_link_degrees_topk(spark, sf_dir):
    from website_to_agent_spark.operators import linkgraph

    deg = linkgraph.degrees(_doc_page_edges(spark, sf_dir))
    return deg.orderBy(F.desc("in_deg"), F.asc("node")).limit(20)


def q_pagerank_hosts(spark, sf_dir):
    # host-level weighted PageRank, 8 synchronous iterations; per-
    # iteration rounding at 9 dp keeps Spark and the DuckDB recursive
    # CTE in bit-lockstep (module docstring: order-sensitive float
    # sums re-synchronized every step).
    from website_to_agent_spark.operators import linkgraph

    e = _doc_page_edges(spark, sf_dir)
    hosts = (
        e.select(
            F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
            .alias("src_host"),
            F.concat(
                F.lit("src"),
                (F.expr("cast(substring(dst, 2) as long)") % 20).cast("string"),
            ).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
        # collapse-once discipline: the loop derives nodes/outw/edge
        # prep from this frame several times — materialize the tiny
        # (≤400-row) host graph so the doc-scale scan+groupBy lineage
        # runs once, not per derivation (values unchanged)
        .localCheckpoint(eager=True)
    )
    # dangling=False is safe here BY CONSTRUCTION: every host owns
    # docs and every doc emits 3 edges, so D = 0 exactly and the fast
    # path is bit-identical to the default (and to the SQL mirror,
    # whose dang term evaluates to 0)
    pr = linkgraph.pagerank(
        hosts, iters=8, src_col="src_host", dst_col="dst_host",
        weight_col="weight", sync_dp=9, dangling=False,
    )
    return pr.select(F.col("node").alias("host"), "rank")


def q_anchor_text_top(spark, sf_dir):
    # anchor rule: link j of doc i carries anchor 'a' || (i + j) mod 4
    # — per-target anchor histograms then differ across hosts.
    from website_to_agent_spark.operators import linkgraph

    e = _doc_page_edges(spark, sf_dir).select(
        F.concat(
            F.lit("src"),
            (F.expr("cast(substring(dst, 2) as long)") % 20).cast("string"),
        ).alias("dst_host"),
        F.concat(
            F.lit("a"), ((F.col("doc_id") + F.col("j")) % 4).cast("string")
        ).alias("anchor"),
    )
    return linkgraph.top_anchors(e, k=2, dst_col="dst_host")


def q_linkgraph_stats(spark, sf_dir):
    """link_degrees_topk + anchor_text_top as one tagged union (r4
    consolidation — keeps the grid inside the driver's 50-row cap
    while every constituent stays value-verified). Merged rows use
    typed SENTINELS ('' / -1 / -1.0), never NULL, for the columns a
    branch doesn't carry: NULL cells are unsortable/engine-ambiguous
    in row-multiset comparators."""
    deg = q_link_degrees_topk(spark, sf_dir).select(
        F.col("node").alias("key"),
        F.lit("").alias("anchor"),
        F.col("in_deg").alias("m1"),
        F.col("out_deg").alias("m2"),
        F.lit("degrees").alias("method"),
    )
    anc = q_anchor_text_top(spark, sf_dir).select(
        F.col("dst").alias("key"),
        F.col("anchor"),
        F.col("cnt").alias("m1"),
        F.col("rk").cast("long").alias("m2"),
        F.lit("anchors").alias("method"),
    )
    return deg.unionByName(anc)


def q_trustrank_hosts(spark, sf_dir):
    # TrustRank over the SAME host graph as pagerank_hosts, trusted
    # seeds = hosts src0/src1/src2; 8 iterations at 9-dp lockstep.
    # dangling=False is structurally safe here (every host owns docs,
    # every doc emits edges — see q_pagerank_hosts), so the mirror CTE
    # carries no dangling term (D = 0 exactly).
    #
    # r5 tagged union (50-row-grid discipline): trust ∪ spam-mass ∪
    # salsa. The mass branch value-checks linkgraph.spam_mass —
    # PageRank and TrustRank over the SAME host graph joined
    # node-wise, rel_mass = (rank − trust)/rank (Gyöngyi et al.
    # VLDB'06). The salsa branch (r5-s7) value-checks
    # linkgraph.salsa's two degree-normalized stationary chains at
    # the same 9-dp per-iteration lockstep (the mirror normalizes
    # inside the recursive term via SUM() OVER () — window functions
    # are legal there in DuckDB). Sentinel rule: merged-row columns a
    # branch doesn't carry hold -1.0, never NULL.
    from website_to_agent_spark.operators import linkgraph

    e = _doc_page_edges(spark, sf_dir)
    hosts = (
        e.select(
            F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
            .alias("src_host"),
            F.concat(
                F.lit("src"),
                (F.expr("cast(substring(dst, 2) as long)") % 20).cast("string"),
            ).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
        # collapse-once discipline (see q_pagerank_hosts): TWO rank
        # loops each re-derive nodes/outw/edge prep from this frame —
        # without the materialization the doc-scale lineage re-runs
        # ~7×, which is what the 22.9 s bench reading measured
        .localCheckpoint(eager=True)
    )
    # r6 perf: the three rank loops are INDEPENDENT (trust, pagerank,
    # salsa each consume only the materialized `hosts` checkpoint), and
    # each loop is a chain of small per-iteration jobs that leaves most
    # of the executor pool idle — submit them from a thread pool so the
    # scheduler back-fills (guide §2.6 "overlap independent jobs").
    # Values are unchanged: same loops, same inputs, same rounding.
    from concurrent.futures import ThreadPoolExecutor

    # trust + pagerank iterate the same (nodes, outw, prepared-edge)
    # tables — build them ONCE (rank_prep) instead of per loop
    prep = linkgraph.rank_prep(
        hosts, src_col="src_host", dst_col="dst_host",
        weight_col="weight",
    )
    with ThreadPoolExecutor(max_workers=3) as _pool:
        f_tr = _pool.submit(
            linkgraph.trustrank, hosts, ["src0", "src1", "src2"],
            iters=8, src_col="src_host", dst_col="dst_host",
            weight_col="weight", sync_dp=9, dangling=False, prep=prep,
        )
        f_pr = _pool.submit(
            linkgraph.pagerank, hosts, iters=8, src_col="src_host",
            dst_col="dst_host", weight_col="weight", sync_dp=9,
            dangling=False, prep=prep,
        )
        f_sal = _pool.submit(
            linkgraph.salsa, hosts, iters=8, src_col="src_host",
            dst_col="dst_host", weight_col="weight", sync_dp=9,
        )
        tr, pr, sal = f_tr.result(), f_pr.result(), f_sal.result()
    linkgraph.release_rank_prep(prep)
    mass = linkgraph.spam_mass(pr, tr)
    trust_rows = tr.select(
        F.col("node").alias("host"),
        F.col("trust").alias("v1"),
        F.lit(-1.0).alias("v2"),
        F.lit(-1.0).alias("v3"),
        F.lit("trust").alias("method"),
    )
    mass_rows = mass.select(
        F.col("node").alias("host"),
        F.col("rank").alias("v1"),
        F.col("trust").alias("v2"),
        F.col("rel_mass").alias("v3"),
        F.lit("mass").alias("method"),
    )
    salsa_rows = sal.select(
        F.col("node").alias("host"),
        F.col("hub").alias("v1"),
        F.col("auth").alias("v2"),
        F.lit(-1.0).alias("v3"),
        F.lit("salsa").alias("method"),
    )
    return trust_rows.unionByName(mass_rows).unionByName(salsa_rows)


def q_crawl_traps(spark, sf_dir):
    """Crawler-trap detection over a synthetic frontier derived from
    `documents`: a calendar-explosion host (one template, n_docs
    urls), a relative-link-loop host, a depth-bomb host, and a
    healthy host whose paths are 6-char md5 prefixes (below the hex-
    run threshold → distinct templates, one url each)."""
    from website_to_agent_spark.operators import traps

    d = _read(spark, sf_dir, "documents").select("doc_id")
    tail = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)
    cal = d.select(
        F.concat(
            F.lit("https://trap.example.com/cal?yr="),
            (F.col("doc_id") % 4).cast("string"),
            F.lit("&day="), F.col("doc_id").cast("string"),
        ).alias("url"))
    ok = d.select(
        F.concat(F.lit("https://ok.example.com/p/"), tail,
                 F.lit(".html")).alias("url"))
    loop = d.filter(F.col("doc_id") % 50 == 0).select(
        F.concat(F.lit("https://loop.example.com/a/b/a/b/a/b/"),
                 tail).alias("url"))
    deep = d.filter(F.col("doc_id") % 100 == 0).select(
        F.concat(
            F.lit("https://deep.example.com"),
            F.lit("/s" * 17), F.lit("/"), tail,
        ).alias("url"))
    urls = cal.unionByName(ok).unionByName(loop).unionByName(deep)
    return traps.trap_report(urls, min_urls=32)


def q_inverted_index(spark, sf_dir):
    """Full-corpus inverted index: per-term df/cf + the postings list
    as a canonical doc-ascending string."""
    from website_to_agent_spark.operators import indexing

    return indexing.inverted_index(
        _read(spark, sf_dir, "documents"))


def q_connected_components(spark, sf_dir):
    # residue-class edge rule: doc i links only within its i % 10
    # class (dst = g + 10·((i² + j) mod (n/10))) — ≥10 real components
    # with i²-induced internal structure. iters=8 FIXED: both engines
    # at the same round count agree exactly even where labels haven't
    # converged (string min-propagation, no floats).
    from website_to_agent_spark.operators import linkgraph

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    k = n // 10
    edges = (
        docs.select(
            "doc_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
        )
        .select(
            F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("src"),
            F.concat(
                F.lit("d"),
                (
                    (F.col("doc_id") % 10)
                    + 10
                    * ((F.col("doc_id") * F.col("doc_id") + F.col("j"))
                       % F.lit(k))
                ).cast("string"),
            ).alias("dst"),
        )
    )
    return linkgraph.connected_components(edges, iters=8)


def q_recrawl_priorities(spark, sf_dir):
    # snapshots synthesized from events: one url per user, digest =
    # event_type (deduped to one row per (url, ts) so the LAG window
    # order is total in both engines); now is an explicit literal —
    # the operator never reads wall clock (determinism/resume).
    from website_to_agent_spark.operators import recrawl

    ev = _read(spark, sf_dir, "events")
    snaps = (
        ev.groupBy(
            F.concat(
                F.lit("https://site.test/u/"), F.col("user_id").cast("string")
            ).alias("url"),
            "ts",
        )
        .agg(F.min("event_type").alias("digest"))
    )
    rates = recrawl.change_rate(recrawl.mark_changes(snaps))
    pr = recrawl.revisit_priority(rates, "2024-07-01 00:00:00")
    return rates.select(
        "url", "n_snaps", "n_changes", "span_s", "rate"
    ).join(pr, "url")


def q_apply_mixture(spark, sf_dir):
    """Mixture EXECUTION: deterministic up/down-sampling to the target
    shares (copies = ⌊m⌋ + md5-uniform fractional repeat)."""
    from website_to_agent_spark.operators import sampling

    d = _read(spark, sf_dir, "documents")
    out = sampling.apply_mixture(
        d, "lang", F.length("text"),
        {"en": 0.5, "de": 0.125, "fr": 0.125, "es": 0.125, "zh": 0.125},
        key_col="doc_id",
    )
    return out.select("doc_id", "lang", "copy_idx")


def q_crawl_priority_drain(spark, sf_dir):
    # the priority-queue drain, oracle-grade: batch_per_job=1 makes
    # each superstep one argmax pop (score desc, enqueue-ord tie-
    # break), which a DuckDB recursive CTE simulates exactly. Score
    # rule: doc d scores (d*17) mod 29; dead links are unscored →
    # nulls-last ≡ the CTE's -1 sentinel. fetch_ord stays the engine's
    # enqueue-keyed rank (NOT pop order) — the CTE re-ranks by ord.
    # r5-s5: UNION'd with the OPIC adaptive drain on the same store —
    # the pop sequence (greedy argmax-cash) AND the final cash/history
    # state, both mirrored by a second recursive CTE that folds the
    # full OPIC cash algebra (equal split over hygiene-passed
    # candidates pre-dedup, dangling/budget-exhausted cash to the ''
    # sink, 12-dp fold rounding). Merged-row sentinels ''/-1/-1.0.
    pages = pages_from_documents(spark, sf_dir, limit=40)
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    prio = docs.select(
        F.format_string(f"https://{_HOST}/d/%d.html", F.col("doc_id"))
        .alias("url"),
        ((F.col("doc_id") * 17) % 29).cast("double").alias("score"),
    )
    jobs = [CrawlJob("prio", f"https://{_HOST}/d/0.html", max_urls=6)]
    res = CrawlEngine(
        spark, pages, mode="client", batch_per_job=1, priority=prio
    ).run(jobs)
    prio_rows = res.crawled.select(
        F.lit("prio").alias("kind"), "url",
        F.col("fetch_ord").cast("int").alias("ord"), "success",
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .alias("text_chars"),
        F.lit(-1.0).alias("cash"), F.lit(-1.0).alias("hist"),
    )
    res2 = CrawlEngine(
        spark, pages, mode="client", batch_per_job=1, opic=True
    ).run([CrawlJob("opic", f"https://{_HOST}/d/0.html", max_urls=6)])
    w = Window.orderBy("superstep")
    pops = res2.crawled.select("url", "success", "superstep").select(
        F.lit("opic_pop").alias("kind"), "url",
        (F.row_number().over(w) - 1).cast("int").alias("ord"),
        "success", F.lit(-1).alias("text_chars"),
        F.lit(-1.0).alias("cash"), F.lit(-1.0).alias("hist"),
    )
    state = res2.opic.select(
        F.lit("opic_state").alias("kind"), "url",
        F.lit(-1).cast("int").alias("ord"),
        F.lit(False).alias("success"), F.lit(-1).alias("text_chars"),
        "cash", "hist",
    )
    return prio_rows.unionByName(pops).unionByName(state)


def q_minhash_near_dups(spark, sf_dir):
    # md5 base hash: byte-reproducible in DuckDB, so the whole
    # shingle → signature → banding → candidate → estimate pipeline is
    # value-exact against the oracle (the xxhash64 default stays the
    # faster scale path; they share every line but the two hash calls).
    corpus = _docs_dup_corpus(spark, sf_dir)
    return dedupe.minhash_lsh_pairs(
        corpus, n_hashes=32, bands=16, threshold=0.9, hash_fn="md5"
    ).select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_simhash_near_dups(spark, sf_dir):
    # md5-based 60-bit fingerprint: byte-reproducible in DuckDB, so the
    # contract row is value-exact (the xxhash64 default is the faster
    # scale path; both share every line but the token hash).
    corpus = _docs_dup_corpus(spark, sf_dir)
    return dedupe.simhash_near_pairs(
        corpus, max_hamming=3, hash_fn="md5"
    ).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_seeder_records(spark, sf_dir):
    """EP3 seeder pipeline over synthesized pages: head extraction +
    BM25 + sort + cap. Value-oracled: the synthetic heads reduce to
    'Doc <id>' so the whole semijoin→head→BM25→sort→cap chain has a
    closed-form DuckDB twin (which also pins head_udf's title path)."""
    from website_to_agent_spark.operators import seeder_pipeline

    pages = pages_from_documents(spark, sf_dir, limit=60)
    recs = seeder_pipeline.seed_and_score(
        pages, _HOST, source="cc", query="doc 7", extract_head=True,
        max_urls=20,
    )
    return recs.select(
        "url", "status", F.round("relevance_score", 5).alias("relevance_score"),
        F.col("head_data.title").alias("head_title"),
    )


def q_extract_sections(spark, sf_dir):
    md = F.concat(
        F.format_string("# Doc %d\n", F.col("doc_id")),
        F.substring("text", 1, 120),
        F.lit("\n## Tail\ntail content"),
    )
    return (
        _read(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(tq.extract_sections(md)))
        .select("doc_id", F.col("pos").cast("long").alias("section_idx"),
                F.col("col.title").alias("title"),
                F.length("col.content").alias("content_chars"))
    )


def q_domain_knowledge(spark, sf_dir):
    """A11 stand-in, flattened to scalar columns."""
    from website_to_agent_spark.operators import knowledge

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    ).filter(F.col("url").cast("long") < 50)
    dk = knowledge.extract_domain_knowledge(docs)
    return dk.select(
        "source_url", F.posexplode("core_concepts")
    ).select(
        "source_url", F.col("pos").cast("long").alias("concept_rank"),
        F.col("col.name").alias("concept"),
        F.col("col.importance_score").alias("importance"),
    )


def q_pii_scrub(spark, sf_dir):
    """Training-data PII pass: emails/IPv4/phones redacted with typed
    placeholders (deterministic PII injected so the branches execute)."""
    from website_to_agent_spark.operators import webtext

    pii = F.concat(
        F.col("text"),
        F.format_string(
            " Contact user%d@example.com or 10.0.%d.7 or +44 7700 900%03d"
            " now. Released 2025-01-%02d; cost 1 000 000.",
            F.col("doc_id"), F.col("doc_id") % 256, F.col("doc_id") % 1000,
            F.col("doc_id") % 28 + 1,
        ),
    )
    return _read(spark, sf_dir, "documents").select(
        "doc_id", webtext.pii_scrub(pii).alias("clean_text")
    )


# ----- sampling / splitting / mixing / packing (training-data
# selection layer, operators/sampling.py) — all value-oracled: the
# md5-prefix 60-bit uniform is byte-reproducible in DuckDB, so split
# membership, sampled row sets, mixture shares and bin assignments
# mirror exactly.

def q_split_by_hash(spark, sf_dir):
    """Deterministic train/val/test assignment per doc (map-only)."""
    from website_to_agent_spark.operators import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id")
    return sampling.split_by_hash(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language downsampling (en halved, de kept,
    others dropped) — the execution step of data mixing."""
    from website_to_agent_spark.operators import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.stratified_sample(
        d, "lang", {"en": 0.5, "de": 1.0}, "doc_id"
    ).select("doc_id", "lang")


def q_mixture_report(spark, sf_dir):
    """Per-language token share + the sampling multiplier that would
    hit a target mixture (the planning step of data mixing)."""
    from website_to_agent_spark.operators import sampling

    d = _read(spark, sf_dir, "documents")
    # targets are exact binary fractions summing to exactly 1.0, so the
    # normalized target_share is the literal itself in both engines
    rep = sampling.mixture_report(
        d, "lang", F.length("text"),
        targets={"en": 0.5, "de": 0.125, "fr": 0.125,
                 "es": 0.125, "zh": 0.125},
    )
    return rep.select(
        "stratum", "n_docs", "total_weight",
        F.round("share", 6).alias("share"),
        F.round("target_share", 6).alias("target_share"),
        F.round("multiplier", 6).alias("multiplier"),
    )


def q_mixture_plan(spark, sf_dir):
    """mixture_report + apply_mixture as one tagged union (r4
    consolidation): the planning row carries shares/multipliers, the
    execution rows carry (doc_id, copy_idx)."""
    rep = q_mixture_report(spark, sf_dir).select(
        F.col("stratum"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("n_docs").alias("n"),
        F.col("total_weight").alias("w"),
        F.col("share"),
        F.col("target_share"),
        F.col("multiplier"),
        F.lit("report").alias("method"),
    )
    app = q_apply_mixture(spark, sf_dir).select(
        F.col("lang").alias("stratum"),
        F.col("doc_id"),
        F.col("copy_idx").cast("long").alias("n"),
        F.lit(-1).cast("long").alias("w"),
        F.lit(-1.0).alias("share"),
        F.lit(-1.0).alias("target_share"),
        F.lit(-1.0).alias("multiplier"),
        F.lit("apply").alias("method"),
    )
    return rep.unionByName(app)


def q_pack_sequences(spark, sf_dir):
    """Both packing forms as one tagged union (r5): ``bins`` = whole-
    doc throughput packing (floor(exclusive prefix sum / budget) — doc
    stays whole); ``windows`` = TRUE GPT-style token-window packing
    (per-shard md5-ordered streams chopped every seq_len, docs SPLIT
    across boundaries, windows value-checked token-for-token via a CSV
    column). Window ids are a deterministic SQL-expressible sequence
    so DuckDB can mirror the whole chop."""
    from website_to_agent_spark.operators import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    bins = sampling.pack_sequences(
        d, 5000, "doc_id", F.length("text"), n_groups=8
    ).select(
        F.lit("bins").alias("tag"), "doc_id",
        F.col("pack_group").cast("long").alias("k"),
        F.col("n_tokens").alias("n_a"),
        F.col("bin_id").alias("n_b"),
        F.col("bin_overflow").alias("flag"),
        F.lit("").alias("ids_csv"),
    )
    with_ids = d.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), (F.col("doc_id") % 9).cast("int")),
            lambda i: ((F.col("doc_id") + i) % 97).cast("int"),
        ).alias("ids"),
    )
    win = sampling.pack_token_windows(
        with_ids, "doc_id", "ids", 32, 4, eos_id=999
    ).select(
        F.lit("windows").alias("tag"),
        F.col("shard").cast("long").alias("doc_id"),
        F.col("window_id").alias("k"),
        F.col("n_ids").alias("n_a"),
        F.col("n_docs").alias("n_b"),
        F.col("complete").alias("flag"),
        F.concat_ws(",", F.col("input_ids").cast("array<string>"))
        .alias("ids_csv"),
    )
    return bins.unionByName(win)


# ----- corpus curation (operators/curation.py) — all value-oracled.

def q_cap_per_domain(spark, sf_dir):
    """Anti-spam domain cap: ≤ 20 docs per source, winners elected by
    salted-md5 order (unbiased w.r.t. crawl order, reproducible)."""
    from website_to_agent_spark.operators import curation

    d = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return curation.cap_per_domain(d, "source", 20)


def q_decontaminate(spark, sf_dir):
    """Train/eval overlap removal: every 37th doc plays the benchmark
    set; any doc sharing a word 8-gram with it is flagged (the
    benchmark docs flag themselves — they ARE in the corpus)."""
    from website_to_agent_spark.operators import curation

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 37 == 0)
    return curation.decontaminate(d, bench).select(
        "doc_id", "contaminated", "n_overlaps"
    )


def q_dedup_paragraphs(spark, sf_dir):
    """Cross-doc paragraph dedup over synthesized 3-paragraph pages
    (unique lead + two shared boilerplate paragraphs): boilerplate
    survives only in the smallest (doc_id, pos) occurrence."""
    from website_to_agent_spark.operators import curation

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 200),
            F.lit("\n\nsubscribe to our newsletter today"),
            F.lit("\n\ncopyright footer all rights reserved"),
        ).alias("text"),
    )
    return curation.dedup_paragraphs_across_docs(d)


def q_suffix_arrays(spark, sf_dir):
    """Distributed suffix array by prefix doubling + adjacent-suffix
    LCP by binary lifting (r5-s10), over a deterministic 10-doc slice
    (doc_id % 50 == 0) so the DuckDB mirror's O(L²) common-prefix
    probe stays cheap. Two arms: method='sa' → the global suffix rank
    (real suffixes rank contiguously ABOVE the n_docs sentinel rows —
    structural: sentinels are negative at round 1 and dense ranking
    preserves order), method='lcp' → the LCP to the next suffix in SA
    order, capped at 64 (the oracle's probe bound; values below the
    cap are exact). Third arm (r5-s11) method='cut': the FULL
    remove_duplicate_spans_exact output at min_len=20 — one row per
    doc with off=n_spans_removed, val=n_chars_removed and stext=the
    rebuilt deduped text — value-oracled against a complete DuckDB
    ExactSubstr mirror (uncapped LCP, b-side extent marks,
    gaps-and-islands merge, string_agg gap rebuild). stext is ''
    outside the cut arm (merged-row sentinel rule: NULL cells break
    the driver's row sort)."""
    from website_to_agent_spark.operators import suffixes

    d = _read(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0).select("doc_id", "text")
    sa_df, lcp_df = suffixes.suffix_array_and_lcp(d)
    sa = sa_df.select(
        F.lit("sa").alias("method"), "doc_id", "off",
        F.col("sa_rank").cast("long").alias("val"),
        F.lit("").alias("stext"))
    lcp = lcp_df.select(
        F.lit("lcp").alias("method"), "doc_id", "off",
        F.least(F.col("lcp"), F.lit(64)).cast("long").alias("val"),
        F.lit("").alias("stext"))
    cut = suffixes.remove_duplicate_spans_exact(
        d, min_len=20, lcp=lcp_df).select(
        F.lit("cut").alias("method"), "doc_id",
        F.col("n_spans_removed").cast("long").alias("off"),
        F.col("n_chars_removed").cast("long").alias("val"),
        F.col("text").alias("stext"))
    return sa.unionByName(lcp).unionByName(cut)


def q_dedup_spans(spark, sf_dir):
    """Suffix-array-style exact substring dedup (Lee et al. 2022 /
    RefinedWeb): repeated word-8-gram spans survive only in their
    globally-first occurrence; later occurrences are excised and docs
    reassembled. Every 5th doc gets a shared 12-token boilerplate tail
    injected so real cross-doc duplicated spans exist at any SF."""
    from website_to_agent_spark.operators import curation

    tail = (" subscribe to our newsletter today for exclusive offers"
            " and updates delivered weekly")
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.substring("text", 1, 300), F.lit(tail)),
        ).otherwise(F.substring("text", 1, 300)).alias("text"),
    )
    # md5 digests: the byte-reproducible variant the DuckDB oracle
    # mirrors (the xxhash64 default is the production/bench path)
    return curation.remove_duplicate_spans(d, hash_fn="md5")


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed word-bigram
    features, 512 buckets, raw distribution = the whole corpus, target
    = the 'en' subset. High log_weight = looks English-target-like."""
    from website_to_agent_spark.operators import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    w = sampling.dsir_importance(
        d, d.filter(F.col("lang") == "en"), n=2, buckets=512
    )
    return w.select(
        "doc_id", "n_grams", F.round("log_weight", 6).alias("log_weight")
    )


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality filtering, both shapes as one tagged
    union (r5 consolidation):

    - ``mono``: char-trigram table trained on the 'en' subset (the
      trusted corpus), EVERY doc scored under it, corpus-wide
      head/middle/tail cutoffs (the r3 row, unchanged).
    - ``by_lang``: the real Wenzek et al. 2020 shape — one LM per
      language, each doc scored under its OWN language's LM
      (per-language Laplace denominators), and the percentile cutoffs
      fit PER LANGUAGE, so every language contributes its own head
      slice.

    Train = one (lang-keyed) groupBy; score = explode → broadcast
    join → per-doc avg (only (doc_id, logp) ever shuffles); cutoff
    tables are ≤ |langs| rows, broadcast."""
    from website_to_agent_spark.operators import webtext

    d = _read(spark, sf_dir, "documents")
    lm = webtext.train_char_lm(d.filter(F.col("lang") == "en"))
    mono = webtext.perplexity_buckets(d, lm).select(
        F.lit("mono").alias("tag"),
        "doc_id",
        F.lit("").alias("lang"),   # sentinel, not NULL: row-sort
        "n_grams",
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("perplexity", 4).alias("perplexity"),
        "bucket",
    )
    lms = webtext.train_char_lms(d)
    by_lang = webtext.perplexity_buckets_by_lang(d, lms).select(
        F.lit("by_lang").alias("tag"),
        "doc_id", "lang", "n_grams",
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("perplexity", 4).alias("perplexity"),
        "bucket",
    )
    # r5-s4: CCNet step 1 — trained n-gram language ID. Every doc is
    # scored under EVERY language's LM (broadcast gram join, ≤|langs|
    # fanout) and the argmax language wins (ties: 6-dp score then
    # lexicographic lang — engine-independent). lang here is the
    # PREDICTED language; bucket is the '' sentinel.
    detect = webtext.detect_language(d, lms).select(
        F.lit("detect").alias("tag"),
        "doc_id", "lang", "n_grams",
        F.round("avg_logp", 6).alias("avg_logp"),
        F.round("perplexity", 4).alias("perplexity"),
        F.lit("").alias("bucket"),
    )
    return mono.unionByName(by_lang).unionByName(detect)


def q_gopher_quality(spark, sf_dir):
    """Gopher/C4-style repetition + shape gates (deterministic
    structure injected: duplicate lines, a duplicate paragraph on
    doc_id%4==0, a bullet, an ellipsis line) PLUS the full Rae et al.
    Table A1 n-gram repetition fractions (top-{2,3,4}-gram and
    duplicated-{5..10}-gram character coverage) via
    ``repetition_metrics`` — every signal value-exact vs the oracle."""
    from website_to_agent_spark.operators import webtext

    shaped = F.concat_ws(
        "\n",
        F.col("text"),
        F.lit("repeated line"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("repeated line")).otherwise(
            F.lit("- a bullet")
        ),
        F.lit("trailing thought..."),
        F.lit("This is one sentence. Here comes another sentence right"
              " now. Finally a third sentence ends the line."),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("This line mentions javascript and has many words."))
        .otherwise(
            F.lit("This ordinary sentence has plenty of words today.")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("This code snippet contains a { brace character."))
        .otherwise(
            F.lit("No braces appear anywhere in this tidy sentence.")),
        F.when(F.col("doc_id") % 9 == 0,
               F.lit("Lorem ipsum dolor sit amet is classic filler text."))
        .otherwise(
            F.lit("Original phrasing continues in this closing sentence.")),
    )
    shaped = F.concat(
        shaped,
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\n\nshared closing paragraph"
                     "\n\nshared closing paragraph"))
        .otherwise(F.lit("\n\nunique closing thought")),
    )
    m = webtext.gopher_metrics(shaped)
    d = _read(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["dup_line_frac"].alias("dup_line_frac"),
        m["dup_line_char_frac"].alias("dup_line_char_frac"),
        m["dup_para_frac"].alias("dup_para_frac"),
        m["dup_para_char_frac"].alias("dup_para_char_frac"),
        m["bullet_frac"].alias("bullet_frac"),
        m["ellipsis_frac"].alias("ellipsis_frac"),
        webtext.gopher_quality_ok(shaped).alias("quality_ok"),
        webtext.c4_clean_lines(shaped).alias("c4_text"),
        webtext.c4_page_ok(webtext.c4_clean_lines(shaped)).alias("c4_ok"),
    )
    rep = webtext.gopher_repetition_ok(
        webtext.repetition_metrics(d.select("doc_id", shaped.alias("text")))
    )
    return base.join(rep, "doc_id")


def q_url_dedup(spark, sf_dir):
    """URL-level dedup — tagged union (r5-s8) of two alias layers:
    rows from the STATIC canonical form (tracking params stripped,
    params sorted, case/port/fragment normalized) ∪ rows
    ``dust:<find>`` from LEARNED DUST rules (Bar-Yossef WWW'07):
    per-doc (page/, page/index.html) same-digest pairs must yield
    exactly the index.html deletion rules, while a ?page=1/?page=2
    family with differing digests must be refuted out — absence is
    value-checked by the hash. Mining restricted to doc_id % 5 == 0
    (the oracle mirror self-joins envelope buckets; 100 docs keeps
    its pair count oracle-sized)."""
    from website_to_agent_spark.operators import dust, webtext

    d = _read(spark, sf_dir, "documents").select("doc_id")
    variants = d.select(
        F.format_string(
            "https://Docs.Example.com:443/d/%d.html?utm_source=x&b=2&a=1#frag",
            F.col("doc_id"),
        ).alias("url")
    ).unionByName(
        d.select(
            F.format_string(
                "https://docs.example.com/d/%d.html?a=1&b=2", F.col("doc_id")
            ).alias("url")
        )
    ).unionByName(
        d.filter(F.col("doc_id") % 2 == 0).select(
            F.format_string(
                "HTTP://docs.example.com:80/d/%d.html?fbclid=abc", F.col("doc_id")
            ).alias("url")
        )
    )
    base = webtext.url_dedup_best(variants).select(
        "canon_url", "url", "n_variants"
    )

    dd = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    same_dig = F.md5(F.concat(F.col("text"), F.col("doc_id").cast("string")))

    def _fam(fmt, dig):
        return dd.select(
            F.format_string(fmt, F.col("doc_id")).alias("url"),
            dig.alias("digest"),
        )

    pagesd = (
        _fam("https://dust.example.com/a/%d/", same_dig)
        .unionByName(_fam("https://dust.example.com/a/%d/index.html",
                          same_dig))
        .unionByName(_fam("https://dust.example.com/p/%d?page=1",
                          F.md5(F.concat(F.col("text"),
                                         F.col("doc_id").cast("string"),
                                         F.lit("p1")))))
        .unionByName(_fam("https://dust.example.com/p/%d?page=2",
                          F.md5(F.concat(F.col("text"),
                                         F.col("doc_id").cast("string"),
                                         F.lit("p2")))))
    )
    rules = dust.dust_rules(pagesd, max_bucket=None)
    dust_rows = rules.select(
        F.concat(F.lit("dust:"), F.col("find")).alias("canon_url"),
        F.col("replace").alias("url"),
        F.col("support").cast("long").alias("n_variants"),
    )
    return base.unionByName(dust_rows)


def q_text_near_dups(spark, sf_dir):
    """Embedding-cosine near-dups over RAW TEXT: hashing-trick
    featurizer (md5 buckets — DuckDB-reproducible) feeding the exact
    near-dup operator; the duplicated corpus guarantees cosine-1 pairs."""
    corpus = _docs_dup_corpus(spark, sf_dir)
    emb = corpus.select(
        "doc_id", ann.hash_embed(F.col("text"), dim=32, hash_fn="md5").alias("embedding")
    )
    return ann.embedding_near_dups(
        emb, threshold=0.95, n_bits=0, id_col="doc_id"
    ).select("doc_a", "doc_b", F.round("cos_sim", 4).alias("cos_sim"))


def q_chunk_text(spark, sf_dir):
    """Pre-training chunking: overlapping fixed-width windows."""
    from website_to_agent_spark.operators import webtext

    return (
        _read(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(webtext.chunk_text(F.col("text"), 200, 50)),
        )
        .select(
            "doc_id",
            F.col("col.chunk_idx").cast("long").alias("chunk_idx"),
            F.md5("col.content").alias("chunk_md5"),
            F.length("col.content").alias("chunk_chars"),
        )
    )


def q_dedup_lines(spark, sf_dir):
    """In-document exact line dedup (first occurrence wins)."""
    from website_to_agent_spark.operators import webtext

    shaped = F.concat_ws(
        "\n", F.lit("boiler"), F.col("text"), F.lit("boiler"),
        F.lit("keep"), F.lit("boiler"), F.lit("keep"),
    )
    return _read(spark, sf_dir, "documents").select(
        "doc_id", F.md5(webtext.dedup_lines(shaped)).alias("clean_md5")
    )


def q_content_hashes(spark, sf_dir):
    """doc_hash + snapshot_diff as one tagged union (r4-s3
    consolidation; sentinels, no NULLs)."""
    dh = q_doc_hash(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("content_md5").alias("payload"),
        F.lit(-1).cast("long").alias("delta"),
        F.lit("doc_hash").alias("method"),
    )
    sd = q_snapshot_diff(spark, sf_dir).select(
        F.col("url").alias("key"),
        F.col("change").alias("payload"),
        F.col("delta_chars").cast("long").alias("delta"),
        F.lit("snapshot_diff").alias("method"),
    )
    return dh.unionByName(sd)


def q_doc_quality(spark, sf_dir):
    """lang_id_counts + quality_scores as one tagged union (r4-s3
    consolidation)."""
    lg = q_lang_id_counts(spark, sf_dir).select(
        F.col("lang_pred").alias("key"),
        F.col("n"),
        F.lit(-1.0).alias("quality"),
        F.lit("lang_counts").alias("method"),
    )
    qs = q_quality_scores(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("key"),
        F.lit(-1).cast("long").alias("n"),
        F.col("quality"),
        F.lit("quality").alias("method"),
    )
    return lg.unionByName(qs)


def q_phrase_search(spark, sf_dir):
    """Exact-phrase retrieval from positional postings alone — the
    mirror recomputes positions relationally (self-join on pos+1), a
    fully independent formulation of the same semantics."""
    from website_to_agent_spark.operators import indexing

    rel_pos = indexing.postings_positional(
        _read(spark, sf_dir, "documents"))
    return indexing.phrase_docs(rel_pos, ["the", "fast"])


def q_canonical_dedup(spark, sf_dir):
    """rel=canonical dedup, value-exact against construction-rule
    ground truth: every synthetic page DECLARES its canonical (three
    variants per doc — tracking-param URL with an absolute rel-first
    tag, /print URL with a root-relative href-first tag, and for even
    ids a mobile host declaring the absolute target), so the oracle
    derives the expected groups from doc_id arithmetic with no regex
    — the whole extract+resolve pipeline is what's under test."""
    from website_to_agent_spark.operators import webtext

    d = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"))
    canon = F.concat(F.lit("https://ex.com/d/"), F.col("id"))
    a = d.select(
        F.concat(canon, F.lit("?utm_source=x")).alias("url"),
        F.encode(
            F.concat(F.lit('<html><head><link rel="canonical" href="'),
                     canon, F.lit('"></head><body>x</body></html>')),
            "utf-8").alias("html"),
    )
    b = d.select(
        F.concat(canon, F.lit("/print")).alias("url"),
        F.encode(
            F.concat(F.lit("<html><head><link href='/d/"), F.col("id"),
                     F.lit("' rel='canonical'></head></html>")),
            "utf-8").alias("html"),
    )
    c = d.filter(F.col("id").cast("long") % 2 == 0).select(
        F.concat(F.lit("https://m.ex.com/d/"), F.col("id")).alias("url"),
        F.encode(
            F.concat(F.lit('<html><head><link rel=canonical href="'),
                     canon, F.lit('"></head></html>')),
            "utf-8").alias("html"),
    )
    pages = a.unionByName(b).unionByName(c)
    return webtext.canonical_dedup_best(pages)


def q_line_ops(spark, sf_dir):
    """chunk_text + dedup_lines as one tagged union (r4-s3
    consolidation — frees a grid slot for host_boilerplate; sentinels
    -1/'' instead of NULL, see q_linkgraph_stats)."""
    ch = q_chunk_text(spark, sf_dir).select(
        "doc_id",
        F.col("chunk_idx").alias("idx"),
        F.col("chunk_md5").alias("payload_md5"),
        F.col("chunk_chars").cast("long").alias("chars"),
        F.lit("chunk").alias("method"),
    )
    dl = q_dedup_lines(spark, sf_dir).select(
        "doc_id",
        F.lit(-1).cast("long").alias("idx"),
        F.col("clean_md5").alias("payload_md5"),
        F.lit(-1).cast("long").alias("chars"),
        F.lit("dedup_lines").alias("method"),
    )
    return ch.unionByName(dl)


def q_host_boilerplate(spark, sf_dir):
    """Per-host boilerplate strip, value-exact: hosts = doc_id % 20
    (25 pages each at sf0.01), a per-host banner line injected into
    every page — flagged at frac 1.0 and stripped from ALL pages;
    naturally repeated template lines of the synthetic corpus get the
    same treatment in both engines (the mirror groups by the raw line
    string; Spark's xxhash64 digests are an internal transport)."""
    from website_to_agent_spark.operators import webtext

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("host"),
        F.concat(
            F.col("text"), F.lit("\nSubscribe to host "),
            (F.col("doc_id") % 20).cast("string"),
        ).alias("text"),
    )
    flagged = webtext.host_boilerplate_lines(d)
    out = webtext.strip_host_boilerplate(d, flagged)
    return out.select(
        "doc_id",
        F.md5("text").alias("clean_md5"),
        F.col("n_boilerplate_removed").cast("long").alias("n_removed"),
    )


def q_llm_retry_summaries(spark, sf_dir):
    """A11/T4: batch-LLM stage with the 60/20/20 trim-and-retry loop
    over a deterministic context-window endpoint — the whole loop is
    value-exact against the DuckDB mirror."""
    from website_to_agent_spark.operators import llm

    docs = _read(spark, sf_dir, "documents")
    out = llm.llm_map(
        docs, llm.DeterministicEndpoint(max_chars=300),
        max_tokens_schedule=(100, 50),
    )
    return out.select(
        "doc_id", "completion", "ok",
        F.col("attempts").cast("long").alias("attempts"),
    )


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs over embeddings ∪ exact copies
    (so the result is non-trivially non-empty)."""
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dup)
    return ann.embedding_near_dups(corpus, threshold=0.99).select(
        "doc_a", "doc_b", F.round("cos_sim", 4).alias("cos_sim")
    )


def q_ann_ivf_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first().embedding)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ann.ivf_topk(emb, queries, dim=dim, k=5, n_centroids=8, n_probe=3)
    return out.select("q_id", "vec_id", F.round("cos_sim", 5).alias("cos_sim"))


def q_ann_lsh_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first().embedding)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ann.lsh_topk(emb, queries, dim=dim, k=5, n_bits=8, probe_hamming=1)
    return out.select("q_id", "vec_id", F.round("cos_sim", 5).alias("cos_sim"))


# ----- consolidated contract rows (r3 verdict ask #2): the driver
# verifies at most 50 rows, so near-duplicate rows sharing a fixture
# are merged — each merged row still value-verifies every constituent
# operator (UNION ALL keeps all rows; a join keeps all columns).


def q_ann_topk(spark, sf_dir):
    """ANN family on one fixture: brute-force cosine (`ann.cosine_topk`),
    hyperplane-LSH (`ann.lsh_topk`), and IVF (`ann.ivf_topk`) top-5 for
    the same 3 queries, discriminated by `method`."""
    a = q_ann_cosine_topk(spark, sf_dir).select(
        "q_id", "vec_id", "cos_sim", F.lit("cosine").alias("method"))
    b = q_ann_lsh_topk(spark, sf_dir).select(
        "q_id", "vec_id", "cos_sim", F.lit("lsh").alias("method"))
    c = q_ann_ivf_topk(spark, sf_dir).select(
        "q_id", "vec_id", "cos_sim", F.lit("ivf").alias("method"))
    return a.unionByName(b).unionByName(c)


def q_hash_near_dups(spark, sf_dir):
    """MinHash-LSH + SimHash near-dup pairs over the same duplicated
    corpus; `metric` carries est_jaccard / hamming respectively."""
    mh = q_minhash_near_dups(spark, sf_dir).select(
        "doc_a", "doc_b",
        F.col("est_jaccard").cast("double").alias("metric"),
        F.lit("minhash").alias("method"))
    sh = q_simhash_near_dups(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("hamming").cast("double").alias("metric"),
        F.lit("simhash").alias("method"))
    return mh.unionByName(sh)


def q_text_stats(spark, sf_dir):
    """word_count + token_estimate in one per-doc projection."""
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        tq.word_count(F.col("text")).cast("long").alias("n_words"),
        tq.token_estimate(F.col("text")).alias("n_tokens"),
    )


def q_markdown_transforms(spark, sf_dir):
    """sanitize_markdown + trim_intelligently + title_from_markdown +
    extract_sections as one per-doc projection (same synthetic
    `# Doc N` header injections as the former standalone rows; the
    section list is summarized per doc: count, ordered titles, total
    content chars)."""
    md = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.format_string("# Doc %d\n", F.col("doc_id")),
        ).otherwise(F.lit("")),
        F.col("text"),
    )
    md2 = F.concat(
        F.format_string("# Doc %d\n", F.col("doc_id")),
        F.substring("text", 1, 120),
        F.lit("\n## Tail\ntail content"),
    )
    secs = tq.extract_sections(md2)
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        tq.sanitize_markdown(F.col("text")).alias("safe_text"),
        tq.trim_intelligently(F.col("text"), 50).alias("trimmed"),
        tq.title_from_markdown(md).alias("title"),
        F.size(secs).cast("long").alias("n_sections"),
        F.array_join(
            F.transform(secs, lambda s: s["title"]), "|"
        ).alias("section_titles"),
        F.aggregate(
            secs, F.lit(0).cast("long"),
            lambda acc, s: acc + F.length(s["content"]),
        ).alias("section_chars"),
    )


def q_sample_assignments(spark, sf_dir):
    """split_by_hash + stratified_sample + global_shuffle shard/pos
    unioned: (doc_id, label) with `method` naming the assignment
    operator."""
    from website_to_agent_spark.operators import sampling

    sp = q_split_by_hash(spark, sf_dir).select(
        "doc_id", F.col("split").alias("label"),
        F.lit("split_by_hash").alias("method"))
    st = q_stratified_sample(spark, sf_dir).select(
        "doc_id", F.col("lang").alias("label"),
        F.lit("stratified").alias("method"))
    sh = sampling.global_shuffle(
        _read(spark, sf_dir, "documents").select("doc_id"),
        "doc_id", n_shards=8,
    ).select(
        "doc_id",
        F.concat_ws(":", F.col("shard"), F.col("shard_pos")).alias("label"),
        F.lit("shard").alias("method"),
    )
    # r5-s10: Efraimidis–Spirakis weighted sampling without
    # replacement, both forms — global top-40 by char weight and
    # top-5 per language (the corpus-mixing shape).
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    wg = sampling.weighted_sample(
        docs, "doc_id", F.col("n_chars"), k=40,
    ).select("doc_id", F.lit("sel").alias("label"),
             F.lit("weighted").alias("method"))
    wl = sampling.weighted_sample(
        docs, "doc_id", F.col("n_chars"), k=5, strata_col="lang",
    ).select("doc_id", F.col("lang").alias("label"),
             F.lit("weighted_lang").alias("method"))
    return sp.unionByName(st).unionByName(sh).unionByName(wg).unionByName(wl)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_stats": q_text_stats,
        "content_length_by_source": q_content_length_by_source,
        "topk_reports": q_topk_reports,
        "content_hashes": q_content_hashes,
        "distinct_counts": q_distinct_counts,
        "event_success_stats": q_event_success_stats,
        "redirect_resolve": q_redirect_resolve,
        "revalidate_status": q_revalidate_status,
        "markdown_transforms": q_markdown_transforms,
        "bm25_scores": q_bm25_scores,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_topk": q_ann_topk,
        "doc_quality": q_doc_quality,
        "phrase_search": q_phrase_search,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "canonical_dedup": q_canonical_dedup,
        "safe_error_display": q_safe_error_display,
        "term_intersection": q_term_intersection,
        "embedding_near_dups": q_embedding_near_dups,
        "llm_retry_summaries": q_llm_retry_summaries,
        "pii_scrub": q_pii_scrub,
        "gopher_quality": q_gopher_quality,
        "url_dedup": q_url_dedup,
        "line_ops": q_line_ops,
        "host_boilerplate": q_host_boilerplate,
        "text_near_dups": q_text_near_dups,
        "lm_perplexity": q_lm_perplexity,
        "cap_per_domain": q_cap_per_domain,
        "decontaminate": q_decontaminate,
        "dedup_paragraphs": q_dedup_paragraphs,
        "dedup_spans": q_dedup_spans,
        "suffix_arrays": q_suffix_arrays,
        "sample_assignments": q_sample_assignments,
        "mixture_plan": q_mixture_plan,
        "pack_sequences": q_pack_sequences,
        "crawl_traps": q_crawl_traps,
        "inverted_index": q_inverted_index,
        # iterative crawl loops + hash-family ops — all value-oracled
        # too (recursive-CTE state folds / md5 hash variants)
        "crawl_client_fifo": q_crawl_client_fifo,
        "crawl_seeder_discovery": q_crawl_seeder_discovery,
        "crawl_priority_drain": q_crawl_priority_drain,
        "hash_near_dups": q_hash_near_dups,
        "linkgraph_stats": q_linkgraph_stats,
        "recrawl_priorities": q_recrawl_priorities,
        "connected_components": q_connected_components,
        "pagerank_hosts": q_pagerank_hosts,
        "trustrank_hosts": q_trustrank_hosts,
        "seeder_records": q_seeder_records,
        "dsir_weights": q_dsir_weights,
        "domain_knowledge": q_domain_knowledge,
    }


# --------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# --------------------------------------------------------------------

def _split_oracle_sql() -> str:
    """split_by_hash mirror: cutoffs come from the SAME float
    accumulation as the Spark plan (sampling.split_thresholds), embedded
    via repr() so both engines compare u against bit-identical doubles."""
    from website_to_agent_spark.operators.sampling import split_thresholds

    t_train, t_val = split_thresholds(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return f"""
        SELECT doc_id,
               CASE WHEN u < {t_train!r} THEN 'train'
                    WHEN u < {t_val!r} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                     || 'split-v1'), 1, 15))::BIGINT
                   / 1152921504606846976.0 AS u
          FROM documents
        )
    """


def _sanitize_oracle_sql() -> str:
    """Programmatically fold the P20 regex chain (`ui.py:34-90`) into
    nested DuckDB regexp_replace calls — mirrors tq.sanitize_markdown
    step for step."""
    steps = [
        (r"<[^>]*?>", " ", "g"),
        (r"&[a-zA-Z0-9#]+;", " ", "g"),
        (r"<!(?:DOCTYPE|--)[^>]*>", " ", "g"),
        (r":::[^:]*?:::", " ", "gs"),
        (r"\{[^}]*\}", " ", "g"),
        (r"\[[^\]]*\](?:\([^)]*\))?", " ", "g"),
        (r"---+", " ", "g"),
        (r"\|[^|]*\|", " ", "g"),
        (r"^#+\s*", "", "gm"),
        (r"[<>{}\\|`~\[\]()_*#@$%^&+=]", " ", "g"),
        (r"[\x00-\x1F\x7F-\x9F]", " ", "g"),
        (r"[^\x20-\x7E]", " ", "g"),
        (r"[^\w\s]{2,}", " ", "g"),
        (r"\s+", " ", "g"),
    ]
    expr = "text"
    for pat, rep, flags in steps:
        # DuckDB string literals keep backslashes verbatim — only
        # single-quotes need escaping.
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', '{flags}')"
    expr = f"trim({expr})"
    return f"""
        WITH s0 AS (SELECT doc_id, {expr} AS c FROM documents),
        s1 AS (
          SELECT doc_id,
                 CASE WHEN length(c) > 3000
                      THEN substr(c, 1, 3000) || ' (truncated)'
                      ELSE c END AS c
          FROM s0
        ),
        s2 AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   regexp_replace(c, '[^a-zA-Z0-9\\s.,!?:-]', ' ', 'g'),
                   '\\s+', ' ', 'g')) AS final
          FROM s1
        )
        SELECT doc_id,
               CASE WHEN final <> '' THEN final
                    ELSE 'Content processed safely' END AS safe_text
        FROM s2
    """


_DUP_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
)
"""

# DuckDB has no Python-strip; ^\s+ / \s+$ removal, applied twice
_SQL_STRIP = "regexp_replace(regexp_replace({x}, '^\\s+', ''), '\\s+$', '')"

# extract_sections oracle pieces (precomputed: f-string expressions
# cannot contain backslashes)
_SEC_TITLE = _SQL_STRIP.format(
    x="regexp_replace(regexp_extract(part, '^(#{1,6} [^\\n]*)', 1), '^#+ ', '')"
)
_SEC_CONTENT = _SQL_STRIP.format(
    x="CASE WHEN regexp_matches(part, '^#{1,6} ') "
      "THEN regexp_replace(part, '^#{1,6} [^\\n]*\\n?', '') "
      "ELSE part END"
)
_SEC_NONBLANK = _SQL_STRIP.format(x="x")


def _emb_dim() -> int:
    """Embedding dim of the correctness-gate table (the driver runs the
    oracle comparison at sf0.01 only)."""
    try:
        import duckdb

        return duckdb.connect().execute(
            "SELECT len(embedding) FROM "
            "read_parquet('/root/testdata/sf0.01/embeddings.parquet') LIMIT 1"
        ).fetchone()[0]
    except Exception:  # noqa: BLE001 — testdata missing: fall back
        return 64


def _trim_sql(max_tokens: int) -> str:
    """DuckDB mirror of tq.trim_intelligently(text, max_tokens) over
    the ``cl`` (whitespace-cleaned) and ``text`` columns in scope."""
    mc = max_tokens * 4
    beg, mid, end = int(mc * 0.6), int(mc * 0.2), int(mc * 0.2)
    mk = "chr(10) || chr(10) || '[... CONTENT TRIMMED FOR ANALYSIS ...]' || chr(10) || chr(10)"
    return f"""CASE
        WHEN length(text) <= {mc} THEN text
        WHEN length(cl) <= {mc} THEN cl
        ELSE substr(cl, 1, {beg})
             || {mk} || substr(cl, (length(cl) // 2 - {mid // 2}) + 1, {mid})
             || {mk} || substr(cl, length(cl) - {end} + 1, {end})
      END"""


def _llm_retry_oracle_sql(max_chars: int = 300) -> str:
    """Mirror of llm.llm_map(docs, DeterministicEndpoint(max_chars),
    schedule=(100, 50)): attempt 1 feeds the RAW text (the reference's
    full-content first call), retry 2 trim(text,100), retry 3
    trim(text,50); completion = 'OK(len):first40'."""
    return f"""
        WITH c AS (
          SELECT doc_id, text,
                 regexp_replace(regexp_replace(text,
                   '\\n\\s*\\n\\s*\\n+', chr(10) || chr(10), 'g'),
                   ' +', ' ', 'g') AS cl
          FROM documents
        ),
        t AS (
          SELECT doc_id, text AS in0,
                 {_trim_sql(100)} AS in1,
                 {_trim_sql(50)} AS in2
          FROM c
        )
        SELECT doc_id,
               CASE WHEN length(in0) <= {max_chars}
                    THEN 'OK(' || length(in0) || '):' || substr(in0, 1, 40)
                    WHEN length(in1) <= {max_chars}
                    THEN 'OK(' || length(in1) || '):' || substr(in1, 1, 40)
                    WHEN length(in2) <= {max_chars}
                    THEN 'OK(' || length(in2) || '):' || substr(in2, 1, 40)
                    ELSE '' END AS completion,
               (length(in0) <= {max_chars} OR length(in1) <= {max_chars}
                OR length(in2) <= {max_chars}) AS ok,
               CAST(CASE WHEN length(in0) <= {max_chars} THEN 1
                         WHEN length(in1) <= {max_chars} THEN 2
                         ELSE 3 END AS BIGINT) AS attempts
        FROM t
    """


def _lsh_oracle_sql(n_bits: int = 8, k: int = 5, seed: int = 42) -> str:
    """Value-exact DuckDB mirror of ann.lsh_topk: the SAME hyperplanes
    (regenerated from the shared seed — in the oracle they may be
    literals; the Spark plan ships them as broadcast data) bucket the
    corpus, multi-probe hamming≤1, exact cosine per candidate, top-k."""
    from website_to_agent_spark.operators.ann import hyperplane_values

    planes = hyperplane_values(_emb_dim(), n_bits, seed)
    vals = ", ".join(
        f"({1 << i}::BIGINT, [{', '.join(repr(x) for x in p)}]::DOUBLE[])"
        for i, p in enumerate(planes)
    )
    probe_vals = ", ".join(f"({m}::BIGINT)" for m in [0] + [1 << i for i in range(n_bits)])
    return f"""
        WITH planes(w, p) AS (VALUES {vals}),
        b AS (
          SELECT e.vec_id, e.embedding,
                 (SELECT CAST(SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], planes.p) > 0
                                       THEN planes.w ELSE 0 END) AS BIGINT)
                  FROM planes) AS bucket
          FROM embeddings e
        ),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket AS q_bucket
              FROM b WHERE vec_id < 3),
        probes(m) AS (VALUES {probe_vals}),
        qp AS (SELECT q_id, q_vec, xor(q_bucket, m) AS bucket
               FROM q CROSS JOIN probes),
        cand AS (
          SELECT DISTINCT qp.q_id, b.vec_id,
                 list_cosine_similarity(b.embedding::DOUBLE[], qp.q_vec::DOUBLE[]) AS cs
          FROM b JOIN qp USING (bucket)
        )
        SELECT q_id, vec_id, ROUND(cs, 5) AS cos_sim
        FROM cand
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) <= {k}
    """


def _ivf_oracle_sql(n_centroids: int = 8, n_probe: int = 3, k: int = 5) -> str:
    """Value-exact DuckDB mirror of ann.ivf_topk with stride-sampled
    centroids (every ⌈n/k⌉-th row by id — same deterministic rule as
    ann.stride_centroids)."""
    return f"""
        WITH st AS (SELECT greatest(1, COUNT(*) // {n_centroids}) AS stride FROM embeddings),
        cents AS (
          SELECT vec_id AS cid, embedding AS cvec FROM embeddings, st
          WHERE vec_id % st.stride = 0 ORDER BY vec_id LIMIT {n_centroids}
        ),
        assign AS (
          SELECT e.vec_id, e.embedding,
                 (SELECT c.cid FROM cents c
                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC, c.cid
                  LIMIT 1) AS centroid
          FROM embeddings e
        ),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
        qprobe AS (
          SELECT q_id, q_vec, cid AS centroid FROM (
            SELECT q.q_id, q.q_vec, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                     ORDER BY list_cosine_similarity(q.q_vec::DOUBLE[], c.cvec::DOUBLE[]) DESC, c.cid) AS rn
            FROM q CROSS JOIN cents c
          ) WHERE rn <= {n_probe}
        ),
        cand AS (
          SELECT DISTINCT qp.q_id, a.vec_id,
                 list_cosine_similarity(a.embedding::DOUBLE[], qp.q_vec::DOUBLE[]) AS cs
          FROM assign a JOIN qprobe qp USING (centroid)
        )
        SELECT q_id, vec_id, ROUND(cs, 5) AS cos_sim
        FROM cand
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) <= {k}
    """


def oracle_sql() -> dict[str, str]:
    o = {
        "word_count": """
            SELECT doc_id,
                   CAST(length(list_filter(string_split_regex(text, '\\s+'),
                        x -> x <> '')) AS BIGINT) AS n_words
            FROM documents
        """,
        "token_estimate": """
            SELECT doc_id, length(text) // 4 AS n_tokens FROM documents
        """,
        "content_length_by_source": """
            SELECT source, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "key_topics": f"""
            WITH toks AS (
              SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
              FROM documents
            )
            SELECT word, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rank
            FROM toks
            WHERE length(word) > 4 AND word NOT IN ({_STOPS})
            GROUP BY word
            ORDER BY cnt DESC, word
            LIMIT 10
        """,
        "top_docs_by_length": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 5
        """,
        "doc_hash": """
            SELECT doc_id, md5(text) AS content_md5 FROM documents
        """,
        "distinct_counts": """
            WITH tok AS (
              SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
              FROM documents
            ),
            tok2 AS (SELECT term FROM tok WHERE term <> ''),
            tot AS (SELECT COUNT(*) AS n FROM tok2),
            cnts AS (SELECT term, COUNT(*) AS cnt FROM tok2 GROUP BY term),
            hh AS (
              SELECT term, cnt FROM cnts CROSS JOIN tot
              WHERE cnt >= 0.005 * tot.n
            ),
            seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
            -- the md5-family count-min cells, byte-identical to
            -- sketches.cms_table(hash_impl='md5', depth=4, width=512)
            cells AS (
              SELECT seed,
                     (('0x' || substr(md5(term || ':' || CAST(seed AS VARCHAR)),
                                      1, 15))::BIGINT) % 512 AS bucket,
                     COUNT(*) AS cnt
              FROM tok2 CROSS JOIN seeds
              GROUP BY 1, 2
            ),
            probe AS (
              SELECT hh.term, hh.cnt, MIN(COALESCE(c.cnt, 0)) AS est
              FROM hh CROSS JOIN seeds
              LEFT JOIN cells c ON c.seed = seeds.seed
                AND c.bucket = (('0x' || substr(md5(hh.term || ':'
                      || CAST(seeds.seed AS VARCHAR)), 1, 15))::BIGINT) % 512
              GROUP BY hh.term, hh.cnt
            )
            SELECT 'corpus' AS kind, '' AS term,
                   CAST(-1 AS BIGINT) AS cnt, CAST(-1 AS BIGINT) AS est,
                   COUNT(DISTINCT source) AS n_sources,
                   COUNT(DISTINCT lang) AS n_langs
            FROM documents
            UNION ALL
            SELECT 'cms_hh', term, cnt, est,
                   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
            FROM probe
        """,
        "event_stats": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE) AS total_value,
                   ROUND(MIN(value), 6) AS min_value,
                   ROUND(MAX(value), 6) AS max_value
            FROM events GROUP BY event_type
        """,
        "success_rate": """
            SELECT COUNT(*) AS total_requests,
                   ROUND(AVG(CASE WHEN event_type = 'error' THEN 0.0 ELSE 1.0 END), 6)
                     AS success_rate
            FROM events
        """,
        "top_events_per_type": """
            SELECT event_type, event_id, ROUND(value, 6) AS value, rn
            FROM (
              SELECT event_type, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rn
              FROM events
            ) WHERE rn <= 3
        """,
        "revalidate_status": """
            WITH snaps AS (
              SELECT printf('https://v.example.com/d/%d.html', doc_id)
                       AS url,
                     CASE WHEN doc_id % 3 = 1 THEN md5(text || 'OLD')
                          ELSE md5(text) END AS digest
              FROM documents
            ),
            pages AS (
              SELECT printf('https://v.example.com/d/%d.html', doc_id)
                       AS url,
                     md5(text) AS new_digest
              FROM documents WHERE doc_id % 7 <> 0
            )
            SELECT s.url, s.digest,
                   COALESCE(p.new_digest, '') AS new_digest,
                   CASE WHEN p.new_digest IS NULL THEN 'gone'
                        WHEN p.new_digest = s.digest THEN 'not_modified'
                        ELSE 'modified' END AS status
            FROM snaps s LEFT JOIN pages p USING (url)
        """,
        # bounded redirect-chain walk — mirrors
        # operators/redirects.resolve_redirects over the synthetic
        # graph of q_redirect_resolve (ids ending 1-4 chain down to
        # the 0-anchor; 6/7 are a 2-cycle). redirect_ok ⟺ the final
        # url has no outgoing edge, exactly the engine's settlement
        # rule after its final-hop check.
        "redirect_resolve": """
            WITH RECURSIVE ids AS (SELECT doc_id AS i FROM documents),
            edges AS (
              SELECT printf('https://r.example.com/p/%d.html', i) AS src,
                     printf('https://r.example.com/p/%d.html',
                            CASE WHEN i % 10 IN (1,2,3,4) THEN i - 1
                                 WHEN i % 10 = 6 THEN i + 1
                                 WHEN i % 10 = 7 THEN i - 1 END) AS dst
              FROM ids WHERE i % 10 IN (1, 2, 3, 4, 6, 7)
            ),
            walk AS (
              SELECT printf('https://r.example.com/p/%d.html', i) AS url,
                     printf('https://r.example.com/p/%d.html', i) AS cur,
                     0 AS n_hops
              FROM ids
              UNION ALL
              SELECT w.url, e.dst, w.n_hops + 1
              FROM walk w JOIN edges e ON w.cur = e.src
              WHERE w.n_hops < 5
            )
            SELECT url, cur AS final_url,
                   CAST(n_hops AS BIGINT) AS n_hops,
                   NOT EXISTS (SELECT 1 FROM edges e2 WHERE e2.src = cur)
                     AS redirect_ok
            FROM walk
            QUALIFY ROW_NUMBER() OVER (PARTITION BY url
                                       ORDER BY n_hops DESC) = 1
        """,
        "sanitize_markdown": _sanitize_oracle_sql(),
        "trim_intelligently": """
            WITH c AS (
              SELECT doc_id, text,
                     regexp_replace(regexp_replace(text,
                       '\\n\\s*\\n\\s*\\n+', chr(10) || chr(10), 'g'),
                       ' +', ' ', 'g') AS cl
              FROM documents
            )
            SELECT doc_id,
              CASE
                WHEN length(text) <= 200 THEN text
                WHEN length(cl) <= 200 THEN cl
                ELSE substr(cl, 1, 120)
                     || chr(10) || chr(10) || '[... CONTENT TRIMMED FOR ANALYSIS ...]' || chr(10) || chr(10)
                     || substr(cl, (length(cl) // 2 - 20) + 1, 40)
                     || chr(10) || chr(10) || '[... CONTENT TRIMMED FOR ANALYSIS ...]' || chr(10) || chr(10)
                     || substr(cl, length(cl) - 40 + 1, 40)
              END AS trimmed
            FROM c
        """,
        "title_from_markdown": """
            WITH md AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                          THEN '# Doc ' || doc_id || chr(10) || text
                          ELSE text END AS m
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN trim(regexp_extract(m, '(?m)^#{1,2} (.+)$', 1)) <> ''
                        THEN trim(regexp_extract(m, '(?m)^#{1,2} (.+)$', 1))
                        ELSE 'Untitled' END AS title
            FROM md
        """,
        "bm25_scores": f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
              FROM documents
            ),
            tok2 AS (SELECT * FROM tok WHERE term <> ''),
            dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
            st AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT SUM(dl) FROM dl) * 1.0
                       / (SELECT COUNT(*) FROM documents) AS avgdl
            ),
            tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM tok2
              WHERE term IN ('data','table','join','fast')
              GROUP BY doc_id, term
            ),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
            raw AS (
              SELECT tf.doc_id,
                     SUM(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * 2.5
                         / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))
                     ) AS raw
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
              GROUP BY tf.doc_id
            ),
            allr AS (
              SELECT d.doc_id, COALESCE(raw.raw, 0.0) AS raw
              FROM documents d LEFT JOIN raw USING (doc_id)
            ),
            mm AS (SELECT MIN(raw) AS lo, MAX(raw) AS hi FROM allr),
            -- BM25F (r5): stacked fields, per-field length norm +
            -- weight, combine-then-saturate
            fieldsrc AS (
              SELECT doc_id, 'body' AS field, CAST(1.0 AS DOUBLE) AS w,
                     CAST(0.75 AS DOUBLE) AS bf, text AS t
              FROM documents
              UNION ALL
              SELECT doc_id, 'title', CAST(3.0 AS DOUBLE),
                     CAST(0.5 AS DOUBLE), substr(text, 1, 80)
              FROM documents
              UNION ALL
              SELECT doc_id, 'anchor', CAST(2.0 AS DOUBLE),
                     CAST(0.4 AS DOUBLE),
                     CASE WHEN doc_id % 7 = 0 THEN 'data table fast'
                          WHEN doc_id % 5 = 0 THEN 'join query speed'
                          ELSE '' END
              FROM documents
            ),
            ftok AS (
              SELECT doc_id, field,
                     unnest(string_split_regex(lower(t), '[^a-z0-9]+')) AS term
              FROM fieldsrc
            ),
            ftok2 AS (SELECT * FROM ftok WHERE term <> ''),
            fdl AS (
              SELECT doc_id, field, w, bf,
                     len(list_filter(
                       string_split_regex(lower(t), '[^a-z0-9]+'),
                       x -> x <> '')) AS dl
              FROM fieldsrc
            ),
            favg AS (
              SELECT field, AVG(dl) * 1.0 AS avgdl FROM fdl GROUP BY field
            ),
            ftf AS (
              SELECT doc_id, field, term, COUNT(*) AS tf FROM ftok2
              WHERE term IN ('data','table','join','fast')
              GROUP BY doc_id, field, term
            ),
            fdf AS (
              SELECT term, COUNT(DISTINCT doc_id) AS df FROM ftf
              GROUP BY term
            ),
            ftfw AS (
              SELECT t.doc_id, t.term,
                     SUM(d.w * t.tf
                         / (1 - d.bf + d.bf * d.dl
                            / greatest(a.avgdl, 1e-9))) AS tfw
              FROM ftf t
              JOIN fdl d ON t.doc_id = d.doc_id AND t.field = d.field
              JOIN favg a ON t.field = a.field
              GROUP BY t.doc_id, t.term
            ),
            fraw AS (
              SELECT w.doc_id,
                     SUM(ln(1 + ((SELECT COUNT(*) FROM documents)
                                 - f.df + 0.5) / (f.df + 0.5))
                         * w.tfw * 2.5 / (w.tfw + 1.5)) AS raw
              FROM ftfw w JOIN fdf f USING (term) GROUP BY w.doc_id
            ),
            fallr AS (
              SELECT d.doc_id, COALESCE(fraw.raw, 0.0) AS raw
              FROM documents d LEFT JOIN fraw USING (doc_id)
            ),
            fmm AS (SELECT MIN(raw) AS lo, MAX(raw) AS hi FROM fallr)
            SELECT 'flat' AS tag, doc_id,
                   ROUND(CASE WHEN hi > lo THEN (raw - lo) / (hi - lo)
                              ELSE 0.0 END, 5) AS score
            FROM allr CROSS JOIN mm
            UNION ALL
            SELECT 'bm25f' AS tag, doc_id,
                   ROUND(CASE WHEN hi > lo THEN (raw - lo) / (hi - lo)
                              ELSE 0.0 END, 5) AS score
            FROM fallr CROSS JOIN fmm
        """,
        "dedup_exact": f"""
            WITH {_DUP_CORPUS_CTE},
            newb AS (
              SELECT doc_id, text FROM corpus WHERE doc_id >= 250
              UNION ALL
              SELECT doc_id + 200000, text FROM corpus
              WHERE doc_id >= 250 AND doc_id < 260
            ),
            prior AS (
              SELECT DISTINCT md5(text) AS h FROM corpus
              WHERE doc_id < 250
            ),
            win AS (
              SELECT md5(text) AS h, MIN(doc_id) AS doc_id
              FROM newb GROUP BY md5(text)
            ),
            fresh AS (
              SELECT w.h, w.doc_id FROM win w
              LEFT JOIN prior p ON w.h = p.h WHERE p.h IS NULL
            )
            SELECT 'groups' AS part, md5(text) AS dup_hash,
                   COUNT(*) AS n_dups,
                   MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
            FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
            UNION ALL
            SELECT 'inc_survivor', h, 1, doc_id, doc_id FROM fresh
            UNION ALL
            SELECT 'seen_count', 'x',
                   (SELECT COUNT(*) FROM prior)
                   + (SELECT COUNT(*) FROM fresh), 0, 0
        """,
        "ngram_jaccard": f"""
            WITH {_DUP_CORPUS_CTE},
            toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS l
              FROM corpus
            ),
            sh AS (
              SELECT doc_id, unnest(
                CASE WHEN length(l) >= 3
                     THEN list_distinct(list_transform(
                            generate_series(1, length(l) - 2),
                            i -> array_to_string(list_slice(l, i, i + 2), ' ')))
                     ELSE [array_to_string(l, ' ')] END) AS g
              FROM toks
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b,
                   ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
        """,
        # FLOOR(epoch(..)) mirrors Spark's timestamp→long cast (which
        # floors; DuckDB's bare epoch()::BIGINT would ROUND half-up)
        "recrawl_priorities": """
            WITH snaps AS (
              SELECT 'https://site.test/u/' || CAST(user_id AS VARCHAR)
                       AS url,
                     ts, MIN(event_type) AS digest
              FROM events GROUP BY 1, 2
            ),
            marked AS (
              SELECT url, ts, digest,
                     LAG(digest) OVER (PARTITION BY url ORDER BY ts)
                       AS prev
              FROM snaps
            ),
            rates AS (
              SELECT url,
                     COUNT(*) AS n_snaps,
                     SUM(CASE WHEN prev IS NOT NULL AND digest <> prev
                              THEN 1 ELSE 0 END) AS n_changes,
                     MAX(CAST(FLOOR(epoch(ts)) AS BIGINT))
                       - MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS span_s,
                     MAX(ts) AS last_ts
              FROM marked GROUP BY url
            )
            SELECT url, n_snaps, n_changes, span_s,
                   CASE WHEN span_s > 0
                        THEN n_changes / span_s
                        ELSE CAST(0.0 AS DOUBLE) END AS rate,
                   (CASE WHEN span_s > 0 AND n_changes > 0
                         THEN n_changes / span_s
                         ELSE CAST(0.0 AS DOUBLE) END)
                   * (CAST(FLOOR(epoch(TIMESTAMP '2024-07-01 00:00:00'))
                           AS BIGINT)
                      - CAST(FLOOR(epoch(last_ts)) AS BIGINT)) AS score
            FROM rates
        """,
        "link_degrees_topk": """
            WITH nd AS (SELECT COUNT(*) AS n FROM documents),
            edges AS (
              SELECT 'd' || CAST(d.doc_id AS VARCHAR) AS src,
                     'd' || CAST((d.doc_id * d.doc_id + j.j) % nd.n AS VARCHAR)
                       AS dst
              FROM documents d, nd, (VALUES (1), (2), (3)) j(j)
            ),
            outs AS (SELECT src AS node, COUNT(*) AS out_deg
                     FROM edges GROUP BY 1),
            ins AS (SELECT dst AS node, COUNT(*) AS in_deg
                    FROM edges GROUP BY 1)
            SELECT COALESCE(o.node, i.node) AS node,
                   COALESCE(o.out_deg, 0) AS out_deg,
                   COALESCE(i.in_deg, 0) AS in_deg
            FROM outs o FULL OUTER JOIN ins i ON o.node = i.node
            ORDER BY in_deg DESC, node LIMIT 20
        """,
        # mirrors linkgraph.connected_components round-for-round:
        # symmetrized distinct edges, min-label propagation, 8 fixed
        # rounds (exact string labels — convergence not required for
        # equality, only the same round count)
        "connected_components": """
            WITH RECURSIVE nd AS (SELECT COUNT(*) AS n FROM documents),
            edges AS (
              SELECT 'd' || CAST(d.doc_id AS VARCHAR) AS src,
                     'd' || CAST(d.doc_id % 10
                                 + 10 * ((d.doc_id * d.doc_id + j.j)
                                         % (nd.n // 10))
                                 AS VARCHAR) AS dst
              FROM documents d, nd, (VALUES (1), (2), (3)) j(j)
            ),
            sym AS (
              SELECT DISTINCT x.a, x.b FROM (
                SELECT src AS a, dst AS b FROM edges
                UNION ALL SELECT dst AS a, src AS b FROM edges
              ) x
            ),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            cc(iter, node, label) AS (
              SELECT 0, node, node FROM nodes
              UNION ALL
              SELECT l.iter + 1, l.node,
                     LEAST(l.label, COALESCE(c.nlab, l.label))
              FROM cc l
              LEFT JOIN (
                SELECT s.b AS node, MIN(l2.label) AS nlab
                FROM sym s JOIN cc l2 ON l2.node = s.a
                GROUP BY s.b
              ) c ON c.node = l.node
              WHERE l.iter < 8
            )
            SELECT node, label AS component FROM cc WHERE iter = 8
        """,
        # mirrors linkgraph.pagerank step-for-step: same edge rule,
        # same (1-d)/N + d*(contrib + dang/N) shape, same 9-dp
        # per-iteration ROUND — the recursive working table IS the
        # rank vector of the previous iteration (dang is 0 here: every
        # host has out-edges, but the term is mirrored anyway).
        "pagerank_hosts": """
            WITH RECURSIVE nd AS (SELECT COUNT(*) AS n FROM documents),
            edges AS (
              SELECT 'src' || CAST(d.doc_id % 20 AS VARCHAR) AS src,
                     'src' || CAST(((d.doc_id * d.doc_id + j.j) % nd.n) % 20
                                   AS VARCHAR) AS dst,
                     COUNT(*) AS w
              FROM documents d, nd, (VALUES (1), (2), (3)) j(j)
              GROUP BY 1, 2
            ),
            -- no top-level UNION here: inside WITH RECURSIVE, DuckDB
            -- parses a CTE body of the shape "a UNION b" as base/step
            -- recursion syntax (dropping the dedup); the subquery +
            -- DISTINCT form is a plain SELECT and parses normally
            nodes AS (
              SELECT DISTINCT x.node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges
              ) x
            ),
            nn AS (SELECT COUNT(*) AS n FROM nodes),
            outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1),
            pr(iter, node, r) AS (
              SELECT 0, node,
                     ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9)
              FROM nodes
              UNION ALL
              SELECT m.it + 1, n2.node,
                     ROUND(
                       (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                         / (SELECT n FROM nn)
                       + CAST(0.85 AS DOUBLE)
                         * (COALESCE(c.c, CAST(0.0 AS DOUBLE))
                            + m.dang / CAST((SELECT n FROM nn) AS DOUBLE)),
                       9)
              FROM nodes n2
              CROSS JOIN (
                SELECT MAX(iter) AS it,
                       COALESCE((SELECT SUM(p2.r) FROM pr p2
                                 LEFT JOIN outw ow ON p2.node = ow.src
                                 WHERE ow.src IS NULL),
                                CAST(0.0 AS DOUBLE)) AS dang
                FROM pr
              ) m
              LEFT JOIN (
                SELECT e.dst, SUM(p.r * e.w / ow.wout) AS c
                FROM pr p
                JOIN edges e ON p.node = e.src
                JOIN outw ow ON p.node = ow.src
                GROUP BY e.dst
              ) c ON c.dst = n2.node
              WHERE m.it < 8
            )
            SELECT node AS host, r AS rank FROM pr WHERE iter = 8
        """,
        "anchor_text_top": """
            WITH nd AS (SELECT COUNT(*) AS n FROM documents),
            edges AS (
              SELECT 'src' || CAST(((d.doc_id * d.doc_id + j.j) % nd.n) % 20
                                   AS VARCHAR) AS dst,
                     'a' || CAST((d.doc_id + j.j) % 4 AS VARCHAR) AS anchor
              FROM documents d, nd, (VALUES (1), (2), (3)) j(j)
            ),
            counted AS (
              SELECT dst, anchor, COUNT(*) AS cnt
              FROM edges GROUP BY dst, anchor
            )
            SELECT dst, anchor, cnt, rk FROM (
              SELECT dst, anchor, cnt,
                     ROW_NUMBER() OVER (PARTITION BY dst
                                        ORDER BY cnt DESC, anchor) AS rk
              FROM counted
            ) WHERE rk <= 2
        """,
        "minhash_near_dups": f"""
            WITH {_DUP_CORPUS_CTE},
            toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS l
              FROM corpus
            ),
            sh AS (
              SELECT doc_id, unnest(
                CASE WHEN length(l) >= 3
                     THEN list_distinct(list_transform(
                            generate_series(1, length(l) - 2),
                            i -> array_to_string(list_slice(l, i, i + 2), ' ')))
                     ELSE [array_to_string(l, ' ')] END) AS g
              FROM toks
            ),
            hs AS (
              SELECT doc_id,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT % 4294967296 AS h
              FROM sh
            ),
            mins AS (
              SELECT doc_id, i,
                     MIN((h * (2 * i + 1) + i * 2654435769)
                         % 2305843009213693951) AS mh
              FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) t
              GROUP BY doc_id, i
            ),
            sig AS (
              SELECT doc_id, list(mh ORDER BY i) AS s FROM mins GROUP BY doc_id
            ),
            banded AS (
              SELECT doc_id, s, band_id,
                     md5(array_to_string(
                           list_slice(s, band_id * 2 + 1, band_id * 2 + 2),
                           ',')) AS band_key
              FROM sig CROSS JOIN
                   (SELECT unnest(generate_series(0, 15)) AS band_id) b
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.s AS sa, b.s AS sb
              FROM banded a
              JOIN banded b ON a.band_id = b.band_id
                           AND a.band_key = b.band_key
              WHERE a.doc_id < b.doc_id
            ),
            est AS (
              SELECT doc_a, doc_b,
                     list_sum(list_transform(
                       sa, (x, i) -> CASE WHEN x = sb[i] THEN 1 ELSE 0 END))
                       / 32.0 AS est_jaccard
              FROM cand
            )
            SELECT doc_a, doc_b, ROUND(est_jaccard, 6) AS est_jaccard
            FROM est WHERE est_jaccard >= 0.9
        """,
        "embedding_near_dups": """
            WITH corpus AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, embedding
              FROM embeddings WHERE vec_id < 10
            )
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4)
                     AS cos_sim
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.99
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                       FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.q_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.q_vec::DOUBLE[]) AS cs
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT q_id, vec_id, cs,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cs DESC, vec_id) AS rank
              FROM scored
            )
            SELECT q_id, vec_id, ROUND(cs, 5) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "lang_id_counts": f"""
            WITH t AS (
              SELECT list_filter(
                       string_split_regex(lower(text), '[^a-zA-Zäöüñáéíóú]+'),
                       x -> TRUE) AS toks
              FROM documents
            ),
            r AS (
              SELECT
                length(list_filter(toks, x -> list_contains([{_EN}], x))) * 1.0
                  / greatest(length(toks), 1) AS en,
                length(list_filter(toks, x -> list_contains([{_ES}], x))) * 1.0
                  / greatest(length(toks), 1) AS es,
                length(list_filter(toks, x -> list_contains([{_DE}], x))) * 1.0
                  / greatest(length(toks), 1) AS de
              FROM t
            ),
            p AS (
              SELECT CASE
                WHEN greatest(en, es, de) < 0.03 THEN 'und'
                WHEN en = greatest(en, es, de) THEN 'en'
                WHEN es = greatest(en, es, de) THEN 'es'
                ELSE 'de' END AS lang_pred
              FROM r
            )
            SELECT lang_pred, COUNT(*) AS n FROM p GROUP BY lang_pred
        """,
        "quality_scores": f"""
            WITH b AS (
              SELECT doc_id, length(text) AS n,
                     length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_n,
                     list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            s AS (
              SELECT doc_id,
                CASE WHEN n >= 200 AND n <= 100000 THEN 1.0
                     WHEN n >= 50 THEN 0.5 ELSE 0.0 END AS len_score,
                alpha_n * 1.0 / greatest(n, 1) AS alpha,
                length(list_filter(toks, x -> list_contains([{_EN}], x))) * 1.0
                  / greatest(length(toks), 1) AS stop_ratio
              FROM b
            )
            SELECT doc_id,
                   ROUND((len_score
                          + least(alpha * 2, 1.0)
                          + CASE WHEN stop_ratio >= 0.02 THEN 1.0
                                 ELSE stop_ratio / 0.02 END) / 3.0, 6) AS quality
            FROM s
        """,
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))), 3) AS DOUBLE)
                     AS sum_base_price,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))
                         * (CAST(1 AS DECIMAL(28,8)) - CAST(l_discount AS DECIMAL(28,8)))), 3) AS DOUBLE)
                     AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "snapshot_diff": """
            WITH base AS (
              SELECT CAST(doc_id AS VARCHAR) AS url, text FROM documents
            ),
            cur AS (
              SELECT url,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
              FROM (SELECT CAST(doc_id AS VARCHAR) AS url, text, doc_id
                    FROM documents WHERE doc_id % 11 <> 0)
              UNION ALL
              SELECT 'new-' || CAST(doc_id AS VARCHAR) AS url, text
              FROM documents WHERE doc_id < 10
            ),
            j AS (
              SELECT COALESCE(b.url, c.url) AS url,
                     CASE WHEN b.url IS NULL THEN 'added'
                          WHEN c.url IS NULL THEN 'removed'
                          WHEN b.text <> c.text THEN 'changed'
                     END AS change,
                     COALESCE(length(c.text), 0) - COALESCE(length(b.text), 0)
                       AS delta_chars
              FROM base b FULL JOIN cur c ON b.url = c.url
            )
            SELECT url, change, delta_chars FROM j WHERE change IS NOT NULL
        """,
        "safe_error_display": """
            SELECT doc_id,
                   substr(trim(regexp_replace(
                     regexp_replace('Error <code=500> @ ' || text,
                                    '[^\\w\\s.,!?():-]', ' ', 'g'),
                     '\\s+', ' ', 'g')), 1, 500) AS safe_msg
            FROM documents
        """,
        "term_intersection": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id,
                   COALESCE(array_to_string(list_sort(list_intersect(
                     ['data','table','join'],
                     list_distinct(list_concat(toks[1:5], toks[6:10])))), ','), '')
                     AS matched_terms
            FROM t
        """,
        "simhash_near_dups": f"""
            WITH {_DUP_CORPUS_CTE},
            tok AS (
              SELECT doc_id,
                     ('0x' || substr(md5(t.tkn), 1, 15))::BIGINT AS h
              FROM corpus,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                      x -> x <> '')) AS t(tkn)
            ),
            bits AS (SELECT unnest(generate_series(0, 59)) AS i),
            per_bit AS (
              SELECT doc_id, i,
                     SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM tok CROSS JOIN bits GROUP BY doc_id, i
            ),
            fp AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sh
              FROM per_bit GROUP BY doc_id
            ),
            banded AS (
              SELECT doc_id, sh, b.band, (sh >> (b.band * 15)) & 32767 AS key
              FROM fp, (SELECT unnest(generate_series(0, 3)) AS band) b
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.sh AS sh_a, b.sh AS sh_b
              FROM banded a
              JOIN banded b ON a.band = b.band AND a.key = b.key
                            AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
        """,
        "extract_sections": f"""
            WITH md AS (
              SELECT doc_id,
                     '# Doc ' || doc_id || chr(10) || substr(text, 1, 120)
                     || chr(10) || '## Tail' || chr(10) || 'tail content' AS m
              FROM documents
            ),
            parts AS (
              SELECT doc_id,
                     list_filter(
                       string_split(
                         regexp_replace(m, '(?m)^(#{{1,6}} )', chr(1) || '\\1', 'g'),
                         chr(1)),
                       x -> {_SEC_NONBLANK} <> ''
                     ) AS ps
              FROM md
            ),
            flat AS (
              SELECT doc_id, unnest(ps) AS part,
                     unnest(generate_series(0, length(ps) - 1)) AS section_idx
              FROM parts
            )
            SELECT doc_id, CAST(section_idx AS BIGINT) AS section_idx,
                   CASE WHEN regexp_matches(part, '^#{{1,6}} ')
                        THEN {_SEC_TITLE}
                        ELSE 'Introduction' END AS title,
                   length({_SEC_CONTENT}) AS content_chars
            FROM flat
        """,
        "domain_knowledge": f"""
            -- tq.trim_intelligently(text, 4000) is the identity below
            -- 16000 chars; documents max out far under that, so the
            -- stand-in reduces to per-doc top-10 topic words.
            WITH docs AS (
              SELECT CAST(doc_id AS VARCHAR) AS source_url, text
              FROM documents WHERE doc_id < 50
            ),
            tok AS (
              SELECT source_url, t.w AS word
              FROM docs,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS t(w)
              WHERE length(t.w) > 4 AND t.w NOT IN ({_STOPS})
            ),
            counts AS (
              SELECT source_url, word, COUNT(*) AS cnt
              FROM tok GROUP BY source_url, word
            ),
            ranked AS (
              SELECT source_url, word, cnt,
                     ROW_NUMBER() OVER (PARTITION BY source_url
                                        ORDER BY cnt DESC, word) AS rank,
                     MAX(cnt) OVER (PARTITION BY source_url) AS max_cnt
              FROM counts
            )
            SELECT source_url, CAST(rank - 1 AS BIGINT) AS concept_rank,
                   word AS concept,
                   ROUND(cnt * 1.0 / max_cnt, 6) AS importance
            FROM ranked WHERE rank <= 10
        """,
        "pii_scrub": """
            WITH p AS (
              SELECT doc_id,
                     text || ' Contact user' || doc_id
                     || '@example.com or 10.0.' || (doc_id % 256)
                     || '.7 or +44 7700 900'
                     || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                     || ' now. Released 2025-01-'
                     || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                     || '; cost 1 000 000.' AS t
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                     '\\+\\d{1,3}[ .-]?\\d{2,4}([ .-]?\\d{2,4}){1,3}'
                     || '|\\(\\d{3}\\) ?\\d{3}[-. ]\\d{4}'
                     || '|\\d{3}[-. ]\\d{3}[-. ]\\d{4}',
                     '<PHONE>', 'g')
                     AS clean_text
            FROM p
        """,
        "gopher_quality": """
            WITH s AS (
              SELECT doc_id,
                     text || chr(10) || 'repeated line' || chr(10)
                     || CASE WHEN doc_id % 3 = 0 THEN 'repeated line'
                             ELSE '- a bullet' END
                     || chr(10) || 'trailing thought...'
                     || chr(10) || 'This is one sentence. Here comes '
                     || 'another sentence right now. Finally a third '
                     || 'sentence ends the line.'
                     || chr(10)
                     || CASE WHEN doc_id % 5 = 0
                        THEN 'This line mentions javascript and has many words.'
                        ELSE 'This ordinary sentence has plenty of words today.'
                        END
                     || chr(10)
                     || CASE WHEN doc_id % 7 = 0
                        THEN 'This code snippet contains a { brace character.'
                        ELSE 'No braces appear anywhere in this tidy sentence.'
                        END
                     || chr(10)
                     || CASE WHEN doc_id % 9 = 0
                        THEN 'Lorem ipsum dolor sit amet is classic filler text.'
                        ELSE 'Original phrasing continues in this closing sentence.'
                        END
                     || CASE WHEN doc_id % 4 = 0
                             THEN chr(10) || chr(10)
                                  || 'shared closing paragraph'
                                  || chr(10) || chr(10)
                                  || 'shared closing paragraph'
                             ELSE chr(10) || chr(10)
                                  || 'unique closing thought' END AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(t, chr(10)),
                                                x -> trim(x)),
                                 x -> x <> '') AS lines,
                     list_filter(list_transform(
                                   string_split_regex(t, '\\n{2,}'),
                                   x -> trim(x)),
                                 x -> x <> '') AS paras,
                     list_filter(string_split_regex(t, '\\s+'),
                                 x -> x <> '') AS words
              FROM s
            ),
            x AS (
              SELECT doc_id,
                CAST(length(words) AS BIGINT) AS n_words,
                ROUND(list_sum(list_transform(words, w -> length(w))) * 1.0
                      / greatest(length(words), 1), 6) AS mean_word_len,
                ROUND(length(list_filter(words,
                        w -> w IN ('#', '...', '…'))) * 1.0
                      / greatest(length(words), 1), 6) AS swr,
                ROUND((length(lines) - length(list_distinct(lines))) * 1.0
                      / greatest(length(lines), 1), 6) AS dup_line_frac,
                ROUND((list_sum(list_transform(lines, l -> length(l)))
                       - list_sum(list_transform(list_distinct(lines),
                                                 l -> length(l)))) * 1.0
                      / greatest(list_sum(list_transform(lines,
                                                         l -> length(l))),
                                 1), 6) AS dup_line_char_frac,
                ROUND((length(paras) - length(list_distinct(paras))) * 1.0
                      / greatest(length(paras), 1), 6) AS dup_para_frac,
                ROUND((list_sum(list_transform(paras, p -> length(p)))
                       - list_sum(list_transform(list_distinct(paras),
                                                 p -> length(p)))) * 1.0
                      / greatest(list_sum(list_transform(paras,
                                                         p -> length(p))),
                                 1), 6) AS dup_para_char_frac,
                ROUND(length(list_filter(lines,
                        l -> starts_with(l, '-') OR starts_with(l, '*')
                             OR starts_with(l, '•'))) * 1.0
                      / greatest(length(lines), 1), 6) AS bullet_frac,
                ROUND(length(list_filter(lines,
                        l -> ends_with(l, '...') OR ends_with(l, '…'))) * 1.0
                      / greatest(length(lines), 1), 6) AS ellipsis_frac
              FROM m
            ),
            tk AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(t), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM s
            ),
            tc AS (
              SELECT doc_id,
                     length(array_to_string(toks, ' ')) AS total_chars
              FROM tk
            ),
            g AS (
              SELECT doc_id, n,
                     array_to_string(toks[i : i + n - 1], ' ') AS gram
              FROM tk,
                   unnest([2,3,4,5,6,7,8,9,10]) AS u(n),
                   unnest(generate_series(1, length(toks) - n + 1)) AS p(i)
            ),
            gc AS (
              SELECT doc_id, n, gram, length(gram) AS L, count(*) AS c
              FROM g GROUP BY ALL
            ),
            ga AS (
              SELECT doc_id,
                max(CASE WHEN n=2 THEN c*L END) AS t2,
                max(CASE WHEN n=3 THEN c*L END) AS t3,
                max(CASE WHEN n=4 THEN c*L END) AS t4,
                sum(CASE WHEN n=5 AND c>1 THEN (c-1)*L END) AS d5,
                sum(CASE WHEN n=6 AND c>1 THEN (c-1)*L END) AS d6,
                sum(CASE WHEN n=7 AND c>1 THEN (c-1)*L END) AS d7,
                sum(CASE WHEN n=8 AND c>1 THEN (c-1)*L END) AS d8,
                sum(CASE WHEN n=9 AND c>1 THEN (c-1)*L END) AS d9,
                sum(CASE WHEN n=10 AND c>1 THEN (c-1)*L END) AS d10
              FROM gc GROUP BY doc_id
            ),
            rep AS (
              SELECT tc.doc_id,
                ROUND(COALESCE(t2,0)*1.0/greatest(total_chars,1), 6)
                  AS top_2gram_char_frac,
                ROUND(COALESCE(t3,0)*1.0/greatest(total_chars,1), 6)
                  AS top_3gram_char_frac,
                ROUND(COALESCE(t4,0)*1.0/greatest(total_chars,1), 6)
                  AS top_4gram_char_frac,
                ROUND(COALESCE(d5,0)*1.0/greatest(total_chars,1), 6)
                  AS dup_5gram_char_frac,
                ROUND(COALESCE(d6,0)*1.0/greatest(total_chars,1), 6)
                  AS dup_6gram_char_frac,
                ROUND(COALESCE(d7,0)*1.0/greatest(total_chars,1), 6)
                  AS dup_7gram_char_frac,
                ROUND(COALESCE(d8,0)*1.0/greatest(total_chars,1), 6)
                  AS dup_8gram_char_frac,
                ROUND(COALESCE(d9,0)*1.0/greatest(total_chars,1), 6)
                  AS dup_9gram_char_frac,
                ROUND(COALESCE(d10,0)*1.0/greatest(total_chars,1), 6)
                  AS dup_10gram_char_frac
              FROM tc LEFT JOIN ga ON tc.doc_id = ga.doc_id
            ),
            c4 AS (
              SELECT doc_id,
                COALESCE(array_to_string(list_filter(lines,
                  l -> (ends_with(l, '.') OR ends_with(l, '!')
                        OR ends_with(l, '?') OR ends_with(l, '"')
                        OR ends_with(l, '”'))
                       AND length(list_filter(
                             string_split_regex(l, '\\s+'),
                             w -> w <> '')) >= 5
                       AND NOT contains(lower(l), 'javascript')),
                  chr(10)), '') AS c4_text
              FROM m
            ),
            c4ok AS (
              SELECT doc_id, c4_text,
                ((length(c4_text)
                  - length(regexp_replace(c4_text, '[.!?]', '', 'g'))) >= 3
                 AND NOT contains(c4_text, '{')
                 AND NOT contains(lower(c4_text), 'lorem ipsum')) AS c4_ok
              FROM c4
            )
            SELECT x.doc_id, n_words, mean_word_len, dup_line_frac,
                   dup_line_char_frac, dup_para_frac, dup_para_char_frac,
                   bullet_frac, ellipsis_frac, c4ok.c4_text, c4ok.c4_ok,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND swr <= 0.1 AND dup_line_frac <= 0.3
                    AND dup_line_char_frac <= 0.2
                    AND dup_para_frac <= 0.3 AND dup_para_char_frac <= 0.2
                    AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3)
                     AS quality_ok,
                   rep.top_2gram_char_frac, rep.top_3gram_char_frac,
                   rep.top_4gram_char_frac, rep.dup_5gram_char_frac,
                   rep.dup_6gram_char_frac, rep.dup_7gram_char_frac,
                   rep.dup_8gram_char_frac, rep.dup_9gram_char_frac,
                   rep.dup_10gram_char_frac,
                   (rep.top_2gram_char_frac <= 0.20
                    AND rep.top_3gram_char_frac <= 0.18
                    AND rep.top_4gram_char_frac <= 0.16
                    AND rep.dup_5gram_char_frac <= 0.15
                    AND rep.dup_6gram_char_frac <= 0.14
                    AND rep.dup_7gram_char_frac <= 0.13
                    AND rep.dup_8gram_char_frac <= 0.12
                    AND rep.dup_9gram_char_frac <= 0.11
                    AND rep.dup_10gram_char_frac <= 0.10)
                     AS repetition_ok
            FROM x JOIN rep ON x.doc_id = rep.doc_id
                   JOIN c4ok ON x.doc_id = c4ok.doc_id
        """,
        "text_near_dups": f"""
            WITH {_DUP_CORPUS_CTE},
            t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM corpus
            ),
            e AS (
              SELECT doc_id,
                list_transform(generate_series(0, 31),
                  i -> CAST(length(list_filter(toks,
                         tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT % 32 = i))
                       AS DOUBLE)) AS counts
              FROM t
            ),
            n AS (
              SELECT doc_id,
                     list_transform(counts,
                       x -> x / greatest(sqrt(list_sum(list_transform(counts, y -> y * y))), 1e-12)
                     ) AS emb
              FROM e
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ROUND(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
            FROM n a JOIN n b ON a.doc_id < b.doc_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.95
        """,
        "chunk_text": """
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   md5(substr(text, s + 1, 200)) AS chunk_md5,
                   length(substr(text, s + 1, 200)) AS chunk_chars
            FROM (
              SELECT doc_id, text,
                     unnest(generate_series(0,
                       greatest(length(text) - 1, 0), 150)) AS s,
                     unnest(generate_series(0,
                       CAST(greatest(length(text) - 1, 0) // 150 AS INT))) AS i
              FROM documents
            )
        """,
        "dedup_lines": """
            WITH s AS (
              SELECT doc_id,
                     string_split('boiler' || chr(10) || text || chr(10)
                       || 'boiler' || chr(10) || 'keep' || chr(10)
                       || 'boiler' || chr(10) || 'keep', chr(10)) AS lines
              FROM documents
            )
            SELECT doc_id,
                   md5(array_to_string(
                     list_filter(lines,
                       (x, i) -> list_position(lines, x) = i),
                     chr(10))) AS clean_md5
            FROM s
        """,
        "seeder_records": """
            -- EP3 mirror for the synthesized pages: every seed is a
            -- stored page whose head reduces to title 'Doc <id>' (no
            -- meta/jsonld), so head_text == 'doc <id>' and the BM25
            -- ranking over heads has a closed-form SQL twin.
            WITH corpus AS (
              SELECT doc_id,
                     'https://docs.example.com/d/' || doc_id || '.html' AS url,
                     lower('Doc ' || doc_id) AS t
              FROM documents WHERE doc_id < 60
            ),
            tok AS (
              SELECT doc_id, unnest(string_split_regex(t, '[^a-z0-9]+')) AS term
              FROM corpus
            ),
            tok2 AS (SELECT * FROM tok WHERE term <> ''),
            dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
            st AS (
              SELECT (SELECT COUNT(*) FROM corpus) AS n,
                     (SELECT SUM(dl) FROM dl) * 1.0
                       / (SELECT COUNT(*) FROM corpus) AS avgdl
            ),
            tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM tok2
              WHERE term IN ('doc', '7') GROUP BY doc_id, term
            ),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
            raw AS (
              SELECT tf.doc_id,
                     SUM(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * 2.5
                         / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))
                     ) AS raw
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
              GROUP BY tf.doc_id
            ),
            allr AS (
              SELECT c.doc_id, c.url, COALESCE(raw.raw, 0.0) AS raw
              FROM corpus c LEFT JOIN raw USING (doc_id)
            ),
            mm AS (SELECT MIN(raw) AS lo, MAX(raw) AS hi FROM allr)
            SELECT url, 'valid' AS status,
                   ROUND(CASE WHEN hi > lo THEN (raw - lo) / (hi - lo)
                              ELSE 0.0 END, 5) AS relevance_score,
                   'Doc ' || doc_id AS head_title
            FROM allr CROSS JOIN mm
            ORDER BY relevance_score DESC, url
            LIMIT 20
        """,
        "url_dedup": """
            WITH d AS (SELECT doc_id FROM documents),
            u AS (
              SELECT 'https://Docs.Example.com:443/d/' || doc_id
                     || '.html?utm_source=x&b=2&a=1#frag' AS url FROM d
              UNION ALL
              SELECT 'https://docs.example.com/d/' || doc_id
                     || '.html?a=1&b=2' FROM d
              UNION ALL
              SELECT 'HTTP://docs.example.com:80/d/' || doc_id
                     || '.html?fbclid=abc' FROM d WHERE doc_id % 2 = 0
            ),
            c AS (
              SELECT url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS auth0,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p0,
                regexp_extract(url, '\\?([^#]*)', 1) AS q0
              FROM u
            ),
            c2 AS (
              SELECT url, scheme,
                CASE WHEN scheme = 'http'
                     THEN regexp_replace(auth0, ':80$', '')
                     WHEN scheme = 'https'
                     THEN regexp_replace(auth0, ':443$', '')
                     ELSE auth0 END AS auth,
                CASE WHEN p0 = '' THEN '/' ELSE p0 END AS p,
                array_to_string(list_sort(list_filter(string_split(q0, '&'),
                  kv -> kv <> '' AND NOT regexp_matches(lower(kv),
                    '^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid)(=|$)'))),
                  '&') AS cq
              FROM c
            )
            SELECT scheme || '://' || auth || p
                   || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END
                     AS canon_url,
                   MIN(url) AS url, COUNT(*) AS n_variants
            FROM c2 GROUP BY 1
            UNION ALL
            -- DUST rule mining mirror (r5-s8): token-boundary spans
            -- (envelope, middle) per url, envelope-bucket pairs,
            -- support/refutation on distinct envelopes, canonical
            -- direction = shorter middle. Empty list slices stringify
            -- to NULL in DuckDB — COALESCE keeps boundary spans alive.
            SELECT 'dust:' || dr.find AS canon_url,
                   dr.replace AS url, dr.support AS n_variants
            FROM (
              WITH dpages AS (
                SELECT 'https://dust.example.com/a/' || doc_id || '/' AS url,
                       md5(text || doc_id) AS digest
                FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT 'https://dust.example.com/a/' || doc_id
                       || '/index.html', md5(text || doc_id)
                FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT 'https://dust.example.com/p/' || doc_id
                       || '?page=1', md5(text || doc_id || 'p1')
                FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT 'https://dust.example.com/p/' || doc_id
                       || '?page=2', md5(text || doc_id || 'p2')
                FROM documents WHERE doc_id % 5 = 0
              ),
              dtoks AS (
                SELECT url, digest,
                       regexp_extract_all(url,
                         '[A-Za-z0-9]+|[^A-Za-z0-9]') AS ts,
                       len(regexp_extract_all(url,
                         '[A-Za-z0-9]+|[^A-Za-z0-9]')) AS n
                FROM dpages
              ),
              dspans AS (
                SELECT DISTINCT url, digest,
                       COALESCE(array_to_string(ts[1:i], ''), '')
                         || chr(1)
                         || COALESCE(array_to_string(ts[i+l+1:n], ''),
                                     '') AS env,
                       COALESCE(array_to_string(ts[i+1:i+l], ''), '')
                         AS mid
                FROM dtoks,
                     LATERAL (SELECT unnest(range(0, n + 1)) AS i) gi,
                     LATERAL (SELECT unnest(range(0, 5)) AS l) gl
                WHERE i + l <= n AND NOT (i = 0 AND l = n)
              ),
              dpairs AS (
                SELECT a.env, a.mid AS alpha, b.mid AS beta,
                       a.digest = b.digest AS same
                FROM dspans a
                JOIN dspans b ON a.env = b.env AND a.mid < b.mid
              ),
              dagg AS (
                SELECT alpha, beta,
                       COUNT(DISTINCT CASE WHEN same THEN env END)
                         AS support,
                       COUNT(DISTINCT CASE WHEN NOT same THEN env END)
                         AS refuted
                FROM dpairs GROUP BY 1, 2
              )
              SELECT CASE WHEN length(beta) < length(alpha)
                          THEN alpha ELSE beta END AS find,
                     CASE WHEN length(beta) < length(alpha)
                          THEN beta ELSE alpha END AS replace,
                     support
              FROM dagg WHERE support >= 2 AND refuted <= 0
            ) dr
        """,
        # sampling/splitting/mixing/packing: the 60-bit md5-prefix
        # uniform mirrors verbatim; the split cutoffs are embedded as
        # repr() of the EXACT doubles split_by_hash compares against
        # (sampling.split_thresholds) — a hand-written 0.9 literal
        # would differ from Python's 0.8+0.1 in the last bit.
        # curation: window/shingle/paragraph mirrors (md5 order strings
        # compare identically lexicographically in both engines; the
        # winner election and reassembly orderings are integer keys).
        "cap_per_domain": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cap-v1'),
                                doc_id) AS rk
              FROM documents
            ) WHERE rk <= 20
        """,
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS l
              FROM documents
            ),
            grams AS (
              SELECT doc_id, unnest(
                CASE WHEN length(l) >= 8
                     THEN list_distinct(list_transform(
                            generate_series(1, length(l) - 7),
                            i -> array_to_string(list_slice(l, i, i + 7),
                                                 ' ')))
                     ELSE [array_to_string(l, ' ')] END) AS gram
              FROM toks
            ),
            bench AS (
              SELECT DISTINCT gram FROM grams WHERE doc_id % 37 = 0
            ),
            hits AS (
              SELECT g.doc_id, COUNT(*) AS n_overlaps
              FROM grams g JOIN bench USING (gram) GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(h.n_overlaps, 0) > 0 AS contaminated,
                   COALESCE(h.n_overlaps, 0) AS n_overlaps
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        "dedup_paragraphs": """
            WITH d2 AS (
              SELECT doc_id,
                     substr(text, 1, 200)
                       || chr(10) || chr(10)
                       || 'subscribe to our newsletter today'
                       || chr(10) || chr(10)
                       || 'copyright footer all rights reserved' AS t
              FROM documents
            ),
            lists AS (
              SELECT doc_id, string_split(t, chr(10) || chr(10)) AS l
              FROM d2
            ),
            paras AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(l))) - 1 AS pos,
                     unnest(l) AS para
              FROM lists
            ),
            ranked AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY para
                                        ORDER BY doc_id, pos) AS rn
              FROM paras
            ),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(para, chr(10) || chr(10) ORDER BY pos)
                       AS text,
                     COUNT(*) AS n_paragraphs
              FROM ranked WHERE rn = 1 GROUP BY doc_id
            ),
            dropped AS (
              SELECT doc_id, COUNT(*) AS n_dropped
              FROM ranked WHERE rn > 1 GROUP BY doc_id
            )
            SELECT r.doc_id, r.text, r.n_paragraphs,
                   COALESCE(dr.n_dropped, 0) AS n_dropped
            FROM rebuilt r LEFT JOIN dropped dr USING (doc_id)
        """,
        # DSIR importance weights: identical md5 bucket hashing,
        # Laplace smoothing and ln arithmetic; the per-doc sum is
        # rounded (6 dp) to absorb float-summation order.
        "dsir_weights": """
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(text),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS l
              FROM documents
            ),
            grams AS (
              SELECT doc_id, lang, unnest(
                CASE WHEN len(l) >= 2
                     THEN list_transform(
                            generate_series(1, len(l) - 1),
                            i -> array_to_string(list_slice(l, i, i + 1),
                                                 ' '))
                     ELSE [array_to_string(l, ' ')] END) AS g
              FROM toks
            ),
            bk AS (
              SELECT doc_id, lang,
                     ('0x' || substr(md5(g), 1, 15))::BIGINT % 512 AS b
              FROM grams
            ),
            raw AS (SELECT b, COUNT(*) AS rc FROM bk GROUP BY b),
            tgt AS (SELECT b, COUNT(*) AS tc FROM bk
                    WHERE lang = 'en' GROUP BY b),
            rt AS (SELECT CAST(SUM(rc) AS DOUBLE) AS rtot FROM raw),
            tt AS (SELECT CAST(COALESCE(SUM(tc), 0) AS DOUBLE) AS ttot
                   FROM tgt),
            ratio AS (
              SELECT raw.b,
                     ln((COALESCE(tc, 0) + 1.0) / (ttot + 512.0))
                       - ln((rc + 1.0) / (rtot + 512.0)) AS lr
              FROM raw LEFT JOIN tgt USING (b), rt, tt
            ),
            per AS (
              SELECT doc_id, b, COUNT(*) AS c FROM bk GROUP BY doc_id, b
            ),
            sc AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                     round(SUM(c * lr), 6) AS log_weight
              FROM per JOIN ratio USING (b) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(s.n_grams, 0) AS n_grams,
                   COALESCE(s.log_weight, 0.0) AS log_weight
            FROM documents d LEFT JOIN sc s USING (doc_id)
        """,
        # True suffix array (r5-s10): the mirror sorts suffix STRINGS
        # (UTF-8 byte order == code-point order) with doc_id DESC as
        # tie-break — exactly the engine's per-doc sentinel semantics
        # (sentinel rank -(doc_id)-1: unique, below every char, so a
        # shorter prefix-equal suffix sorts first and equal strings
        # order by doc_id DESC). Real ranks start at n_docs (the
        # sentinel block ranks below all real suffixes). LCP joins a
        # static 1..64 series on prefix equality and takes max k
        # (prefix equality is monotone in k, so max k IS the LCP; no
        # lateral table functions — this DuckDB build rejects
        # column-dependent generate_series parameters).
        "suffix_arrays": """
            WITH slice AS (
              SELECT doc_id, COALESCE(text, '') AS text
              FROM documents WHERE doc_id % 50 = 0
            ),
            maxlen AS (
              SELECT COALESCE(max(length(text)), 0) AS m FROM slice
            ),
            offs AS (
              SELECT unnest(range(0, (SELECT m FROM maxlen))) AS off
            ),
            suf AS (
              SELECT sl.doc_id, o.off, substr(sl.text, o.off + 1) AS s
              FROM slice sl JOIN offs o ON o.off < length(sl.text)
            ),
            ord AS (
              SELECT doc_id, off, s,
                     row_number() OVER (ORDER BY s, doc_id DESC) - 1 AS rn
              FROM suf
            ),
            nd AS (SELECT count(*) AS n_docs FROM slice),
            ks AS (SELECT unnest(range(1, 65)) AS k),
            adj AS (
              SELECT a.doc_id, a.off, a.s AS sa, b.s AS sb,
                     b.doc_id AS b_doc, b.off AS b_off
              FROM ord a JOIN ord b ON b.rn = a.rn + 1
            ),
            lcp AS (
              SELECT adj.doc_id, adj.off, adj.b_doc, adj.b_off,
                     adj.sa, adj.sb, COALESCE(max(ks.k), 0) AS val
              FROM adj LEFT JOIN ks
                ON ks.k <= least(length(adj.sa), length(adj.sb), 64)
               AND substr(adj.sa, 1, ks.k) = substr(adj.sb, 1, ks.k)
              GROUP BY adj.doc_id, adj.off, adj.b_doc, adj.b_off,
                       adj.sa, adj.sb
            ),
            -- ExactSubstr mirror: pairs at the 64 cap get an uncapped
            -- probe; extents mark the b side only (SA-interval
            -- election), merge per doc, rebuild from the gaps
            ksu AS (
              SELECT unnest(range(1, (SELECT m FROM maxlen) + 1)) AS k
            ),
            deep AS (
              SELECT c.b_doc AS d, c.b_off AS s,
                     c.b_off + max(ksu.k) AS e
              FROM lcp c JOIN ksu
                ON c.val >= 64
               AND ksu.k <= least(length(c.sa), length(c.sb))
               AND substr(c.sa, 1, ksu.k) = substr(c.sb, 1, ksu.k)
              GROUP BY c.b_doc, c.b_off
            ),
            mk AS (
              SELECT b_doc AS d, b_off AS s, b_off + val AS e
              FROM lcp WHERE val >= 20 AND val < 64
              UNION ALL
              SELECT d, s, e FROM deep
            ),
            isl AS (
              SELECT d, s, e,
                     CASE WHEN s > COALESCE(max(e) OVER (
                            PARTITION BY d ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                          THEN 1 ELSE 0 END AS new
              FROM mk
            ),
            grp AS (
              SELECT d, s, e, sum(new) OVER (
                       PARTITION BY d ORDER BY s
                       ROWS UNBOUNDED PRECEDING) AS g
              FROM isl
            ),
            mrg AS (
              SELECT d, g, min(s) AS s, max(e) AS e
              FROM grp GROUP BY d, g
            ),
            gaps AS (
              SELECT d,
                     COALESCE(lag(e) OVER (PARTITION BY d ORDER BY s),
                              0) AS gs,
                     s AS ge
              FROM mrg
              UNION ALL
              SELECT d, max(e) AS gs, NULL AS ge FROM mrg GROUP BY d
            ),
            rebuilt AS (
              SELECT g.d,
                     string_agg(substr(sl2.text, g.gs + 1,
                                       COALESCE(g.ge, length(sl2.text))
                                       - g.gs), '' ORDER BY g.gs) AS txt
              FROM gaps g JOIN slice sl2 ON sl2.doc_id = g.d
              GROUP BY g.d
            ),
            cutstats AS (
              SELECT d, count(*) AS n_spans, sum(e - s) AS n_chars
              FROM mrg GROUP BY d
            )
            SELECT 'sa' AS method, doc_id, off,
                   rn + (SELECT n_docs FROM nd) AS val, '' AS stext
            FROM ord
            UNION ALL
            SELECT 'lcp' AS method, doc_id, off, val, '' AS stext
            FROM lcp
            UNION ALL
            SELECT 'cut' AS method, sl.doc_id,
                   COALESCE(cs.n_spans, 0) AS off,
                   COALESCE(cs.n_chars, 0) AS val,
                   COALESCE(rb.txt, sl.text) AS stext
            FROM slice sl
            LEFT JOIN cutstats cs ON cs.d = sl.doc_id
            LEFT JOIN rebuilt rb ON rb.d = sl.doc_id
        """,
        # Suffix-array-style span dedup: identical md5 gram digests,
        # row_number winner election, gaps-and-islands interval merge
        # and token-level reassembly — value-exact in both engines.
        "dedup_spans": """
            WITH d2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN substr(text, 1, 300)
                               || ' subscribe to our newsletter today'
                               || ' for exclusive offers and updates'
                               || ' delivered weekly'
                          ELSE substr(text, 1, 300) END AS text
              FROM documents
            ),
            toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS l
              FROM d2
            ),
            occ AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(l) - 7)) - 1 AS pos,
                     unnest(list_transform(
                       generate_series(1, len(l) - 7),
                       i -> md5(array_to_string(list_slice(l, i, i + 7),
                                                ' ')))) AS h
              FROM toks WHERE len(l) >= 8
            ),
            dups AS (
              SELECT doc_id, pos AS s, pos + 7 AS e
              FROM (SELECT doc_id, pos,
                           row_number() OVER (PARTITION BY h
                                              ORDER BY doc_id, pos) AS rn
                    FROM occ)
              WHERE rn > 1
            ),
            isl AS (
              SELECT doc_id, s, e,
                     CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                          OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                          THEN 1 ELSE 0 END AS new
              FROM dups
            ),
            spans AS (
              SELECT doc_id, g, min(s) AS s, max(e) AS e
              FROM (SELECT doc_id, s, e,
                           sum(new) OVER (PARTITION BY doc_id
                                          ORDER BY s) AS g
                    FROM isl)
              GROUP BY doc_id, g
            ),
            per_doc AS (
              SELECT doc_id, COUNT(*) AS n_spans_removed
              FROM spans GROUP BY doc_id
            ),
            tokpos AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(l))) - 1 AS pos,
                     unnest(l) AS tok
              FROM toks
            ),
            kept AS (
              SELECT t.doc_id, t.pos, t.tok
              FROM tokpos t LEFT JOIN spans sp
                ON t.doc_id = sp.doc_id AND t.pos BETWEEN sp.s AND sp.e
              WHERE sp.doc_id IS NULL
            ),
            agg AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id
            ),
            tot AS (SELECT doc_id, len(l) AS n_tokens FROM toks)
            SELECT t.doc_id, COALESCE(a.text, '') AS text, t.n_tokens,
                   t.n_tokens - COALESCE(a.n_kept, 0) AS n_tokens_removed,
                   COALESCE(p.n_spans_removed, 0) AS n_spans_removed
            FROM tot t
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN per_doc p USING (doc_id)
        """,
        # CCNet-style perplexity: identical normalization, trigram
        # inventory, Laplace smoothing and ln/avg arithmetic; avg/exp
        # rounded (6/4 dp) to absorb float-summation order.
        "lm_perplexity": r"""
            WITH norm AS (
              SELECT doc_id, lang,
                     regexp_replace(lower(substr(text, 1, 1000)),
                                    '\s+', ' ', 'g') AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, lang, unnest(
                CASE WHEN length(t) >= 3
                     THEN list_transform(generate_series(1, length(t) - 2),
                                         i -> substr(t, i, 3))
                     ELSE [t] END) AS gram
              FROM norm
            ),
            lm AS (
              SELECT gram, COUNT(*) AS cnt FROM grams
              WHERE lang = 'en' GROUP BY gram
            ),
            stats AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
                     CAST(COUNT(*) AS DOUBLE) AS vocab
              FROM lm
            ),
            scored AS (
              SELECT g.doc_id,
                     ln((COALESCE(lm.cnt, 0) + 1.0)
                        / (stats.total + 1.0 * stats.vocab)) AS logp
              FROM grams g LEFT JOIN lm USING (gram) CROSS JOIN stats
            ),
            agg AS (
              SELECT doc_id, COUNT(*) AS n_grams, AVG(logp) AS al
              FROM scored GROUP BY doc_id
            ),
            ppl AS (
              SELECT doc_id, n_grams, al, exp(-al) AS p FROM agg
            ),
            cuts AS (
              SELECT round(quantile_cont(p, 0.3333333333333333), 6) AS c0,
                     round(quantile_cont(p, 0.6666666666666666), 6) AS c1
              FROM ppl
            ),
            -- per-language CCNet (r5): one LM per language, per-lang
            -- Laplace denominators, per-lang percentile cutoffs
            lml AS (
              SELECT lang, gram, COUNT(*) AS cnt FROM grams
              GROUP BY lang, gram
            ),
            statsl AS (
              SELECT lang,
                     CAST(SUM(cnt) AS DOUBLE)
                       + 1.0 * CAST(COUNT(*) AS DOUBLE) AS denom
              FROM lml GROUP BY lang
            ),
            scoredl AS (
              SELECT g.doc_id, g.lang,
                     ln((COALESCE(l.cnt, 0) + 1.0) / s.denom) AS logp
              FROM grams g
              LEFT JOIN lml l ON g.lang = l.lang AND g.gram = l.gram
              JOIN statsl s ON g.lang = s.lang
            ),
            aggl AS (
              SELECT doc_id, lang, COUNT(*) AS n_grams, AVG(logp) AS al
              FROM scoredl GROUP BY doc_id, lang
            ),
            ppll AS (
              SELECT doc_id, lang, n_grams, al, exp(-al) AS p FROM aggl
            ),
            cutsl AS (
              SELECT lang,
                     round(quantile_cont(p, 0.3333333333333333), 6) AS c0,
                     round(quantile_cont(p, 0.6666666666666666), 6) AS c1
              FROM ppll GROUP BY lang
            ),
            -- language detection (r5-s4, CCNet step 1): score every
            -- doc under EVERY language's LM; with alpha=1 the
            -- unmatched-gram term (n-m)*ln(alpha) vanishes, so only
            -- matched grams aggregate
            ngd AS (
              SELECT doc_id, COUNT(*) AS n_grams FROM grams
              GROUP BY doc_id
            ),
            matchedd AS (
              SELECT g.doc_id, l.lang, SUM(ln(l.cnt + 1.0)) AS sm
              FROM grams g JOIN lml l ON g.gram = l.gram
              WHERE l.lang IS NOT NULL
              GROUP BY g.doc_id, l.lang
            ),
            crossedd AS (
              SELECT n.doc_id, s.lang, n.n_grams,
                     (COALESCE(m.sm, 0.0) - n.n_grams * ln(s.denom))
                       / n.n_grams AS al
              FROM ngd n
              CROSS JOIN (SELECT * FROM statsl
                          WHERE lang IS NOT NULL) s
              LEFT JOIN matchedd m
                ON m.doc_id = n.doc_id AND m.lang = s.lang
            ),
            bestd AS (
              SELECT doc_id, lang, n_grams, al,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY round(al, 6) DESC, lang) AS rn
              FROM crossedd
            )
            SELECT 'mono' AS tag, doc_id, '' AS lang,
                   n_grams,
                   ROUND(al, 6) AS avg_logp,
                   ROUND(p, 4) AS perplexity,
                   CASE WHEN round(p, 6) <= c0 THEN 'head'
                        WHEN round(p, 6) <= c1 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM ppl CROSS JOIN cuts
            UNION ALL
            SELECT 'by_lang' AS tag, p.doc_id, p.lang, p.n_grams,
                   ROUND(p.al, 6) AS avg_logp,
                   ROUND(p.p, 4) AS perplexity,
                   CASE WHEN round(p.p, 6) <= c.c0 THEN 'head'
                        WHEN round(p.p, 6) <= c.c1 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM ppll p JOIN cutsl c USING (lang)
            UNION ALL
            SELECT 'detect' AS tag, doc_id, lang, n_grams,
                   ROUND(al, 6) AS avg_logp,
                   ROUND(exp(-al), 4) AS perplexity,
                   '' AS bucket
            FROM bestd WHERE rn = 1
        """,
        "split_by_hash": _split_oracle_sql(),
        "stratified_sample": """
            SELECT doc_id, lang
            FROM (
              SELECT doc_id, lang,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || 'sample-v1'), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
              FROM documents
            )
            WHERE u < CASE lang WHEN 'en' THEN 0.5
                                WHEN 'de' THEN 1.0
                                ELSE 0.0 END
        """,
        "mixture_report": """
            WITH agg AS (
              SELECT lang AS stratum, COUNT(*) AS n_docs,
                     CAST(SUM(length(text)) AS BIGINT) AS total_weight
              FROM documents GROUP BY lang
            ),
            sh AS (
              SELECT stratum, n_docs, total_weight,
                     CAST(total_weight AS DOUBLE)
                       / CAST(SUM(total_weight) OVER () AS DOUBLE) AS share,
                     -- CAST: a bare 0.125 is DECIMAL in DuckDB, and a
                     -- Decimal cell str()-normalizes as '0.125', not
                     -- the float form '0.125000' — hash mismatch with
                     -- identical values
                     CAST(CASE stratum WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.125
                                  WHEN 'fr' THEN 0.125 WHEN 'es' THEN 0.125
                                  WHEN 'zh' THEN 0.125 ELSE 0.0 END
                          AS DOUBLE) AS target_share
              FROM agg
            )
            SELECT stratum, n_docs, total_weight,
                   ROUND(share, 6) AS share,
                   ROUND(target_share, 6) AS target_share,
                   ROUND(CASE WHEN share > 0 THEN target_share / share
                              END, 6) AS multiplier
            FROM sh
        """,
        # mixture execution: same multiplier CTE as mixture_report,
        # then copies = floor(m) + (u60 < frac) unrolled via range()
        "apply_mixture": """
            WITH agg AS (
              SELECT lang AS stratum, COUNT(*) AS n_docs,
                     CAST(SUM(length(text)) AS BIGINT) AS total_weight
              FROM documents GROUP BY lang
            ),
            sh AS (
              SELECT stratum,
                     CAST(total_weight AS DOUBLE)
                       / CAST(SUM(total_weight) OVER () AS DOUBLE) AS share,
                     CAST(CASE stratum WHEN 'en' THEN 0.5
                                       WHEN 'de' THEN 0.125
                                       WHEN 'fr' THEN 0.125
                                       WHEN 'es' THEN 0.125
                                       WHEN 'zh' THEN 0.125
                                       ELSE 0.0 END AS DOUBLE)
                       AS target_share
              FROM agg
            ),
            mult AS (
              SELECT stratum,
                     CASE WHEN share > 0 THEN target_share / share
                          ELSE CAST(0.0 AS DOUBLE) END AS m
              FROM sh
            ),
            rows_n AS (
              SELECT d.doc_id, d.lang,
                     CAST(FLOOR(mult.m) AS BIGINT)
                     + CASE WHEN ('0x' || substr(md5(
                               CAST(d.doc_id AS VARCHAR) || 'mix-v1'),
                               1, 15))::BIGINT / 1152921504606846976.0
                              < mult.m - FLOOR(mult.m)
                            THEN 1 ELSE 0 END AS copies
              FROM documents d JOIN mult ON mult.stratum = d.lang
            )
            SELECT doc_id, lang, unnest(range(copies)) AS copy_idx
            FROM rows_n WHERE copies > 0
        """,
        "pack_sequences": """
            WITH tok AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(0, CAST(doc_id % 9 AS INT)),
                       i -> CAST((doc_id + i) % 97 AS INT))
                     || [CAST(999 AS INT)] AS ids,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || 'pack-v1'), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
              FROM documents
            ),
            pos AS (
              SELECT doc_id, ids, u,
                     CAST(floor(u * 4) AS BIGINT) AS shard,
                     CAST(len(ids) AS BIGINT) AS n,
                     COALESCE(SUM(CAST(len(ids) AS BIGINT)) OVER (
                       PARTITION BY CAST(floor(u * 4) AS BIGINT)
                       ORDER BY u, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS start
              FROM tok
            ),
            pieces AS (
              SELECT shard,
                     unnest(generate_series(
                       CAST(floor(start / 32.0) AS BIGINT),
                       CAST(floor((start + n - 1) / 32.0) AS BIGINT)))
                       AS window_id,
                     start, n, ids
              FROM pos
            ),
            sliced AS (
              SELECT shard, window_id,
                     greatest(window_id * 32, start) AS pos,
                     list_slice(
                       ids,
                       CAST(greatest(window_id * 32, start)
                            - start + 1 AS BIGINT),
                       CAST(least((window_id + 1) * 32, start + n)
                            - start AS BIGINT)) AS piece
              FROM pieces
            ),
            windows AS (
              SELECT shard, window_id,
                     flatten(list(piece ORDER BY pos)) AS input_ids,
                     COUNT(*) AS n_docs
              FROM sliced GROUP BY shard, window_id
            )
            SELECT 'bins' AS tag, doc_id,
                   doc_id % 8 AS k,
                   CAST(length(text) AS BIGINT) AS n_a,
                   CAST(floor(
                     COALESCE(CAST(SUM(length(text)) OVER (
                         PARTITION BY doc_id % 8 ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS DOUBLE), 0.0)
                     / 5000) AS BIGINT) AS n_b,
                   length(text) > 5000 AS flag,
                   '' AS ids_csv
            FROM documents
            UNION ALL
            SELECT 'windows', shard, window_id,
                   CAST(len(input_ids) AS BIGINT),
                   n_docs,
                   len(input_ids) = 32,
                   array_to_string(input_ids, ',')
            FROM windows
        """,
        "llm_retry_summaries": _llm_retry_oracle_sql(max_chars=300),
        "ann_lsh_topk": _lsh_oracle_sql(n_bits=8, k=5, seed=42),
        "ann_ivf_topk": _ivf_oracle_sql(n_centroids=8, n_probe=3, k=5),
        # The CLIENT crawl loop (Crawl4AIClient.extract_website_content,
        # crawl4ai_client.py:219-309) as a DuckDB recursive CTE: one row
        # per URL pop, state = (frontier list, enqueued-seen list,
        # fetched list, success count) folded exactly like the
        # reference's sequential loop — FIFO pop, fetch = page exists in
        # the synthetic store, links discovered only while budget
        # remains AFTER counting the current success, enqueue-dedup
        # against everything ever enqueued (≡ first-enqueue-wins).
        # text_chars is value-exact because pages_from_documents
        # templates the HTML, so the extracted text is exactly
        # 'Doc {d}\n{text}\nn1\nn2\nn3\npdf\ndead' (the space-collapse +
        # trim mirrors extraction.normalize_text; the corpus is verified
        # newline/entity-free so no further normalization applies).
        # priority-queue drain mirror: argmax pop by (score desc,
        # enqueue ord) — frontier carries (url, ord) structs so the
        # final fetch_ord re-ranks by ord exactly like the engine
        "crawl_priority_drain": r"""
            WITH RECURSIVE st AS (
              SELECT 0 AS step,
                     [{'url': 'https://docs.example.com/d/0.html',
                       'ord': 0::BIGINT}] AS frontier,
                     ['https://docs.example.com/d/0.html'] AS seen,
                     []::STRUCT(url VARCHAR, ord BIGINT,
                                success BOOLEAN)[] AS fetched,
                     0::BIGINT AS succ,
                     1::BIGINT AS next_ord
              UNION ALL
              SELECT step + 1,
                     rest || fresh,
                     seen || list_transform(fresh, f -> f.url),
                     fetched || [{'url': cur.url, 'ord': cur.ord,
                                  'success': ok}],
                     succ + CASE WHEN ok THEN 1 ELSE 0 END,
                     next_ord + len(fresh)
              FROM (
                SELECT step, rest, seen, fetched, succ, next_ord, cur, ok,
                       CASE WHEN ok AND succ + 1 < 6
                            THEN list_transform(
                                   list_filter(
                                     ['https://docs.example.com/d/' ||
                                        ((3 * d + 1) % n) || '.html',
                                      'https://docs.example.com/d/' ||
                                        ((3 * d + 2) % n) || '.html',
                                      'https://docs.example.com/d/' ||
                                        ((3 * d + 3) % n) || '.html',
                                      'https://docs.example.com/missing/'
                                        || d || '.html'],
                                     u -> NOT list_contains(seen, u)),
                                   (u, i) -> {'url': u,
                                              'ord': next_ord + i - 1})
                            ELSE []::STRUCT(url VARCHAR, ord BIGINT)[]
                       END AS fresh
                FROM (
                  SELECT step, seen, fetched, succ, next_ord,
                         frontier[idx] AS cur,
                         list_filter(frontier, (f, i) -> i != idx) AS rest,
                         regexp_matches(frontier[idx].url,
                           '^https://docs\.example\.com/d/\d+\.html$') AS ok,
                         COALESCE(TRY_CAST(regexp_extract(frontier[idx].url,
                           'd/(\d+)\.html$', 1) AS BIGINT), 0) AS d,
                         params.n AS n
                  FROM (
                    SELECT *,
                           list_position(
                             scores, list_max(scores)) AS idx
                    FROM (
                      SELECT *,
                             list_transform(frontier, f ->
                               COALESCE(TRY_CAST((TRY_CAST(
                                 regexp_extract(f.url, 'd/(\d+)\.html$', 1)
                                 AS BIGINT) * 17) % 29 AS DOUBLE),
                                 -1.0)) AS scores
                      FROM st
                      WHERE succ < 6 AND len(frontier) > 0
                    )
                  ) CROSS JOIN
                    (SELECT COUNT(*)::BIGINT AS n FROM documents
                     WHERE doc_id < 40) params
                )
              )
            )
            -- OPIC adaptive drain on the same store (r5-s5): greedy
            -- argmax-cash pops + the full cash algebra — popped cash
            -- moves to history and splits equally over the 4 hygiene-
            -- passed candidates (pre-seen-dedup, so seen urls keep
            -- accumulating); a failed or budget-exhausting pop sinks
            -- its cash to the '' row; every fold rounds to 12 dp —
            -- exactly CrawlEngine(opic=True)'s superstep fold
            , ost AS (
              SELECT 0 AS step,
                     [{'url': 'https://docs.example.com/d/0.html',
                       'ord': 0::BIGINT}] AS frontier,
                     ['https://docs.example.com/d/0.html'] AS seen,
                     [{'url': 'https://docs.example.com/d/0.html',
                       'cash': 1.0::DOUBLE, 'hist': 0.0::DOUBLE}] AS cashes,
                     []::STRUCT(url VARCHAR, step INTEGER,
                                success BOOLEAN)[] AS pops,
                     0::BIGINT AS succ,
                     1::BIGINT AS next_ord
              UNION ALL
              SELECT step + 1,
                     rest || fresh,
                     seen || list_transform(fresh, f -> f.url),
                     list_transform(cashes, s -> {
                       'url': s.url,
                       'cash': round(
                         (CASE WHEN s.url = cur.url THEN 0.0::DOUBLE
                               ELSE s.cash END)
                         + len(list_filter(recv, c -> c = s.url))
                           * share, 12),
                       'hist': CASE WHEN s.url = cur.url
                                    THEN round(s.hist + c_pop, 12)
                                    ELSE s.hist END
                     }) || list_transform(
                       list_filter(
                         list_distinct(recv),
                         u -> NOT list_contains(
                                list_transform(cashes, s -> s.url), u)),
                       u -> {
                         'url': u,
                         'cash': round(
                           len(list_filter(recv, c -> c = u)) * share,
                           12),
                         'hist': 0.0::DOUBLE
                       }),
                     pops || [{'url': cur.url, 'step': step::INTEGER,
                               'success': ok}],
                     succ + CASE WHEN ok THEN 1 ELSE 0 END,
                     next_ord + len(fresh)
              FROM (
                SELECT *,
                       CASE WHEN len(recv) > 0
                            THEN c_pop / len(recv) ELSE 0.0::DOUBLE
                       END AS share,
                       list_transform(
                         list_filter(cands,
                                     u -> NOT list_contains(seen, u)),
                         (u, i) -> {'url': u, 'ord': next_ord + i - 1}
                       ) AS fresh
                FROM (
                  SELECT *,
                         CASE WHEN len(cands) > 0 THEN cands
                              WHEN c_pop != 0.0 THEN ['']
                              ELSE []::VARCHAR[]
                         END AS recv
                  FROM (
                    SELECT step, seen, cashes, pops, succ, next_ord,
                           cur, rest, ok,
                           COALESCE(
                             list_filter(cashes,
                                         s -> s.url = cur.url)[1].cash,
                             0.0::DOUBLE) AS c_pop,
                           CASE WHEN ok AND succ + 1 < 6
                                THEN ['https://docs.example.com/d/' ||
                                        ((3 * d + 1) % n) || '.html',
                                      'https://docs.example.com/d/' ||
                                        ((3 * d + 2) % n) || '.html',
                                      'https://docs.example.com/d/' ||
                                        ((3 * d + 3) % n) || '.html',
                                      'https://docs.example.com/missing/'
                                        || d || '.html']
                                ELSE []::VARCHAR[]
                           END AS cands
                    FROM (
                      SELECT step, seen, cashes, pops, succ, next_ord,
                             frontier[idx] AS cur,
                             list_filter(frontier,
                                         (f, i) -> i != idx) AS rest,
                             regexp_matches(frontier[idx].url,
                               '^https://docs\.example\.com/d/\d+\.html$')
                               AS ok,
                             COALESCE(TRY_CAST(regexp_extract(
                               frontier[idx].url, 'd/(\d+)\.html$', 1)
                               AS BIGINT), 0) AS d,
                             params.n AS n
                      FROM (
                        SELECT *,
                               list_position(
                                 cscores, list_max(cscores)) AS idx
                        FROM (
                          SELECT *,
                                 list_transform(frontier, f ->
                                   COALESCE(
                                     list_filter(cashes,
                                       s -> s.url = f.url)[1].cash,
                                     -1.0::DOUBLE)) AS cscores
                          FROM ost
                          WHERE succ < 6 AND len(frontier) > 0
                        )
                      ) CROSS JOIN
                        (SELECT COUNT(*)::BIGINT AS n FROM documents
                         WHERE doc_id < 40) params
                    )
                  )
                )
              )
            )
            SELECT 'prio' AS kind, f.url AS url,
                   CAST(ROW_NUMBER() OVER (ORDER BY f.ord) - 1
                        AS INTEGER) AS ord,
                   f.success AS success,
                   CASE WHEN f.success
                        THEN CAST(length(trim(regexp_replace(
                                    doc.text, ' +', ' ', 'g')))
                                  + length(CAST(doc.doc_id AS VARCHAR))
                                  + 23 AS INTEGER)
                        ELSE 0 END AS text_chars,
                   -1.0 AS cash, -1.0 AS hist
            FROM (SELECT fetched FROM st ORDER BY step DESC LIMIT 1) last,
                 unnest(last.fetched) AS t(f)
            LEFT JOIN documents doc
              ON f.success
             AND doc.doc_id = TRY_CAST(regexp_extract(f.url,
                   'd/(\d+)\.html$', 1) AS BIGINT)
            UNION ALL
            SELECT 'opic_pop', p.url, p.step, p.success, -1,
                   -1.0, -1.0
            FROM (SELECT pops FROM ost ORDER BY step DESC LIMIT 1) lastp,
                 unnest(lastp.pops) AS tp(p)
            UNION ALL
            SELECT 'opic_state', s.url, -1, FALSE, -1,
                   s.cash, s.hist
            FROM (SELECT cashes FROM ost ORDER BY step DESC LIMIT 1) lasts,
                 unnest(lasts.cashes) AS ts(s)
        """,
        "crawl_client_fifo": r"""
            WITH RECURSIVE st AS (
              SELECT 0 AS step,
                     ['https://docs.example.com/d/0.html'] AS frontier,
                     ['https://docs.example.com/d/0.html'] AS seen,
                     []::STRUCT(url VARCHAR, fetch_ord INTEGER,
                                success BOOLEAN)[] AS fetched,
                     0::BIGINT AS succ
              UNION ALL
              SELECT step + 1,
                     list_slice(frontier, 2, len(frontier)) || fresh,
                     seen || fresh,
                     fetched || [{'url': cur,
                                  'fetch_ord': CAST(len(fetched) AS INTEGER),
                                  'success': ok}],
                     succ + CASE WHEN ok THEN 1 ELSE 0 END
              FROM (
                SELECT step, frontier, seen, fetched, succ, cur, ok,
                       CASE WHEN ok AND succ + 1 < 6
                            THEN list_filter(
                                   ['https://docs.example.com/d/' ||
                                      ((3 * d + 1) % n) || '.html',
                                    'https://docs.example.com/d/' ||
                                      ((3 * d + 2) % n) || '.html',
                                    'https://docs.example.com/d/' ||
                                      ((3 * d + 3) % n) || '.html',
                                    'https://docs.example.com/missing/'
                                      || d || '.html'],
                                   u -> NOT list_contains(seen, u))
                            ELSE [] END AS fresh
                FROM (
                  SELECT step, frontier, seen, fetched, succ,
                         frontier[1] AS cur,
                         regexp_matches(frontier[1],
                           '^https://docs\.example\.com/d/\d+\.html$') AS ok,
                         COALESCE(TRY_CAST(regexp_extract(frontier[1],
                           'd/(\d+)\.html$', 1) AS BIGINT), 0) AS d,
                         params.n AS n
                  FROM st CROSS JOIN
                       (SELECT COUNT(*)::BIGINT AS n FROM documents
                        WHERE doc_id < 40) params
                  WHERE succ < 6 AND len(frontier) > 0
                )
              )
            )
            SELECT f.url AS url, f.fetch_ord AS fetch_ord,
                   f.success AS success,
                   CASE WHEN f.success
                        THEN CAST(length(trim(regexp_replace(
                                    doc.text, ' +', ' ', 'g')))
                                  + length(CAST(doc.doc_id AS VARCHAR))
                                  + 23 AS INTEGER)
                        ELSE 0 END AS text_chars
            FROM (SELECT fetched FROM st ORDER BY step DESC LIMIT 1) last,
                 unnest(last.fetched) AS t(f)
            LEFT JOIN documents doc
              ON f.success
             AND doc.doc_id = TRY_CAST(regexp_extract(f.url,
                   'd/(\d+)\.html$', 1) AS BIGINT)
            ORDER BY fetch_ord
        """,
        # The seeder crawl loop as a DuckDB recursive CTE: one row per
        # superstep, the whole engine state (seen set, frontier, budget,
        # next_ord) carried as list/scalar columns, folded exactly like
        # CrawlEngine's driver loop — drain first 5 by ord, drop
        # depth-capped rows AFTER slicing, expand the synthetic page
        # graph (pages_from_documents: 3 mod-n links + a dead /missing
        # link per page; the pdf link is filtered by F4/F5), anti-join
        # the seen set, first-enqueue-wins by (parent_ord, pos), cap at
        # the discovered budget, assign dense ords.
        "crawl_seeder_discovery": r"""
            WITH RECURSIVE st AS (
              SELECT 0 AS step,
                     [{'ord': 0::BIGINT,
                       'url': 'https://docs.example.com/d/1.html',
                       'depth': 0}] AS seen,
                     [{'ord': 0::BIGINT,
                       'url': 'https://docs.example.com/d/1.html',
                       'depth': 0}] AS frontier,
                     1::BIGINT AS budget, 1::BIGINT AS next_ord
              UNION ALL
              SELECT step + 1,
                     seen || new_rows,
                     list_slice(sorted_frontier, 6, len(sorted_frontier))
                       || new_rows,
                     budget + len(new_rows),
                     next_ord + len(new_rows)
              FROM (
                SELECT step, seen, budget, next_ord, sorted_frontier,
                       list_transform(
                         list_slice(deduped, 1, CAST(15 - budget AS INT)),
                         (c, i) -> {'ord': next_ord + i - 1,
                                    'url': c.url, 'depth': c.depth}
                       ) AS new_rows
                FROM (
                  SELECT *,
                         list_filter(
                           fresh,
                           (c, i) -> list_position(
                             list_transform(fresh, x -> x.url), c.url) = i
                         ) AS deduped
                  FROM (
                    SELECT *,
                           list_filter(
                             cands,
                             c -> NOT list_contains(
                               list_transform(seen, s -> s.url), c.url)
                           ) AS fresh
                    FROM (
                      SELECT *,
                             list_sort(flatten(list_transform(
                               list_filter(list_slice(sorted_frontier, 1, 5),
                                           x -> x.depth <= 2),
                               p -> CASE WHEN regexp_matches(p.url,
                                      '^https://docs\.example\.com/d/\d+\.html$')
                                    THEN [
                                      {'parent_ord': p.ord, 'pos': 0,
                                       'url': 'https://docs.example.com/d/' ||
                                         ((3 * regexp_extract(p.url,
                                            'd/(\d+)\.html', 1)::BIGINT + 1)
                                          % n) || '.html',
                                       'depth': p.depth + 1},
                                      {'parent_ord': p.ord, 'pos': 1,
                                       'url': 'https://docs.example.com/d/' ||
                                         ((3 * regexp_extract(p.url,
                                            'd/(\d+)\.html', 1)::BIGINT + 2)
                                          % n) || '.html',
                                       'depth': p.depth + 1},
                                      {'parent_ord': p.ord, 'pos': 2,
                                       'url': 'https://docs.example.com/d/' ||
                                         ((3 * regexp_extract(p.url,
                                            'd/(\d+)\.html', 1)::BIGINT + 3)
                                          % n) || '.html',
                                       'depth': p.depth + 1},
                                      {'parent_ord': p.ord, 'pos': 3,
                                       'url': 'https://docs.example.com/missing/'
                                         || regexp_extract(p.url,
                                              'd/(\d+)\.html', 1) || '.html',
                                       'depth': p.depth + 1}
                                    ]
                                    ELSE [] END))) AS cands
                      FROM (
                        SELECT step, seen, budget, next_ord,
                               list_sort(frontier) AS sorted_frontier,
                               params.n AS n
                        FROM st CROSS JOIN
                             (SELECT COUNT(*)::BIGINT AS n FROM documents
                              WHERE doc_id < 40) params
                        WHERE budget < 15 AND len(frontier) > 0
                      )
                    )
                  )
                )
              )
            )
            SELECT u.url AS url, u.ord AS ord, u.depth AS depth
            FROM (SELECT seen FROM st ORDER BY step DESC LIMIT 1) f,
                 unnest(f.seen) AS t(u)
            ORDER BY ord
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))
                         * (CAST(1 AS DECIMAL(28,8)) - CAST(l_discount AS DECIMAL(28,8)))), 3) AS DOUBLE)
                     AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
    }

    # ---- contract-grid consolidation (r3 verdict ask #2) ----------
    # The round driver verifies at most 50 contract rows; r3's 56-row
    # grid left its 6 newest entries unchecked. Near-duplicate rows
    # sharing a fixture are merged below (UNION ALL with a `method`
    # discriminator, or a doc_id join for per-doc transforms) so every
    # §2 operator keeps a value-exact oracle while the grid fits the
    # driver's window with headroom. DuckDB accepts WITH inside derived
    # tables, so composition wraps the proven per-op SQL unchanged.
    o["ann_topk"] = f"""
        SELECT q_id, vec_id, cos_sim, 'cosine' AS method
        FROM ({o.pop("ann_cosine_topk")})
        UNION ALL
        SELECT q_id, vec_id, cos_sim, 'lsh' AS method
        FROM ({o.pop("ann_lsh_topk")})
        UNION ALL
        SELECT q_id, vec_id, cos_sim, 'ivf' AS method
        FROM ({o.pop("ann_ivf_topk")})
    """
    o["hash_near_dups"] = f"""
        SELECT doc_a, doc_b, CAST(est_jaccard AS DOUBLE) AS metric,
               'minhash' AS method
        FROM ({o.pop("minhash_near_dups")})
        UNION ALL
        SELECT doc_a, doc_b, CAST(hamming AS DOUBLE) AS metric,
               'simhash' AS method
        FROM ({o.pop("simhash_near_dups")})
    """
    o["text_stats"] = f"""
        SELECT a.doc_id, a.n_words, b.n_tokens
        FROM ({o.pop("word_count")}) a
        JOIN ({o.pop("token_estimate")}) b USING (doc_id)
    """
    # ---- r4 session-6: merge the three small top-k reports ---------
    o["topk_reports"] = f"""
        SELECT word AS key, '' AS item, CAST(cnt AS DOUBLE) AS metric,
               rank AS rk, 'topics' AS method
        FROM ({o.pop("key_topics")})
        UNION ALL
        SELECT '' AS key, CAST(doc_id AS VARCHAR) AS item,
               CAST(n_chars AS DOUBLE) AS metric,
               CAST(-1 AS BIGINT) AS rk, 'docs' AS method
        FROM ({o.pop("top_docs_by_length")})
        UNION ALL
        SELECT event_type AS key, CAST(event_id AS VARCHAR) AS item,
               value AS metric, rn AS rk, 'events' AS method
        FROM ({o.pop("top_events_per_type")})
    """
    # ---- r4 session-3 consolidations -------------------------------
    o["linkgraph_stats"] = f"""
        SELECT node AS key, '' AS anchor,
               in_deg AS m1, out_deg AS m2, 'degrees' AS method
        FROM ({o.pop("link_degrees_topk")})
        UNION ALL
        SELECT dst AS key, anchor, cnt AS m1, CAST(rk AS BIGINT) AS m2,
               'anchors' AS method
        FROM ({o.pop("anchor_text_top")})
    """
    o["event_success_stats"] = f"""
        SELECT event_type AS key, n, total_value AS m1,
               min_value AS m2, max_value AS m3, 'by_type' AS method
        FROM ({o.pop("event_stats")})
        UNION ALL
        SELECT 'ALL' AS key, total_requests AS n, success_rate AS m1,
               CAST(0.0 AS DOUBLE) AS m2, CAST(0.0 AS DOUBLE) AS m3,
               'success_rate' AS method
        FROM ({o.pop("success_rate")})
    """
    o["content_hashes"] = f"""
        SELECT CAST(doc_id AS VARCHAR) AS key, content_md5 AS payload,
               CAST(-1 AS BIGINT) AS delta, 'doc_hash' AS method
        FROM ({o.pop("doc_hash")})
        UNION ALL
        SELECT url AS key, change AS payload,
               CAST(delta_chars AS BIGINT) AS delta,
               'snapshot_diff' AS method
        FROM ({o.pop("snapshot_diff")})
    """
    o["doc_quality"] = f"""
        SELECT lang_pred AS key, n, CAST(-1.0 AS DOUBLE) AS quality,
               'lang_counts' AS method
        FROM ({o.pop("lang_id_counts")})
        UNION ALL
        SELECT CAST(doc_id AS VARCHAR) AS key, CAST(-1 AS BIGINT) AS n,
               quality, 'quality' AS method
        FROM ({o.pop("quality_scores")})
    """
    # phrase search: an INDEPENDENT relational formulation — positions
    # via a generate_series lateral, adjacency via a pos+1 self-join
    # (the Spark side intersects shifted position arrays instead)
    o["phrase_search"] = """
        WITH t AS (
          SELECT doc_id AS doc,
                 list_filter(string_split_regex(lower(text),
                             '[^a-z0-9]+'), x -> x <> '') AS ls
          FROM documents
        ),
        tok AS (
          SELECT doc, ls[g.i] AS term, g.i - 1 AS pos
          FROM t, UNNEST(generate_series(1, len(ls))) AS g(i)
        )
        SELECT a.doc, CAST(COUNT(*) AS BIGINT) AS n_matches
        FROM tok a JOIN tok b ON a.doc = b.doc AND b.pos = a.pos + 1
        WHERE a.term = 'the' AND b.term = 'fast'
        GROUP BY a.doc
    """
    # canonical dedup: ground truth from the construction rule — no
    # regex in the oracle; what's under test is the Spark side's
    # extract + root-relative resolution + fallback-free grouping
    o["canonical_dedup"] = """
        WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS id FROM documents),
        pages AS (
          SELECT 'https://ex.com/d/' || id || '?utm_source=x' AS url,
                 'https://ex.com/d/' || id AS canon FROM d
          UNION ALL
          SELECT 'https://ex.com/d/' || id || '/print',
                 'https://ex.com/d/' || id FROM d
          UNION ALL
          SELECT 'https://m.ex.com/d/' || id,
                 'https://ex.com/d/' || id
          FROM d WHERE CAST(id AS BIGINT) % 2 = 0
        )
        SELECT canon AS canon_url, MIN(url) AS url,
               COUNT(*) AS n_variants
        FROM pages GROUP BY canon
    """
    o["line_ops"] = f"""
        SELECT doc_id, chunk_idx AS idx, chunk_md5 AS payload_md5,
               CAST(chunk_chars AS BIGINT) AS chars, 'chunk' AS method
        FROM ({o.pop("chunk_text")})
        UNION ALL
        SELECT doc_id, CAST(-1 AS BIGINT) AS idx,
               clean_md5 AS payload_md5, CAST(-1 AS BIGINT) AS chars,
               'dedup_lines' AS method
        FROM ({o.pop("dedup_lines")})
    """
    o["host_boilerplate"] = """
        WITH d AS (
          SELECT doc_id, 'h' || CAST(doc_id % 20 AS VARCHAR) AS host,
                 text || chr(10) || 'Subscribe to host '
                      || CAST(doc_id % 20 AS VARCHAR) AS text
          FROM documents
        ),
        split AS (
          SELECT doc_id, host, string_split(text, chr(10)) AS ls
          FROM d
        ),
        lines AS (
          SELECT doc_id, host, ls[g.i] AS line, g.i AS ord
          FROM split, UNNEST(generate_series(1, len(ls))) AS g(i)
        ),
        nb AS (
          SELECT host, line, COUNT(DISTINCT doc_id) AS n
          FROM lines WHERE trim(line) <> '' GROUP BY 1, 2
        ),
        hp AS (SELECT host, COUNT(*) AS n_pages FROM d GROUP BY 1),
        flagged AS (
          SELECT nb.host, nb.line FROM nb JOIN hp USING (host)
          WHERE hp.n_pages >= 3 AND nb.n * 1.0 / hp.n_pages >= 0.5
        ),
        kept AS (
          SELECT l.doc_id, l.line, l.ord,
                 f.line IS NOT NULL AS dropped
          FROM lines l
          LEFT JOIN flagged f
            ON l.host = f.host AND l.line = f.line
        )
        SELECT doc_id,
               md5(coalesce(string_agg(line, chr(10) ORDER BY ord)
                              FILTER (WHERE NOT dropped), ''))
                 AS clean_md5,
               CAST(COUNT(*) FILTER (WHERE dropped) AS BIGINT)
                 AS n_removed
        FROM kept GROUP BY doc_id
    """
    # ---- r4 session-3 new rows --------------------------------------
    # TrustRank: same host graph + 9-dp per-iteration rounding as
    # pagerank_hosts; restart vector uniform on seeds src0/1/2; no
    # dangling term (structurally D = 0, see q_pagerank_hosts).
    # (1.0 - 0.85) is computed IN-ENGINE both sides — Python would
    # fold it to the same IEEE double, but the forms must match.
    # r5: tagged union trust ∪ spam-mass — the pr CTE is the
    # pagerank_hosts mirror verbatim (dangling term structurally 0);
    # rel_mass = (p.r − t.r)/p.r over the two 9-dp-rounded iterates is
    # the same IEEE arithmetic in both engines.
    o["trustrank_hosts"] = """
        WITH RECURSIVE nd AS (SELECT COUNT(*) AS n FROM documents),
        edges AS (
          SELECT 'src' || CAST(d.doc_id % 20 AS VARCHAR) AS src,
                 'src' || CAST(((d.doc_id * d.doc_id + j.j) % nd.n) % 20
                               AS VARCHAR) AS dst,
                 COUNT(*) AS w
          FROM documents d, nd, (VALUES (1), (2), (3)) j(j)
          GROUP BY 1, 2
        ),
        nodes AS (
          SELECT DISTINCT x.node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges
          ) x
        ),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        tvec AS (
          SELECT node,
                 CASE WHEN node IN ('src0', 'src1', 'src2')
                      THEN CAST(1.0 AS DOUBLE) / 3
                      ELSE CAST(0.0 AS DOUBLE) END AS t
          FROM nodes
        ),
        outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1),
        inw AS (SELECT dst, SUM(w) AS win FROM edges GROUP BY 1),
        enorm AS (
          SELECT e.src, e.dst,
                 CAST(e.w AS DOUBLE) / CAST(ow.wout AS DOUBLE) AS wn_out,
                 CAST(e.w AS DOUBLE) / CAST(iw.win AS DOUBLE) AS wn_in
          FROM edges e JOIN outw ow ON e.src = ow.src
          JOIN inw iw ON e.dst = iw.dst
        ),
        sal_hubs AS (SELECT DISTINCT src AS node FROM edges),
        sal_auths AS (SELECT DISTINCT dst AS node FROM edges),
        sal_a(iter, node, a) AS (
          SELECT 0, node,
                 ROUND(CAST(1.0 AS DOUBLE)
                       / (SELECT COUNT(*) FROM sal_auths), 9)
          FROM sal_auths
          UNION ALL
          SELECT m.it + 1, x.node, ROUND(x.raw / SUM(x.raw) OVER (), 9)
          FROM (
            SELECT an.node, COALESCE(c.c, CAST(0.0 AS DOUBLE)) AS raw
            FROM sal_auths an
            LEFT JOIN (
              SELECT e2.dst, SUM(t.t * e2.wn_out) AS c
              FROM (
                SELECT e1.src, SUM(p.a * e1.wn_in) AS t
                FROM sal_a p JOIN enorm e1 ON p.node = e1.dst
                GROUP BY e1.src
              ) t JOIN enorm e2 ON t.src = e2.src
              GROUP BY e2.dst
            ) c ON c.dst = an.node
          ) x
          CROSS JOIN (SELECT MAX(iter) AS it FROM sal_a) m
          WHERE m.it < 8
        ),
        sal_h(iter, node, h) AS (
          SELECT 0, node,
                 ROUND(CAST(1.0 AS DOUBLE)
                       / (SELECT COUNT(*) FROM sal_hubs), 9)
          FROM sal_hubs
          UNION ALL
          SELECT m.it + 1, x.node, ROUND(x.raw / SUM(x.raw) OVER (), 9)
          FROM (
            SELECT hn.node, COALESCE(c.c, CAST(0.0 AS DOUBLE)) AS raw
            FROM sal_hubs hn
            LEFT JOIN (
              SELECT e2.src, SUM(s.s * e2.wn_in) AS c
              FROM (
                SELECT e1.dst, SUM(p.h * e1.wn_out) AS s
                FROM sal_h p JOIN enorm e1 ON p.node = e1.src
                GROUP BY e1.dst
              ) s JOIN enorm e2 ON s.dst = e2.dst
              GROUP BY e2.src
            ) c ON c.src = hn.node
          ) x
          CROSS JOIN (SELECT MAX(iter) AS it FROM sal_h) m
          WHERE m.it < 8
        ),
        tr(iter, node, r) AS (
          SELECT 0, node, ROUND(t, 9) FROM tvec
          UNION ALL
          SELECT m.it + 1, t2.node,
                 ROUND(
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * t2.t
                   + CAST(0.85 AS DOUBLE)
                     * COALESCE(c.c, CAST(0.0 AS DOUBLE)),
                   9)
          FROM tvec t2
          CROSS JOIN (SELECT MAX(iter) AS it FROM tr) m
          LEFT JOIN (
            SELECT e.dst, SUM(p.r * e.w / ow.wout) AS c
            FROM tr p
            JOIN edges e ON p.node = e.src
            JOIN outw ow ON p.node = ow.src
            GROUP BY e.dst
          ) c ON c.dst = t2.node
          WHERE m.it < 8
        ),
        pr(iter, node, r) AS (
          SELECT 0, node,
                 ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9)
          FROM nodes
          UNION ALL
          SELECT m.it + 1, n2.node,
                 ROUND(
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                     / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE)
                     * (COALESCE(c.c, CAST(0.0 AS DOUBLE))
                        + m.dang / CAST((SELECT n FROM nn) AS DOUBLE)),
                   9)
          FROM nodes n2
          CROSS JOIN (
            SELECT MAX(iter) AS it,
                   COALESCE((SELECT SUM(p2.r) FROM pr p2
                             LEFT JOIN outw ow ON p2.node = ow.src
                             WHERE ow.src IS NULL),
                            CAST(0.0 AS DOUBLE)) AS dang
            FROM pr
          ) m
          LEFT JOIN (
            SELECT e.dst, SUM(p.r * e.w / ow.wout) AS c
            FROM pr p
            JOIN edges e ON p.node = e.src
            JOIN outw ow ON p.node = ow.src
            GROUP BY e.dst
          ) c ON c.dst = n2.node
          WHERE m.it < 8
        )
        SELECT node AS host, r AS v1,
               CAST(-1.0 AS DOUBLE) AS v2, CAST(-1.0 AS DOUBLE) AS v3,
               'trust' AS method
        FROM tr WHERE iter = 8
        UNION ALL
        SELECT p.node AS host, p.r AS v1, t.r AS v2,
               CASE WHEN p.r > 0 THEN (p.r - t.r) / p.r END AS v3,
               'mass' AS method
        FROM pr p JOIN tr t ON p.node = t.node
        WHERE p.iter = 8 AND t.iter = 8
        UNION ALL
        SELECT COALESCE(h.node, a.node) AS host,
               COALESCE(h.h, CAST(0.0 AS DOUBLE)) AS v1,
               COALESCE(a.a, CAST(0.0 AS DOUBLE)) AS v2,
               CAST(-1.0 AS DOUBLE) AS v3,
               'salsa' AS method
        FROM (SELECT * FROM sal_h WHERE iter = 8) h
        FULL OUTER JOIN (SELECT * FROM sal_a WHERE iter = 8) a
          ON h.node = a.node
    """
    # Crawler traps: same synthetic frontier (calendar explosion /
    # ab-loop / depth bomb / healthy md5-tail host) and the same
    # RE2-compatible template collapse as operators/traps.py.
    o["crawl_traps"] = """
        WITH u AS (
          SELECT 'https://trap.example.com/cal?yr='
                 || CAST(doc_id % 4 AS VARCHAR)
                 || '&day=' || CAST(doc_id AS VARCHAR) AS url
          FROM documents
          UNION ALL
          SELECT 'https://ok.example.com/p/'
                 || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                 || '.html' FROM documents
          UNION ALL
          SELECT 'https://loop.example.com/a/b/a/b/a/b/'
                 || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
          FROM documents WHERE doc_id % 50 = 0
          UNION ALL
          SELECT 'https://deep.example.com' || repeat('/s', 17) || '/'
                 || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
          FROM documents WHERE doc_id % 100 = 0
        ),
        per_url AS (
          SELECT
            lower(regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              lower(url),
              '#.*$', '', 'g'),
              '([?&][^=&#]*)=[^&#]*', '\\1=*', 'g'),
              '[0-9a-f]{8,}', '{h}', 'g'),
              '[0-9]+', '{n}', 'g') AS template,
            CAST(len(segs) AS BIGINT) AS depth,
            CAST(COALESCE(list_max(list_transform(segs,
              s -> len(list_filter(segs, x -> x = s)))), 0) AS BIGINT)
              AS seg_repeat,
            url
          FROM (
            SELECT url,
                   list_filter(string_split(regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                     '/'), x -> x <> '') AS segs
            FROM u
          )
        ),
        g AS (
          SELECT host, template,
                 COUNT(DISTINCT url) AS n_urls,
                 MAX(depth) AS max_depth,
                 MAX(seg_repeat) AS max_seg_repeat,
                 MIN(url) AS example
          FROM per_url GROUP BY host, template
        )
        SELECT host, template, n_urls, max_depth, max_seg_repeat,
               example,
               concat_ws(',',
                 CASE WHEN n_urls >= 32 THEN 'explosion' END,
                 CASE WHEN max_seg_repeat >= 3 THEN 'loop' END,
                 CASE WHEN max_depth > 16 THEN 'depth' END) AS reasons
        FROM g
    """
    # Inverted index: bm25's tokenizer, postings as the canonical
    # doc-ascending "doc:tf" string.
    o["inverted_index"] = """
        WITH tok AS (
          SELECT doc_id AS doc,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                   AS term
          FROM documents
        ),
        tf AS (
          SELECT term, doc, COUNT(*) AS tf FROM tok
          WHERE term <> '' GROUP BY 1, 2
        )
        SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
               string_agg(CAST(doc AS VARCHAR) || ':'
                          || CAST(tf AS VARCHAR), ',' ORDER BY doc)
                 AS postings
        FROM tf GROUP BY term
    """
    o["mixture_plan"] = f"""
        SELECT stratum, CAST(-1 AS BIGINT) AS doc_id, n_docs AS n,
               total_weight AS w, share, target_share, multiplier,
               'report' AS method
        FROM ({o.pop("mixture_report")})
        UNION ALL
        SELECT lang AS stratum, doc_id, CAST(copy_idx AS BIGINT) AS n,
               CAST(-1 AS BIGINT) AS w, CAST(-1.0 AS DOUBLE) AS share,
               CAST(-1.0 AS DOUBLE) AS target_share,
               CAST(-1.0 AS DOUBLE) AS multiplier, 'apply' AS method
        FROM ({o.pop("apply_mixture")})
    """
    o["markdown_transforms"] = f"""
        SELECT a.doc_id, a.safe_text, b.trimmed, c.title,
               d.n_sections, d.section_titles, d.section_chars
        FROM ({o.pop("sanitize_markdown")}) a
        JOIN ({o.pop("trim_intelligently")}) b USING (doc_id)
        JOIN ({o.pop("title_from_markdown")}) c USING (doc_id)
        JOIN (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sections,
                 string_agg(title, '|' ORDER BY section_idx)
                   AS section_titles,
                 CAST(SUM(content_chars) AS BIGINT) AS section_chars
          FROM ({o.pop("extract_sections")}) GROUP BY doc_id
        ) d USING (doc_id)
    """
    o["sample_assignments"] = f"""
        SELECT doc_id, split AS label, 'split_by_hash' AS method
        FROM ({o.pop("split_by_hash")})
        UNION ALL
        SELECT doc_id, lang AS label, 'stratified' AS method
        FROM ({o.pop("stratified_sample")})
        UNION ALL
        SELECT doc_id,
               CAST(shard AS VARCHAR) || ':'
                 || CAST(row_number() OVER (
                        PARTITION BY shard ORDER BY u, doc_id
                    ) AS VARCHAR) AS label,
               'shard' AS method
        FROM (
          SELECT doc_id, CAST(floor(u * 8) AS INT) AS shard, u
          FROM (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                       || 'shuffle-v1'), 1, 15))::BIGINT
                     / 1152921504606846976.0 AS u
            FROM documents
          )
        )
        UNION ALL
        -- Efraimidis–Spirakis A-ES: top-k by ln(u)/w, u the salted-md5
        -- 60-bit uniform, w = n_chars; same ln/divide arithmetic both
        -- engines (the DSIR precedent), ties broken on doc_id.
        SELECT doc_id, 'sel' AS label, 'weighted' AS method
        FROM (
          SELECT doc_id,
                 ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || 'wsample-v1'), 1, 15))::BIGINT
                    / 1152921504606846976.0)
                   / CAST(n_chars AS DOUBLE) AS es_key
          FROM documents WHERE n_chars > 0
          ORDER BY es_key DESC, doc_id LIMIT 40
        )
        UNION ALL
        SELECT doc_id, lang AS label, 'weighted_lang' AS method
        FROM (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                   || 'wsample-v1'), 1, 15))::BIGINT
                               / 1152921504606846976.0)
                              / CAST(n_chars AS DOUBLE) DESC, doc_id
                 ) AS es_rank
          FROM documents WHERE n_chars > 0
        ) WHERE es_rank <= 5
    """
    return o
