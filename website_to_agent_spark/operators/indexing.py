"""Inverted-index construction — the materialized form of the BM25
statistics (`operators/bm25.py` computes them per query on the fly;
at corpus scale you build the index ONCE and serve every query from
it — the standard batch-indexing dataflow, e.g. Dean & Ghemawat's
original MapReduce example, OSDI'04; independent implementation).

The reference scores with in-memory `rank-bm25` over ≤100 head
strings (`url_seeder.py:120-150`) — no index, rebuilt per query.
Here the postings build is three relational stages, all
hash-partitioned by term:

1. tokenize + posexplode → (term, doc, tf) via one map-side-combined
   groupBy — the 100 TB text never moves; only (term, doc) pairs do.
2. per-term fold → df (document frequency), cf (collection
   frequency), and the postings list sorted by doc id.
3. optional stopword pruning: ``max_df`` drops terms appearing in
   more than that FRACTION of documents. A stopword's postings row at
   corpus scale is billions of entries in one task — the classic
   single-key OOM. The drop is never silent: ``n_terms_pruned`` in
   the report, and the relational form (``postings_relational``)
   keeps everything when the consumer can stream per (term, doc).

Postings are emitted as a canonical STRING ("doc:tf,doc:tf", doc
ascending) rather than array<struct>: byte-stable across engines
(value-exact DuckDB oracle) and directly writable to any sink. The
relational (term, doc, tf) form — the one you'd bucket by term for a
co-located merge-join with query terms — is the scale surface;
the string form is the bounded export.

Tokenization is `bm25.tokenize` (lower, split non-alnum) so index
statistics and the on-the-fly scorer agree exactly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from website_to_agent_spark.operators.bm25 import tokenize


def postings_relational(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(term, doc, tf) — the bucketable scale form. One explode + one
    map-side-combined groupBy."""
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    return tok.groupBy("term", "doc").agg(F.count("*").alias("tf"))


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: Optional[float] = None,
) -> DataFrame:
    """(term, df, cf, postings) — postings = "doc:tf,…" sorted by doc.

    ``max_df`` (fraction of the corpus, e.g. 0.5) prunes stopword
    terms BEFORE the collect_list fold, bounding the largest postings
    row. Pair with ``index_report`` so the prune is visible."""
    rel = postings_relational(docs, id_col, text_col)
    if max_df is not None:
        n_docs = docs.count()
        cutoff = int(max_df * n_docs)
        term_df = rel.groupBy("term").agg(F.count("*").alias("_df"))
        rel = rel.join(
            F.broadcast(term_df.filter(F.col("_df") > cutoff)
                        .select("term")),
            "term", "left_anti",
        )
    return rel.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc", "tf"))),
                lambda s: F.concat_ws(
                    ":", s["doc"].cast("string"), s["tf"].cast("string")),
            ),
            ",",
        ).alias("postings"),
    )


def index_report(docs: DataFrame, index: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """One row: corpus/index totals + how many terms the index is
    missing vs the raw vocabulary (= pruned by ``max_df``). The
    no-silent-caps companion to ``inverted_index``."""
    vocab = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .agg(F.countDistinct("term").alias("n_vocab"),
             F.count("*").alias("n_tokens"))
    )
    idx = index.agg(
        F.count("*").alias("n_terms"),
        F.coalesce(F.sum("cf"), F.lit(0)).alias("n_indexed_tokens"),
    )
    return vocab.crossJoin(idx).select(
        "n_vocab", "n_tokens", "n_terms", "n_indexed_tokens",
        (F.col("n_vocab") - F.col("n_terms")).alias("n_terms_pruned"),
    )


def doc_norms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc, dl) — per-document token counts, the length-normalization
    table a BM25 index stores NEXT TO the postings (Lucene's norms
    file). Build once with the index; map-only."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("dl"),
    )


def _term_score(k1: float, b: float, avgdl: float) -> F.Column:
    """The per-(term, doc) BM25 partial score — one expression shared
    by the scan-parity scorer, the impact (upper-bound) builder, and
    the pruned serve path, so all three agree to the last bit."""
    idf = F.log(
        F.lit(1.0) + (F.col("_n_docs") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
    )
    return idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.lit(max(avgdl, 1e-9)))
    )


def _exact_raw(hit: DataFrame, df_: DataFrame, norms: DataFrame,
               n_docs: int, avgdl: float, k1: float, b: float
               ) -> DataFrame:
    """(doc, raw) — exact raw BM25 over the matched (term, doc) rows."""
    return (
        hit.join(F.broadcast(df_), "term")
        .join(norms, "doc")
        .withColumn("_n_docs", F.lit(float(n_docs)))
        .withColumn("term_score", _term_score(k1, b, avgdl))
        .groupBy("doc")
        .agg(F.sum("term_score").alias("raw"))
    )


def bm25_from_postings(
    rel: DataFrame,
    norms: DataFrame,
    query: str,
    k1: float = 1.5,
    b: float = 0.75,
    normalize: bool = True,
) -> DataFrame:
    """BM25 scores SERVED FROM the persisted index — ``rel`` is
    :func:`postings_relational` output, ``norms`` is :func:`doc_norms`
    — instead of re-scanning 100 TB of text per query the way
    `operators/bm25.py::bm25_scores` (and the reference, which
    rebuilds `rank-bm25` in memory per call) does. Same math, same
    idf form, same [0,1] normalization: asserted score-identical to
    the scan path in tests.

    Serve-path shape: the query-term postings are a broadcast-probe
    slice of ``rel`` (term-bucketed at rest → partition-pruned scan);
    df and the corpus stats are two tiny aggregations; the per-doc
    fold shuffles only (doc, term_score) pairs."""
    from website_to_agent_spark.operators.bm25 import query_terms

    terms = query_terms(query)
    ids = norms.select(F.col("doc"))
    if not terms:
        return ids.select("doc", F.lit(0.0).alias("score"))
    stats = norms.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(stats.n), float(stats.avgdl or 0.0)

    hit = rel.filter(F.col("term").isin(terms))
    df_ = hit.groupBy("term").agg(F.count("*").alias("df"))
    scored = _exact_raw(hit, df_, norms, n_docs, avgdl, k1, b)
    out = ids.join(scored, "doc", "left").withColumn(
        "raw", F.coalesce(F.col("raw"), F.lit(0.0)))
    if not normalize:
        return out.select("doc", F.col("raw").alias("score"))
    mm = out.agg(F.min("raw").alias("lo"), F.max("raw").alias("hi"))
    return (
        out.crossJoin(F.broadcast(mm))
        .withColumn(
            "score",
            F.when(F.col("hi") > F.col("lo"),
                   (F.col("raw") - F.col("lo"))
                   / (F.col("hi") - F.col("lo"))).otherwise(F.lit(0.0)),
        )
        .select("doc", "score")
    )


def postings_positional(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(term, doc, positions) — token offsets per (term, doc), the
    phrase-query form of the index (Lucene's proximity data). One
    posexplode + one map-side-combined groupBy; positions are sorted,
    so downstream intersections are deterministic."""
    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    return tok.groupBy("term", "doc").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"))


def phrase_docs(rel_pos: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc, n_matches) — documents containing the exact token phrase,
    from positional postings alone (text never read). Standard
    positional-intersection: fold term i's positions shifted by -i
    into a running intersection; survivors are phrase start offsets.

    Scale shape: each phrase term's postings row is one (doc,
    positions) slice (broadcast-probe selection like ``lookup``);
    the fold is |phrase|-1 doc-keyed joins over QUERY-SIZED inputs —
    the index itself never shuffles. Duplicate adjacent terms
    ("buffalo buffalo") work: shifted-position intersection doesn't
    care that the slices coincide."""
    if not phrase:
        raise ValueError("phrase_docs: empty phrase")
    terms = [t.lower() for t in phrase]
    cur = (
        rel_pos.filter(F.col("term") == terms[0])
        .select("doc", F.col("positions").alias("starts"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = rel_pos.filter(F.col("term") == t).select(
            "doc",
            F.transform(
                F.col("positions"), lambda p: p - i
            ).alias("_shifted"),
        )
        cur = (
            cur.join(nxt, "doc")
            .select(
                "doc",
                F.array_intersect("starts", "_shifted").alias("starts"),
            )
            .filter(F.size("starts") > 0)
        )
    return cur.select(
        "doc", F.size("starts").cast("long").alias("n_matches"))


def search(rel: DataFrame, norms: DataFrame, query: str,
           k: int = 10) -> DataFrame:
    """Top-k BM25 retrieval from the persisted index — the end-user
    query path. Deterministic tie-break (score desc, doc asc);
    TakeOrderedAndProject, no global sort."""
    return (
        bm25_from_postings(rel, norms, query)
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
    )


def term_impacts(rel: DataFrame, norms: DataFrame,
                 k1: float = 1.5, b: float = 0.75) -> DataFrame:
    """(term, df, ub) — per-term maximum partial BM25 score ("impact"
    / "max-score" metadata, Turtle & Flood IPM'95; the term-level form
    of Lucene's impacts and of block-max WAND's block maxima). Built
    ONCE alongside the index: ``ub`` upper-bounds any document's
    score contribution from that term, which is what lets the serve
    path skip scoring documents that provably cannot reach the top-k
    (:func:`search_pruned`).

    One postings⋈norms join + one term-keyed map-combined max — an
    index-build-time pass, term-granular output (tiny). The bounds
    are valid for the EXACT corpus the index describes (same norms,
    same k1/b): rebuild impacts whenever the index is rebuilt or
    compacted."""
    stats = norms.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(stats.n), float(stats.avgdl or 0.0)
    df_ = rel.groupBy("term").agg(F.count("*").alias("df"))
    return (
        rel.join(norms, "doc")
        .join(df_, "term")
        .withColumn("_n_docs", F.lit(float(n_docs)))
        .withColumn("term_score", _term_score(k1, b, avgdl))
        .groupBy("term")
        .agg(F.max("df").alias("df"),
             F.max("term_score").alias("ub"))
    )


def search_pruned(rel: DataFrame, norms: DataFrame, query: str,
                  k: int = 10, k1: float = 1.5, b: float = 0.75,
                  impacts: Optional[DataFrame] = None,
                  normalize: bool = True,
                  stats: Optional[dict] = None) -> DataFrame:
    """Top-k BM25 identical to :func:`search`, but with MaxScore-
    family pruning (Turtle & Flood IPM'95; Broder et al.'s WAND,
    CIKM'03 — public papers, independent batch adaptation): documents
    whose best-possible score provably cannot reach the top-k never
    join norms and never enter the scoring aggregation.

    The batch adaptation (safe by construction, asserted identical to
    the full scorer in tests):

    1. θ seed: exactly score only the docs in the SMALLEST posting
       lists (rarest terms first, until their cumulative df ≥ k).
       The k-th best raw score among any k docs lower-bounds the true
       k-th best, so pruning against it can never drop a winner.
    2. Upper bounds: every matched doc's ``ub_sum`` = Σ ub over the
       query terms it contains (one slim term-broadcast join + one
       doc-keyed map-combined sum over the query slice — no norms, no
       scoring). Docs with ``ub_sum < θ`` are pruned; a true top-k
       doc has raw ≥ θ and ub_sum ≥ raw, so it always survives
       (a 1e-9 relative slack absorbs double rounding).
    3. Exact-score the survivors only; top-k with :func:`search`'s
       tie-break.

    This is the classic stopword win: for "the spark scheduler", the
    millions of docs matching only "the" never reach the norms join
    or the scoring shuffle — their cost collapses to one slim sum
    over the postings slice. At rest, postings bucketed by term plus
    the (term, ub) table are exactly the metadata a block-max layout
    would extend to block granularity.

    ``impacts`` — pass :func:`term_impacts` output to reuse the
    stored bounds; None computes them from the query slice (still
    correct, one extra pass over the slice). ``normalize`` mirrors
    :func:`bm25_from_postings`'s min-max exactly: when every corpus
    doc matches some query term, min-max's lower end is no longer 0
    and pruning cannot preserve it, so the query falls back to the
    full scorer (detected with one cheap count; an all-stopword query
    was never prunable anyway). ``stats`` — optional dict, filled
    with {theta, n_matched, n_survivors} for observability (costs one
    extra count)."""
    from website_to_agent_spark.operators.bm25 import query_terms

    terms = list(dict.fromkeys(query_terms(query)))
    ids = norms.select(F.col("doc"))
    zero = ids.select(
        "doc", F.lit(0.0).alias("score")).orderBy("doc").limit(k)
    if not terms:
        return zero
    st = norms.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = int(st.n), float(st.avgdl or 0.0)

    hit = rel.filter(F.col("term").isin(terms))
    df_rows = hit.groupBy("term").agg(F.count("*").alias("df")).collect()
    if not df_rows:
        return zero
    df_ = rel.sparkSession.createDataFrame(
        [(r["term"], r["df"]) for r in df_rows], "term string, df long")

    # normalization exactness guard: lo == 0 requires ≥1 unmatched doc
    if normalize:
        # Σdf < n_docs guarantees an unmatched doc without a count
        some_unmatched = sum(r["df"] for r in df_rows) < n_docs
        if (not some_unmatched
                and hit.select("doc").distinct().count() == n_docs):
            return (
                bm25_from_postings(rel, norms, query, k1, b, normalize)
                .orderBy(F.desc("score"), F.asc("doc")).limit(k)
            )

    # 1. θ from the rarest terms' docs
    by_df = sorted((r["df"], r["term"]) for r in df_rows)
    seed_terms, cum = [], 0
    for dfv, t in by_df:
        seed_terms.append(t)
        cum += dfv
        if cum >= k:
            break
    seed_docs = (
        hit.filter(F.col("term").isin(seed_terms))
        .select("doc").distinct()
    )
    seed_raw = _exact_raw(hit.join(seed_docs, "doc"), df_, norms,
                          n_docs, avgdl, k1, b)
    top_seed = [r["raw"] for r in
                seed_raw.orderBy(F.desc("raw")).limit(k).collect()]
    theta = top_seed[k - 1] if len(top_seed) >= k else 0.0

    # 2. upper-bound pruning over the query slice
    if impacts is None:
        ub_ = (
            hit.join(norms, "doc")
            .join(F.broadcast(df_), "term")
            .withColumn("_n_docs", F.lit(float(n_docs)))
            .withColumn("term_score", _term_score(k1, b, avgdl))
            .groupBy("term").agg(F.max("term_score").alias("ub"))
        )
    else:
        ub_ = impacts.filter(F.col("term").isin(terms)).select("term", "ub")
    ub_sums = (
        hit.join(F.broadcast(ub_), "term")
        .groupBy("doc").agg(F.sum("ub").alias("ub_sum"))
    )
    survivors = ub_sums.filter(
        F.col("ub_sum") >= F.lit(theta * (1.0 - 1e-9))).select("doc")

    # 3. exact scores for survivors only
    raw = _exact_raw(hit.join(survivors, "doc"), df_, norms,
                     n_docs, avgdl, k1, b)
    if stats is not None:
        stats["theta"] = theta
        stats["n_matched"] = ub_sums.count()
        stats["n_survivors"] = survivors.count()
    topk = raw.orderBy(F.desc("raw"), F.asc("doc")).limit(k).collect()
    spark = rel.sparkSession
    if not topk:
        return zero
    hi = topk[0]["raw"]
    if normalize:
        rows = [(r["doc"], (r["raw"] / hi) if hi > 0.0 else 0.0)
                for r in topk]
    else:
        rows = [(r["doc"], r["raw"]) for r in topk]
    out = spark.createDataFrame(rows, norms.select(
        "doc", F.lit(0.0).alias("score")).schema)
    if len(rows) < k:
        # mirror search(): zero-score docs fill the tail in doc order
        matched_ids = spark.createDataFrame(
            [(r["doc"],) for r in topk], norms.select("doc").schema)
        fill = (
            ids.join(matched_ids, "doc", "left_anti")
            .orderBy("doc").limit(k - len(rows))
            .select("doc", F.lit(0.0).alias("score"))
        )
        out = out.unionByName(fill)
    return out


def merge_index_deltas(
    base: DataFrame,
    deltas: Optional[DataFrame] = None,
    tombstones: Optional[DataFrame] = None,
) -> DataFrame:
    """The LIVE postings view of an incrementally-maintained index:
    base ∪ deltas, minus tombstoned docs — (term, doc, tf).

    At 100 TB the index is never rebuilt: new crawl snapshots append
    a postings DELTA (``postings_relational`` of just the new docs —
    O(Δ)), pure deletions append doc ids to a TOMBSTONE list, and
    queries read this merged view. Delta docs AUTOMATICALLY supersede
    their base rows (the Lucene/LSM delete-then-add segment
    semantics), so a re-crawled doc is just its fresh delta — no
    explicit tombstone needed. A doc-keyed anti-join against the
    term-bucketed base would be a full-index shuffle, so the dead-doc
    check is a BROADCAST anti-join instead — correct while the
    delta + delete lists are compaction-bounded (the same contract as
    the snapshot catalog's delta files, ``sources/catalog.py``).
    ``compact_index`` folds everything back into one base and empties
    both lists.
    """
    dead = None
    if tombstones is not None:
        dead = tombstones.select("doc").distinct()
    if deltas is not None:
        delta_docs = deltas.select("doc").distinct()
        dead = delta_docs if dead is None else (
            dead.unionByName(delta_docs).distinct())
    rel = base
    if dead is not None:
        # the USING-column join would reorder columns to (doc, term,
        # tf); pin the (term, doc, tf) contract for positional
        # consumers (unions, exceptAll, parquet appends)
        rel = rel.join(F.broadcast(dead), "doc", "left_anti")
    if deltas is not None:
        rel = rel.unionByName(deltas)
    return rel.select("term", "doc", "tf")


def compact_index(
    base: DataFrame,
    deltas: Optional[DataFrame] = None,
    tombstones: Optional[DataFrame] = None,
) -> DataFrame:
    """Fold deltas + tombstones into a fresh base (write it term-
    bucketed; start the next delta cycle empty). One term-keyed
    shuffle over the merged view — the periodic cost that keeps the
    query-time broadcast anti-join small."""
    merged = merge_index_deltas(base, deltas, tombstones)
    # merge_index_deltas already guarantees one row per (term, doc) —
    # delta docs supersede base rows — so this groupBy is a defensive
    # identity; if a caller unions two deltas carrying the same doc,
    # the summed tf surfaces the mistake instead of silently keeping
    # duplicate rows
    return merged.groupBy("term", "doc").agg(F.sum("tf").alias("tf"))


def lookup(index: DataFrame, terms: list[str]) -> DataFrame:
    """Postings rows for ``terms`` — a broadcast-hash probe (term list
    is query-sized)."""
    return index.join(
        F.broadcast(
            index.sparkSession.createDataFrame(
                [(t,) for t in terms], "term string")),
        "term", "left_semi",
    )
