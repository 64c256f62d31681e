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


def lookup(index: DataFrame, terms: list[str]) -> DataFrame:
    """Postings rows for ``terms`` — a broadcast-hash probe (term list
    is query-sized)."""
    return index.join(
        F.broadcast(
            index.sparkSession.createDataFrame(
                [(t,) for t in terms], "term string")),
        "term", "left_semi",
    )
