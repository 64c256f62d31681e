"""BM25 relevance scoring (SURVEY §2.7 R1) — pure column math.

The reference scores seeder head-metadata against a query with
`rank-bm25` via crawl4ai (`test_url_seeder.py:29-57`), normalizes to
[0,1], and yields all-zero scores for an empty query
(`test_url_seeder.py:221-235`). Here it is a two-pass DataFrame
computation that Catalyst plans end-to-end (no UDFs):

1. explode tokens → per-(doc,term) tf + per-doc length, per-term df,
   global avgdl / N
2. join query terms, compute idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
3. per-doc sum, min-max normalize

idf uses the Lucene/rank-bm25-style non-negative form
``ln(1 + (N − df + 0.5)/(df + 0.5))``.

Scale: one explode + two aggregations; df/avgdl are tiny (vocabulary-
sized / scalar) and broadcast into the scoring join. Determinism (R2,
`test_url_seeder.py:343-372`) is free — column math.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

K1 = 1.5
B = 0.75
TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(col) -> F.Column:
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def query_terms(query: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", query.lower()) if t]


def bm25_scores(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    normalize: bool = True,
) -> DataFrame:
    """Score every doc against ``query``. Returns (id_col, score).

    Empty query ⇒ all-zero scores (reference semantics,
    `test_url_seeder.py:221-235`)."""
    terms = query_terms(query)
    ids = docs.select(id_col)
    if not terms:
        return ids.select(F.col(id_col), F.lit(0.0).alias("score"))

    # one pass for corpus stats: N (incl. zero-token docs) + total tokens
    stats_row = docs.select(
        F.count("*").alias("n"),
        F.sum(F.size(tokenize(F.col(text_col)))).alias("total_tokens"),
    ).first()
    n_docs = int(stats_row.n)
    avgdl = float(stats_row.total_tokens or 0) / max(n_docs, 1)

    tok = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    doclen = tok.groupBy(id_col).agg(F.count("*").alias("dl"))

    qterms = tok.filter(F.col("term").isin(terms))
    tf = qterms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, id_col)
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(max(avgdl, 1e-9)))
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("raw"))
    )
    out = ids.join(scored, id_col, "left").withColumn(
        "raw", F.coalesce(F.col("raw"), F.lit(0.0))
    )
    if not normalize:
        return out.select(F.col(id_col), F.col("raw").alias("score"))

    # min-max normalize to [0,1] (`test_url_seeder.py:44-49`); constant
    # scores normalize to 0 (guard against div-by-zero).
    stats = out.agg(
        F.min("raw").alias("lo"), F.max("raw").alias("hi")
    )
    return (
        out.crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.when(
                F.col("hi") > F.col("lo"),
                (F.col("raw") - F.col("lo")) / (F.col("hi") - F.col("lo")),
            ).otherwise(F.lit(0.0)),
        )
        .select(F.col(id_col), "score")
    )


def bm25_rank(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: Optional[float] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """EP3 pipeline (`test_url_seeder.py:32-57`): score → threshold
    filter (F12) → sort desc (O1) → cap (O2)."""
    scored = bm25_scores(docs, query, id_col, text_col)
    if threshold is not None:
        scored = scored.filter(F.col("score") >= threshold)
    scored = scored.orderBy(F.desc("score"), F.asc(id_col))
    if limit is not None:
        scored = scored.limit(limit)
    return scored


def bm25f_scores(
    docs: DataFrame,
    query: str,
    fields: dict,
    id_col: str = "doc_id",
    k1: float = K1,
    b=B,
    normalize: bool = True,
) -> DataFrame:
    """BM25F (Robertson & Zaragoza 2004, public) — fielded ranking for
    web documents: body, title, and anchor text are different evidence
    streams (an inbound anchor repeating the query is worth more than
    one more body occurrence), so each field's term frequency is
    length-normalized WITHIN its field, scaled by the field weight,
    and the weighted frequencies are combined BEFORE the single
    shared k1 saturation:

        tf̃_f(t,d) = tf_f / (1 − b_f + b_f · dl_f/avgdl_f)
        tf̃(t,d)   = Σ_f w_f · tf̃_f
        score(d)  = Σ_t idf(t) · tf̃·(k1+1)/(k1 + tf̃)

    (summing per-field BM25 scores instead — the naive alternative —
    lets a term saturate separately per field, which the paper shows
    breaks the non-linear tf property; this is the canonical
    combine-then-saturate form). idf is document-level: df counts docs
    containing the term in ANY field, same non-negative form as
    :func:`bm25_scores`.

    ``fields`` maps column name → weight w_f; ``b`` is one float or a
    per-field dict. NULL field text scores as empty. Returns
    (id_col, score), min-max normalized like :func:`bm25_scores`.

    Scale shape: per-(doc, field) lengths are ONE map-only pass
    (``stack`` of ``size(tokenize(...))`` — no explode); the token
    explode is one pass over all fields stacked; per-field avgdl is a
    |fields|-row broadcast; df is term-bounded and broadcast. Only
    (id, field, term) count rows shuffle — anchor/title fields are
    tiny next to body, so the explode is ~the body-only cost.
    """
    names = list(fields)
    bmap = {f: (b[f] if isinstance(b, dict) else b) for f in names}
    terms = query_terms(query)
    ids = docs.select(id_col)
    if not terms:
        return ids.select(F.col(id_col), F.lit(0.0).alias("score"))

    def _stack(make):
        parts = []
        for f in names:
            parts.extend([F.lit(f), make(f)])
        return F.stack(F.lit(len(names)), *parts)

    # (id, field, dl) for EVERY doc incl. empty fields — map-only
    dl = docs.select(
        F.col(id_col),
        _stack(lambda f: F.size(tokenize(F.coalesce(F.col(f), F.lit("")))))
        .alias("field", "dl"),
    )
    avgdl = dl.groupBy("field").agg(F.avg("dl").alias("avgdl"))

    tok = docs.select(
        F.col(id_col),
        _stack(lambda f: tokenize(F.coalesce(F.col(f), F.lit(""))))
        .alias("field", "toks"),
    ).select(F.col(id_col), "field", F.explode("toks").alias("term"))
    tf = (
        tok.filter(F.col("term").isin(terms))
        .groupBy(id_col, "field", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n_docs = docs.count()

    b_col = F.create_map(
        *[x for f in names for x in (F.lit(f), F.lit(float(bmap[f])))]
    )[F.col("field")]
    w_col = F.create_map(
        *[x for f in names for x in (F.lit(f), F.lit(float(fields[f])))]
    )[F.col("field")]
    tfw = (
        tf.join(dl, [id_col, "field"])
        .join(F.broadcast(avgdl), "field")
        .withColumn(
            "tfn",
            w_col * F.col("tf")
            / (1 - b_col + b_col * F.col("dl")
               / F.greatest(F.col("avgdl"), F.lit(1e-9))),
        )
        .groupBy(id_col, "term")
        .agg(F.sum("tfn").alias("tfw"))
    )
    scored = (
        tfw.join(F.broadcast(df_), "term")
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5)),
        )
        .withColumn(
            "term_score",
            F.col("idf") * F.col("tfw") * (k1 + 1)
            / (F.col("tfw") + F.lit(float(k1))),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("raw"))
    )
    out = ids.join(scored, id_col, "left").withColumn(
        "raw", F.coalesce(F.col("raw"), F.lit(0.0))
    )
    if not normalize:
        return out.select(F.col(id_col), F.col("raw").alias("score"))
    stats = out.agg(F.min("raw").alias("lo"), F.max("raw").alias("hi"))
    return (
        out.crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.when(
                F.col("hi") > F.col("lo"),
                (F.col("raw") - F.col("lo")) / (F.col("hi") - F.col("lo")),
            ).otherwise(F.lit(0.0)),
        )
        .select(F.col(id_col), "score")
    )
