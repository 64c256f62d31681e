"""MaxScore/WAND-family pruned top-k serving
(indexing.search_pruned / term_impacts): identical results to the
full scorer on every edge, with the pruning actually engaging on a
stopword-skewed corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import indexing


def _corpus(spark):
    """120 docs. 'the' is in every doc (stopword); topic words are
    rare and concentrated; doc text lengths vary so norms matter."""
    rows = []
    for i in range(120):
        # 'web' is in EVERY doc (the all-match fallback case);
        # 'the' is in ~92% (high-df stopword, but min-max lo stays 0)
        words = ["web"]
        if i % 13 != 0:
            words += ["the"] * (3 + i % 5)
        if i % 40 == 0:
            words += ["spark"] * 3 + ["scheduler"]
        if i % 15 == 0:
            words += ["spark"]
        if i % 7 == 0:
            words += ["parquet", "files"]
        words += [f"filler{i % 11}"] * (i % 4)
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def served(spark):
    docs = _corpus(spark)
    rel = indexing.postings_relational(docs).localCheckpoint(eager=True)
    norms = indexing.doc_norms(docs).localCheckpoint(eager=True)
    return rel, norms


QUERIES = [
    "spark scheduler",          # rare + rare
    "the spark scheduler",      # stopword + rare (the MaxScore case)
    "spark",                    # single term
    "parquet files the",        # mid-df + stopword
    "scheduler nosuchterm",     # one term absent from the corpus
    "nosuchterm",               # nothing matches
    "",                         # empty query
]


def _rows(df):
    # float sums jitter at the last bit with partition order, so docs
    # with IDENTICAL text can swap ranks between runs in EITHER path;
    # compare on a canonical (rounded score, doc) order instead
    rows = [(r["doc"], round(r["score"], 9)) for r in df.collect()]
    return sorted(rows, key=lambda t: (-t[1], t[0]))


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [1, 10, 200])
def test_pruned_equals_full(spark, served, query, k):
    rel, norms = served
    want = _rows(indexing.search(rel, norms, query, k=k))
    got = _rows(indexing.search_pruned(rel, norms, query, k=k))
    assert got == want


def test_pruned_equals_full_with_stored_impacts(spark, served):
    rel, norms = served
    imp = indexing.term_impacts(rel, norms).localCheckpoint(eager=True)
    for query in QUERIES:
        want = _rows(indexing.search(rel, norms, query, k=10))
        got = _rows(indexing.search_pruned(rel, norms, query, k=10,
                                           impacts=imp))
        assert got == want, query


def test_pruned_equals_full_unnormalized(spark, served):
    rel, norms = served
    full = (
        indexing.bm25_from_postings(rel, norms, "the spark scheduler",
                                    normalize=False)
        .orderBy(F.desc("score"), F.asc("doc")).limit(5)
    )
    got = _rows(indexing.search_pruned(rel, norms, "the spark scheduler",
                                       k=5, normalize=False))
    assert got == _rows(full)


def test_pruning_actually_engages(spark, served):
    rel, norms = served
    stats = {}
    indexing.search_pruned(rel, norms, "the spark scheduler", k=3,
                           stats=stats).collect()
    # ~110 docs match the stopword; θ from the 'scheduler'/'spark'
    # seeds must exclude the stopword-only docs
    assert stats["n_matched"] > 100
    assert stats["theta"] > 0.0
    assert stats["n_survivors"] < stats["n_matched"] / 2


def test_all_docs_match_falls_back_exactly(spark, served):
    rel, norms = served
    # 'web' matches every doc → min-max lo ≠ 0 → full-scorer fallback
    for q in ("web", "web scheduler"):
        want = _rows(indexing.search(rel, norms, q, k=7))
        got = _rows(indexing.search_pruned(rel, norms, q, k=7))
        assert got == want, q


def test_ub_is_a_true_upper_bound(spark, served):
    rel, norms = served
    imp = {r["term"]: r["ub"] for r in
           indexing.term_impacts(rel, norms).collect()}
    st = norms.agg(F.count("*").alias("n"),
                   F.avg("dl").alias("avgdl")).first()
    df_ = rel.groupBy("term").agg(F.count("*").alias("df"))
    per = (
        rel.join(norms, "doc").join(df_, "term")
        .withColumn("_n_docs", F.lit(float(st.n)))
        .withColumn("ts", indexing._term_score(1.5, 0.75,
                                               float(st.avgdl)))
        .select("term", "ts").collect()
    )
    for r in per:
        assert r["ts"] <= imp[r["term"]] + 1e-15
