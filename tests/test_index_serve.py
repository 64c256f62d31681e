"""Index serve path: BM25 from persisted postings must equal the
text-scan scorer exactly (same idf form, same normalization)."""

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import bm25, indexing


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")


def test_bm25_from_postings_equals_scan_path(spark, docs):
    rel = indexing.postings_relational(docs)
    norms = indexing.doc_norms(docs)
    q = "data table join fast"
    idx_scores = {r.doc: r.score for r in indexing.bm25_from_postings(
        rel, norms, q).collect()}
    scan_scores = {r.doc_id: r.score for r in bm25.bm25_scores(
        docs, q).collect()}
    assert set(idx_scores) == set(scan_scores)
    for d, s in scan_scores.items():
        assert idx_scores[d] == pytest.approx(s, abs=1e-12), d


def test_bm25_from_postings_empty_query_all_zero(spark, docs):
    rel = indexing.postings_relational(docs)
    norms = indexing.doc_norms(docs)
    out = indexing.bm25_from_postings(rel, norms, "???").collect()
    assert len(out) == docs.count()
    assert all(r.score == 0.0 for r in out)


def test_incremental_index_equals_full_rebuild(spark, docs):
    """Snapshot 1 indexes docs 0..399; snapshot 2 adds 400..499 and
    RE-CRAWLS docs 0..49 with changed text (tombstone + fresh delta).
    The merged incremental view must score identically to an index
    rebuilt from scratch over the final corpus state."""
    d1 = docs.filter(F.col("doc_id") < 400)
    d_new = docs.filter(F.col("doc_id") >= 400)
    d_re = docs.filter(F.col("doc_id") < 50).withColumn(
        "text", F.concat(F.lit("fresh recrawl body "), F.col("text")))

    base = indexing.postings_relational(d1)
    delta = indexing.postings_relational(d_new.unionByName(d_re))

    final_docs = (
        d1.filter(F.col("doc_id") >= 50)
        .unionByName(d_new).unionByName(d_re)
    )
    # LSM delete-then-add semantics: the delta docs (incl. the
    # re-crawled ones) supersede their base rows in ONE call — no
    # explicit tombstone needed for a re-crawl
    live = indexing.merge_index_deltas(base, deltas=delta)

    norms = indexing.doc_norms(final_docs)
    q = "data table join fast"
    inc = {r.doc: r.score for r in indexing.bm25_from_postings(
        live, norms, q).collect()}
    full = {r.doc: r.score for r in indexing.bm25_from_postings(
        indexing.postings_relational(final_docs), norms, q).collect()}
    assert set(inc) == set(full) and len(inc) == 500
    for d in full:
        assert inc[d] == pytest.approx(full[d], abs=1e-12), d


def test_compact_index_folds_and_empties(spark, docs):
    d1 = docs.filter(F.col("doc_id") < 100)
    d2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
    base = indexing.postings_relational(d1)
    delta = indexing.postings_relational(d2)
    tomb = spark.createDataFrame([(5,), (7,)], "doc long")
    compacted = indexing.compact_index(base, delta, tomb)
    rebuilt = indexing.postings_relational(
        d1.filter(~F.col("doc_id").isin(5, 7)).unionByName(d2))
    assert compacted.unionByName(rebuilt).distinct().count() \
        == rebuilt.count() == compacted.count()


def test_phrase_docs_matches_python_mirror(spark):
    import re

    rows = [
        (0, "machine learning at scale with machine learning pipelines"),
        (1, "learning machine basics"),                 # reversed: no
        (2, "machine, learning!"),                      # punct-split: yes
        (3, "machine x learning"),                      # gap: no
        (4, "buffalo buffalo buffalo"),                 # dup-adjacent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rel_pos = indexing.postings_positional(docs)

    def mirror(phrase):
        out = {}
        for d, text in rows:
            toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
            n = sum(
                toks[i:i + len(phrase)] == phrase
                for i in range(len(toks) - len(phrase) + 1))
            if n:
                out[d] = n
        return out

    for phrase in (["machine", "learning"],
                   ["buffalo", "buffalo"],
                   ["learning", "machine"],
                   ["machine"],
                   ["no", "such", "phrase"]):
        got = {r.doc: r.n_matches
               for r in indexing.phrase_docs(rel_pos, phrase).collect()}
        assert got == mirror(phrase), phrase


def test_search_topk_deterministic(spark, docs):
    rel = indexing.postings_relational(docs)
    norms = indexing.doc_norms(docs)
    top = indexing.search(rel, norms, "data table join fast", k=5).collect()
    assert len(top) == 5
    assert top[0].score == 1.0  # min-max normalized winner
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)
    again = indexing.search(rel, norms, "data table join fast", k=5).collect()
    assert [(r.doc, r.score) for r in top] == [(r.doc, r.score) for r in again]
