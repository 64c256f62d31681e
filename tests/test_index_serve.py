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
