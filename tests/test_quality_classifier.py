"""Trained quality classifier: logistic regression over hashed
features separates held-out trusted-like text from spam-like text, the
apply path is map-only, and the Pareto keep rule prefers high scores
deterministically."""

import random

from pyspark.sql import functions as F

from website_to_agent_spark import plans
from website_to_agent_spark.operators import quality_classifier as qc

WIKI = ("the river flows through the valley past the old stone bridge "
        "where merchants traded grain and wool for centuries before the "
        "railway arrived in the region").split()
SPAM = ("buy cheap discount pills casino bonus click here winner free "
        "offer limited deal cash prize claim now urgent").split()


def _mk(rng, vocab, n):
    return " ".join(rng.choice(vocab) for _ in range(n))


def test_classifier_separates_heldout(spark):
    rng = random.Random(7)
    pos = spark.createDataFrame(
        [(i, _mk(rng, WIKI, 30)) for i in range(40)],
        "doc_id long, text string")
    neg = spark.createDataFrame(
        [(i, _mk(rng, SPAM, 30)) for i in range(40)],
        "doc_id long, text string")
    w = qc.train_quality_classifier(pos, neg, dim=64, iters=20)
    assert len(w) == 65

    held = spark.createDataFrame(
        [(0, _mk(rng, WIKI, 25)), (1, _mk(rng, WIKI, 25)),
         (2, _mk(rng, SPAM, 25)), (3, _mk(rng, SPAM, 25)),
         (4, " ".join(WIKI[:12] + SPAM[:2]))],   # mostly-wiki mix
        "doc_id long, text string")
    scored = qc.classify_quality(held, w)
    got = {r.doc_id: r.quality_prob for r in scored.collect()}
    assert min(got[0], got[1]) > 0.8
    assert max(got[2], got[3]) < 0.2
    assert got[4] > 0.5
    # apply path is pure column math
    plan = plans.explain_str(scored)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pareto_keep_prefers_high_scores_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, 0.95) for i in range(200)]
        + [(i + 200, 0.05) for i in range(200)],
        "doc_id long, quality_prob double")
    kept = qc.pareto_keep(docs)
    ids = {r.doc_id for r in kept.collect()}
    hi = sum(1 for i in ids if i < 200)
    lo = len(ids) - hi
    assert hi > 100 and lo < 20 and hi > 5 * max(lo, 1)
    again = {r.doc_id for r in
             qc.pareto_keep(docs.repartition(9)).collect()}
    assert again == ids
