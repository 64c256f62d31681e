"""Trained quality classifier — the GPT-3/LLaMA-style "does this look
like the trusted corpus?" filter (GPT-3 trained logistic regression on
hashed features of WebText-vs-CommonCrawl; LLaMA used a fastText
linear classifier the same way). Beyond-reference capability (task
brief: first-class LLM-training-data operators).

In-engine logistic regression over the hashing-trick features
(`ann.hash_embed`): every gradient step is ONE map + one dim-keyed
aggregation (posexplode → groupBy(idx).avg — the same scale-safe shape
as `ann.kmeans_refine`'s mean step), with the current weight vector
entering each step's plan as literals (dim-bounded). No pyspark.ml, no
UDFs, no driver-side data loops — the driver only collects the
dim-sized gradient per step.

Scale notes: the training set shuffles only (idx, err·x_j) pairs —
never text; map-side partial aggregation collapses each task to dim
rows before the exchange. The classifier itself is map-only at apply
time (weights enter the plan as a dim-sized literal array). Weight
sums accumulate in float across an unordered shuffle, so trained
weights are deterministic only up to float-summation order — tests
assert separation margins, not bit-equality (unlike the md5-keyed
selection operators, which are exact by construction).
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

from website_to_agent_spark.operators.ann import hash_embed


def _dot_lit(x, w: List[float]) -> F.Column:
    wl = F.array(*[F.lit(float(v)) for v in w])
    return F.aggregate(
        F.zip_with(x, wl, lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def train_quality_classifier(pos: DataFrame, neg: DataFrame,
                             text_col: str = "text", dim: int = 256,
                             iters: int = 30, lr: float = 2.0,
                             l2: float = 0.0,
                             hash_fn: str = "xxhash64") -> List[float]:
    """Fit w for P(quality | x) = sigmoid(w·x + b) by full-batch
    gradient ascent on the log-likelihood; x = `hash_embed` features
    (unit-norm hashed token counts). Returns [w_0..w_{dim-1}, b].

    ``pos`` is the trusted corpus (Wikipedia-like), ``neg`` the raw
    pool (the GPT-3 recipe: positives vs unfiltered crawl). Each step
    runs one Spark job: errors are computed map-side against the
    current literal weights, the gradient is a dim-keyed avg.
    """
    feats = (
        pos.select(F.lit(1.0).alias("y"),
                   hash_embed(F.col(text_col), dim, hash_fn).alias("x"))
        .unionByName(
            neg.select(F.lit(0.0).alias("y"),
                       hash_embed(F.col(text_col), dim, hash_fn).alias("x")))
        .localCheckpoint(eager=True)   # featurize once, not per step
    )
    w = [0.0] * dim
    b = 0.0
    try:
        for _ in range(iters):
            z = _dot_lit(F.col("x"), w) + F.lit(b)
            err = F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            grad = (
                feats.select(err.alias("e"), F.posexplode("x").alias("j", "v"))
                .groupBy("j")
                .agg(F.avg(F.col("e") * F.col("v")).alias("g"))
                .collect()
            )
            gb = feats.select(F.avg(err).alias("g")).first().g
            gmap = {r.j: r.g for r in grad}
            w = [wi + lr * (gmap.get(j, 0.0) - l2 * wi)
                 for j, wi in enumerate(w)]
            b += lr * gb
    finally:
        # the feature table is a training-scope artifact — release its
        # checkpoint blocks (the repo-wide loop discipline) instead of
        # waiting for driver GC
        from website_to_agent_spark.operators.crawl import _release_checkpoint

        _release_checkpoint(feats)
    return w + [b]


def classify_quality(docs: DataFrame, weights: List[float],
                     text_col: str = "text",
                     score_col: str = "quality_prob",
                     hash_fn: str = "xxhash64") -> DataFrame:
    """Append sigmoid(w·hash_embed(text) + b) — map-only, weights are
    a dim-sized plan literal; pair with a threshold filter or the
    GPT-3 Pareto-resampling trick downstream."""
    dim = len(weights) - 1
    x = hash_embed(F.col(text_col), dim, hash_fn)
    z = _dot_lit(x, weights[:dim]) + F.lit(float(weights[dim]))
    return docs.withColumn(
        score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    )


def pareto_keep(docs: DataFrame, score_col: str = "quality_prob",
                key_col: str = "doc_id", alpha: float = 9.0,
                salt: str = "pareto-v1") -> DataFrame:
    """GPT-3's stochastic quality keep rule: a document is kept iff
    u < exp(-alpha·(1 - score)) (their np.random.pareto acceptance,
    re-expressed with the repo's deterministic md5-uniform so retries
    and engines agree). Map-only."""
    from website_to_agent_spark.operators.sampling import _u60

    u = _u60(F.col(key_col), salt)
    return docs.filter(
        u < F.exp(-F.lit(float(alpha)) * (F.lit(1.0) - F.col(score_col)))
    )
