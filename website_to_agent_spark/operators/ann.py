"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side higher-
  order functions, no Python).
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path: only
  vectors sharing a bucket (or probing bucket) are compared, so the
  candidate set is ~n/2^bits per query instead of n.

Scale design: queries are broadcast (small side); the corpus scan is
one pass; per-query top-k is a window over the (query, candidate)
pairs, partitioned by query — no global sort.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double"))
    )


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus scan.
    Returns (q_id, vec_id, cos_sim, rank)."""
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_bits: int = 0, seed: int = 42,
                        dim: Optional[int] = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup).

    ``n_bits=0`` → exact all-pairs (the correctness baseline; candidate
    join on a trivial key). ``n_bits>0`` → random-hyperplane bucketing
    first, so only same-bucket pairs are compared (the scale path —
    high-cosine pairs land in the same bucket with prob (1−θ/π)^bits).
    Returns (doc_a, doc_b, cos_sim) with doc_a < doc_b."""
    if n_bits > 0:
        assert dim is not None
        planes = _hyperplanes(dim, n_bits, seed)
        c = corpus.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    else:
        c = corpus.withColumn("bucket", F.lit(0))
    a = c.select(F.col(id_col).alias("doc_a"),
                 F.col(vec_col).alias("va"), "bucket")
    b = c.select(F.col(id_col).alias("doc_b"),
                 F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", "cos_sim")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other scale path.

    Centroids are a deterministic sample of the corpus (first
    ``n_centroids`` by id — at scale: a k-means fit persisted next to
    the index). Every vector is assigned to its nearest centroid (one
    corpus pass, pure column math); a query probes only the
    ``n_probe`` nearest centroid lists. The corpus would be written
    partitioned by ``centroid`` so a probe is a partition-pruned scan."""
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col).limit(n_centroids).collect()
    ]

    def nearest(vec, n: int) -> F.Column:
        sims = F.array(*[
            F.struct(
                cosine(vec, F.array(*[F.lit(x) for x in cvec])).alias("s"),
                F.lit(i).alias("c"),
            )
            for i, (_cid, cvec) in enumerate(cents)
        ])
        top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
        return F.transform(top, lambda s: s["c"])

    c = corpus.withColumn(
        "centroid", nearest(F.col(vec_col), 1)[0]
    )
    q = queries.withColumn(
        "centroid", F.explode(nearest(F.col(q_vec_col), n_probe))
    )
    joined = c.join(F.broadcast(q), "centroid")
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
    ).dropDuplicates([q_id_col, id_col])
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (no numpy on executors —
    generated on the driver, shipped as literals)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def lsh_bucket(vec_col, planes) -> F.Column:
    """Sign-of-projection bucket id: bit i = 1 iff vec·plane_i > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_bits: int = 8, probe_hamming: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             seed: int = 42) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by random-hyperplane
    signature; compare a query only against buckets within
    ``probe_hamming`` bit-flips (multi-probe). Recall/efficiency knob =
    (n_bits, probe_hamming)."""
    planes = _hyperplanes(dim, n_bits, seed)
    c = corpus.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q = queries.withColumn("q_bucket", lsh_bucket(F.col(q_vec_col), planes))

    # probe buckets: the query bucket + every bucket ≤ probe_hamming away
    probes = [0]
    if probe_hamming >= 1:
        probes += [1 << i for i in range(n_bits)]
    q = q.withColumn(
        "bucket",
        F.explode(
            F.array(*[F.col("q_bucket").bitwiseXOR(F.lit(m).cast("long"))
                      for m in probes])
        ),
    )
    joined = c.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos_sim"),
    ).dropDuplicates([q_id_col, id_col])
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
