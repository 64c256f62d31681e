"""Mergeable sketches for incremental corpus statistics at 100 TB.

The reference reports exact, single-box aggregate stats over each run
(`/root/reference/url_seeder.py` score/count summaries and the client
result counters in `/root/reference/crawl4ai_client.py`). Exact
distincts and exact heavy-hitter counts stop being re-computable at
100 TB: counting distinct urls across a year of crawl snapshots means
re-reading every snapshot. The standard industrial answer is a sketch
layer — tiny, MERGEABLE summaries built per shard/epoch so the global
statistic is a union of summaries, never a re-scan:

- **HLL (Datasketches HllSketch)** — distinct counting. Build one
  sketch per (group, column) with Spark's JVM-side ``hll_sketch_agg``;
  union prior-epoch sketches with the new delta's
  (``hll_union_agg``) — the prior corpus is never re-read.
- **Theta sketches** — distinct counting WITH set algebra: union,
  intersection, difference. "How many urls did snapshot B add / drop
  vs snapshot A" from two kilobyte-scale blobs instead of a
  snapshot×snapshot join.
- **Count–min (Cormode & Muthukrishnan '05)** — approximate
  frequencies / heavy hitters under a fixed memory bound. Implemented
  natively as a (seed, bucket, cnt) DataFrame rather than an opaque
  binary so it stays engine-portable: merging is ``union + groupBy
  sum``, point queries are a broadcast join, and with the md5 hash
  family every cell is byte-reproducible in DuckDB (the oracle
  mirrors the whole sketch). The xxhash64 family is the scale path
  (one 64-bit hash per cell vs md5's 128-bit hex round-trip).

Scale shape: every builder is ONE map-side-combined aggregation whose
output is bounded by the sketch size (``depth×width`` cells for CMS,
~``2^lgk`` registers for HLL/theta) per group, not by the data; all
hashing/argmin math stays in whole-stage codegen (zero Python UDFs).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "hll_sketches", "hll_rollup",
    "theta_sketches", "theta_overlap",
    "cms_table", "cms_merge", "cms_lookup",
    "heavy_hitters",
]


# --------------------------------------------------------------- HLL

def hll_sketches(df: DataFrame, cols: Sequence[str],
                 group_cols: Sequence[str] = (),
                 lgk: int = 12) -> DataFrame:
    """One Datasketches HLL sketch per ``cols`` entry per group:
    ``(group…, {c}_hll binary, n_rows)``. Build once per shard /
    snapshot / epoch and keep the rows — every later question about
    distincts is a union of these (``hll_rollup``), never a re-read.

    ``lgk`` trades size for error (2^lgk registers; rel. std. error
    ≈ 1.04/√2^lgk — ~1.6% at the default 12). One map-side-combined
    aggregation; output is ``n_groups`` rows of kilobyte blobs.
    """
    aggs = [
        F.hll_sketch_agg(F.col(c), F.lit(lgk)).alias(f"{c}_hll")
        for c in cols
    ] + [F.count(F.lit(1)).alias("n_rows")]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def hll_rollup(sk: DataFrame, cols: Sequence[str],
               group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge HLL sketch rows down to ``group_cols`` (empty = global):
    ``(group…, {c}_hll, {c}_distinct, n_rows)``. The merged sketch
    column is kept so the output is ITSELF mergeable — roll daily
    sketches into monthly, monthly into the corpus total, and union
    next epoch's delta into that, all without touching the data.
    """
    aggs = []
    for c in cols:
        aggs.append(
            F.hll_union_agg(F.col(f"{c}_hll"), F.lit(True))
            .alias(f"{c}_hll"))
    aggs.append(F.sum("n_rows").alias("n_rows"))
    out = (sk.groupBy(*group_cols).agg(*aggs)
           if group_cols else sk.agg(*aggs))
    for c in cols:
        out = out.withColumn(
            f"{c}_distinct",
            F.round(F.hll_sketch_estimate(F.col(f"{c}_hll")))
            .cast("long"),
        )
    return out


# ------------------------------------------------------------- theta

def theta_sketches(df: DataFrame, cols: Sequence[str],
                   group_cols: Sequence[str] = ()) -> DataFrame:
    """Theta sketches per column per group: ``(group…, {c}_theta)``.
    Same build discipline as :func:`hll_sketches`; use these when the
    question involves SET ALGEBRA between snapshots, not just a
    count (theta supports intersection/difference, HLL only union)."""
    aggs = [
        F.theta_sketch_agg(F.col(c)).alias(f"{c}_theta") for c in cols
    ] + [F.count(F.lit(1)).alias("n_rows")]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def theta_overlap(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """Set algebra between two single-row theta-sketch frames (the
    ``group_cols=()`` output of :func:`theta_sketches` for the same
    column): one row of distinct-count estimates

    ``(n_a, n_b, n_union, n_intersection, n_only_a, n_only_b)``

    e.g. url churn between two crawl snapshots — which is otherwise a
    full snapshot×snapshot anti-join — from two kilobyte blobs.
    Driver-side cost: a cross join of two 1-row frames.
    """
    c = f"{col}_theta"
    a1 = a.select(F.col(c).alias("_ta"))
    b1 = b.select(F.col(c).alias("_tb"))
    est = F.theta_sketch_estimate
    return a1.crossJoin(b1).select(
        F.round(est(F.col("_ta"))).cast("long").alias("n_a"),
        F.round(est(F.col("_tb"))).cast("long").alias("n_b"),
        F.round(est(F.theta_union(F.col("_ta"), F.col("_tb"))))
        .cast("long").alias("n_union"),
        F.round(est(F.theta_intersection(F.col("_ta"), F.col("_tb"))))
        .cast("long").alias("n_intersection"),
        F.round(est(F.theta_difference(F.col("_ta"), F.col("_tb"))))
        .cast("long").alias("n_only_a"),
        F.round(est(F.theta_difference(F.col("_tb"), F.col("_ta"))))
        .cast("long").alias("n_only_b"),
    )


# --------------------------------------------------------- count–min

def _cms_bucket(col: F.Column, seed: F.Column, width: int,
                hash_impl: str) -> F.Column:
    """Row of the CMS hash family: bucket index for (item, seed).

    ``xxhash64`` — the scale path: one JVM 64-bit hash per cell.
    ``md5`` — the oracle path: first 15 hex chars of
    md5(item ‖ ':' ‖ seed) as a 60-bit integer, mod width —
    byte-reproducible in DuckDB (``('0x' || substr(md5(…),1,15))
    ::BIGINT % width``), the package's standard cross-engine formula
    (sampling._u60). Both stay in whole-stage codegen.
    """
    if hash_impl == "xxhash64":
        return F.pmod(F.xxhash64(col, seed), F.lit(width))
    assert hash_impl == "md5", hash_impl
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(":"),
                           seed.cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return F.pmod(h60, F.lit(width))


def cms_table(df: DataFrame, col: str, depth: int = 4,
              width: int = 1024, group_cols: Sequence[str] = (),
              hash_impl: str = "xxhash64") -> DataFrame:
    """Count–min sketch of ``col``'s frequencies as a slim table:
    ``(group…, seed, bucket, cnt)`` — ≤ ``depth×width`` rows per
    group regardless of data size. Estimates over-count, never
    under-count; error ≤ (e/width)·N with prob. 1−e^−depth.

    Kept relational instead of an opaque binary on purpose: merging
    epochs is ``union + groupBy sum`` (:func:`cms_merge`), point
    queries are a broadcast join (:func:`cms_lookup`), and the md5
    family makes every cell DuckDB-mirrorable. One explode(depth) +
    one map-side-combined groupBy; the pre-shuffle row multiplication
    collapses to ≤ depth×width rows per task before the exchange.
    """
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    rows = df.select(*group_cols, F.col(col).alias("_it"), seeds)
    return (
        rows.select(
            *group_cols, "seed",
            _cms_bucket(F.col("_it"), F.col("seed"), width,
                        hash_impl).alias("bucket"),
        )
        .groupBy(*group_cols, "seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Merge CMS tables built with the SAME (depth, width, hash_impl,
    group_cols): cell-wise sum. This is the incremental-epoch path —
    yesterday's sketch + today's delta sketch, no re-read."""
    assert tables, "cms_merge: need at least one table"
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_lookup(cms: DataFrame, probes: DataFrame, col: str,
               depth: int = 4, width: int = 1024,
               hash_impl: str = "xxhash64",
               est_col: str = "est") -> DataFrame:
    """Point-query the sketch for each distinct ``probes[col]`` value:
    ``(col, est)`` with ``est = min over depth cells`` (absent cell =
    0). The sketch side is ≤ depth×width rows — broadcast, so the
    probe side never shuffles. Takes a GLOBAL (ungrouped) sketch;
    for a grouped sketch, filter to one group first — joining on
    (seed, bucket) alone would silently sum across groups."""
    extra = set(cms.columns) - {"seed", "bucket", "cnt"}
    assert not extra, (
        f"cms_lookup: grouped sketch (extra columns {sorted(extra)}) — "
        "filter to one group before querying")
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    keyed = (
        probes.select(F.col(col)).distinct()
        .select(col, seeds)
        .select(
            col, "seed",
            _cms_bucket(F.col(col), F.col("seed"), width,
                        hash_impl).alias("bucket"),
        )
    )
    return (
        keyed.join(F.broadcast(cms), ["seed", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
             .alias(est_col))
    )


def heavy_hitters(df: DataFrame, col: str, min_frac: float,
                  cms: Optional[DataFrame] = None,
                  depth: int = 4, width: int = 1024,
                  hash_impl: str = "xxhash64") -> DataFrame:
    """Items of ``col`` occurring in ≥ ``min_frac`` of rows:
    ``(col, cnt, frac[, est])``. Exact counts via one map-side-
    combined groupBy (the heavy key IS the grouping key, so partial
    aggregation absorbs the skew) + a 1-row broadcast total; when a
    ``cms`` table for the same column is supplied, each hitter also
    carries the sketch's over-estimate ``est`` (≥ cnt, for auditing
    the deployed sketch's error on exactly the keys that matter)."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    tot = df.agg(F.count(F.lit(1)).alias("_n"))
    out = (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") >= F.col("_n") * F.lit(min_frac))
        .select(col, "cnt",
                (F.col("cnt") / F.col("_n")).alias("frac"))
    )
    if cms is not None:
        est = cms_lookup(cms, out.select(col), col, depth=depth,
                         width=width, hash_impl=hash_impl)
        out = out.join(est, col)
    return out
