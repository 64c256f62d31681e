"""J6/P23: snapshot diff — content-change detection across two crawls
(`crawl4ai_examples.py:300-335`): self-join on url across snapshot
reads; changed = hash differs, added/removed via anti-joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_digest(df: DataFrame, url_col: str = "url",
                   content_col: str = "text") -> DataFrame:
    return df.select(
        F.col(url_col).alias("url"),
        F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256).alias("digest"),
        F.length(F.coalesce(F.col(content_col), F.lit(""))).alias("n_chars"),
    )


def snapshot_diff(baseline: DataFrame, current: DataFrame,
                  url_col: str = "url", content_col: str = "text") -> DataFrame:
    """(url, change, baseline_chars, current_chars, delta_chars) with
    change ∈ {added, removed, changed}; unchanged rows are dropped."""
    b = content_digest(baseline, url_col, content_col).alias("b")
    c = content_digest(current, url_col, content_col).alias("c")
    joined = b.join(c, "url", "full")
    return (
        joined.select(
            "url",
            F.when(F.col("b.digest").isNull(), "added")
            .when(F.col("c.digest").isNull(), "removed")
            .when(F.col("b.digest") != F.col("c.digest"), "changed")
            .alias("change"),
            F.col("b.n_chars").alias("baseline_chars"),
            F.col("c.n_chars").alias("current_chars"),
            (
                F.coalesce(F.col("c.n_chars"), F.lit(0))
                - F.coalesce(F.col("b.n_chars"), F.lit(0))
            ).alias("delta_chars"),
        )
        .filter(F.col("change").isNotNull())
    )
