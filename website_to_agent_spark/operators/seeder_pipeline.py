"""EP3: the linear seeder/scoring pipeline (SURVEY §3 EP3) —

    seeds → semijoin pages → head extraction → BM25 → threshold →
    sort desc → cap → stats

one Catalyst-planned query, no loop (`test_url_seeder.py:32-57` config
surface: source, extract_head, query, score_threshold, max_urls).
Returns SEEDER_RECORD-shaped rows: url, status, relevance_score,
head_data (None score when extract_head=False or query is None —
`test_url_seeder.py:237-252`; all-zero scores on empty query —
`:221-235`).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from website_to_agent_spark.functions.extract import head_udf
from website_to_agent_spark.operators import bm25
from website_to_agent_spark.sources import seeds as seed_sources


def seed_and_score(
    pages: DataFrame,
    domain: str,
    source: str = "cc",
    query: Optional[str] = None,
    extract_head: bool = True,
    score_threshold: Optional[float] = None,
    max_urls: Optional[int] = None,
) -> DataFrame:
    """Returns (url, status, relevance_score, head_data) sorted by
    score desc when scored (O1), capped at max_urls (O2)."""
    if source == "cc":
        seeds = seed_sources.cc_seeds(pages, domain)
    elif source == "sitemap":
        seeds = seed_sources.sitemap_seeds(pages, domain)
    elif source in ("cc+sitemap", "sitemap+cc"):
        seeds = seed_sources.combined_seeds(
            seed_sources.cc_seeds(pages, domain),
            seed_sources.sitemap_seeds(pages, domain),
        )
    else:
        raise ValueError(f"invalid source: {source}")  # `test_async_url_seeder.py:403-437`

    rows = seeds.join(
        pages.select("url", "html"), "url", "left"
    ).withColumn(
        "status", F.when(F.col("html").isNotNull(), "valid").otherwise("missing")
    )

    if extract_head:
        rows = rows.withColumn(
            "head_data",
            F.when(F.col("html").isNotNull(), head_udf(F.col("html"))),
        )
        if query is not None:
            # score over the head text: title + meta values + jsonld
            # (rank-bm25 over head metadata, `test_url_seeder.py:29-57`)
            head_text = F.concat_ws(
                " ",
                F.col("head_data.title"),
                F.concat_ws(" ", F.map_values(
                    F.coalesce(F.col("head_data.meta"),
                               F.create_map().cast("map<string,string>")))),
                F.concat_ws(" ", F.coalesce(F.col("head_data.jsonld"),
                                            F.array().cast("array<string>"))),
            )
            scored_input = rows.select("url", head_text.alias("head_text"))
            scores = bm25.bm25_scores(
                scored_input, query, id_col="url", text_col="head_text"
            ).withColumnRenamed("score", "relevance_score")
            rows = rows.join(scores, "url", "left")
        else:
            rows = rows.withColumn(
                "relevance_score", F.lit(None).cast("double")
            )
    else:
        rows = rows.withColumn("head_data", F.lit(None).cast(
            "struct<title:string,charset:string,lang:string,"
            "meta:map<string,string>,jsonld:array<string>>"
        )).withColumn("relevance_score", F.lit(None).cast("double"))

    out = rows.select("url", "status", "relevance_score", "head_data")
    if score_threshold is not None:
        out = out.filter(F.col("relevance_score") >= score_threshold)  # F12
    if query is not None and extract_head:
        out = out.orderBy(F.desc("relevance_score"), F.asc("url"))     # O1
    if max_urls is not None:
        out = out.limit(max_urls)                                      # O2
    return out


def score_report(records: DataFrame) -> DataFrame:
    """A7 score-distribution report (`test_url_seeder.py:333-340,
    594-654`): min/max/avg relevance + counts."""
    return records.agg(
        F.count("*").alias("n_urls"),
        F.sum((F.col("status") == "valid").cast("long")).alias("n_valid"),
        F.round(F.min("relevance_score"), 6).alias("min_score"),
        F.round(F.max("relevance_score"), 6).alias("max_score"),
        F.round(F.avg("relevance_score"), 6).alias("avg_score"),
    )
