"""A11 knowledge extraction — Spark shape + deterministic stand-in.

The reference calls an LLM per document and parses the response into a
``DomainKnowledge`` struct (`agents.py:70-297`). The engine's contract
(SURVEY §2.4 A11) is the dataflow shape: a grouped computation per url
producing the §1.1 nested struct; the LLM call itself is out of engine
scope. ``extract_domain_knowledge`` is the deterministic stand-in used
by tests and pipelines without network: concepts = per-doc key topics
(A8) with frequency-normalized importance, insights = leading
sentences, terminology = "<term>: <definition>"-patterned lines.

A production deployment swaps ``_concepts_from_topics`` for an
``applyInPandas`` batch that calls a model endpoint — the output schema
(schema.DOMAIN_KNOWLEDGE) and retry semantics (T4: trim 60/20/20 on
context overflow, `agents.py:136-222`) are already in place via
``textquality.trim_intelligently``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from website_to_agent_spark.operators import textquality as tq


def extract_domain_knowledge(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    max_concepts: int = 10,
    max_insights: int = 5,
    max_tokens: int = 4000,
) -> DataFrame:
    """Per-doc DomainKnowledge struct (deterministic stand-in)."""
    trimmed = docs.select(
        F.col(id_col).alias("source_url"),
        tq.trim_intelligently(F.col(text_col), max_tokens).alias("t"),
    )

    # concepts: per-doc top words (A8 semantics), importance = cnt/max
    toks = trimmed.select(
        "source_url", F.explode(tq.words(F.col("t"))).alias("word")
    ).filter((F.length("word") > 4) & ~F.col("word").isin(tq.STOP_WORDS))
    counts = toks.groupBy("source_url", "word").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source_url").orderBy(F.desc("cnt"), F.asc("word"))
    wmax = Window.partitionBy("source_url")
    concepts = (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn("max_cnt", F.max("cnt").over(wmax))
        .filter(F.col("rank") <= max_concepts)
        .groupBy("source_url")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank").alias("_r"),
                        F.struct(
                            F.col("word").alias("name"),
                            F.format_string(
                                "mentioned %d times", F.col("cnt")
                            ).alias("description"),
                            F.array().cast("array<string>").alias(
                                "related_concepts"
                            ),
                            F.round(
                                F.col("cnt") / F.col("max_cnt"), 6
                            ).alias("importance_score"),
                        ).alias("c"),
                    )
                )
            ).alias("ranked")
        )
        .select(
            "source_url",
            F.transform(F.col("ranked"), lambda s: s["c"]).alias("core_concepts"),
        )
    )

    # insights: the first sentences (confidence decays by position)
    sentences = trimmed.select(
        "source_url",
        F.slice(
            F.filter(
                F.transform(
                    F.split(F.col("t"), "(?<=[.!?])\\s+"), lambda s: F.trim(s)
                ),
                lambda s: F.length(s) > 20,
            ),
            1,
            max_insights,
        ).alias("sents"),
    ).select(
        "source_url",
        F.transform(
            F.col("sents"),
            lambda s, i: F.struct(
                s.alias("content"),
                F.array().cast("array<string>").alias("topics"),
                F.round(F.lit(1.0) - i * 0.1, 2).alias("confidence"),
            ),
        ).alias("key_insights"),
    )

    # terminology: "term: definition" patterned lines
    terms = trimmed.select(
        "source_url",
        F.filter(
            F.transform(
                F.split(F.col("t"), "\n"),
                lambda line: F.struct(
                    F.trim(F.regexp_extract(line, r"^([\w -]{2,40}):\s+(.+)$", 1)).alias("term"),
                    F.trim(F.regexp_extract(line, r"^([\w -]{2,40}):\s+(.+)$", 2)).alias("definition"),
                    F.lit(None).cast("string").alias("context"),
                    F.array().cast("array<string>").alias("examples"),
                ),
            ),
            lambda s: (s["term"] != "") & (s["definition"] != ""),
        ).alias("terminology"),
    )

    return (
        concepts.join(sentences, "source_url", "outer")
        .join(terms, "source_url", "outer")
        .select(
            F.coalesce(F.col("core_concepts"), F.array()).alias("core_concepts"),
            F.coalesce(F.col("terminology"), F.array()).alias("terminology"),
            F.coalesce(F.col("key_insights"), F.array()).alias("key_insights"),
            "source_url",
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias(
                "extraction_timestamp"
            ),
        )
    )
