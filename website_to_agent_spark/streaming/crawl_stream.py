"""Structured-Streaming twin of the extraction pipeline (SURVEY §2.8).

The crawl loop itself is deliberately a batch superstep driver (crawl
ordering must be reproduced exactly — T1); the streaming surface covers
the continuously-arriving-pages case: a WARC/parquet drop directory is
consumed as a stream, extraction runs incrementally, and windowed
fetch/parse metrics aggregate with a watermark for late pages (T3).

``foreachBatch`` gives exactly-once appends into the same snapshot
catalog the batch engine checkpoints through.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from website_to_agent_spark import schema
from website_to_agent_spark.functions.extract import extract_udf


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(schema.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def extract_stream(pages_stream: DataFrame) -> DataFrame:
    """Incremental extraction: same Arrow kernel as batch, applied per
    micro-batch. Stateless → append mode."""
    return pages_stream.withColumn(
        "ext", extract_udf(F.col("url"), F.col("html"))
    ).select(
        "url",
        "warc_ts",
        F.col("ext.title").alias("title"),
        F.col("ext.text").alias("text"),
        F.col("ext.markdown").alias("markdown"),
        F.size(F.coalesce(F.col("ext.links"), F.array())).alias("n_links"),
        F.length(F.col("ext.text")).alias("text_chars"),
    )


def windowed_metrics(extracted: DataFrame, window: str = "10 minutes",
                     watermark: str = "30 minutes") -> DataFrame:
    """Per-window fetch/parse metrics with late-data watermark (T3/T6)."""
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window))
        .agg(
            F.count("*").alias("parsed"),
            F.sum("text_chars").alias("bytes"),
            F.sum("n_links").alias("links_found"),
        )
    )


def run_to_parquet(extracted: DataFrame, out_dir: str, checkpoint: str,
                   once: bool = True):
    """Exactly-once sink via foreachBatch append."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    writer = (
        extracted.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
