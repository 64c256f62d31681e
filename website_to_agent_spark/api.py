"""Reference-parity API surface (SURVEY §7 step 8).

A user of the reference can call these with the same shapes it returns:

- ``discover_urls(...)``      ≙ `url_seeder.discover_urls`
  (`/root/reference/src/url_seeder.py:253-266`)
- ``extract_website_content(...)`` ≙ `llms_text.extract_website_content`
  (`/root/reference/src/llms_text.py:13-131`) /
  `Crawl4AIClient.extract_website_content` (`crawl4ai_client.py:193`)
- ``get_stats`` ≙ `URLSeeder.get_stats` (`url_seeder.py:239-250`)

The network is the ``pages`` DataFrame (Common-Crawl-style store per
BASELINE.json input_hint); everything else matches the reference's
dict/list contracts.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from website_to_agent_spark.operators.crawl import (
    CrawlEngine,
    CrawlJob,
    combined_llmstxt,
)
from website_to_agent_spark.reference_sim import (
    LOW_CONTENT_PLACEHOLDER,
    llmstxt_header,
)


def discover_urls(
    spark: SparkSession,
    pages: Optional[DataFrame],
    start_url: str,
    max_pages: int = 10,
    max_depth: int = 2,
) -> List[str]:
    """Seeder discovery → list of discovered URLs (set semantics; we
    return discovery order, strictly stronger than the reference's
    hash-ordered set, `url_seeder.py:97`). ``pages=None`` → LIVE mode:
    fetch over HTTP instead of the page-store join."""
    engine = CrawlEngine(spark, pages, mode="seeder")
    result = engine.run(
        [CrawlJob("discover", start_url, max_urls=max_pages, max_depth=max_depth)]
    )
    urls = [r.url for r in result.seen.orderBy("ord").collect()]
    result.unpersist()
    return urls


def seeder_stats(result_tables) -> Dict[str, int]:
    """`get_stats()` shape (`url_seeder.py:239-250`)."""
    discovered = result_tables.seen.count()
    visited = result_tables.crawled.count()
    failed = result_tables.crawled.filter(~F.col("success")).count()
    return {"discovered": discovered, "visited": visited, "failed": failed}


def extract_website_content(
    spark: SparkSession,
    pages: Optional[DataFrame],
    url: str,
    max_urls: int = 5,
    show_full_text: bool = True,
    now: Optional[datetime] = None,
    output_format: str = "markdown",
) -> Dict[str, Any]:
    """Crawl + extract + wrap, returning the reference's extraction
    dict (`llms_text.py:94-102`): llmstxt / llmsfulltxt / processed /
    failed / discovered URLs / timestamp / processing time.
    ``output_format`` selects the P13 `_format_content` branch
    (`crawl4ai_client.py:193-204,352-386`)."""
    import time as _time

    t0 = _time.time()
    now = now or datetime.now(timezone.utc)
    engine = CrawlEngine(spark, pages, mode="client", output_format=output_format)
    result = engine.run([CrawlJob("extract", url, max_urls=max_urls)])

    rows = result.crawled.orderBy("fetch_ord").collect()
    processed = [r.url for r in rows if r.success]
    combined_rows = combined_llmstxt(result.crawled).collect()
    content = combined_rows[0].content if combined_rows else ""
    discovered = [r.url for r in result.seen.collect()]
    result.unpersist()

    if not processed:
        # extraction-failed fallback (`llms_text.py:44-71`)
        fallback = (
            f"# Website Content: {url}\n"
            f"Status: Extraction Failed\n"
            f"Error: No pages could be scraped successfully\n"
            f"Extracted on: {now.strftime('%Y-%m-%d %H:%M:%S')}\n\n---\n\n"
            "Unfortunately, we couldn't extract content from this website."
        )
        return {
            "llmstxt": fallback,
            "llmsfulltxt": fallback,
            "processed_urls": [],
            "failed_urls": [url],
            "discovered_urls": [url],
            "extraction_timestamp": now.isoformat(),
            "total_processing_time": _time.time() - t0,
            "extraction_error": "No pages could be scraped successfully",
        }

    if not content or len(content.strip()) < 10:   # `llms_text.py:77-79`
        content = LOW_CONTENT_PLACEHOLDER

    from urllib.parse import urlparse

    base_domain = urlparse(url).netloc
    header = llmstxt_header(
        url,
        title=processed[0],
        description=f"Content from {len(processed)} pages on {base_domain}",
        extracted_on=now.strftime("%Y-%m-%d %H:%M:%S"),
    )
    formatted = header + content
    return {
        "llmstxt": formatted,
        "llmsfulltxt": formatted,
        "processed_urls": processed,
        "failed_urls": [r.url for r in rows if not r.success],
        "discovered_urls": discovered,
        "extraction_timestamp": now.isoformat(),
        "total_processing_time": _time.time() - t0,
    }


def export_results(df: DataFrame, path: str, format: str = "json") -> None:
    """S6 JSON export sink (`test_crawl4ai_client.py:280-295`)."""
    writer = df.coalesce(1).write.mode("overwrite")
    if format == "json":
        writer.json(path)
    elif format == "parquet":
        writer.parquet(path)
    elif format == "csv":
        writer.option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported export format: {format}")
