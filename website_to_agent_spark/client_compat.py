"""Richer-client compat surface (r3 verdict ask #5).

The reference's test driver imports an API its shipped client never
defines — ``CrawlConfig``, ``CrawlMode``, ``quick_crawl`` /
``quick_crawl_async`` (`/root/reference/test_crawl4ai_client.py:16-23`)
— and `CRAWL4AI_CLIENT_README.md` documents that fuller surface
(modes, seeding config, stats, export). SURVEY §5.1 treats the pair
as the spec; this module implements it on the Spark engine:

- ``CrawlMode.SINGLE_PAGE``  → one-page extract (store join + Arrow
  extraction kernel)
- ``CrawlMode.MULTI_PAGE``   → ``CrawlEngine(mode="client")`` BFS
  (the reference's link-following loop, distributed)
- ``CrawlMode.SITEMAP``      → ``sources.seeds.sitemap_seeds`` → page
  extract
- ``CrawlMode.SEEDED``       → ``seeder_pipeline.seed_and_score``
  (sitemap/cc/sitemap+cc discovery + BM25 head scoring + threshold,
  README §"Advanced Seeding") → page extract, relevance-ranked

Everything heavy is a DataFrame plan; rows are collected only at this
UI boundary — the reference client's own contract (its loop holds
every page in a Python list, `crawl4ai_client.py:211-313`), bounded
at max_pages scale. ``CrawlResult`` mirrors the reference dataclass
(`crawl4ai_client.py:33-52`) plus the README's ``links`` / ``media``
/ ``relevance_score`` / ``error_message`` fields.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field, asdict
from enum import Enum
from typing import Any, Dict, List, Optional, Union
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, functions as F

from website_to_agent_spark.functions.extract import (
    extract_udf,
    format_content,
)


class OutputFormat(Enum):
    """`crawl4ai_client.py:25-31`."""

    HTML = "html"
    MARKDOWN = "markdown"
    TEXT = "text"
    JSON = "json"
    STRUCTURED = "structured"


class CrawlMode(Enum):
    """README §"Advanced Crawling Modes" (modes 1-4)."""

    SINGLE_PAGE = "single_page"
    MULTI_PAGE = "multi_page"
    SITEMAP = "sitemap"
    SEEDED = "seeded"


@dataclass
class CrawlConfig:
    """README §"Configuration Reference" — defaults per its table."""

    max_pages: int = 10
    max_depth: int = 2
    timeout: int = 30
    css_selector: Optional[str] = None
    exclude_external_links: bool = False
    same_domain_only: bool = True
    delay_before_return_html: Optional[float] = None
    # official-seeding block (README §"Advanced Seeding Configuration")
    seeding_source: str = "sitemap+cc"
    seeding_query: Optional[str] = None
    seeding_pattern: Optional[str] = None
    seeding_score_threshold: Optional[float] = None
    seeding_live_check: bool = False
    seeding_extract_head: bool = True
    seeding_concurrency: int = 100
    seeding_hits_per_sec: int = 10
    seeding_force: bool = False


@dataclass
class CrawlResult:
    """Reference ``CrawlResult`` (`crawl4ai_client.py:33-52`) + the
    README's extra read paths (links / media / relevance_score /
    error_message / extracted_content)."""

    url: str
    html: str = ""
    markdown: str = ""
    extracted_content: str = ""
    cleaned_html: str = ""
    text: str = ""
    title: str = ""
    description: str = ""
    keywords: List[str] = field(default_factory=list)
    links: List[str] = field(default_factory=list)
    media: List[str] = field(default_factory=list)
    success: bool = True
    status_code: int = 200
    error: str = ""
    relevance_score: Optional[float] = None

    @property
    def error_message(self) -> str:
        """Alias the test driver reads (`test_crawl4ai_client.py:53`)."""
        return self.error


_MEDIA_EXTS = (".jpg", ".jpeg", ".png", ".gif", ".webp", ".mp4", ".mp3",
               ".wav", ".svg", ".avif")


class Crawl4AIClient:
    """The README's client, Spark-backed. ``pages`` is the CC-style
    page store DataFrame (BASELINE.json input_hint); ``pages=None``
    puts SINGLE_PAGE/MULTI_PAGE in live-HTTP mode via the engine's
    fetch source (SITEMAP/SEEDED require a store — their discovery
    reads sitemap/CC documents, which live in the store)."""

    def __init__(self, config: Optional[CrawlConfig] = None, *,
                 spark: Optional[SparkSession] = None,
                 pages: Optional[DataFrame] = None):
        self.config = config or CrawlConfig()
        if spark is None:
            from website_to_agent_spark.session import get_spark

            spark = get_spark(app_name="crawl4ai-compat")
        self.spark = spark
        self.pages = pages
        self._stats: Dict[str, Any] = {
            "total_requests": 0,
            "successful_requests": 0,
            "failed_requests": 0,
            "urls_seeded": 0,
            "official_seeding_available": True,
            "total_processing_time": 0.0,
        }

    # ---- context managers (README uses `async with`; session is
    # caller-owned, so both are no-op passthroughs)
    def __enter__(self) -> "Crawl4AIClient":
        return self

    def __exit__(self, *exc) -> None:
        return None

    async def __aenter__(self) -> "Crawl4AIClient":
        return self

    async def __aexit__(self, *exc) -> None:
        return None

    # ------------------------------------------------------------ crawl
    def crawl(
        self,
        url: str,
        mode: CrawlMode = CrawlMode.SINGLE_PAGE,
        output_format: OutputFormat = OutputFormat.MARKDOWN,
    ) -> Union[CrawlResult, List[CrawlResult]]:
        t0 = time.time()
        if mode == CrawlMode.SINGLE_PAGE:
            out: Union[CrawlResult, List[CrawlResult]] = (
                self._extract_urls([url], output_format)[0]
            )
        elif mode == CrawlMode.MULTI_PAGE:
            out = self._multi_page(url, output_format)
        elif mode == CrawlMode.SITEMAP:
            out = self._sitemap(url, output_format)
        elif mode == CrawlMode.SEEDED:
            out = self._seeded(url, output_format)
        else:  # pragma: no cover - enum is closed
            raise ValueError(f"unknown mode: {mode}")
        results = out if isinstance(out, list) else [out]
        self._stats["total_requests"] += len(results)
        self._stats["successful_requests"] += sum(
            1 for r in results if r.success)
        self._stats["failed_requests"] += sum(
            1 for r in results if not r.success)
        self._stats["total_processing_time"] += time.time() - t0
        return out

    async def crawl_async(
        self,
        url: str,
        mode: CrawlMode = CrawlMode.SINGLE_PAGE,
        output_format: OutputFormat = OutputFormat.MARKDOWN,
    ) -> Union[CrawlResult, List[CrawlResult]]:
        """Async name the README/test use — the plan still executes on
        the cluster; there is nothing to await driver-side."""
        return self.crawl(url, mode, output_format)

    # ----------------------------------------------------------- modes
    def _extract_urls(self, urls: List[str], fmt: OutputFormat,
                      scores: Optional[Dict[str, float]] = None
                      ) -> List[CrawlResult]:
        """Store-join + extraction kernel for an explicit URL list,
        preserving input order. One plan, one collect."""
        spark = self.spark
        df = spark.createDataFrame(
            list(enumerate(urls)), "idx long, url string"
        )
        if self.pages is not None:
            df = df.join(
                self.pages.select("url", "html"), "url", "left"
            )
        else:
            from website_to_agent_spark.sources.httpfetch import http_fetch

            fetched = http_fetch(
                df.select("url"), timeout_s=float(self.config.timeout)
            )
            df = df.join(
                fetched.select(
                    "url",
                    F.when(F.col("success"), F.col("html")).alias("html"),
                ),
                "url", "left",
            )
        df = df.withColumn("ext", extract_udf(F.col("url"), F.col("html")))
        df = df.select(
            "idx", "url",
            F.decode(F.col("html"), "utf-8").alias("raw_html"),
            "ext.*",
            format_content(
                fmt.value, F.col("ext.markdown"), F.col("ext.text"),
                F.col("ext.cleaned_html"), F.col("ext.title"),
                F.col("ext.description"), F.col("ext.keywords"),
            ).alias("formatted"),
            F.col("html").isNotNull().alias("ok"),
        )
        rows = df.orderBy("idx").collect()
        out = []
        for r in rows:
            links = [l.url for l in (r.links or [])]
            out.append(CrawlResult(
                url=r.url,
                html=r.raw_html or "",
                markdown=r.markdown or "",
                extracted_content=(r.formatted if r.ok else "") or "",
                cleaned_html=r.cleaned_html or "",
                text=r.text or "",
                title=r.title or "",
                description=r.description or "",
                keywords=list(r.keywords or []),
                links=links,
                media=[u for u in links
                       if u.lower().endswith(_MEDIA_EXTS)],
                success=bool(r.ok),
                status_code=200 if r.ok else 0,
                error="" if r.ok else "page not reachable",
                relevance_score=(scores or {}).get(r.url),
            ))
        return out

    def _multi_page(self, url: str, fmt: OutputFormat
                    ) -> List[CrawlResult]:
        """The reference's link-following loop (`crawl4ai_client.py:
        219-309`) — run distributed by CrawlEngine, then hydrated to
        CrawlResults in fetch order (failures kept, like the loop)."""
        from website_to_agent_spark.operators.crawl import (
            CrawlEngine,
            CrawlJob,
        )

        engine = CrawlEngine(
            self.spark, self.pages, mode="client",
            output_format=fmt.value,
        )
        res = engine.run([
            CrawlJob("compat", url, max_urls=self.config.max_pages,
                     max_depth=self.config.max_depth)
        ])
        crawled = res.crawled
        if self.pages is not None:
            crawled = crawled.join(
                self.pages.select(
                    "url", F.decode("html", "utf-8").alias("raw_html")
                ),
                "url", "left",
            )
        else:
            crawled = crawled.withColumn(
                "raw_html", F.lit(None).cast("string"))
        rows = crawled.orderBy("fetch_ord").collect()
        res.unpersist()
        return [
            CrawlResult(
                url=r.url,
                html=(r.raw_html if r.success else "") or "",
                markdown=r.markdown or "",
                extracted_content=r.content or "",
                cleaned_html="",
                text=r.text or "",
                title=r.title or "",
                description=r.description or "",
                keywords=list(r.keywords or []),
                success=bool(r.success),
                status_code=200 if r.success else 0,
                error="" if r.success else "page not reachable",
            )
            for r in rows
        ]

    @staticmethod
    def _domain_of(url_or_domain: str) -> str:
        """README: modes accept 'example.com' or a full URL."""
        p = urlparse(url_or_domain)
        return (p.netloc or p.path.split("/")[0]).lower()

    def _require_store(self, mode: str) -> DataFrame:
        if self.pages is None:
            raise ValueError(
                f"CrawlMode.{mode} needs a page store: sitemap/CC "
                "discovery reads sitemap.xml / archive documents, "
                "which live in the pages DataFrame"
            )
        return self.pages

    def _sitemap(self, url: str, fmt: OutputFormat) -> List[CrawlResult]:
        from website_to_agent_spark.sources.seeds import sitemap_seeds

        pages = self._require_store("SITEMAP")
        seeds = sitemap_seeds(pages, self._domain_of(url))
        urls = [
            r.url
            for r in seeds.orderBy("url")
            .limit(self.config.max_pages).collect()
        ]
        return self._extract_urls(urls, fmt)

    def _seeded(self, url: str, fmt: OutputFormat) -> List[CrawlResult]:
        from website_to_agent_spark.operators.seeder_pipeline import (
            seed_and_score,
        )

        pages = self._require_store("SEEDED")
        cfg = self.config
        records = seed_and_score(
            pages,
            self._domain_of(url),
            source=cfg.seeding_source,
            query=cfg.seeding_query,
            extract_head=cfg.seeding_extract_head,
            score_threshold=cfg.seeding_score_threshold,
            max_urls=cfg.max_pages,
        ).collect()
        self._stats["urls_seeded"] += len(records)
        scores = {
            r.url: r.relevance_score
            for r in records
            if r.relevance_score is not None
        }
        return self._extract_urls([r.url for r in records], fmt,
                                  scores=scores)

    # ----------------------------------------------------------- extras
    def get_stats(self) -> Dict[str, Any]:
        """README §"Performance Monitoring" key set."""
        s = dict(self._stats)
        n = s["total_requests"]
        s["success_rate"] = (s["successful_requests"] / n) if n else 0.0
        s["average_processing_time"] = (
            s["total_processing_time"] / n if n else 0.0
        )
        return s

    def export_results(self, results: List[CrawlResult], path: str,
                       format: str = "json") -> None:
        """`test_crawl4ai_client.py:282` — local-file export of a
        result batch (driver-side by contract; the DataFrame-scale
        sink is ``api.export_results``)."""
        dicts = [asdict(r) for r in results]
        if format == "json":
            with open(path, "w", encoding="utf-8") as fh:
                json.dump(dicts, fh, indent=2, ensure_ascii=False)
        elif format == "csv":
            import csv

            cols = ["url", "success", "status_code", "title",
                    "description", "relevance_score", "error"]
            with open(path, "w", encoding="utf-8", newline="") as fh:
                w = csv.DictWriter(fh, fieldnames=cols,
                                   extrasaction="ignore")
                w.writeheader()
                w.writerows(dicts)
        else:
            raise ValueError(f"unsupported export format: {format}")


# ------------------------------------------------------------ helpers
def quick_crawl(url: str,
                output_format: OutputFormat = OutputFormat.MARKDOWN,
                *, spark: Optional[SparkSession] = None,
                pages: Optional[DataFrame] = None,
                config: Optional[CrawlConfig] = None) -> CrawlResult:
    """One-call single-page crawl (`test_crawl4ai_client.py:21`)."""
    client = Crawl4AIClient(config, spark=spark, pages=pages)
    out = client.crawl(url, CrawlMode.SINGLE_PAGE, output_format)
    assert isinstance(out, CrawlResult)
    return out


async def quick_crawl_async(
        url: str,
        output_format: OutputFormat = OutputFormat.MARKDOWN,
        *, spark: Optional[SparkSession] = None,
        pages: Optional[DataFrame] = None,
        config: Optional[CrawlConfig] = None) -> CrawlResult:
    """Async spelling (`test_crawl4ai_client.py:22,43,58`)."""
    return quick_crawl(url, output_format, spark=spark, pages=pages,
                       config=config)


async def seeded_crawl_async(
        domain: str, query: Optional[str] = None, max_pages: int = 10,
        source: str = "sitemap+cc",
        score_threshold: Optional[float] = None,
        *, spark: Optional[SparkSession] = None,
        pages: Optional[DataFrame] = None) -> List[CrawlResult]:
    """README §"Multi-Page Crawling with Seeding"."""
    cfg = CrawlConfig(
        max_pages=max_pages, seeding_source=source, seeding_query=query,
        seeding_score_threshold=score_threshold,
    )
    client = Crawl4AIClient(cfg, spark=spark, pages=pages)
    out = client.crawl(domain, CrawlMode.SEEDED)
    assert isinstance(out, list)
    return out
