"""Single-threaded reference-semantics simulator — the oracle.

Re-implements, step for step, the two crawl loops of the reference:

- ``client_crawl``  = `Crawl4AIClient.extract_website_content`
  (`/root/reference/src/crawl4ai_client.py:193-340`): sequential FIFO
  queue, exact-host filter, success-budget ``max_urls``, banner-joined
  combined document.
- ``seeder_discover`` = `URLSeeder.seed_urls`
  (`/root/reference/src/url_seeder.py:34-97`): batched BFS with depth
  cap, discovered-set budget, 5-gate URL validity filter.

The network is replaced by an in-memory ``pages`` store (the sandbox
analogue of the Common-Crawl-style Iceberg ``pages`` table per
BASELINE.json ``input_hint``). Extraction goes through the same shared
kernel (`website_to_agent_spark.extraction`) the Spark UDFs use, so a
byte-for-byte comparison between this simulator and the distributed
engine checks ordering/dedup/budget dataflow — the part re-expressed in
Spark — against the reference's sequential semantics.

NOTE on ordering: the reference seeder returns
``list(self.discovered_urls)[:max_pages]`` from a Python *set*
(`url_seeder.py:97`) whose iteration order is hash-randomized across
processes; the reproducible invariants are the discovered/visited/
failed SETS and their sizes. The client's ``scraped_urls`` list IS
deterministic (FIFO), and we reproduce it exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse

from website_to_agent_spark import extraction


@dataclass
class StoredPage:
    """One row of the ``pages`` store (html as str; the Spark table
    holds it as binary utf-8 per BASELINE.json input_hint)."""

    html: str
    status: int = 200
    content_type: str = "text/html; charset=utf-8"


@dataclass
class ClientCrawlRecord:
    url: str
    ord: int            # fetch order (0-based pop order over fetched URLs)
    success: bool
    title: str = ""
    description: str = ""
    keywords: List[str] = field(default_factory=list)
    text: str = ""
    markdown: str = ""
    content: str = ""   # _format_content output (markdown fallback chain)


def _format_content_markdown(rec: dict) -> str:
    """`Crawl4AIClient._format_content` for OutputFormat.MARKDOWN
    (`crawl4ai_client.py:352-367`): first non-blank of markdown,
    extracted_content, cleaned_html, html, text — stripped."""
    for attr in ("markdown", "text", "cleaned_html", "cleaned_html", "text"):
        # reference order: markdown, extracted_content, cleaned_html,
        # html, text; in our kernel extracted_content == text and
        # html == cleaned_html (str(main_content) both times,
        # `crawl4ai_client.py:130-134`).
        content = rec.get(attr)
        if content and content.strip():
            return content.strip()
    return ""


def format_content_sim(rec: dict, fmt: str = "markdown") -> str:
    """Faithful Python mirror of the FULL `_format_content` dispatch
    (`crawl4ai_client.py:352-386`), all five OutputFormat branches.
    In our kernel extracted_content == text and html == cleaned_html
    (str(main_content) both times, `crawl4ai_client.py:130-134`)."""
    import json as _json

    fmt = fmt.lower()
    text = rec.get("text") or ""
    md = rec.get("markdown") or ""
    ch = rec.get("cleaned_html") or ""
    if fmt == "markdown":
        return _format_content_markdown(rec)
    if fmt == "html":
        return ch or ch or ""                  # html or cleaned_html
    if fmt == "text":
        return text or text or ""              # text or extracted_content
    if fmt == "json":
        return _json.dumps(
            {
                "title": rec.get("title"),
                "content": text or text,       # text or extracted_content
                "description": rec.get("description"),
                "keywords": rec.get("keywords"),
            },
            indent=2,
        )
    if fmt == "structured":
        return md or text or text or ""
    return text or text or ""                  # unknown format fallback


def client_crawl(
    pages: Dict[str, StoredPage],
    seed_url: str,
    max_urls: int = 5,
) -> dict:
    """Sequential replica of `extract_website_content`
    (`crawl4ai_client.py:206-340`), OutputFormat.MARKDOWN."""
    scraped_urls: List[str] = []
    all_content: List[str] = []
    records: List[ClientCrawlRecord] = []
    base_domain = urlparse(seed_url).netloc
    urls_to_scrape: List[str] = [seed_url]
    scraped_set: set = set()
    ord_counter = 0

    while urls_to_scrape and len(scraped_urls) < max_urls:
        current_url = urls_to_scrape.pop(0)
        if current_url in scraped_set:           # `:226-228`
            continue

        page = pages.get(current_url)
        scraped_set.add(current_url)             # `:232`
        if page is None or page.status != 200:   # fetch error (`:74-75,142-149`)
            records.append(
                ClientCrawlRecord(url=current_url, ord=ord_counter, success=False)
            )
            ord_counter += 1
            continue

        rec = extraction.extract_page(page.html, current_url)
        ord_counter_this = ord_counter
        ord_counter += 1
        scraped_urls.append(current_url)
        content = _format_content_markdown(rec)
        all_content.append(
            f"\n\n=== CONTENT FROM: {current_url} ===\n\n{content}"  # `:237`
        )
        records.append(
            ClientCrawlRecord(
                url=current_url,
                ord=ord_counter_this,
                success=True,
                title=rec["title"],
                description=rec["description"],
                keywords=rec["keywords"],
                text=rec["text"],
                markdown=rec["markdown"],
                content=content,
            )
        )

        # Link discovery (`:241-303`) — only while budget remains.
        if len(scraped_urls) < max_urls:
            for full_url, _pos in rec["links"]:
                if urlparse(full_url).netloc != base_domain:      # `:268`
                    continue
                if full_url in scraped_set:                        # `:271`
                    continue
                if full_url in urls_to_scrape:                     # `:274`
                    continue
                if full_url.endswith(extraction.CLIENT_SKIP_EXTENSIONS):  # `:277`
                    continue
                urls_to_scrape.append(full_url)                    # `:282`

    combined_content = "\n".join(all_content)                      # `:312`
    return {
        "success": bool(scraped_urls),
        "content": combined_content,
        "urls_scraped": scraped_urls,
        "total_content_length": len(combined_content),
        "pages_scraped": len(scraped_urls),
        "records": records,
        "seen": scraped_set,
        "base_domain": base_domain,
    }


def llmstxt_header(url: str, title: str, description: str,
                   extracted_on: str = "1970-01-01 00:00:00") -> str:
    """Deterministic part of the llms_text wrapper
    (`/root/reference/src/llms_text.py:82-87`); the timestamp is
    injected so tests can pin it."""
    header = f"# Website Content: {url}\n"
    header += f"Title: {title}\n"
    header += f"Description: {description}\n"
    header += f"Extracted on: {extracted_on}\n"
    header += "Total pages processed: 1\n\n---\n\n"
    return header


LOW_CONTENT_PLACEHOLDER = (
    "Limited content was extracted from this website. This might be a "
    "dynamic site that requires JavaScript to load its content."
)  # `llms_text.py:79`


def wrap_llmstxt(crawl_result: dict, url: str,
                 extracted_on: str = "1970-01-01 00:00:00") -> str:
    """`extract_website_content` wrapper, `llms_text.py:74-87`."""
    content = crawl_result["content"]
    if not content or len(content.strip()) < 10:     # `:77`
        content = LOW_CONTENT_PLACEHOLDER
    title = crawl_result["urls_scraped"][0] if crawl_result["urls_scraped"] else url
    description = (
        f"Content from {crawl_result['pages_scraped']} pages on "
        f"{crawl_result['base_domain']}"
    )  # `crawl4ai_client.py:337-338`
    return llmstxt_header(url, title, description, extracted_on) + content


@dataclass
class SeederResult:
    discovered: List[str]   # insertion order (reference: unordered set)
    visited: set
    failed: set

    @property
    def stats(self) -> dict:
        return {
            "discovered": len(self.discovered),
            "visited": len(self.visited),
            "failed": len(self.failed),
        }


def seeder_discover(
    pages: Dict[str, StoredPage],
    start_url: str,
    max_pages: int = 10,
    max_depth: int = 2,
) -> SeederResult:
    """Replica of `URLSeeder.seed_urls` (`url_seeder.py:34-97`) with the
    batched event loop flattened to sequential order (asyncio.gather
    preserves task-submission order, so discovery order is identical)."""
    base_domain = urlparse(start_url).netloc.lower()     # `:223-237`
    discovered: dict = {start_url: None}                 # ordered set
    visited: set = set()
    failed: set = set()
    urls_to_process: List[Tuple[str, int]] = [(start_url, 0)]

    while urls_to_process and len(discovered) < max_pages:   # `:61`
        batch_size = min(5, len(urls_to_process))             # `:63`
        current_batch = urls_to_process[:batch_size]
        urls_to_process = urls_to_process[batch_size:]

        batch_results: List[List[Tuple[str, int]]] = []
        for url, depth in current_batch:
            if url in visited or depth > max_depth:           # `:70`
                continue
            # _process_url (`:99-141`)
            visited.add(url)
            page = pages.get(url)
            if page is None or page.status != 200:
                failed.add(url)
                batch_results.append([])
                continue
            if "text/html" not in page.content_type.lower():  # `:126-129`
                batch_results.append([])
                continue
            links = extraction.seeder_links(page.html, url)
            new = [
                (u, depth + 1)
                for u, _pos in links
                if extraction.seeder_is_valid_url(u, base_domain)
            ]
            batch_results.append(new)

        for result in batch_results:                          # `:79-85`
            for new_url, new_depth in result:
                if new_url not in discovered and len(discovered) < max_pages:
                    discovered[new_url] = None
                    urls_to_process.append((new_url, new_depth))

    return SeederResult(
        discovered=list(discovered.keys()),
        visited=visited,
        failed=failed,
    )
