"""Seed sources (SURVEY §2.1 S3/S4/S5, J3).

The reference seeds from sitemap.xml, the Common-Crawl index, an
explicit URL list, or combinations (`test_url_seeder.py:318,520-547`;
`SeedingConfig(source='sitemap'|'cc'|'cc+sitemap')`). Here:

- the CC-style ``pages`` table IS the cc source (domain-filtered scan),
- sitemap source parses ``<loc>`` entries out of sitemap XML bodies
  stored in ``pages`` (pure `regexp_extract_all` — no UDF),
- custom lists come from ``spark.createDataFrame``,
- combined sources are ``unionByName + dropDuplicates`` (J3).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from website_to_agent_spark.functions import urlfns


from pyspark.sql.types import BinaryType


@F.pandas_udf(BinaryType())
def _maybe_gunzip(blob):
    """Gunzip payloads that carry the gzip magic, pass others through
    (Arrow-batched; applied to sitemap documents only)."""
    import gzip as _gzip

    import pandas as _pd

    out = []
    for b in blob:
        if b is not None and bytes(b[:2]) == b"\x1f\x8b":
            try:
                out.append(_gzip.decompress(bytes(b)))
                continue
            except OSError:
                pass
        out.append(b)
    return _pd.Series(out)


def url_list_seeds(spark: SparkSession, urls: Sequence[str]) -> DataFrame:
    """S5 custom URL-list source (`test_async_url_seeder.py:311-353`)."""
    return spark.createDataFrame([(u,) for u in urls], "url string")


def cc_seeds(pages: DataFrame, domain: str,
             pattern: str | None = None) -> DataFrame:
    """S4: seed every known page of a registrable domain from the
    CC-style store; optional glob pattern (F13)."""
    out = pages.select("url").filter(
        urlfns.host(F.col("url")).endswith(domain.lower())
    )
    if pattern:
        from website_to_agent_spark.operators.filters import glob_pattern_ok

        out = out.filter(glob_pattern_ok(F.col("url"), pattern))
    return out


def sitemap_seeds(pages: DataFrame, domain: str) -> DataFrame:
    """S3: parse <loc> URLs out of sitemap.xml documents for a domain.
    Pure column expression — the XML never leaves the JVM."""
    host = urlfns.host(F.col("url"))
    sitemaps = pages.filter(
        host.endswith(domain.lower())
        & F.col("url").rlike("sitemap[^/]*\\.xml$")
    )
    locs = sitemaps.select(
        F.explode(
            F.regexp_extract_all(
                F.decode(F.col("html"), "utf-8"),
                F.lit("<loc>\\s*(.*?)\\s*</loc>"),
                F.lit(1),
            )
        ).alias("url")
    )
    return locs.filter(F.col("url") != "")


def sitemap_url_entries(sitemap_docs: DataFrame,
                        body_col: str = "html") -> DataFrame:
    """Per-``<url>`` sitemap metadata → (url, priority, lastmod,
    changefreq): the sitemaps.org fields crawlers actually schedule
    on. ``priority`` defaults to the protocol's 0.5 when absent;
    ``lastmod`` stays the raw W3C datetime string (cast downstream —
    sitemaps mix date-only and full-timestamp forms).

    Feed straight into the engine's ranked drain:
    ``CrawlEngine(priority=entries.select("url", F.col("priority")
    .alias("score")))`` — the site owner's own crawl-ordering hint,
    composable with PageRank/TrustRank host scores (priority_on=
    "host"). Pure column regex over metadata-scale sitemap docs;
    nothing leaves the JVM."""
    body = F.decode(_maybe_gunzip(F.col(body_col)), "utf-8")
    entry = F.explode(
        F.regexp_extract_all(
            body, F.lit("(?s)<url>(.*?)</url>"), F.lit(1))
    ).alias("entry")
    e = sitemap_docs.select(entry)

    def field(tag: str) -> F.Column:
        return F.nullif(
            F.regexp_extract(
                F.col("entry"),
                f"<{tag}>\\s*(.*?)\\s*</{tag}>", 1),
            F.lit(""),
        )

    def unescape(c: F.Column) -> F.Column:
        # XML predefined entities — conforming sitemaps MUST escape
        # & < > " ' in <loc> (urls carry & constantly); &amp; last so
        # double-escaped text ('&amp;lt;') decodes one level only
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                        ("&quot;", '"'), ("&apos;", "'"),
                        ("&amp;", "&")):
            c = F.replace(c, F.lit(ent), F.lit(ch))
        return c

    return (
        e.select(
            unescape(field("loc")).alias("url"),
            F.coalesce(field("priority").cast("double"),
                       F.lit(0.5)).alias("priority"),
            field("lastmod").alias("lastmod"),
            field("changefreq").alias("changefreq"),
        )
        .filter(F.col("url").isNotNull())
    )


def sitemap_seeds_recursive(pages: DataFrame, sitemap_urls: DataFrame,
                            max_depth: int = 3) -> DataFrame:
    """Sitemap-INDEX-aware discovery (sitemaps.org protocol): a
    ``<sitemapindex>`` document's ``<loc>`` entries are MORE sitemaps,
    not page seeds — the flat ``sitemap_seeds`` would emit them as
    crawl urls. Walks the index tree breadth-first up to ``max_depth``
    levels (real trees are 1-2): per level one broadcast join against
    the page store + pure column XML extraction; cycle-safe via a
    visited set. ``sitemap_urls``: 1-column DataFrame of starting
    sitemap documents (e.g. robots.txt ``Sitemap:`` discovery)."""
    seeds = None
    frontier = sitemap_urls.toDF("url").distinct()
    visited = frontier
    for _ in range(max_depth):
        docs = pages.join(
            F.broadcast(frontier), pages["url"] == frontier["url"], "inner"
        ).select(pages["url"].alias("s_url"), "html")
        # sitemaps ship gzipped (.xml.gz) as often as plain — gunzip
        # transparently (Arrow kernel; runs only over the metadata-
        # scale sitemap docs, never the page corpus)
        body = F.decode(_maybe_gunzip(F.col("html")), "utf-8")
        parsed = docs.select(
            body.contains("<sitemapindex").alias("is_index"),
            F.explode(
                F.regexp_extract_all(
                    body, F.lit("<loc>\\s*(.*?)\\s*</loc>"), F.lit(1)
                )
            ).alias("url"),
        ).filter(F.col("url") != "")
        level_seeds = parsed.filter(~F.col("is_index")).select("url")
        seeds = level_seeds if seeds is None \
            else seeds.unionByName(level_seeds)
        frontier = (
            parsed.filter(F.col("is_index")).select("url")
            .join(visited, "url", "left_anti")
            .distinct()
        )
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier)
    return (seeds if seeds is not None
            else pages.select("url").limit(0)).dropDuplicates(["url"])


def combined_seeds(*sources: DataFrame) -> DataFrame:
    """J3 multi-source union (`test_url_seeder.py:520-547`)."""
    assert sources
    out = sources[0].select("url")
    for s in sources[1:]:
        out = out.unionByName(s.select("url"))
    return out.dropDuplicates(["url"])


def live_check(seeds: DataFrame, pages: DataFrame) -> DataFrame:
    """F14 live-check: in the sandbox, liveness == presence in the page
    store → left_semi join (production: HEAD probe in the fetch UDF)."""
    return seeds.join(pages.select("url"), "url", "left_semi")


def sitemap_xml(urls: Iterable[str]) -> str:
    """Render a sitemap.xml body (fixture/test helper)."""
    entries = "\n".join(f"  <url><loc>{u}</loc></url>" for u in urls)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"{entries}\n</urlset>\n"
    )


SITEMAP_MANIFEST = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("file", T.StringType(), False),
    T.StructField("n_urls", T.LongType(), False),
])


def sitemap_sink(urls: DataFrame, path: str, base_url: str,
                 url_col: str = "url", lastmod_col: Optional[str] = None,
                 priority_col: Optional[str] = None,
                 changefreq_col: Optional[str] = None,
                 max_per_file: int = 50_000, salt: str = "sitemap-v1",
                 gzip_files: bool = False, mode: str = "error"
                 ) -> DataFrame:
    """Publish a crawled-url table as sitemaps.org shards + index —
    the export twin of :func:`sitemap_url_entries` (round-trip
    tested): ``sitemap-NNNNN.xml[.gz]`` files under ``path`` plus a
    ``sitemap.xml`` index whose ``<loc>`` entries are
    ``base_url/sitemap-NNNNN.xml[.gz]``.

    Protocol bounds enforced mechanically: shards are sized from an
    exact count at max_per_file/2 mean occupancy and any shard that
    still exceeds the 50 000-url cap splits into ``-a``/``-b``…
    part files inside its task — the cap can NEVER be violated, and
    the manifest rows (shard, file, n_urls) account for every url
    (Σ n_urls == distinct input urls). Deterministic like
    :func:`~website_to_agent_spark.sources.warc.warc_sink`: md5 shard
    + in-shard url sort → identical bytes across re-runs, retries,
    partitionings and cluster sizes. One task per shard
    (``applyInPandas``); optional lastmod/priority/changefreq columns
    become the per-``<url>`` scheduling hints crawlers read back."""
    import html as _html
    import math as _math
    import os

    import pandas as pd  # noqa: F811 (executor-side)

    if mode not in ("error", "overwrite"):
        raise ValueError("mode must be 'error' or 'overwrite'")
    if os.path.isdir(path) and os.listdir(path):
        if mode == "error":
            raise FileExistsError(f"{path} exists and is non-empty")
        for f in os.listdir(path):
            os.unlink(os.path.join(path, f))
    os.makedirs(path, exist_ok=True)

    cols = [F.col(url_col).alias("url")]
    for name, c in (("lastmod", lastmod_col), ("priority", priority_col),
                    ("changefreq", changefreq_col)):
        cols.append(
            (F.col(c).cast("string") if c is not None
             else F.lit(None).cast("string")).alias(name))
    rows = urls.select(*cols).dropDuplicates(["url"])
    n_total = rows.count()
    n_shards = max(1, _math.ceil(n_total / max(1, max_per_file // 2)))
    rows = rows.withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(
                "\x00", F.col("url"), F.lit(salt))), 1, 15), 16, 10)
            .cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    ext = ".xml.gz" if gzip_files else ".xml"

    def _write(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import gzip as _gzip

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("url", kind="mergesort")
        out = []
        n_parts = _math.ceil(len(pdf) / max_per_file)
        for p in range(n_parts):
            part = pdf.iloc[p * max_per_file:(p + 1) * max_per_file]
            suffix = "" if n_parts == 1 else chr(ord("a") + p)
            fname = os.path.join(
                path, f"sitemap-{shard:05d}{suffix}{ext}")
            lines = ['<?xml version="1.0" encoding="UTF-8"?>',
                     '<urlset xmlns='
                     '"http://www.sitemaps.org/schemas/sitemap/0.9">']
            for r in part.itertuples(index=False):
                lines.append("  <url>")
                lines.append(f"    <loc>{_html.escape(r.url)}</loc>")
                for tag in ("lastmod", "priority", "changefreq"):
                    v = getattr(r, tag)
                    if v is not None and not (isinstance(v, float)
                                              and v != v):
                        lines.append(
                            f"    <{tag}>{_html.escape(str(v))}</{tag}>")
                lines.append("  </url>")
            lines.append("</urlset>")
            blob = ("\n".join(lines) + "\n").encode("utf-8")
            if gzip_files:
                blob = _gzip.compress(blob, mtime=0)
            with open(fname, "wb") as fh:
                fh.write(blob)
            out.append({"shard": shard, "file": fname,
                        "n_urls": len(part)})
        return pd.DataFrame(out)

    manifest = (
        rows.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(_write, schema=SITEMAP_MANIFEST)
        .collect()
    )
    # the sitemap index (≤50k sitemaps per index is the same protocol
    # cap — at 2.5e9 urls per index level, one level suffices here;
    # driver-side: |manifest| rows, bounded)
    idx_lines = ['<?xml version="1.0" encoding="UTF-8"?>',
                 '<sitemapindex xmlns='
                 '"http://www.sitemaps.org/schemas/sitemap/0.9">']
    for m in sorted(manifest, key=lambda m: m.file):
        loc = base_url.rstrip("/") + "/" + os.path.basename(m.file)
        idx_lines.append(
            f"  <sitemap><loc>{_html.escape(loc)}</loc></sitemap>")
    idx_lines.append("</sitemapindex>")
    with open(os.path.join(path, "sitemap.xml"), "wb") as fh:
        fh.write(("\n".join(idx_lines) + "\n").encode("utf-8"))
    return urls.sparkSession.createDataFrame(manifest, SITEMAP_MANIFEST)
