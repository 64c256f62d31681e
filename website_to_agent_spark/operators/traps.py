"""Crawler-trap detection — URL-template explosion, path loops,
depth bombs (the classic frontier-hygiene pass, Heydon & Najork,
"Mercator: A scalable, extensible Web crawler", WWW'99 — public
paper, independent implementation).

The reference has no defense against traps: its membership check
(`crawl4ai_client.py:271-276`) dedups exact URLs only, so a calendar
page that mints `?date=2020-01-02`, `?date=2020-01-03`, … one new URL
per fetch drains the whole crawl budget into one host. At 100 TB the
frontier MUST collapse URLs to templates and rate-limit by template,
not by exact string.

Mechanism — all pure Catalyst columns (regex + array HOFs, no UDFs,
RE2-compatible so a DuckDB oracle mirrors value-exact):

- ``url_template``: lowercase, drop fragment, blank query VALUES
  (keep param names — ``?page=3`` and ``?page=4`` are one template,
  ``?page=`` vs ``?id=`` are two), then long-hex runs → ``{h}`` and
  digit runs → ``{n}``. Session ids, dates, counters, content hashes
  all collapse.
- ``max_segment_repeat``: the largest multiplicity of any single path
  segment — symlink/relative-link loops look like
  ``/a/b/a/b/a/b/…`` (O(k²) over path segments per URL; paths are
  short, and it stays inside whole-stage codegen).
- ``path_depth``: segment count (depth bombs).
- ``trap_report``: one groupBy (host, template) → url count per
  template + max depth/repeat + deterministic example (min url) +
  ``reasons`` ('' = clean). The aggregation is map-side combinable
  and hash-partitioned by (host, template) — the hot keys ARE the
  traps, but each collapses to one row before the exchange.
- ``exclude_traps``: frontier hygiene — anti-join candidates against
  flagged templates. The flagged set is tiny by construction
  (templates, not URLs) → broadcast, zero shuffle on the frontier.

Thresholds are per-call knobs: explosion = ``min_urls`` distinct urls
in one template (traps mint unbounded urls; legitimate templates are
bounded by real content), loop = any segment ≥ ``max_repeat`` times,
depth = > ``max_depth`` segments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from website_to_agent_spark.functions import urlfns

# hex runs this long are ids/hashes, not words (f "decade" etc. is 6)
_HEX_RUN = r"[0-9a-f]{8,}"


def url_template(url: Column) -> Column:
    """Collapse a URL to its trap-grouping template (see module
    docstring). Lowercasing is safe here: the template is a GROUPING
    key, never a fetchable resource."""
    t = F.lower(url)
    t = F.regexp_replace(t, r"#.*$", "")          # fragment
    t = F.regexp_replace(t, r"([?&][^=&#]*)=[^&#]*", r"$1=*")  # q values
    t = F.regexp_replace(t, _HEX_RUN, "{h}")      # ids / hashes
    return F.regexp_replace(t, r"[0-9]+", "{n}")  # counters / dates


def _segments(url: Column) -> Column:
    p = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.filter(F.split(p, "/"), lambda s: s != "")


def path_depth(url: Column) -> Column:
    return F.size(_segments(url)).cast("long")


def max_segment_repeat(url: Column) -> Column:
    """Largest multiplicity of any one path segment (0 for an empty
    path) — ≥3 is the classic relative-link-loop signature."""
    segs = _segments(url)
    return F.coalesce(
        F.array_max(
            F.transform(
                segs,
                lambda s: F.size(F.filter(segs, lambda x: x == s)),
            )
        ),
        F.lit(0),
    ).cast("long")


def trap_report(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 32,
    max_repeat: int = 3,
    max_depth: int = 16,
) -> DataFrame:
    """(host, template, n_urls, max_depth, max_seg_repeat, example,
    reasons) — one row per URL template; ``reasons`` is a
    comma-joined subset of {explosion, loop, depth} ('' = clean).
    ``example`` = min(url), deterministic."""
    u = F.col(url_col)
    per_url = urls.select(
        F.lower(urlfns.netloc(u)).alias("host"),
        url_template(u).alias("template"),
        path_depth(u).alias("depth"),
        max_segment_repeat(u).alias("seg_repeat"),
        u.alias("_url"),
    )
    g = per_url.groupBy("host", "template").agg(
        F.countDistinct("_url").alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.max("seg_repeat").alias("max_seg_repeat"),
        F.min("_url").alias("example"),
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_urls") >= min_urls, F.lit("explosion")),
        F.when(F.col("max_seg_repeat") >= max_repeat, F.lit("loop")),
        F.when(F.col("max_depth") > max_depth, F.lit("depth")),
    )
    return g.withColumn("reasons", reasons)


def exclude_traps(candidates: DataFrame, report: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Drop frontier candidates whose (host, template) is flagged in
    ``report``. The flagged-template table is template-granular —
    small by construction — so it broadcasts; the frontier itself
    never shuffles."""
    u = F.col(url_col)
    flagged = report.filter(F.col("reasons") != "").select(
        "host", "template")
    keyed = candidates.withColumn(
        "_trap_host", F.lower(urlfns.netloc(u))
    ).withColumn("_trap_template", url_template(u))
    kept = keyed.join(
        F.broadcast(flagged.withColumnsRenamed(
            {"host": "_trap_host", "template": "_trap_template"})),
        ["_trap_host", "_trap_template"],
        "left_anti",
    )
    return kept.drop("_trap_host", "_trap_template")
