"""Live robots.txt source: fetch + parse per-host robots policies into
the ``robots(host, disallow array<string>, crawl_delay double)`` table
consumed by ``operators.politeness`` (north_star: "per-host politeness
token buckets and robots.txt caches broadcast to executors").

The reference has no robots handling; the rule set implemented is the
standard one: the ``User-agent: *`` group's ``Disallow`` prefixes and
``Crawl-delay``, with a specific-UA group taking precedence when it
matches. A missing/failed robots.txt means allow-all (empty disallow),
per the de-facto standard.

Scale notes: one row per HOST (metadata-scale, ~10^7 rows for a 10^10
URL frontier), fetched through the same mapInPandas HTTP kernel as
pages and parsed in a second batch kernel; the result is small enough
to broadcast to executors, which is exactly how ``robots_filter`` and
``polite_drain`` consume it.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from website_to_agent_spark.sources.httpfetch import http_fetch

RULE = T.StructType(
    [
        T.StructField("prio", T.IntegerType(), False),   # rule octets
        T.StructField("re", T.StringType(), False),      # compiled regex
        T.StructField("allow", T.BooleanType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
        T.StructField("sitemaps", T.ArrayType(T.StringType()), True),
        # RFC 9309 rule set (Allow + Disallow, * wildcards, $ anchor,
        # longest-match precedence) — politeness.robots_filter uses
        # this when present and falls back to the prefix-only
        # ``disallow`` column otherwise
        T.StructField("rules", T.ArrayType(RULE), True),
    ]
)

_RE_SPECIALS = ".^$+?(){}[]|\\"


def compile_robots_rule(pattern: str) -> Tuple[int, str]:
    """RFC 9309 path pattern → (priority, Java-regex). ``*`` matches
    any run of octets, a trailing ``$`` anchors the end; priority =
    pattern length in octets (the RFC's "most specific = most octets"
    precedence key)."""
    prio = len(pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return prio, "".join(out)


def robots_sitemaps(body: str) -> List[str]:
    """``Sitemap:`` lines from robots.txt (group-independent per the
    de-facto standard) — feeds ``seeds.sitemap_seeds`` so S3 discovery
    starts from the host's own declared sitemaps."""
    out: List[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def parse_robots_rules(
    body: str, user_agent: str = "*"
) -> Tuple[List[Tuple[str, bool]], Optional[float]]:
    """Group-aware robots.txt parse → ([(pattern, is_allow)...],
    crawl_delay) for the most specific matching user-agent group —
    exact/substring UA match beats the ``*`` group. Rules keep file
    order; Allow and Disallow both collected (RFC 9309)."""
    groups: dict = {}
    current: List[str] = []
    seen_rule_since_ua = True

    def _new():
        return {"rules": [], "delay": None}

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule_since_ua:
                current = []
                seen_rule_since_ua = False
            current.append(val.lower())
            for ua in current:
                groups.setdefault(ua, _new())
        elif key in ("disallow", "allow", "crawl-delay"):
            seen_rule_since_ua = True
            for ua in current:
                g = groups.setdefault(ua, _new())
                if key == "crawl-delay":
                    try:
                        g["delay"] = float(val)
                    except ValueError:
                        pass
                elif val:   # an empty pattern matches nothing
                    g["rules"].append((val, key == "allow"))
        else:
            seen_rule_since_ua = True

    ua_l = user_agent.lower()
    for name, g in groups.items():
        if name != "*" and name in ua_l:
            return g["rules"], g["delay"]
    star = groups.get("*")
    if star is not None:
        return star["rules"], star["delay"]
    return [], None


def parse_robots_txt(
    body: str, user_agent: str = "*"
) -> Tuple[List[str], Optional[float]]:
    """Back-compat view of ``parse_robots_rules``: the Disallow
    prefixes only (the pre-RFC-9309 table shape)."""
    rules, delay = parse_robots_rules(body, user_agent)
    return [p for p, allow in rules if not allow], delay


def fetch_robots(
    hosts: DataFrame,
    scheme: str = "https",
    timeout_s: float = 10.0,
    user_agent: str = "*",
    host_col: str = "host",
) -> DataFrame:
    """One GET of ``{scheme}://{host}/robots.txt`` per distinct host →
    the politeness ``robots`` table. Fetch failures → allow-all rows.

    If ``hosts`` carries a ``scheme`` column (see
    ``robots_for_frontier``, which derives it from the URLs actually
    being crawled), it overrides the global ``scheme`` default per host
    — an http-only site must be asked over http, or its rules would
    silently degrade to allow-all."""
    if "scheme" in hosts.columns:
        sch = F.coalesce(F.col("scheme"), F.lit(scheme))
    else:
        sch = F.lit(scheme)
    urls = hosts.select(
        F.concat(
            sch, F.lit("://"), F.col(host_col), F.lit("/robots.txt")
        ).alias("url")
    ).distinct()
    got = http_fetch(urls, timeout_s=timeout_s)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"host": [], "disallow": [], "crawl_delay": [],
                   "sitemaps": [], "rules": []}
            for url, ok, body in zip(pdf["url"], pdf["success"], pdf["html"]):
                host = url.split("://", 1)[1].rsplit("/robots.txt", 1)[0]
                if ok and body is not None:
                    text = bytes(body).decode("utf-8", "replace")
                    rules, delay = parse_robots_rules(text, user_agent)
                    maps = robots_sitemaps(text)
                else:
                    rules, delay, maps = [], None, []
                out["host"].append(host)
                out["disallow"].append(
                    [p for p, allow in rules if not allow])
                out["crawl_delay"].append(delay)
                out["sitemaps"].append(maps)
                out["rules"].append(
                    [compile_robots_rule(p) + (allow,)
                     for p, allow in rules])
            yield pd.DataFrame(out)

    return got.mapInPandas(_parse, schema=ROBOTS)


def robots_for_frontier(
    frontier: DataFrame,
    timeout_s: float = 10.0,
    user_agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Robots table for every host in a frontier, asked over the scheme
    the frontier actually crawls that host with (https preferred when a
    host appears under both) — not a hardcoded https."""
    from website_to_agent_spark.functions import urlfns

    hosts = (
        frontier.select(
            F.lower(urlfns.netloc(F.col(url_col))).alias("host"),
            F.lower(F.regexp_extract(F.col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)).alias("scheme"),
        )
        .filter(F.col("scheme").isin("http", "https"))
        .groupBy("host")
        .agg(F.max("scheme").alias("scheme"))
    )
    return fetch_robots(hosts, timeout_s=timeout_s, user_agent=user_agent)
