"""Link-validity filters F1-F14 (SURVEY §2.3) as pure Column
predicates — Catalyst pushes them below the UDF stages, so invalid
candidates never reach a shuffle or the seen anti-join.

Two divergent reference modes, both supported:
- client (`crawl4ai_client.py:268-279`): exact-host equality + a
  7-extension endswith list on the FULL url.
- seeder (`url_seeder.py:180-221`): http(s) scheme + host ENDSWITH the
  base domain (subdomains allowed) + 25-extension list on the lowered
  PATH + 10 path-prefix skips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from website_to_agent_spark.extraction import (
    CLIENT_SKIP_EXTENSIONS,
    SEEDER_SKIP_EXTENSIONS,
    SEEDER_SKIP_PATHS,
)
from website_to_agent_spark.functions import urlfns


def _endswith_any(col: Column, suffixes) -> Column:
    pred = F.lit(False)
    for s in suffixes:
        pred = pred | col.endswith(s)
    return pred


def client_link_ok(url: Column, base_domain: Column) -> Column:
    """F3 exact host + F5 extension list (`crawl4ai_client.py:268-279`).
    NB: the reference compares the RAW netloc (not lowered, port
    included) — `urlparse(full_url).netloc != base_domain`."""
    return (urlfns.netloc(url) == base_domain) & ~_endswith_any(
        url, CLIENT_SKIP_EXTENSIONS
    )


def seeder_link_ok(url: Column, base_domain: Column) -> Column:
    """F1 scheme + F2 endswith-domain + F4 path extensions + F6 path
    prefixes (`url_seeder.py:191-218`)."""
    scheme_ok = url.rlike("^https?://")                      # F1
    # raw netloc (port included) vs the lowered base domain —
    # exactly `parsed.netloc.endswith(base_domain)`, url_seeder.py:199
    domain_ok = urlfns.netloc(url).endswith(base_domain)     # F2
    p = F.lower(urlfns.path(url))
    ext_ok = ~_endswith_any(p, SEEDER_SKIP_EXTENSIONS)       # F4
    path_ok = F.lit(True)                                    # F6
    for prefix in SEEDER_SKIP_PATHS:
        path_ok = path_ok & ~p.startswith(prefix)
    return scheme_ok & domain_ok & ext_ok & path_ok


def status_ok(status_code: Column) -> Column:
    """F8 (`url_seeder.py:120-123`)."""
    return status_code == F.lit(200)


def content_type_ok(content_type: Column) -> Column:
    """F9 (`url_seeder.py:126-129`)."""
    return F.lower(F.coalesce(content_type, F.lit(""))).contains("text/html")


def depth_ok(depth: Column, max_depth: int) -> Column:
    """F11 (`url_seeder.py:70`)."""
    return depth <= F.lit(max_depth)


def score_ok(score: Column, threshold: float) -> Column:
    """F12 (`test_url_seeder.py:97-117`)."""
    return score >= F.lit(threshold)


def glob_pattern_ok(url: Column, glob: str) -> Column:
    """F13 URL-pattern filter: glob → anchored regex
    (CRAWL4AI_CLIENT_README.md:179)."""
    import re as _re

    regex = "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in glob
    ) + "$"
    return url.rlike(regex)
