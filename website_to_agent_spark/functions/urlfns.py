"""URL column functions (SURVEY P2/P3) — builtin Catalyst expressions.

``parse_url`` is JVM-side; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small public-suffix set sufficient for the engine's partition key.
# In production this would load the full public-suffix list and be
# broadcast; the column logic is identical.
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "com.sg", "com.tr", "co.za",
)


def host(url: Column) -> Column:
    """`urlparse(url).netloc.lower()` (`url_seeder.py:234-235`)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def netloc(url: Column) -> Column:
    """The RAW authority component — what ``urlparse(url).netloc``
    returns: userinfo/host/port between ``://`` and the first ``/?#``.
    ``parse_url(url,'HOST')`` drops the port, so it can NOT stand in
    for the reference's netloc comparisons when URLs carry ports
    (`crawl4ai_client.py:268`, `url_seeder.py:199`)."""
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)


def path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def reg_domain(host_col: Column) -> Column:
    """Registrable domain — the partition key for politeness/bloom/
    salting (SURVEY P3). substring_index approximation + a two-level
    public-suffix correction, all JVM-side."""
    last2 = F.substring_index(host_col, ".", -2)
    last3 = F.substring_index(host_col, ".", -3)
    return F.when(last2.isin(*_TWO_LEVEL_SUFFIXES), last3).otherwise(last2)


# Tracking parameters stripped by URL canonicalization — the
# unambiguous analytics/click-id set only. Deliberately NOT included:
# `ref`, which is load-bearing on many real sites (e.g. GitHub's
# ?ref=<branch> selects different content) — stripping it collapses
# genuinely distinct resources and drops pages from the corpus.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid)(=|$)"


def canonical_url(url: Column, tracking_param_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical URL for URL-level dedup at corpus scale: lowercase
    scheme+authority, drop default ports (:80 http / :443 https), drop
    the fragment, strip tracking params (``tracking_param_re`` — a
    site-specific pipeline passes its own list), sort the remaining
    query params, normalize the empty path to ``/``.
    Pure Catalyst (regex + array ops) — and RE2-compatible, so the
    DuckDB oracle mirrors it value-exact."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    # strip default ports via regex (simpler than substring math)
    auth = F.lower(netloc(url))
    auth_http = F.regexp_replace(auth, r":80$", "")
    auth_https = F.regexp_replace(auth, r":443$", "")
    auth = (
        F.when(scheme == "http", auth_http)
        .when(scheme == "https", auth_https)
        .otherwise(auth)
    )
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    p = F.when(p == "", F.lit("/")).otherwise(p)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "") & ~F.lower(kv).rlike(tracking_param_re),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), auth, p,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def salted_key(reg_domain_col: Column, ord_col: Column, salt_buckets: Column) -> Column:
    """Salted partition key: hash(reg_domain, ord % salt) so a hot
    domain spreads over `salt_buckets` partitions (SURVEY §4 hot-host
    skew). Politeness state is still keyed by the unsalted domain."""
    return F.concat_ws(
        "#", reg_domain_col, F.pmod(F.xxhash64(ord_col), salt_buckets)
    )
