"""Re-crawl scheduling — when to fetch a page AGAIN (the layer the
reference lacks entirely: its crawls are one-shot, `crawl4ai_client.py`
holds no fetch history).

A web-scale crawler re-visits pages at the rate they actually change
(Cho & Garcia-Molina, "Effective Page Refresh Policies for Web
Crawlers", TODS'03 — public paper, independent implementation): pages
are modeled as Poisson change processes, the change rate λ is
estimated from observed snapshot diffs, and the revisit score is the
expected staleness λ·(now − last_fetch). The outputs plug into the
two mechanisms this engine already has:

- ``revisit_priority`` → ``CrawlEngine(priority=..., priority_on=
  "url")``: the staleness score IS the drain score, so the ranked
  batches fetch the most-stale-likely pages first.
- ``recrawl_due`` → ``cuckoo.remove_from_cuckoos`` + a seen-set
  anti-join: expiry makes a URL test "unseen" again, re-entering the
  frontier exactly once (the deletable cuckoo is why the north star
  says "Bloom/cuckoo" — an OR-merged Bloom cannot expire).

All pure column dataflow. Scale shapes: ``mark_changes`` is one
per-url window (hash-partitioned by url — parallel across the
corpus); ``change_rate`` one map-side-combined aggregation;
``revisit_priority``/``recrawl_due`` map-only. Timestamps are
compared in integer epoch seconds (cross-engine exact; sub-second
churn is meaningless at crawl cadence).

Epoch math is SESSION-TIMEZONE-INDEPENDENT by construction — and
READER-CONFIG-independent. Two traps, two fixes:

- The earlier ``cast("timestamp").cast("long")`` pattern silently
  routed NTZ/string inputs through the session zone — under a
  DST-observing driver zone a January snapshot and a July ``now``
  literal shift by DIFFERENT offsets, corrupting every age by the
  DST delta. NTZ and string inputs therefore stay entirely in NTZ
  space: ``timestampdiff(SECOND, ntz_epoch, ts_ntz)``.
- The converse trap: a naive parquet timestamp column arrives as
  TIMESTAMP_NTZ **or** TIMESTAMP_LTZ depending on the *reader's*
  ``spark.sql.parquet.inferTimestampNTZ.enabled`` — the writer does
  not decide. For an LTZ column, ``cast("timestamp_ntz")`` converts
  instant→wall-clock THROUGH the session zone, re-introducing the
  DST corruption. But an LTZ value already *is* a UTC instant, so
  its TZ-free epoch is simply ``cast("long")`` (and for naive
  parquet read legacy-style, the stored micros are taken as UTC
  micros — the same value DuckDB's ``epoch(ts)`` yields).

Hence every entry point dispatches on the column's ACTUAL dtype
(:func:`_epoch_s_typed`): LTZ → ``cast("long")``; NTZ / string /
date → the NTZ ``timestamp_diff`` path. A scheduler must not read
ambient session state (it breaks resumability when the resuming
driver's zone or reader flags differ), and with the dispatch the
same input parquet yields bit-identical schedules under any
{session TZ} × {inferTimestampNTZ} combination (tested in
``tests/test_tz_sweep.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DataType, TimestampType

_NTZ_EPOCH = "1970-01-01 00:00:00"


def _epoch_s(col: F.Column) -> F.Column:
    """Integer seconds (floored) since 1970-01-01T00:00 in naive
    wall-clock space — i.e. UTC epoch for NTZ/string inputs, with NO
    dependence on ``spark.sql.session.timeZone``. The diff is computed
    NTZ-to-NTZ (``timestamp_diff`` truncates toward zero; post-1970
    crawl timestamps make that identical to flooring).

    LTZ inputs must NOT take this path — ``cast("timestamp_ntz")``
    converts them through the session zone. Callers with a frame in
    hand use :func:`_epoch_s_typed`."""
    return F.timestamp_diff(
        "SECOND",
        F.lit(_NTZ_EPOCH).cast("timestamp_ntz"),
        col.cast("timestamp_ntz"),
    )


def _epoch_s_typed(col: F.Column, dtype: DataType) -> F.Column:
    """Dtype-dispatched TZ-free epoch seconds.

    - TIMESTAMP (LTZ): the value is a UTC instant; ``cast("long")``
      is its epoch, independent of session TZ. This also covers the
      legacy read of naive parquet (``inferTimestampNTZ=false``),
      where Spark takes the stored micros as UTC micros — matching
      what a naive-timestamp engine (the DuckDB oracle) computes.
    - TIMESTAMP_NTZ / string / date: NTZ wall-clock taken as UTC via
      :func:`_epoch_s` (``cast("long")`` here would route through
      the session zone — the opposite trap)."""
    if isinstance(dtype, TimestampType):
        return col.cast("long")
    return _epoch_s(col)


def _now_lit(now) -> F.Column:
    """``now`` (str | datetime) as a TZ-independent NTZ literal.
    Naive datetimes are taken as UTC wall clock; aware datetimes are
    converted to UTC first so the caller's zone can't leak in."""
    if hasattr(now, "strftime"):
        if getattr(now, "tzinfo", None) is not None:
            import datetime as _dt

            now = now.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        now = now.strftime("%Y-%m-%d %H:%M:%S")
    return F.lit(str(now))


def mark_changes(snapshots: DataFrame, url_col: str = "url",
                 ts_col: str = "ts",
                 digest_col: str = "digest") -> DataFrame:
    """Adds ``changed`` (bool): this snapshot's digest differs from the
    url's previous snapshot. The first observation of a url is
    ``false`` — it defines the baseline, it doesn't evidence change."""
    w = Window.partitionBy(url_col).orderBy(ts_col)
    prev = F.lag(F.col(digest_col)).over(w)
    return snapshots.withColumn(
        "changed",
        prev.isNotNull() & (F.col(digest_col) != prev),
    )


def change_rate(marked: DataFrame, url_col: str = "url",
                ts_col: str = "ts") -> DataFrame:
    """(url, n_snaps, n_changes, span_s, rate, last_ts): λ estimated as
    observed changes over the observation span (0 for single-snapshot
    urls — no evidence, not infinite churn)."""
    ts_s = _epoch_s_typed(F.col(ts_col), marked.schema[ts_col].dataType)
    return (
        marked.groupBy(F.col(url_col).alias("url"))
        .agg(
            F.count("*").alias("n_snaps"),
            F.sum(F.col("changed").cast("long")).alias("n_changes"),
            (F.max(ts_s) - F.min(ts_s)).alias("span_s"),
            F.max(F.col(ts_col)).alias("last_ts"),
        )
        .withColumn(
            "rate",
            F.when(F.col("span_s") > 0,
                   F.col("n_changes") / F.col("span_s"))
            .otherwise(F.lit(0.0)),
        )
    )


def revisit_priority(rates: DataFrame, now, default_rate: float = 0.0
                     ) -> DataFrame:
    """(url, score) — expected staleness λ·age, ready to feed
    ``CrawlEngine(priority=...)``. ``now`` is an explicit timestamp
    (never wall clock — determinism and resumability). Urls with no
    change evidence score ``default_rate``·age, so a nonzero default
    gives never-observed-changing pages a slow ramp instead of
    starvation."""
    age = _epoch_s(_now_lit(now)) - _epoch_s_typed(
        F.col("last_ts"), rates.schema["last_ts"].dataType
    )
    lam = F.when(F.col("rate") > 0, F.col("rate")).otherwise(
        F.lit(default_rate)
    )
    return rates.select(
        "url", (lam * age).alias("score")
    )


def stale_by_sitemap(entries: DataFrame, rates: DataFrame) -> DataFrame:
    """Urls whose sitemap ``lastmod`` is NEWER than our last fetch —
    the push-signal complement to the Poisson model: the site owner
    explicitly says the page changed, so it outranks any estimated
    staleness. (``entries`` = ``sources.seeds.sitemap_url_entries``
    output; ``rates`` = :func:`change_rate` output.) Urls in the
    sitemap we have never fetched are also due.

    ``lastmod`` strings parse leniently (W3C date or datetime; both
    sides compared as TZ-free epoch seconds — session-TZ- and
    reader-config-proof like the rest of this module, via the same
    dtype dispatch). One broadcast-size join: sitemaps are
    metadata-scale. Returns (url, reason ∈ {changed, never_fetched})."""
    e = entries.filter(F.col("lastmod").isNotNull()).select(
        "url",
        _epoch_s(
            F.coalesce(
                F.col("lastmod").cast("timestamp_ntz"),
                F.to_timestamp_ntz(F.col("lastmod"), F.lit("yyyy-MM-dd")),
            )
        ).alias("_lm"),
    )
    joined = e.join(
        rates.select(
            "url",
            _epoch_s_typed(
                F.col("last_ts"), rates.schema["last_ts"].dataType
            ).alias("_lf"),
        ),
        "url", "left",
    )
    return joined.filter(
        F.col("_lf").isNull() | (F.col("_lm") > F.col("_lf"))
    ).select(
        "url",
        F.when(F.col("_lf").isNull(), F.lit("never_fetched"))
        .otherwise(F.lit("changed")).alias("reason"),
    )


def revalidate(snapshots: DataFrame, pages: DataFrame,
               url_col: str = "url",
               digest_col: str = "digest") -> DataFrame:
    """Conditional-GET analogue (If-None-Match → 304 Not Modified).

    A real re-crawl sends the stored validator (ETag / Last-Modified)
    and skips body transfer + re-processing when the server answers
    304. In the page-store model the validator is a content digest:
    ``snapshots`` carries the urls we hold with their last-fetch
    ``digest``; ``pages`` is the current web. Output adds per url:

    - ``status``: ``not_modified`` (digest unchanged — reuse the
      stored extraction, skip the parse), ``modified`` (re-extract),
      ``gone`` (url no longer resolves — tombstone the snapshot and
      its index postings), and
    - ``new_digest`` (null for ``gone``).

    The downstream contract: only ``modified`` rows pay the Arrow
    extraction kernel (the ~0.9 ms/page cost that dominates a
    re-crawl of a mostly-unchanged web); ``gone`` rows feed
    ``indexing.merge_index_deltas`` tombstones and
    ``cuckoo.remove_from_cuckoos``.

    Scale shape: one url-keyed hash join of two corpus-scale tables —
    the honest minimum (both sides are O(corpus); nothing to
    broadcast). The digest is ``md5`` over the raw html bytes: no
    parse, column-native, so the "check" side of the pass never
    leaves whole-stage codegen.
    """
    p = pages.select(
        F.col(url_col).alias("_pu"), F.md5(F.col("html")).alias("new_digest")
    )
    j = snapshots.join(p, F.col(url_col) == F.col("_pu"), "left").drop("_pu")
    return j.withColumn(
        "status",
        F.when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("new_digest") == F.col(digest_col),
              F.lit("not_modified"))
        .otherwise(F.lit("modified")),
    )


def crawl_snapshots(crawled: DataFrame, pages: DataFrame) -> DataFrame:
    """Build a ``CrawlEngine(revalidate_with=...)`` snapshot table
    from a finished crawl and the store it crawled: the validator is
    ``md5(html)`` AT FETCH TIME (so it must be computed against the
    store that crawl saw, before the store advances), the payload is
    the crawl's stored extraction PLUS the page's out-links — the
    link-DB role every incremental crawler keeps, so a re-crawl can
    re-traverse through unchanged pages without re-parsing them.
    Links are re-derived here with one extraction pass (a one-time
    snapshot-build cost; each later re-crawl then skips the parse for
    every unchanged page). Successful rows only — a failed fetch has
    nothing to revalidate against.

    Redirect caveat: a crawled row that was reached via a 301 stores
    the FINAL page's text but joins the REQUESTED url's store row, so
    its digest is the redirect stub's — such rows simply never
    revalidate as unchanged (conservative, correct)."""
    from website_to_agent_spark.functions.extract import extract_udf

    p = pages.select(
        F.col("url").alias("_pu"),
        F.md5(F.col("html")).alias("digest"),
        F.col("html").alias("_ph"),
    )
    return (
        crawled.filter(F.col("success"))
        .join(p, F.col("url") == F.col("_pu"), "inner")
        .withColumn("_ext", extract_udf(F.col("url"), F.col("_ph")))
        .select(
            "url", "digest", "title", "description", "keywords",
            "text", "markdown", "content",
            F.col("_ext.links").alias("links"),
            F.col("_ext.robots_noindex").alias("robots_noindex"),
            F.col("_ext.robots_nofollow").alias("robots_nofollow"),
            F.col("_ext.nofollow_links").alias("nofollow_links"),
        )
        # a multi-job crawl records one row per (job, url); the
        # payload is identical (same store row, same kernel), so the
        # snapshot keys on url alone — without this, the reuse join
        # would duplicate fetched rows and corrupt the budget window
        .dropDuplicates(["url"])
    )


def recrawl_due(rates: DataFrame, now, ttl_s: int) -> DataFrame:
    """Urls whose last fetch is older than ``ttl_s`` — the hard-expiry
    complement of the soft priority score. Feed the result to
    ``cuckoo.remove_from_cuckoos`` and an anti-join against the seen
    set so the frontier re-enqueues them exactly once."""
    age = _epoch_s(_now_lit(now)) - _epoch_s_typed(
        F.col("last_ts"), rates.schema["last_ts"].dataType
    )
    return rates.filter(age >= F.lit(ttl_s)).select("url")


_HTTP_DATE = "dd MMM yyyy HH:mm:ss zzz"


def _http_epoch(col: F.Column) -> F.Column:
    """RFC 1123 HTTP-date → epoch seconds. The weekday prefix is
    stripped first (Spark ≥3 DateTimeFormatter refuses day-name
    parsing — ``EEE`` raises DATETIME_PATTERN_RECOGNITION); the rest
    carries an explicit zone (GMT), so the parsed instant is
    session-TZ-free and ``cast("long")`` is its epoch (the LTZ branch
    of the module's dispatch). ``try_to_timestamp``: a malformed date
    yields NULL under any ``spark.sql.ansi.enabled`` — header junk
    must never fail a task."""
    return F.try_to_timestamp(
        F.regexp_replace(col, r"^[A-Za-z]+,\s*", ""), F.lit(_HTTP_DATE)
    ).cast("long")


def cache_ttl_s(cache_control=None, expires=None, date=None,
                last_modified=None,
                heuristic_frac: float = 0.1) -> F.Column:
    """Server-declared freshness lifetime in seconds — RFC 9111 §4.2,
    the signal a polite re-crawler should trust before its own Poisson
    estimate (the server KNOWS its publishing cadence; the estimate
    infers it). Inputs are the raw response-header string columns
    (``sources.warc.warc_http_headers`` emits them); precedence is the
    RFC's:

    1. ``no-store`` / ``no-cache`` → 0 (always revalidate).
    2. ``s-maxage`` then ``max-age`` (a crawler is a shared cache).
    3. ``Expires − Date`` (clamped at 0); an Expires that is present
       but unparseable means "already expired" per the RFC → 0.
    4. Heuristic (§4.2.2): ``heuristic_frac`` · (Date − Last-Modified)
       — the traditional 10 %.
    5. No signal at all → NULL (the caller's policy default applies —
       see :func:`recrawl_due_ttl`).

    Pure column math (regex + two date parses), map-only, and
    TZ-independent: both date parses carry the header's explicit zone.
    """
    cc = F.lower(F.coalesce(
        cache_control if cache_control is not None else F.lit(None),
        F.lit("")))
    no_cache = cc.rlike("no-store|no-cache")
    smax = F.nullif(
        F.regexp_extract(cc, r"s-maxage\s*=\s*\"?(\d+)", 1), F.lit(""))
    mage = F.nullif(
        F.regexp_extract(cc, r"max-age\s*=\s*\"?(\d+)", 1), F.lit(""))
    explicit = F.coalesce(smax, mage).cast("long")

    null_s = F.lit(None).cast("string")
    exp_raw = expires if expires is not None else null_s
    date_e = _http_epoch(date if date is not None else null_s)
    exp_e = _http_epoch(exp_raw)
    lm_e = _http_epoch(last_modified if last_modified is not None
                       else null_s)
    expires_ttl = F.when(
        exp_e.isNotNull() & date_e.isNotNull(),
        F.greatest(exp_e - date_e, F.lit(0)),
    ).when(
        # "Expires: 0" / "-1" / junk — present but invalid = expired
        F.trim(F.coalesce(exp_raw, F.lit(""))) != "", F.lit(0),
    )
    heuristic = F.when(
        lm_e.isNotNull() & date_e.isNotNull() & (date_e >= lm_e),
        F.floor((date_e - lm_e) * F.lit(float(heuristic_frac)))
        .cast("long"),
    )
    return F.when(no_cache, F.lit(0)).otherwise(
        F.coalesce(explicit, expires_ttl, heuristic)
    ).alias("ttl_s")


def recrawl_due_ttl(rates: DataFrame, now, ttls: DataFrame,
                    default_ttl_s: int,
                    ttl_col: str = "ttl_s") -> DataFrame:
    """Per-url TTL expiry: urls whose age since last fetch exceeds the
    SERVER'S declared lifetime (``ttls`` = (url, ttl_s), typically
    :func:`cache_ttl_s` over stored headers), falling back to
    ``default_ttl_s`` where the server said nothing (NULL ttl). The
    per-url twin of :func:`recrawl_due` — same downstream contract
    (cuckoo deletion + seen anti-join). One url-keyed left join +
    map-only filter."""
    age = _epoch_s(_now_lit(now)) - _epoch_s_typed(
        F.col("last_ts"), rates.schema["last_ts"].dataType
    )
    j = rates.join(
        ttls.select("url", F.col(ttl_col).alias("_ttl")), "url", "left")
    eff = F.coalesce(F.col("_ttl"), F.lit(int(default_ttl_s)))
    return j.filter(age >= eff).select("url")


# ---------------------------------------------------------------------------
# Freshness-optimal refresh allocation (Cho & Garcia-Molina,
# "Effective Page Refresh Policies for Web Crawlers", TODS'03 §4-6 —
# public paper, independent implementation).
#
# Given per-url Poisson change rates λ_i and a total crawl budget B
# (revisits per second across the corpus), choose revisit frequencies
# f_i maximizing average freshness  F̄ = (1/N) Σ_i (f_i/λ_i)(1−e^{−λ_i/f_i})
# subject to Σ f_i = B.  The Lagrange condition equalizes marginal
# freshness  dF_i/df_i = (1/λ_i)(1 − (1+r_i)e^{−r_i}) = μ  with
# r_i = λ_i/f_i, giving  r_i = φ⁻¹(μ·λ_i)  and the paper's famous
# counterintuitive consequence: pages that change much faster than the
# budget can track are ABANDONED (μ·λ_i ≥ 1 ⇒ f_i = 0) — proportional-
# to-λ allocation is provably worse than uniform, and the optimum is
# neither.
#
# Scale shape: λ is quantized onto a log grid (`grid` buckets per
# e-fold, default 64 ≈ 1.6 % resolution — document, never silent), the
# histogram is ONE map-side-combined groupBy whose row count is
# bounded by the λ dynamic range (a few thousand rows at any corpus
# size), the outer bisection on μ runs driver-side over that bounded
# histogram, and the per-bucket frequencies broadcast back for a
# map-side join.  No per-row numeric iteration ever runs on the
# executors.
# ---------------------------------------------------------------------------

def _phi(r: float) -> float:
    """φ(r) = 1 − (1+r)e^{−r} — marginal-freshness kernel, increasing
    from 0 to 1 on r ∈ [0, ∞)."""
    import math

    return 1.0 - (1.0 + r) * math.exp(-r)


def _phi_inv(x: float) -> float:
    """Inverse of φ on (0, 1) by bisection (monotone; 80 halvings is
    ~1e-24 relative — exact at double precision)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return float("inf")
    lo, hi = 0.0, 1.0
    while _phi(hi) < x:
        hi *= 2.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if _phi(mid) < x:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _opt_freq(lam: float, mu: float) -> float:
    """Optimal revisit frequency for one change rate at multiplier μ:
    f = λ / φ⁻¹(μλ), 0 when the page is abandoned (μλ ≥ 1) or never
    changes (λ = 0 — already always fresh)."""
    if lam <= 0.0 or mu * lam >= 1.0:
        return 0.0
    r = _phi_inv(mu * lam)
    return lam / r if r > 0.0 else 0.0


def refresh_allocation(rates: DataFrame, budget: float,
                       default_rate: float = 0.0,
                       grid: int = 64) -> DataFrame:
    """(url, lam, freq): freshness-optimal revisit frequencies summing
    to ``budget`` (same unit as ``rate``: events per second).  Input is
    :func:`change_rate` output; urls with no change evidence use
    ``default_rate`` (0 ⇒ never revisited by THIS policy — pair with
    :func:`recrawl_due`'s TTL hard expiry so nothing starves forever).

    ``freq`` feeds the drain directly: ``freq · age`` is a
    staleness-rate-weighted priority, or threshold ``age ≥ 1/freq`` to
    emit due urls.  Determinism: the quantization, bisection, and
    per-bucket solve are all closed-form in (rates, budget, grid) —
    no wall clock, no RNG.
    """
    import math

    lam_col = F.when(F.col("rate") > 0, F.col("rate")).otherwise(
        F.lit(float(default_rate))
    ).cast("double")
    lam_df = rates.select("url", lam_col.alias("lam"))
    if budget <= 0.0:
        return lam_df.withColumn("freq", F.lit(0.0))
    # log-grid bucket id; λ=0 routes to a sentinel bucket (freq 0)
    bucket = F.when(
        F.col("lam") > 0,
        F.round(F.log(F.col("lam")) * F.lit(float(grid))).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    with_b = lam_df.withColumn("_b", bucket)
    hist = (
        with_b.filter(F.col("_b").isNotNull())
        .groupBy("_b").agg(F.count("*").alias("cnt"))
        .collect()
    )
    if not hist:
        return with_b.select(
            "url", "lam", F.lit(0.0).alias("freq"))

    buckets = [(int(r._b), int(r.cnt), math.exp(r._b / float(grid)))
               for r in hist]

    def total(mu: float) -> float:
        return sum(cnt * _opt_freq(lam_b, mu)
                   for (_b, cnt, lam_b) in buckets)

    # μ ↓ ⇒ every f ↑ (monotone); bracket then bisect.  μ_hi: abandon
    # everything; μ_lo: shrink until Σf exceeds the budget.
    mu_hi = 1.0 / min(lam_b for (_b, _c, lam_b) in buckets)
    mu_lo = mu_hi
    while total(mu_lo) < budget:
        mu_lo /= 2.0
        if mu_lo < 1e-300:
            break
    for _ in range(200):
        mid = (mu_lo + mu_hi) / 2.0
        if total(mid) > budget:
            mu_lo = mid
        else:
            mu_hi = mid
    mu = (mu_lo + mu_hi) / 2.0

    spark = rates.sparkSession
    freq_tbl = spark.createDataFrame(
        [(b, _opt_freq(lam_b, mu)) for (b, _c, lam_b) in buckets],
        "_b long, freq double",
    )
    return (
        with_b.join(F.broadcast(freq_tbl), "_b", "left")
        .select("url", "lam",
                F.coalesce(F.col("freq"), F.lit(0.0)).alias("freq"))
    )
