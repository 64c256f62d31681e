"""Politeness: robots.txt gating + per-host token-bucket drain (T2).

The reference paces with a 0.5 s inter-batch sleep and an optional
``hits_per_sec`` cap (`url_seeder.py:87-88`,
`test_async_url_seeder.py:270-309`). In a distributed batch engine the
same contract — never exceed a per-host fetch rate — becomes a
per-superstep, per-host drain quota:

    quota(host) = floor(superstep_budget_secs × hits_per_sec(host))

computed from a broadcast ``robots`` table (host, disallow paths,
crawl_delay). Rows over quota stay in the frontier for later
supersteps, which simultaneously kills hot-host skew in the fetch join
(no partition ever holds more than quota rows of one host).

All columnar: a broadcast join + one window; no stateful UDF needed —
the "token bucket" state is the frontier itself (undrained rows are
the unspent tokens).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from website_to_agent_spark.functions import urlfns


def robots_filter(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop frontier URLs disallowed by robots. Two table shapes:

    - with a ``rules`` column (RFC 9309 — built by
      ``robotsfetch.fetch_robots``): Allow + Disallow with ``*``
      wildcards and ``$`` anchors, most-octets-wins precedence,
      allow on ties, allow when nothing matches. Fully columnar: one
      ``aggregate`` over the broadcast rule array per URL, the regex
      evaluated via ``regexp_like`` with a column pattern.
    - without it: the pre-RFC prefix semantics (path startswith any
      Disallow prefix).

    The robots table is host-keyed metadata → broadcast either way;
    matching is against path + optional query (rules like
    ``/*?sort=`` are common)."""
    # host key = lowered netloc WITH port (a different port is a
    # different service; parse_url HOST would drop it)
    f = frontier.withColumn("_host", F.lower(urlfns.netloc(F.col("url"))))
    if "rules" in robots.columns:
        joined = f.join(
            F.broadcast(
                robots.select(F.lower(F.col("host")).alias("_host"), "rules")
            ),
            "_host",
            "left",
        )
        q = F.parse_url(F.col("url"), F.lit("QUERY"))
        target = F.concat(
            urlfns.path(F.col("url")),
            F.when(q.isNotNull() & (q != ""), F.concat(F.lit("?"), q))
            .otherwise(F.lit("")),
        )
        best = F.aggregate(
            F.coalesce(F.col("rules"), F.array().cast(
                "array<struct<prio:int,re:string,allow:boolean>>")),
            F.struct(F.lit(-1).alias("prio"), F.lit(True).alias("allow")),
            lambda acc, r: F.when(
                F.regexp_like(target, r["re"])
                & ((r["prio"] > acc["prio"])
                   | ((r["prio"] == acc["prio"]) & r["allow"])),
                F.struct(r["prio"].alias("prio"), r["allow"].alias("allow")),
            ).otherwise(acc),
        )
        return joined.filter(best["allow"]).drop("_host", "rules")
    joined = f.join(
        F.broadcast(
            robots.select(F.lower(F.col("host")).alias("_host"), "disallow")
        ),
        "_host",
        "left",
    )
    disallowed = F.exists(
        F.coalesce(F.col("disallow"), F.array()),
        lambda p: urlfns.path(F.col("url")).startswith(p),
    )
    return joined.filter(~disallowed).drop("_host", "disallow")


def polite_drain(
    frontier: DataFrame,
    robots: Optional[DataFrame] = None,
    superstep_secs: float = 1.0,
    default_hits_per_sec: float = 2.0,
    order_cols: Tuple[str, ...] = ("ord",),
    superstep: int = 0,
    salt_buckets: int = 0,
    salt_col: Optional[str] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Split the frontier into (batch, leftover) under per-host rate
    quotas. Returns both; the caller unions ``leftover`` back into the
    next superstep's frontier.

    Hosts whose ``crawl_delay`` exceeds ``superstep_secs`` must NOT be
    drained every superstep (flooring the quota at 1 would fetch them
    ``crawl_delay / superstep_secs``× too fast). They get one fetch
    every ``ceil(crawl_delay / superstep_secs)`` supersteps instead —
    stateless: the gate is a function of the caller's ``superstep``
    counter, no per-host bookkeeping table needed, and the long-run
    rate is ≤ 1 / crawl_delay as robots.txt demands.

    If the frontier already carries a ``host`` column (e.g. read from a
    snapshot written bucketed by host — SURVEY §7.6 salted-domain
    partitioning), the drain window partitions on the STORED column, so
    a host-bucketed scan satisfies the window's distribution with NO
    Exchange (asserted in test_scale_path); otherwise the host is
    derived from the url as before.

    ``salt_buckets > 1`` enables the SKEW-BOUNDED two-phase drain for
    hot hosts (SURVEY §4: a host holding 30% of a 10^10-row frontier
    would put all its rows in ONE window partition). Phase 1 ranks
    within (host, salt) — ``urlfns.salted_key`` — and keeps at most
    ``quota`` rows per salt bucket; phase 2 ranks the surviving
    ≤ salt_buckets × quota rows per host exactly. Any global per-host
    top-``quota`` row is necessarily in its salt bucket's top-``quota``,
    so the result is IDENTICAL to the unsalted drain (asserted in
    test_scale_path) while no single task ever scans more than its salt
    shard of a hot host.

    ``salt_col`` picks the column salting hashes on (default: the
    first order column). Pass it when the primary order column is
    low-cardinality — e.g. a priority score that is constant per host
    would put a hot host's whole frontier in one salt bucket."""
    if "host" in frontier.columns:
        f = frontier.withColumn("_host", F.col("host"))
    else:
        f = frontier.withColumn(
            "_host", F.lower(urlfns.netloc(F.col("url")))
        )
    if robots is not None:
        delay = F.coalesce(
            F.col("crawl_delay"), F.lit(1.0 / default_hits_per_sec)
        )
        fast_quota = F.floor(F.lit(superstep_secs) / delay)
        period = F.ceil(delay / F.lit(superstep_secs)).cast("long")
        slow_quota = F.when(
            F.lit(superstep) % period == 0, F.lit(1)
        ).otherwise(F.lit(0))
        f = f.join(
            F.broadcast(
                robots.select(F.lower(F.col("host")).alias("_host"), "crawl_delay")
            ),
            "_host",
            "left",
        ).withColumn(
            "_quota",
            F.when(fast_quota >= 1, fast_quota).otherwise(slow_quota),
        ).drop("crawl_delay")
    else:
        f = f.withColumn(
            "_quota",
            F.lit(max(1, int(superstep_secs * default_hits_per_sec))),
        )
    order = [F.col(c) for c in order_cols]
    drop_cols = ["_host", "_quota", "_rk"]
    if salt_buckets > 1:
        f = f.withColumn(
            "_hsalt",
            urlfns.salted_key(
                F.col("_host"), F.col(salt_col or order_cols[0]),
                F.lit(salt_buckets),
            ),
        )
        w1 = Window.partitionBy("_hsalt").orderBy(*order)
        f = f.withColumn("_rk1", F.row_number().over(w1))
        survivors = f.filter(F.col("_rk1") <= F.col("_quota"))
        cut1 = f.filter(F.col("_rk1") > F.col("_quota"))
        w = Window.partitionBy("_host").orderBy(*order)
        ranked = survivors.withColumn("_rk", F.row_number().over(w))
        drop2 = drop_cols + ["_hsalt", "_rk1"]
        batch = ranked.filter(F.col("_rk") <= F.col("_quota")).drop(*drop2)
        leftover = (
            ranked.filter(F.col("_rk") > F.col("_quota"))
            .drop(*drop2)
            .unionByName(cut1.drop("_host", "_quota", "_hsalt", "_rk1"))
        )
        return batch, leftover
    w = Window.partitionBy("_host").orderBy(*order)
    ranked = f.withColumn("_rk", F.row_number().over(w))
    batch = ranked.filter(F.col("_rk") <= F.col("_quota")).drop(*drop_cols)
    leftover = ranked.filter(F.col("_rk") > F.col("_quota")).drop(*drop_cols)
    return batch, leftover


def adaptive_crawl_delay(
    crawled: DataFrame,
    robots: Optional[DataFrame] = None,
    threshold: float = 0.5,
    factor: float = 2.0,
    max_delay: float = 60.0,
    default_delay: float = 0.5,
) -> DataFrame:
    """Failure-driven per-host backoff — the Retry-After / 429
    discipline a live crawler applies between crawl rounds: hosts
    whose last-round failure rate reached ``threshold`` get their
    ``crawl_delay`` multiplied by ``factor`` (capped at
    ``max_delay``); healthy hosts keep their configured delay; failing
    hosts with no robots row get one at ``default_delay * factor``.
    Returns the updated ``robots(host, disallow, crawl_delay)`` table
    to feed the next ``CrawlEngine(robots=...)`` run — the policy's
    state lives in the table itself, so it is deterministic,
    inspectable, and resumes with the catalog like everything else.

    Scale shape: one host-keyed aggregation of the (already tiny
    relative to the corpus) crawl result + one host-keyed join with
    the broadcast-sized robots table. The failure rate resets each
    round by construction; repeated failing rounds keep multiplying —
    exponential backoff without a bookkeeping table.
    """
    from website_to_agent_spark.functions import urlfns

    rates = (
        crawled.groupBy(
            F.lower(urlfns.netloc(F.col("url"))).alias("host")
        )
        .agg(F.avg((~F.col("success")).cast("double")).alias("_fail"))
    )
    if robots is None:
        robots = rates.sparkSession.createDataFrame(
            [], "host string, disallow array<string>, crawl_delay double"
        )
    # normalize host case BEFORE the join (every politeness consumer
    # lowercases at use; joining raw against the lowercased rates
    # would fork a 'Example.com' row into two rows for one host).
    # Case-duplicate robots rows merge conservatively: max delay,
    # union of disallow prefixes.
    robots_norm = (
        robots.groupBy(F.lower(F.col("host")).alias("host"))
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("disallow")))
            ).alias("disallow"),
            F.max("crawl_delay").alias("crawl_delay"),
        )
    )
    joined = robots_norm.join(rates, "host", "full_outer")
    return joined.select(
        "host",
        F.coalesce(
            F.col("disallow"), F.array().cast("array<string>")
        ).alias("disallow"),
        F.when(
            F.coalesce(F.col("_fail"), F.lit(0.0)) >= threshold,
            F.least(
                F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
                * factor,
                F.lit(max_delay),
            ),
        )
        .otherwise(
            F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
        )
        .alias("crawl_delay"),
    )
