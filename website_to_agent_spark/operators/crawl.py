"""The crawl frontier engine — superstep dataflow (SURVEY §2.8, §7).

Re-expresses the reference's two sequential crawl loops as a driver-side
superstep loop over DataFrames:

- client mode = `Crawl4AIClient.extract_website_content`
  (`crawl4ai_client.py:219-309`): FIFO queue, exact-host filter,
  success-counted ``max_urls`` budget, link discovery from the pruned
  main content.
- seeder mode = `URLSeeder.seed_urls` (`url_seeder.py:34-97`):
  batched BFS (batch 5), depth cap, discovered-set budget, 5-gate URL
  validity filter over the full document.

Each superstep is one Catalyst-planned job::

    frontier(batch) ⋈ pages → extract_udf → posexplode(links)
      → Column filters (F1-F14) → [bloom prefilter] → left_anti seen
      → min-key first-enqueue-wins dedup → ord assignment
      → append (crawled', seen', frontier', metrics')

Ordering parity: every enqueued URL carries ``ord`` — its global FIFO
enqueue rank per job, assigned as ``next_ord + row_number() over
(partitionBy job_id orderBy parent_ord, link_pos)``. Because the
reference's sequential loop is BFS in discovery order, sorting fetched
rows by ``ord`` reproduces its pop order exactly (first-enqueue-wins
dedup = ``min(struct(parent_ord, pos))``; the budget cutoff is a
running per-job window over successes, matching `while ... and
len(scraped_urls) < max_urls`).

Scale notes (100 TB / 10^10-frontier design):
- Everything is keyed by ``job_id`` — one engine run drives millions of
  independent crawl jobs; all windows are per-job, so parallelism is
  across jobs and pages, never a global sort.
- The frontier⋈pages join broadcasts the (small) drained frontier batch
  against the huge pages table; on a cluster the pages table is
  bucketed by url hash so the probe is partition-pruned.
- Per-superstep state is checkpointed through ``SnapshotCatalog``
  (atomic manifest commit) and re-read, truncating lineage — killed
  jobs resume exactly (T5).
- Hot-host skew: drain quotas per registrable domain (politeness, T2)
  plus AQE skew-join; candidates are deduped map-side by
  (job, url) before the anti-join shuffle.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from website_to_agent_spark import schema
from website_to_agent_spark.functions import urlfns
from website_to_agent_spark.functions.extract import (
    banner,
    extract_udf,
    format_content_markdown,
    seeder_links_udf,
)
from website_to_agent_spark.operators import filters
from website_to_agent_spark.sources.catalog import SnapshotCatalog


@dataclass
class CrawlJob:
    job_id: str
    seed_url: str
    max_urls: int = 5          # client: success budget; seeder: discovered budget
    max_depth: Optional[int] = None   # seeder only (client has no depth cap)

    @property
    def base_domain(self) -> str:
        return urlparse(self.seed_url).netloc


def _release_checkpoint(df: Optional[DataFrame], blocking: bool = False) -> None:
    """Free the storage blocks behind a ``localCheckpoint``-ed DataFrame.

    ``DataFrame.unpersist()`` only touches ``persist()``-cached plans;
    a local checkpoint's blocks belong to the underlying RDD (the
    ``LogicalRDD`` leaf of the checkpointed plan), so they must be
    unpersisted through it. Long crawls otherwise accumulate every
    superstep's bundle/frontier/state/bloom blocks in executor storage
    — unbounded creep at 10^10-frontier scale (round-2 verdict's one
    scale-killer). Best-effort: this walks internal API, so failures
    degrade to the old keep-everything behavior, never to wrong data.
    """
    if df is None:
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(blocking)
    except Exception:
        pass


@dataclass
class CrawlResultTables:
    crawled: DataFrame
    seen: DataFrame
    metrics: DataFrame
    supersteps: int = 0
    job_state: Optional[DataFrame] = None
    # (job_id, host, template, dropped, superstep) when the engine ran
    # with trap_max_urls — every candidate the trap guard dropped,
    # template-granular (no-silent-caps). None when the guard was off.
    trap_drops: Optional[DataFrame] = None
    # (job_id, url, final_url, n_hops, redirect_ok, superstep) for
    # every fetched url whose redirect chain was followed (n_hops > 0)
    # or failed to resolve (redirect_ok=false: loop / over max hops).
    # None when the store has no redirect_to column.
    redirects: Optional[DataFrame] = None
    # (job_id, url, superstep) for every fetch answered from the
    # revalidation snapshot (digest unchanged — 304 semantics). None
    # unless the engine ran with revalidate_with.
    revalidated: Optional[DataFrame] = None
    # (job_id, url, superstep) for pages whose <meta name="robots">
    # said noindex/none — content crawled (for completeness) but
    # flagged for the index/corpus layer to drop. None unless the
    # engine ran with honor_meta_robots=True.
    noindexed: Optional[DataFrame] = None
    # (job_id, url, cash, hist) — the final OPIC cash/history state
    # (url '' is the per-job dangling sink). Feed to opic_importance
    # for the normalized estimate. None unless the engine ran with
    # opic=True.
    opic: Optional[DataFrame] = None
    # every localCheckpoint the run still holds at return time; on a
    # catalog-backed run the result tables re-read from disk so this is
    # just the final bloom/state, on an in-memory run it backs
    # crawled/seen/metrics themselves.
    checkpoints: list = field(default_factory=list)

    def unpersist(self, blocking: bool = False) -> None:
        """Free every superstep checkpoint retained by this run.

        Call once the result tables have been consumed (collected /
        written out). On a run without a checkpoint catalog the result
        DataFrames are BACKED by these blocks — they must not be used
        afterwards. Catalog-backed runs stay readable (disk snapshots).
        """
        for df in self.checkpoints:
            _release_checkpoint(df, blocking)
        self.checkpoints = []


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: Optional[DataFrame],
        mode: str = "client",
        checkpoint_dir: Optional[str] = None,
        batch_per_job: Optional[int] = None,
        domain_quota: Optional[int] = None,
        max_supersteps: int = 200,
        use_bloom: bool = False,
        bloom_bits: int = 1 << 20,
        seen_filter: Optional[str] = None,
        cuckoo_buckets: int = 1 << 12,
        cuckoo_slots: int = 4,
        robots: Optional[DataFrame] = None,
        superstep_secs: float = 1.0,
        fetch_timeout_s: float = 30.0,
        output_format: str = "markdown",
        bucket_frontier: int = 0,
        drain_salt_buckets: int = 0,
        priority: Optional[DataFrame] = None,
        priority_on: str = "url",
        opic: bool = False,
        trap_max_urls: Optional[int] = None,
        follow_redirects: bool = True,
        redirect_max_hops: int = 5,
        revalidate_with: Optional[DataFrame] = None,
        honor_meta_robots: bool = False,
    ):
        assert mode in ("client", "seeder")
        # P13 output-format dispatch (`crawl4ai_client.py:25-31,352-386`)
        assert output_format in ("markdown", "html", "text", "json", "structured")
        self.output_format = output_format
        self.spark = spark
        # pages=None → LIVE mode: fetch over HTTP via the mapInPandas
        # kernel (sources/httpfetch.py) instead of the page-store join.
        self.pages = pages
        self.fetch_timeout_s = fetch_timeout_s
        self.mode = mode
        self.catalog = SnapshotCatalog(checkpoint_dir) if checkpoint_dir else None
        # seeder parity batches 5 per job (`url_seeder.py:63`); client
        # parity drains the whole BFS level (sequential loop ≡ BFS).
        if batch_per_job is None and mode == "seeder":
            batch_per_job = 5
        self.batch_per_job = batch_per_job
        self.domain_quota = domain_quota
        self.max_supersteps = max_supersteps
        # URL-seen prefilter (north_star "partitioned Bloom/cuckoo
        # URL-seen filter"): seen_filter ∈ {None, "bloom", "cuckoo"};
        # use_bloom=True is back-compat for seen_filter="bloom". Both
        # share the contract: negative ⇒ enqueue directly (skip the
        # anti-join shuffle), positive ⇒ exact check — and both are
        # maintained O(Δ) per superstep (OR-merge / cogrouped fold).
        # The cuckoo additionally supports fingerprint deletion
        # (re-crawl TTL expiry — operators/cuckoo.py).
        assert seen_filter in (None, "bloom", "cuckoo")
        self.seen_filter = seen_filter or ("bloom" if use_bloom else None)
        self.use_bloom = self.seen_filter is not None
        self.bloom_bits = bloom_bits
        self.cuckoo_buckets = cuckoo_buckets
        self.cuckoo_slots = cuckoo_slots
        # robots(host, disallow array<string>, crawl_delay double):
        # disallowed paths never enter the frontier; crawl_delay drives
        # per-host drain quotas (T2) via polite_drain.
        self.robots = robots
        self.superstep_secs = superstep_secs
        # >0: checkpointed frontier snapshots are written hash-bucketed
        # by job_id into this many buckets (SURVEY §7.6), so next
        # superstep's drain/ord windows (partitionBy job_id) read
        # pre-bucketed data without a full shuffle. Requires a catalog.
        self.bucket_frontier = bucket_frontier
        # >1: two-phase skew-bounded politeness drain (hot hosts rank
        # within (host, salt) shards first — identical output, bounded
        # per-task scan; politeness.polite_drain docstring).
        self.drain_salt_buckets = drain_salt_buckets
        # PRIORITY-QUEUE drain (north-star "priority queue realized as
        # score-bucketed frontier partitions drained in ranked
        # batches"): a scores table — (url, score) or, the scale form,
        # (host, score) with priority_on="host" (host-level PageRank
        # from operators/linkgraph.py — the Common-Crawl-ranking key,
        # same key politeness buckets by; tiny and broadcast) —
        # reorders BOTH the per-superstep drain selection and the
        # within-step pop/budget order to score-desc (ties and
        # unscored rows fall back to FIFO ord, so equal scores ≡ the
        # default crawl). Applies to the batch_per_job drain; the
        # reference-parity paths never pass it. The global fetch_ord
        # in the result stays enqueue-keyed (ord): per-batch pop order
        # is (superstep, score) by construction.
        assert priority_on in ("url", "host")
        self.priority = priority
        self.priority_on = priority_on
        # OPIC — Adaptive On-line Page Importance Computation
        # (Abiteboul, Preda & Cobena, WWW'03 — public paper,
        # independent implementation): the frontier priority LEARNS
        # during the crawl instead of coming from a prior rank job.
        # Every url carries cash (init: 1.0 on each seed) and history;
        # fetching a page moves its cash to history and distributes it
        # equally over its candidate out-links (the enqueue candidates
        # AFTER hygiene filters, BEFORE seen-dedup — cash landing on
        # already-seen urls still accumulates toward their importance,
        # the paper's re-citation signal). Pages with no candidates
        # (failed fetches, dangling pages) sink their cash into a
        # per-job '' row — accounted, never silent (full OPIC cycles
        # it through a virtual page; a budget-bounded crawl sinks it).
        # The greedy crawl-highest-cash drain IS the paper's adaptive
        # strategy; `opic_importance` turns the final state into the
        # normalized importance estimate (history + cash).
        # Scale shape: the cash table is (job, url)-keyed like the
        # frontier; the drain score is a co-keyed hash join (never a
        # broadcast — the state is frontier-sized) and the per-step
        # fold is one union + one map-combinable groupBy over
        # state + Δ, checkpoint-and-release like every other engine
        # state. Cash/history round to 12 dp at each fold so drain
        # tie-breaks are deterministic across partitionings (the
        # pagerank loop's rounding discipline). In-memory state like
        # the trap guard: a catalog resume restarts cash from the
        # resumed frontier (documented re-learn).
        assert not (opic and priority is not None), (
            "opic=True supplies its own adaptive drain scores; pass "
            "either opic or priority, not both"
        )
        self.opic = opic
        # CRAWLER-TRAP GUARD (operators/traps.py): cumulative cap on
        # frontier enqueues per (job, host, url-template). Once a
        # template has enqueued `trap_max_urls` urls, later candidates
        # matching it are dropped BEFORE the dedup shuffle via a
        # broadcast anti-join against the (tiny) capped-template set —
        # the candidate stream itself never shuffles for the guard.
        # Counts update O(Δ) per superstep from the actually-enqueued
        # rows, so the cap lags one superstep: a fresh trap can
        # overshoot by at most one step's link yield before it
        # engages (documented, deterministic). Drops are never silent:
        # CrawlResultTables.trap_drops records (job, host, template,
        # dropped, superstep). Guard state is in-memory; a catalog
        # resume re-learns counts from the resume point.
        self.trap_max_urls = trap_max_urls
        # HTTP REDIRECTS (operators/redirects.py): engaged only when
        # the page store carries a `redirect_to` column — stores
        # without one crawl bit-identically to before. Fetching a
        # redirect row returns the FINAL page's content (the
        # reference's HTTP client follows chains transparently,
        # `crawl4ai_client.py:75`), links resolve against the FINAL
        # url, chains past `redirect_max_hops` fail the fetch
        # (TooManyRedirects — loops hit the same cap), and final urls
        # enter the seen set so a 301 alias and its target can't both
        # be fetched by later enqueues. CrawlResultTables.redirects
        # records every followed/failed chain (never silent).
        self.follow_redirects = follow_redirects
        self.redirect_max_hops = redirect_max_hops
        # CONDITIONAL REVALIDATION (If-None-Match → 304, see
        # operators/recrawl.revalidate): a snapshot table from a prior
        # crawl of the same store — (url, digest, title, description,
        # keywords, text, markdown, content), built by
        # recrawl.crawl_snapshots. During the fetch, a url whose
        # current html digest equals the snapshot digest REUSES the
        # stored extraction AND stored out-links verbatim (the Arrow
        # parse kernel — the dominant re-crawl cost — never runs for
        # it; byte-identical html ⟹ identical links, replayed from
        # the snapshot's link-DB column). Reused urls still consume
        # fetch budget (the request happened; only the body/processing
        # is saved — exactly HTTP 304 semantics). Rows are recorded in
        # CrawlResultTables.revalidated. Client mode only (the seeder
        # never extracts). The stored `content` is reused as-is, so
        # the snapshot must come from a run with the same
        # output_format.
        self.revalidate_with = revalidate_with
        # ROBOTS META DIRECTIVES (REP): when True (both modes — the
        # client reads them from the extraction struct, the seeder
        # from a one-parse links+directives kernel so the parity
        # kernel stays byte-identical), a page whose
        # <meta name="robots"> carries
        # nofollow/none contributes NO candidates, anchors with
        # rel="nofollow" are excluded from discovery (url-level — a
        # url both followed and nofollowed on one page is excluded,
        # the conservative reading), and noindex/none pages are
        # recorded in CrawlResultTables.noindexed so the corpus/index
        # layer can drop their content. All three signals come out of
        # the SAME Arrow parse the extraction already runs (additive
        # EXTRACTED fields) — zero extra passes. Default False: the
        # reference client ignores robots meta, so parity runs stay
        # bit-identical.
        self.honor_meta_robots = honor_meta_robots

    # ---------------------------------------------------------------- init
    def _init_state(self, jobs: list[CrawlJob]):
        spark = self.spark
        frontier = spark.createDataFrame(
            [(j.job_id, j.seed_url, 0, 0) for j in jobs],
            "job_id string, url string, depth int, ord long",
        )
        seen = spark.createDataFrame(
            [(j.job_id, j.seed_url, 0, 0) for j in jobs],
            "job_id string, url string, ord long, depth int",
        )
        # seeder counts the seed itself against the discovered budget
        # (`url_seeder.py:51`); the client budget counts successes only.
        init_budget = 1 if self.mode == "seeder" else 0
        job_state = spark.createDataFrame(
            [
                (
                    j.job_id,
                    init_budget,
                    1,
                    j.max_urls,
                    j.max_depth if j.max_depth is not None else -1,
                    j.base_domain,
                )
                for j in jobs
            ],
            "job_id string, budget_used long, next_ord long, max_urls long,"
            " max_depth int, base_domain string",
        )
        crawled = spark.createDataFrame([], schema.CRAWLED)
        metrics = spark.createDataFrame([], schema.METRICS)
        return frontier, seen, crawled, metrics, job_state

    _JOB_STATE_DDL = (
        "job_id string, budget_used long, next_ord long, max_urls long,"
        " max_depth int, base_domain string"
    )

    def _job_state_df(self, js: dict) -> DataFrame:
        """Materialize the driver-side job-state dict (one short row
        per job — bounded by the job count, the same bound the old
        per-step job_state checkpoint carried) as a DataFrame for the
        frontier/batch joins. createDataFrame of a job-count-bounded
        list costs no Spark job."""
        return self.spark.createDataFrame(
            [(k, int(v[0]), int(v[1]), int(v[2]), int(v[3]), v[4])
             for k, v in js.items()],
            self._JOB_STATE_DDL,
        )

    # ---------------------------------------------------------------- run
    def run(self, jobs: list[CrawlJob], resume: bool = False) -> CrawlResultTables:
        spark = self.spark
        start_step = 0
        crawled_parts: list[DataFrame] = []
        metrics_parts: list[DataFrame] = []
        # r6: job_state lives DRIVER-SIDE (dict keyed by job_id →
        # [budget_used, next_ord, max_urls, max_depth, base_domain]) —
        # it is one short row per job, updated from per-step aggregate
        # stats the loop collects anyway. This replaces two Spark jobs
        # per superstep (the frontier⋈state isEmpty probe and the
        # job_state localCheckpoint) with one bounded collect; the
        # joins that need state columns get a createDataFrame snapshot
        # (broadcast-sized by construction). At 10^6-job scale the
        # stats collect stays bounded by the ACTIVE job count per
        # superstep — the same bound the old checkpointed table had.
        js: dict = {}
        # per-job frontier row counts when the driver knows them
        # exactly (fresh start: the seeds; steps without drain
        # leftover: the enqueue counts); None = probe before draining
        frontier_counts = None
        if resume and self.catalog is not None:
            latest = self.catalog.latest_superstep()
            if latest is not None:
                frontier = self.catalog.read(spark, latest, "frontier")
                job_state = self.catalog.read(spark, latest, "job_state")
                js = {
                    r.job_id: [r.budget_used, r.next_ord, r.max_urls,
                               r.max_depth, r.base_domain]
                    for r in job_state.collect()
                }
                # crawled/metrics/seen are append-only deltas — one per
                # step; seen step-0 base = the seed rows (rebuilt from
                # the jobs list, identical to the original init). A
                # compaction snapshot (catalog.compact) replaces the
                # covered prefix with ONE base read, so resume cost is
                # O(tail), not O(total supersteps).
                _, seen, _, _, _ = self._init_state(jobs)
                base = self.catalog.latest_compaction()
                first_k = 0
                if base is not None and base <= latest:
                    crawled_parts.append(
                        self.catalog.read_compacted(spark, base, "crawled_delta")
                    )
                    metrics_parts.append(
                        self.catalog.read_compacted(spark, base, "metrics_delta")
                    )
                    seen = seen.unionByName(
                        self.catalog.read_compacted(spark, base, "seen_delta")
                    )
                    first_k = base + 1
                for k in range(first_k, latest + 1):
                    crawled_parts.append(
                        self.catalog.read(spark, k, "crawled_delta")
                    )
                    metrics_parts.append(
                        self.catalog.read(spark, k, "metrics_delta")
                    )
                    seen = seen.unionByName(
                        self.catalog.read(spark, k, "seen_delta")
                    )
                crawled = metrics = None  # unused in delta mode
                start_step = latest + 1
            else:
                frontier, seen, crawled, metrics, job_state = self._init_state(jobs)
        else:
            frontier, seen, crawled, metrics, job_state = self._init_state(jobs)
        if not js:
            init_budget = 1 if self.mode == "seeder" else 0
            js = {
                j.job_id: [init_budget, 1, j.max_urls,
                           j.max_depth if j.max_depth is not None else -1,
                           j.base_domain]
                for j in jobs
            }
            if start_step == 0:
                frontier_counts = {j.job_id: 1 for j in jobs}

        pages = (
            self.pages.select("url", "html").withColumnRenamed("url", "p_url")
            if self.pages is not None
            else None
        )
        # r6: slim url-only copy of the page store for KEY-side probes
        # (the hit_keys broadcast build in _fetch/_fetch_following).
        # The store is routinely a checkpointed/ExistingRDD frame, and
        # those scans cannot column-prune — deriving hit keys from the
        # fat table deserialized every html payload once more per
        # superstep (measured ~0.3-0.4 s/step at sf0.1; at cluster
        # scale it is a second full store read per superstep). Built
        # once per crawl, released with the result tables.
        pages_urls = (
            pages.select("p_url").localCheckpoint(eager=True)
            if pages is not None
            else None
        )
        # redirect edge table: one store scan, materialized once per
        # crawl (a small fraction of rows), probed per superstep by
        # broadcast joins of the batch — see _fetch_following.
        redirect_edges_df: Optional[DataFrame] = None
        if (
            self.follow_redirects
            and self.pages is not None
            and "redirect_to" in self.pages.columns
        ):
            from website_to_agent_spark.operators import (
                redirects as redirects_mod,
            )

            redirect_edges_df = redirects_mod.redirect_edges(
                self.pages
            ).localCheckpoint(eager=True)
        redirect_parts: list[DataFrame] = []
        # revalidation snapshot columns, renamed out of the way of the
        # batch/page columns (client mode only — the seeder extracts
        # nothing, so there is nothing to reuse)
        snap: Optional[DataFrame] = None
        if (
            self.revalidate_with is not None
            and self.pages is not None
            and self.mode == "client"
        ):
            rw = self.revalidate_with
            _empty_sarr = F.array().cast("array<string>")
            snap = rw.select(
                F.col("url").alias("_su"),
                F.col("digest").alias("_snap_digest"),
                F.col("title").alias("_snap_title"),
                F.col("description").alias("_snap_description"),
                F.col("keywords").alias("_snap_keywords"),
                F.col("text").alias("_snap_text"),
                F.col("markdown").alias("_snap_markdown"),
                F.col("content").alias("_snap_content"),
                F.col("links").alias("_snap_links"),
                (
                    F.col("robots_noindex")
                    if "robots_noindex" in rw.columns
                    else F.lit(False)
                ).alias("_snap_noindex"),
                (
                    F.col("robots_nofollow")
                    if "robots_nofollow" in rw.columns
                    else F.lit(False)
                ).alias("_snap_nofollow"),
                (
                    F.col("nofollow_links")
                    if "nofollow_links" in rw.columns
                    else _empty_sarr
                ).alias("_snap_nflinks"),
            )
        reval_parts: list[DataFrame] = []
        noindex_parts: list[DataFrame] = []

        step = start_step
        blooms: Optional[DataFrame] = None
        # OPIC cash/history (see __init__): every frontier row starts
        # with cash 1.0 (on a catalog resume: the resumed frontier —
        # documented re-learn, same contract as the trap guard)
        opic_cash: Optional[DataFrame] = None
        _prev_opic: Optional[DataFrame] = None
        if self.opic:
            opic_cash = frontier.select(
                "job_id", "url",
                F.lit(1.0).alias("cash"), F.lit(0.0).alias("hist"),
            ).localCheckpoint(eager=True)
        # trap-guard state: cumulative enqueue counts per (job, host,
        # template) + per-step drop records (see __init__ docstring)
        trap_counts: Optional[DataFrame] = None
        trap_drop_parts: list[DataFrame] = []
        # checkpoint lifecycle: `retained` = blocks the RESULT tables
        # still need (released by CrawlResultTables.unpersist());
        # `prev_*` = the previous superstep's state checkpoints, dead as
        # soon as the current step's are materialized and released then
        # — bounded executor storage over arbitrarily long crawls.
        retained: list[DataFrame] = []
        prev_frontier_ckpt: Optional[DataFrame] = None
        # deferred releases for LAZY checkpoints (the bloom/cuckoo
        # merge): a lazy localCheckpoint materializes inside the next
        # step's first consuming job instead of costing its own eager
        # job, so its parent can only be released AFTER that job ran
        pending_release: list[DataFrame] = []
        _timing = os.environ.get("SPARK_GRAFT_STEP_TIMING") == "1"

        def _jid() -> int:
            if not _timing:
                return 0
            return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

        while step < start_step + self.max_supersteps:
            t0 = time.time()
            _j0 = _jid()
            # active jobs: budget remaining — checked driver-side (the
            # state dict is exact), so the old frontier⋈state isEmpty
            # job only survives as a bounded count probe on the steps
            # whose frontier content the driver cannot know (drain
            # leftover / catalog resume)
            active_ids = [k for k, v in js.items() if v[0] < v[2]]
            if not active_ids:
                break
            if frontier_counts is None:
                frontier_counts = {
                    r.job_id: r.cnt
                    for r in frontier.groupBy("job_id")
                    .agg(F.count("*").alias("cnt")).collect()
                }
            if not any(frontier_counts.get(k, 0) > 0 for k in active_ids):
                break
            job_state = self._job_state_df(js)
            active_state = job_state.filter(F.col("budget_used") < F.col("max_urls"))
            live = (
                frontier.join(active_state, "job_id", "inner")
            )
            _t_empty = time.time()
            _j_empty = _jid()

            # ---- drain batch (O2/O4): per-job FIFO prefix, or the
            # ranked (priority-queue) prefix when scores were given ----
            if self.batch_per_job is not None:
                if self.priority is not None or self.opic:
                    scored = (
                        self._join_cash(live, opic_cash)
                        if self.opic else self._join_scores(live)
                    )
                    w_drain = Window.partitionBy("job_id").orderBy(
                        F.desc_nulls_last("score"), "ord"
                    )
                    # _pop = the ranked pop order — _client_step's
                    # budget window follows it instead of ord
                    ranked = scored.withColumn(
                        "_rk", F.row_number().over(w_drain)
                    ).withColumn("_pop", F.col("_rk")).drop("score")
                else:
                    w_drain = Window.partitionBy("job_id").orderBy("ord")
                    ranked = live.withColumn("_rk", F.row_number().over(w_drain))
                batch = ranked.filter(F.col("_rk") <= self.batch_per_job).drop("_rk")
                leftover = (
                    ranked.filter(F.col("_rk") > self.batch_per_job)
                    .drop("_rk")
                    .select("job_id", "url", "depth", "ord")
                )
            elif self.domain_quota is not None:
                dom = urlfns.reg_domain(urlfns.host(F.col("url")))
                ranked = live.withColumn("_dom", dom).withColumn(
                    "_rk",
                    F.row_number().over(
                        Window.partitionBy("job_id", "_dom").orderBy("ord")
                    ),
                )
                batch = ranked.filter(F.col("_rk") <= self.domain_quota).drop(
                    "_rk", "_dom"
                )
                leftover = (
                    ranked.filter(F.col("_rk") > self.domain_quota)
                    .drop("_rk", "_dom")
                    .select("job_id", "url", "depth", "ord")
                )
            elif self.robots is not None:
                from website_to_agent_spark.operators.politeness import (
                    polite_drain,
                )

                # priority composes with politeness: per-host quotas
                # stay the hard constraint; WITHIN a host's quota the
                # highest-scored urls drain first (_prio = -score so
                # the ascending order_cols contract holds; unscored →
                # +inf → after every scored row; salting stays keyed
                # on ord — a per-host-constant score would collapse a
                # hot host into one salt bucket)
                drain_in = live
                order_cols: tuple = ("ord",)
                if self.priority is not None or self.opic:
                    _sc = (
                        self._join_cash(live, opic_cash)
                        if self.opic else self._join_scores(live)
                    )
                    drain_in = _sc.withColumn(
                        "_prio",
                        -F.coalesce(F.col("score"), F.lit(float("-inf"))),
                    ).drop("score")
                    order_cols = ("_prio", "ord")
                batch, left_df = polite_drain(
                    drain_in, self.robots, superstep_secs=self.superstep_secs,
                    superstep=step, salt_buckets=self.drain_salt_buckets,
                    order_cols=order_cols, salt_col="ord",
                )
                if self.priority is not None or self.opic:
                    w_pop = Window.partitionBy("job_id").orderBy(
                        "_prio", "ord"
                    )
                    batch = batch.withColumn(
                        "_pop", F.row_number().over(w_pop)
                    ).drop("_prio")
                leftover = left_df.select("job_id", "url", "depth", "ord")
            else:
                batch = live
                leftover = None

            if self.mode == "seeder":
                # depth-capped rows consume their batch slots first
                # (`url_seeder.py:63-70`: the batch is sliced off the
                # queue BEFORE the depth check), then are dropped.
                batch = batch.filter(
                    (F.col("max_depth") < 0) | (F.col("depth") <= F.col("max_depth"))
                )

            # ---- fetch = join against the page store (J1), or live
            # HTTP GET when no store was given ----------------------------
            # r6: the drained batch subtree (state join + drain ranking
            # windows — polite_drain in production mode) is referenced
            # by the hits join, the hit_keys broadcast, the miss
            # anti-join and the leftover frontier — persist it lazily
            # for the step so the first consuming job computes the
            # (batch-bounded) rows once and the rest read cache.
            fetch_caches: list = []
            if pages is not None and leftover is not None:
                batch = batch.persist()
                fetch_caches.append(batch)
            if pages is not None:
                if redirect_edges_df is not None:
                    fetched = self._fetch_following(
                        batch, pages, redirect_edges_df,
                        pages_urls=pages_urls,
                    )
                else:
                    fetched = self._fetch(batch, pages,
                                          pages_urls=pages_urls)
            else:
                fetched = self._fetch_live(batch)
            if snap is not None:
                fetched = self._attach_snapshots(fetched, snap)

            # The step bundle (extraction output) is materialized ONCE —
            # everything downstream (crawled delta, candidates, stats,
            # frontier, seen) derives from it, so the Arrow extract
            # kernel runs exactly once per page per superstep instead of
            # once per derived state table.
            if self.mode == "client":
                new_crawled, candidates, per_job, bundle = self._client_step(
                    fetched, step
                )
            else:
                new_crawled, candidates, per_job, bundle = self._seeder_step(
                    fetched, step
                )
            _t_bundle = time.time()
            _j_bundle = _jid()

            # redirect FINAL urls fetched this step (content already
            # held under the requested url) — excluded from this
            # step's candidates below and added to the seen delta, so
            # a 301 alias and its target are fetched once between
            # them (Heritrix/Nutch final-url dedup semantics; the
            # reference's exact-url client would refetch).
            redir_finals = None
            if redirect_edges_df is not None and "final_url" in bundle.columns:
                redir_finals = (
                    bundle.filter(
                        F.col("success")
                        & F.col("final_url").isNotNull()
                        & (F.col("final_url") != F.col("url"))
                    )
                    .groupBy("job_id", F.col("final_url").alias("url"))
                    .agg(
                        F.min("ord").alias("ord"),
                        F.min("depth").alias("depth"),
                    )
                )

            # ---- dedup + enqueue (J2) -----------------------------------
            # candidates: job_id, url, parent_ord, pos, depth.
            # left_anti vs the enqueued-ever set = the reference's
            # scraped_set ∪ queue membership checks
            # (`crawl4ai_client.py:271-276`).
            if self.robots is not None:
                from website_to_agent_spark.operators.politeness import (
                    robots_filter,
                )

                candidates = robots_filter(candidates, self.robots)

            if self.trap_max_urls is not None and trap_counts is not None:
                from website_to_agent_spark.operators import traps as traps_mod

                host_c = F.lower(urlfns.netloc(F.col("url")))
                tmpl_c = traps_mod.url_template(F.col("url"))
                capped = trap_counts.filter(
                    F.col("n") >= self.trap_max_urls
                ).select("job_id", "_th", "_tt")
                keyed = candidates.withColumn("_th", host_c).withColumn(
                    "_tt", tmpl_c
                )
                dropped = (
                    keyed.join(F.broadcast(capped),
                               ["job_id", "_th", "_tt"], "left_semi")
                    .groupBy(
                        "job_id",
                        F.col("_th").alias("host"),
                        F.col("_tt").alias("template"),
                    )
                    .agg(F.count("*").alias("dropped"))
                    .withColumn("superstep", F.lit(step).cast("int"))
                    .localCheckpoint(eager=True)
                )
                trap_drop_parts.append(dropped)
                retained.append(dropped)
                candidates = keyed.join(
                    F.broadcast(capped), ["job_id", "_th", "_tt"],
                    "left_anti",
                ).drop("_th", "_tt")

            if self.opic:
                # ---- OPIC cash fold (see __init__): the drained
                # batch's cash moves to history and splits equally
                # over its candidate links (pre-dedup, so re-cited
                # seen urls still accumulate); no-candidate pages sink
                # to the per-job '' row. One union + one groupBy over
                # state + Δ, 12-dp rounding for deterministic drain
                # tie-breaks, checkpoint-and-release.
                bcash = (
                    batch.select("job_id", "url", "ord")
                    .join(opic_cash.select("job_id", "url", "cash"),
                          ["job_id", "url"], "left")
                    .select("job_id", "url", "ord",
                            F.coalesce(F.col("cash"), F.lit(0.0))
                            .alias("_c"))
                )
                outd = candidates.groupBy("job_id", "parent_ord").agg(
                    F.count("*").alias("_deg")
                )
                recv = (
                    candidates.select("job_id", "url", "parent_ord")
                    .join(outd, ["job_id", "parent_ord"])
                    .join(bcash.select(
                        "job_id", F.col("ord").alias("parent_ord"), "_c"),
                        ["job_id", "parent_ord"])
                    .select("job_id", "url",
                            (F.col("_c") / F.col("_deg")).alias("cash"),
                            F.lit(0.0).alias("hist"))
                )
                spent = bcash.select(
                    "job_id", "url",
                    (-F.col("_c")).alias("cash"), F.col("_c").alias("hist"),
                )
                dang = (
                    bcash.join(
                        outd.select("job_id",
                                    F.col("parent_ord").alias("ord")),
                        ["job_id", "ord"], "left_anti")
                    .groupBy("job_id")
                    .agg(F.sum("_c").alias("cash"))
                    .select("job_id", F.lit("").alias("url"), "cash",
                            F.lit(0.0).alias("hist"))
                )
                new_oc = (
                    opic_cash.unionByName(spent).unionByName(recv)
                    .unionByName(dang)
                    .groupBy("job_id", "url")
                    .agg(F.round(F.sum("cash"), 12).alias("cash"),
                         F.round(F.sum("hist"), 12).alias("hist"))
                    .localCheckpoint(eager=True)
                )
                # the superseded state is still referenced by this
                # step's leftover frontier rows (the drain-score join)
                # — release it only at end of step, once the frontier
                # snapshot has materialized
                _prev_opic = opic_cash
                opic_cash = new_oc

            # per-step lazy caches (the bloom probe) — populated inside
            # the frontier materialization job, dropped right after it
            step_caches: list = []
            if self.use_bloom:
                # Bloom prefilter (SURVEY §4.3): negatives bypass the
                # anti-join shuffle; positives get the exact check.
                # Maintained INCREMENTALLY: built once from the
                # accumulated seen set (just the seeds at a fresh
                # start), then OR-merged with each step's delta — O(Δ)
                # per superstep, never a full-seen rebuild.
                dom = urlfns.reg_domain(urlfns.host(F.col("url")))
                cand_dom = candidates.withColumn("reg_domain", dom)
                if self.seen_filter == "bloom":
                    from website_to_agent_spark.operators import bloom as bloom_mod

                    if blooms is None:
                        blooms = bloom_mod.build_blooms(
                            seen.select(dom.alias("reg_domain"), "url"),
                            n_bits=self.bloom_bits,
                        ).localCheckpoint(eager=True)
                    cand = bloom_mod.bloom_anti_join(
                        cand_dom,
                        seen.select("job_id", "url"),
                        blooms,
                        join_keys=["job_id", "url"],
                        n_bits=self.bloom_bits,
                        cache_out=step_caches,
                    ).drop("reg_domain")
                else:
                    from website_to_agent_spark.operators import cuckoo as ck

                    if blooms is None:
                        blooms = ck.build_cuckoos(
                            seen.select(dom.alias("reg_domain"), "url"),
                            n_buckets=self.cuckoo_buckets,
                            slots=self.cuckoo_slots,
                        ).localCheckpoint(eager=True)
                    cand = ck.cuckoo_anti_join(
                        cand_dom,
                        seen.select("job_id", "url"),
                        blooms,
                        join_keys=["job_id", "url"],
                        n_buckets=self.cuckoo_buckets,
                        slots=self.cuckoo_slots,
                    ).drop("reg_domain")
            else:
                cand = candidates.join(
                    seen.select("job_id", "url"), ["job_id", "url"], "left_anti"
                )
            if redir_finals is not None:
                # batch-bounded set → broadcast anti-join; also covers
                # the bloom path (the finals are not in the filter yet
                # this step, so a probe negative would slip through)
                cand = cand.join(
                    F.broadcast(redir_finals.select("job_id", "url")),
                    ["job_id", "url"],
                    "left_anti",
                )
            # first-enqueue-wins: min (parent_ord, pos) per (job, url)
            cand = (
                cand.groupBy("job_id", "url")
                .agg(
                    F.min(F.struct("parent_ord", "pos")).alias("k"),
                    F.min("depth").alias("depth"),
                )
                .select(
                    "job_id",
                    "url",
                    "depth",
                    F.col("k.parent_ord").alias("parent_ord"),
                    F.col("k.pos").alias("pos"),
                )
            )
            w_ord = Window.partitionBy("job_id").orderBy("parent_ord", "pos")
            cand = cand.withColumn("rank", F.row_number().over(w_ord))

            # budget cap at enqueue time (seeder: discovered budget,
            # `url_seeder.py:82-83`); client enqueues uncapped.
            cand = cand.join(
                job_state.select("job_id", "budget_used", "next_ord", "max_urls"),
                "job_id",
            )
            if self.mode == "seeder":
                cand = cand.filter(
                    F.col("budget_used") + F.col("rank") <= F.col("max_urls")
                )
            # materialized once — feeds the next frontier, the seen
            # delta, and the per-job enqueue stats (3 consumers)
            new_frontier_rows = cand.select(
                "job_id",
                "url",
                "depth",
                (F.col("next_ord") + F.col("rank") - 1).alias("ord"),
            ).localCheckpoint(eager=True)
            # the eager materialization above ran the bloom/cuckoo
            # probe, which fully computes (broadcast-exchanges) the
            # previous step's LAZY filter merge — its parent blocks
            # are now safely dead
            for df in pending_release:
                _release_checkpoint(df)
            pending_release.clear()
            for df in step_caches:
                df.unpersist()
            step_caches.clear()
            # the frontier snapshot is materialized — the per-step
            # fetch-hits/batch caches (consumed by the bundle subtree
            # and, in opic mode, the cash fold) are dead
            for df in fetch_caches:
                df.unpersist()
            fetch_caches.clear()

            if self.trap_max_urls is not None:
                from website_to_agent_spark.operators import traps as traps_mod

                inc = (
                    new_frontier_rows.select(
                        "job_id",
                        F.lower(urlfns.netloc(F.col("url"))).alias("_th"),
                        traps_mod.url_template(F.col("url")).alias("_tt"),
                    )
                    .groupBy("job_id", "_th", "_tt")
                    .agg(F.count("*").alias("n"))
                )
                if trap_counts is None:
                    new_tc = inc.localCheckpoint(eager=True)
                else:
                    new_tc = (
                        trap_counts.unionByName(inc)
                        .groupBy("job_id", "_th", "_tt")
                        .agg(F.sum("n").alias("n"))
                        .localCheckpoint(eager=True)
                    )
                    _release_checkpoint(trap_counts)
                trap_counts = new_tc
            _t_frontier = time.time()
            _j_frontier = _jid()

            # ---- state updates ------------------------------------------
            # ONE bounded collect per superstep: the per-job fetch
            # stats (from the materialized bundle) and enqueue counts
            # (from the materialized frontier rows) update the
            # driver-side state dict and build the metrics delta
            # without a job_state checkpoint job.
            enq_stats = (
                new_frontier_rows.groupBy("job_id")
                .agg(F.count("*").alias("n_enq"))
            )
            stat_rows = (
                per_job.join(enq_stats, "job_id", "full_outer").collect()
            )
            budget_key = "n_budget" if self.mode == "client" else "n_enq"
            for r in stat_rows:
                v = js.get(r["job_id"])
                if v is None:
                    continue
                v[0] += (r[budget_key] or 0)
                v[1] += (r["n_enq"] or 0)
            job_state = self._job_state_df(js)

            seen_delta = new_frontier_rows.select("job_id", "url", "ord", "depth")
            if redir_finals is not None:
                # record followed/failed chains (never silent), and add
                # FINAL urls to the seen set: after A 301→ B was
                # fetched, a later enqueue of B would re-fetch content
                # we already hold. (A B already sitting in the frontier
                # still drains — eventual dedup, same as any crawler's
                # enqueue-time check.) The anti-join keeps seen a set;
                # its left side is batch-bounded, the per-step cost the
                # candidate dedup already pays.
                _chains = (
                    bundle.filter(
                        (F.col("n_hops") > 0) | (~F.col("redirect_ok"))
                    )
                    .select(
                        "job_id", "url", "final_url", "n_hops",
                        "redirect_ok", "superstep",
                    )
                    .localCheckpoint(eager=True)
                )
                redirect_parts.append(_chains)
                retained.append(_chains)
                redir_seen = redir_finals.join(
                    seen.select("job_id", "url"),
                    ["job_id", "url"],
                    "left_anti",
                )
                seen_delta = seen_delta.unionByName(redir_seen)
            if snap is not None and "reused" in bundle.columns:
                _reval = (
                    bundle.filter(F.col("reused"))
                    .select("job_id", "url", "superstep")
                    .localCheckpoint(eager=True)
                )
                reval_parts.append(_reval)
                retained.append(_reval)
            if (
                self.honor_meta_robots
                and "robots_noindex" in bundle.columns
            ):
                _noidx = (
                    bundle.filter(F.col("robots_noindex"))
                    .select("job_id", "url", "superstep")
                    .localCheckpoint(eager=True)
                )
                noindex_parts.append(_noidx)
                retained.append(_noidx)
            if self.use_bloom:
                dom = urlfns.reg_domain(urlfns.host(F.col("url")))
                # the delta includes redirect FINALS (seen_delta, not
                # just the frontier rows) so the prefilter agrees with
                # the exact set
                delta = seen_delta.select(
                    dom.alias("reg_domain"), "url"
                )
                if self.seen_filter == "bloom":
                    from website_to_agent_spark.operators import bloom as bloom_mod

                    # single cogrouped fold: one delta shuffle + one
                    # grouped kernel per superstep (r4 — replaces the
                    # build-then-merge pair, byte-identical output)
                    merged = bloom_mod.add_to_blooms(
                        blooms, delta, n_bits=self.bloom_bits,
                    ).localCheckpoint(eager=False)
                else:
                    from website_to_agent_spark.operators import cuckoo as ck

                    merged = ck.add_to_cuckoos(
                        blooms, delta,
                        n_buckets=self.cuckoo_buckets,
                        slots=self.cuckoo_slots,
                    ).localCheckpoint(eager=False)
                # LAZY checkpoint (r4): the merge materializes inside
                # the next step's probe (a broadcast exchange computes
                # every partition) instead of costing its own eager job
                # per superstep. The superseded filter is released only
                # AFTER that job runs (pending_release), and a crawl
                # that ends before then just abandons the un-run merge
                # — nothing consumes it after the loop.
                pending_release.append(blooms)
                blooms = merged
            frontier = new_frontier_rows
            if leftover is not None:
                frontier = frontier.unionByName(leftover)

            # metrics delta built from the ALREADY-collected stats —
            # same values and schema as the old per_job projection,
            # zero extra jobs and no lineage back into the bundle
            _secs = time.time() - t0
            step_metrics = spark.createDataFrame(
                [
                    (step, r["job_id"], None, r["n_fetched"],
                     r["n_parsed"], r["n_failed"], r["n_links"], None,
                     r["n_bytes"], _secs)
                    for r in stat_rows
                    if r["n_fetched"] is not None
                ],
                schema.METRICS,
            )
            # next step's frontier content is exactly the enqueued
            # rows unless a drain path kept leftover rows (their
            # per-job split is unknown driver-side → probe next step)
            if leftover is None:
                frontier_counts = {
                    r["job_id"]: (r["n_enq"] or 0) for r in stat_rows
                }
            else:
                frontier_counts = None

            # ---- checkpoint + lineage truncation (T5) -------------------
            # frontier/job_state are full-state snapshots (small — the
            # active set and one row per job); crawled/metrics/SEEN are
            # append-only DELTAS (Iceberg-append analogue) — the seen
            # set is never rewritten, so superstep I/O stays O(Δ) even
            # when the accumulated seen set is 10^10 rows. The anti-join
            # probes the union of materialized deltas (at cluster scale:
            # one Iceberg table receiving appends).
            if self.catalog is not None:
                self.catalog.commit(
                    step,
                    {
                        "frontier": frontier,
                        "job_state": job_state,
                        "crawled_delta": new_crawled,
                        "metrics_delta": step_metrics,
                        "seen_delta": seen_delta,
                    },
                    lineage={"mode": self.mode, "step": step},
                    bucket=(
                        {"frontier": (["job_id"], self.bucket_frontier)}
                        if self.bucket_frontier > 0
                        else None
                    ),
                )
                frontier = self.catalog.read(self.spark, step, "frontier")
                seen = seen.unionByName(
                    self.catalog.read(self.spark, step, "seen_delta")
                )
                crawled_parts.append(
                    self.catalog.read(self.spark, step, "crawled_delta")
                )
                metrics_parts.append(
                    self.catalog.read(self.spark, step, "metrics_delta")
                )
                # everything downstream now reads the committed disk
                # snapshots — this step's in-memory bundle and frontier
                # rows are dead; release them so executor storage stays
                # O(current step), not O(all steps)
                _release_checkpoint(bundle)
                _release_checkpoint(new_frontier_rows)
            else:
                # cache + truncate lineage locally; crawled/metrics/seen
                # deltas derive from the already-checkpointed step
                # bundle (still referenced by the result tables → goes
                # in `retained`, freed by CrawlResultTables.unpersist)
                if leftover is not None:
                    frontier = frontier.localCheckpoint(eager=True)
                    _release_checkpoint(prev_frontier_ckpt)
                    prev_frontier_ckpt = frontier
                seen = seen.unionByName(seen_delta)
                crawled_parts.append(new_crawled)
                metrics_parts.append(step_metrics)
                retained.append(bundle)
                retained.append(new_frontier_rows)
            if self.opic and _prev_opic is not None:
                # frontier/job_state snapshots are materialized — the
                # superseded cash state is now safely dead
                _release_checkpoint(_prev_opic)
                _prev_opic = None
            if _timing:
                _t_end = time.time()
                _j_end = _jid()
                print(
                    f"[step {step}] empty={_t_empty - t0:.2f}/{_j_empty - _j0}j "
                    f"bundle={_t_bundle - _t_empty:.2f}/{_j_bundle - _j_empty}j "
                    f"frontier={_t_frontier - _t_bundle:.2f}/{_j_frontier - _j_bundle}j "
                    f"state={_t_end - _t_frontier:.2f}/{_j_end - _j_frontier}j "
                    f"total={_t_end - t0:.2f}/{_j_end - _j0}j"
                )
            step += 1

        empty_crawled = spark.createDataFrame([], schema.CRAWLED)
        empty_metrics = spark.createDataFrame([], schema.METRICS)
        crawled = empty_crawled
        for part in crawled_parts:
            crawled = crawled.unionByName(part)
        metrics = empty_metrics
        for part in metrics_parts:
            metrics = metrics.unionByName(part)

        # dense fetch order per job (the reference's pop counter)
        w_fetch = Window.partitionBy("job_id").orderBy("ord")
        crawled = crawled.withColumn("fetch_ord", F.row_number().over(w_fetch) - 1)
        # final state snapshots + bloom are still live (job_state is
        # returned; the last frontier/bloom would pin blocks forever
        # otherwise) — hand them to the result for explicit release
        # the slim url-only store copy is loop-scoped — nothing after
        # the loop consumes it; release it here so a catalog-backed run
        # returns with only the final bloom pinned (test_scale_path)
        _release_checkpoint(pages_urls)
        for handle in (prev_frontier_ckpt, blooms,
                       trap_counts, redirect_edges_df, opic_cash):
            if handle is not None:
                retained.append(handle)
        # a final un-materialized lazy merge keeps its parent in
        # pending_release — hand those over too (releasing the parent
        # of a never-run lazy checkpoint is safe: nothing computes it)
        retained.extend(pending_release)
        trap_drops = None
        if self.trap_max_urls is not None:
            trap_drops = spark.createDataFrame(
                [], "job_id string, host string, template string,"
                    " dropped long, superstep int",
            )
            for part in trap_drop_parts:
                trap_drops = trap_drops.unionByName(part)
        redirects_tbl = None
        if redirect_edges_df is not None:
            redirects_tbl = spark.createDataFrame(
                [], "job_id string, url string, final_url string,"
                    " n_hops int, redirect_ok boolean, superstep int",
            )
            for part in redirect_parts:
                redirects_tbl = redirects_tbl.unionByName(part)
        revalidated_tbl = None
        if snap is not None:
            revalidated_tbl = spark.createDataFrame(
                [], "job_id string, url string, superstep int",
            )
            for part in reval_parts:
                revalidated_tbl = revalidated_tbl.unionByName(part)
        noindexed_tbl = None
        if self.honor_meta_robots:
            noindexed_tbl = spark.createDataFrame(
                [], "job_id string, url string, superstep int",
            )
            for part in noindex_parts:
                noindexed_tbl = noindexed_tbl.unionByName(part)
        return CrawlResultTables(
            crawled=crawled, seen=seen, metrics=metrics,
            supersteps=step - start_step, job_state=self._job_state_df(js),
            checkpoints=retained, trap_drops=trap_drops,
            redirects=redirects_tbl, revalidated=revalidated_tbl,
            noindexed=noindexed_tbl, opic=opic_cash,
        )

    # ------------------------------------------------------------ scores
    def _join_scores(self, live: DataFrame) -> DataFrame:
        """Attach the broadcast priority table's ``score`` to frontier
        rows (url- or host-keyed; unmatched rows keep score null)."""
        if self.priority_on == "url":
            return live.join(F.broadcast(self.priority), "url", "left")
        return (
            live.withColumn("_ph", urlfns.host(F.col("url")))
            .join(
                F.broadcast(self.priority.withColumnRenamed("host", "_ph")),
                "_ph", "left",
            )
            .drop("_ph")
        )

    @staticmethod
    def _join_cash(live: DataFrame, opic_cash: DataFrame) -> DataFrame:
        """Attach the OPIC cash state as the drain score. Co-keyed
        hash join — the cash table is frontier-sized, NEVER broadcast
        (unlike the static priority table). Cash is already 12-dp
        rounded by the fold, so score ties break deterministically on
        ord."""
        return live.join(
            opic_cash.select(
                "job_id", "url", F.col("cash").alias("score")
            ),
            ["job_id", "url"], "left",
        )

    # -------------------------------------------------------------- fetch
    @staticmethod
    def _fetch(batch: DataFrame, pages: DataFrame,
               pages_urls: Optional[DataFrame] = None) -> DataFrame:
        """Fetch = lookup html for the drained batch in the page store.

        A LEFT join preserving the (small) batch cannot broadcast its
        preserved side — Spark would silently fall back to a sort-merge
        join and SHUFFLE THE ENTIRE PAGES TABLE each superstep. Instead:
        broadcast-INNER join for hits (pages streamed, never shuffled),
        then a tiny broadcast anti-join of the batch against the hit
        keys for the misses (fetch failures, `crawl4ai_client.py:142`).

        ``pages_urls`` (r6): slim (p_url) copy of the store. The
        hit-keys broadcast build otherwise re-streams the FAT store —
        checkpointed stores are ExistingRDD scans with no column
        pruning, so that second stream deserializes every html payload
        again. A batch row's url is in the slim copy iff it is in the
        store, so the key set is identical.
        """
        hits = (
            F.broadcast(batch)
            .join(pages, batch.url == pages.p_url, "inner")
            .withColumn("success", F.lit(True))
            .withColumn("html_ok", F.lit(True))
        )
        if pages_urls is not None:
            hit_keys = (
                F.broadcast(batch)
                .join(pages_urls, batch.url == pages_urls.p_url, "inner")
                .select(F.col("job_id").alias("h_job_id"),
                        F.col("url").alias("h_url"))
            )
        else:
            hit_keys = hits.select(
                F.col("job_id").alias("h_job_id"),
                F.col("url").alias("h_url"),
            )
        misses = (
            batch.join(
                F.broadcast(hit_keys),
                (batch.job_id == F.col("h_job_id"))
                & (batch.url == F.col("h_url")),
                "left_anti",
            )
            .withColumn("p_url", F.lit(None).cast("string"))
            .withColumn("html", F.lit(None).cast("binary"))
            .withColumn("success", F.lit(False))
            .withColumn("html_ok", F.lit(False))
        )
        return hits.unionByName(misses)

    def _fetch_following(
        self, batch: DataFrame, pages: DataFrame, edges: DataFrame,
        pages_urls: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Redirect-aware store fetch: resolve each batch url's chain
        (operators/redirects.py — max_hops rounds of broadcast probes
        against the edge table), then fetch the FINAL url's content
        with the same broadcast-inner + anti hit/miss pattern as
        ``_fetch``. Unresolved chains (loop / too many hops) are
        forced failures, like requests' TooManyRedirects. Adds
        ``final_url``/``n_hops``/``redirect_ok`` columns — downstream
        steps use them for the extraction base url, the seen-set
        delta, and the redirects result table."""
        from website_to_agent_spark.operators import redirects as redirects_mod

        res = redirects_mod.resolve_redirects(
            batch.select("url"), edges, max_hops=self.redirect_max_hops
        )
        b = batch.join(F.broadcast(res), "url", "left")
        okb = b.filter(F.col("redirect_ok"))
        badb = b.filter(~F.col("redirect_ok"))
        hits = (
            F.broadcast(okb)
            .join(pages, okb.final_url == pages.p_url, "inner")
            .withColumn("success", F.lit(True))
            .withColumn("html_ok", F.lit(True))
        )
        # slim key-side probe — see _fetch
        if pages_urls is not None:
            hit_keys = (
                F.broadcast(okb)
                .join(pages_urls, okb.final_url == pages_urls.p_url,
                      "inner")
                .select(F.col("job_id").alias("h_job_id"),
                        F.col("url").alias("h_url"))
            )
        else:
            hit_keys = hits.select(
                F.col("job_id").alias("h_job_id"),
                F.col("url").alias("h_url"),
            )
        null_cols = [
            F.lit(None).cast("string").alias("p_url"),
            F.lit(None).cast("binary").alias("html"),
            F.lit(False).alias("success"),
            F.lit(False).alias("html_ok"),
        ]
        misses = okb.join(
            F.broadcast(hit_keys),
            (okb.job_id == F.col("h_job_id")) & (okb.url == F.col("h_url")),
            "left_anti",
        ).select("*", *null_cols)
        too_many = badb.select("*", *null_cols)
        return hits.unionByName(misses).unionByName(too_many)

    @staticmethod
    def _attach_snapshots(fetched: DataFrame, snap: DataFrame) -> DataFrame:
        """Left-attach the prior-crawl snapshot columns to the fetched
        batch with the same broadcast-inner + anti pattern as
        ``_fetch`` (the snapshot table is corpus-scale — a plain left
        join preserving the small batch would shuffle it whole)."""
        hits = (
            F.broadcast(fetched)
            .join(snap, fetched.url == F.col("_su"), "inner")
            .drop("_su")
        )
        hit_keys = hits.select(
            F.col("job_id").alias("h2_job_id"), F.col("url").alias("h2_url")
        )
        missing = (
            fetched.join(
                F.broadcast(hit_keys),
                (fetched.job_id == F.col("h2_job_id"))
                & (fetched.url == F.col("h2_url")),
                "left_anti",
            )
            .withColumn("_snap_digest", F.lit(None).cast("string"))
            .withColumn("_snap_title", F.lit(None).cast("string"))
            .withColumn("_snap_description", F.lit(None).cast("string"))
            .withColumn("_snap_keywords",
                        F.lit(None).cast("array<string>"))
            .withColumn("_snap_text", F.lit(None).cast("string"))
            .withColumn("_snap_markdown", F.lit(None).cast("string"))
            .withColumn("_snap_content", F.lit(None).cast("string"))
            .withColumn(
                "_snap_links",
                F.lit(None).cast(schema.T.ArrayType(schema.LINK)),
            )
            .withColumn("_snap_noindex", F.lit(False))
            .withColumn("_snap_nofollow", F.lit(False))
            .withColumn("_snap_nflinks",
                        F.array().cast("array<string>"))
        )
        return hits.unionByName(missing)

    def _fetch_live(self, batch: DataFrame) -> DataFrame:
        """Live-mode fetch: the drained batch goes through the
        ``http_fetch`` mapInPandas kernel; results join back to the
        batch (tiny broadcast) so frontier metadata is preserved.

        Success semantics per mode: client counts any 2xx
        (`crawl4ai_client.py:75` raise_for_status only). The seeder
        treats a non-HTML 2xx as VISITED but not failed — it just skips
        link discovery (`url_seeder.py:126-129`: only non-200 / timeout
        / exception URLs enter ``failed_urls``). That skip state is the
        ``html_ok`` flag: ``success`` stays fetch-success so failure
        stats match the reference; ``html_ok`` gates discovery only.
        The content-type check is F9's case-insensitive one
        (`filters.content_type_ok` — headers arrive in arbitrary case).
        """
        from website_to_agent_spark.sources.httpfetch import http_fetch

        got = http_fetch(
            batch.select("url").distinct(), timeout_s=self.fetch_timeout_s
        )
        ok = F.coalesce(F.col("_ok"), F.lit(False))
        return (
            batch.join(
                F.broadcast(
                    got.select(
                        "url", "html", "status_code", "content_type",
                        F.col("success").alias("_ok"),
                    )
                ),
                "url",
                "left",
            )
            .withColumn("success", ok)
            .withColumn(
                "html_ok", ok & filters.content_type_ok(F.col("content_type"))
            )
            .drop("_ok")
        )

    # ------------------------------------------------------------- client
    def _client_step(self, fetched: DataFrame, step: int):
        """One client-mode superstep over the fetched batch.

        Budget gate (`crawl4ai_client.py:219,241`): a row is *popped*
        (recorded) iff successes before it (per job, FIFO order) leave
        budget; its links are discovered iff budget remains AFTER
        counting it. Under a priority drain the batch carries ``_pop``
        (the score-ranked pop order) and the gate follows it — budget
        then goes to the highest-scored rows, not the oldest."""
        pop_col = "_pop" if "_pop" in fetched.columns else "ord"
        w = (
            Window.partitionBy("job_id")
            .orderBy(pop_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        gated = (
            fetched.withColumn(
                "succ_before",
                F.coalesce(F.sum(F.col("success").cast("long")).over(w), F.lit(0)),
            )
            .withColumn(
                "popped",
                F.col("budget_used") + F.col("succ_before") < F.col("max_urls"),
            )
            .withColumn(
                "discover",
                F.col("success")
                & (
                    F.col("budget_used")
                    + F.col("succ_before")
                    + F.lit(1)
                    < F.col("max_urls")
                ),
            )
            .filter(F.col("popped"))
        )

        # Extraction only for successful fetches (filter before the UDF
        # so Catalyst prunes its input). After a followed redirect the
        # FINAL url is the base every client resolves links against.
        redirected = "final_url" in fetched.columns
        base_url = (
            F.coalesce(F.col("final_url"), F.col("url"))
            if redirected
            else F.col("url")
        )
        redir_cols = (
            ["final_url", "n_hops", "redirect_ok"] if redirected else []
        )
        # 304-style reuse: digest-unchanged rows never enter the Arrow
        # extraction kernel; the digest check itself is one column md5
        # inside codegen (see revalidate_with in __init__).
        has_snap = "_snap_digest" in fetched.columns
        if has_snap:
            # coalesce: md5(NULL html) is NULL, and a NULL predicate
            # would drop the row from ALL THREE of the ok/failed/
            # reused splits below — a successful fetch of a null-html
            # store row must re-extract, not vanish
            reuse_pred = F.coalesce(
                F.col("success")
                & F.col("_snap_digest").isNotNull()
                & (F.md5(F.col("html")) == F.col("_snap_digest")),
                F.lit(False),
            )
            gated = gated.withColumn("_reuse", reuse_pred)
        else:
            gated = gated.withColumn("_reuse", F.lit(False))
        # r6 (guide §2.4/§7.2 — duplicated subtrees): the ok/failed/
        # reused branches below each re-plan this entire subtree (drain
        # ranking + fetch joins + budget window); AQE runs every
        # distinct exchange as its own query-stage job, so one parity
        # superstep paid ~14 stage-jobs in the bundle materialization
        # alone. Materialize the gated batch ONCE (batch-bounded rows;
        # the html column is exactly the drained batch's pages) — each
        # branch then reads the cached partitions and the only work
        # left downstream is the extraction kernel + projections.
        # Released right after the bundle checkpoint materializes.
        gated = gated.drop(
            "succ_before", "popped", "p_url"
        ).localCheckpoint(eager=True)
        ok = gated.filter(F.col("success") & ~F.col("_reuse")).withColumn(
            "ext", extract_udf(base_url, F.col("html"))
        )
        failed = gated.filter(~F.col("success"))

        from website_to_agent_spark.functions.extract import format_content

        content = format_content(
            self.output_format,
            F.col("ext.markdown"), F.col("ext.text"), F.col("ext.cleaned_html"),
            title=F.col("ext.title"), description=F.col("ext.description"),
            keywords=F.col("ext.keywords"),
        )
        ok_rows = ok.select(
            "job_id",
            "url",
            "ord",
            "depth",
            F.lit(None).cast("long").alias("fetch_ord"),
            "success",
            F.col("ext.title").alias("title"),
            F.col("ext.description").alias("description"),
            F.col("ext.keywords").alias("keywords"),
            F.col("ext.text").alias("text"),
            F.col("ext.markdown").alias("markdown"),
            content.alias("content"),
            F.lit(step).alias("superstep"),
            F.col("ext.links").alias("links"),
            (
                (
                    F.col("discover")
                    & ~F.coalesce(
                        F.col("ext.robots_nofollow"), F.lit(False)
                    )
                )
                if self.honor_meta_robots
                else F.col("discover")
            ).alias("discover"),
            "base_domain",
            *redir_cols,
            F.lit(False).alias("reused"),
            *(
                [
                    F.coalesce(
                        F.col("ext.robots_noindex"), F.lit(False)
                    ).alias("robots_noindex"),
                    F.coalesce(
                        F.col("ext.nofollow_links"),
                        F.array().cast("array<string>"),
                    ).alias("nofollow_links"),
                ]
                if self.honor_meta_robots
                else []
            ),
        )
        failed_rows = failed.select(
            "job_id",
            "url",
            "ord",
            "depth",
            F.lit(None).cast("long").alias("fetch_ord"),
            "success",
            *[F.lit(None).cast("string").alias(c) for c in ("title", "description")],
            F.lit(None).cast("array<string>").alias("keywords"),
            *[F.lit(None).cast("string").alias(c) for c in ("text", "markdown", "content")],
            F.lit(step).alias("superstep"),
            F.lit(None).cast(schema.T.ArrayType(schema.LINK)).alias("links"),
            F.lit(False).alias("discover"),
            "base_domain",
            *redir_cols,
            F.lit(False).alias("reused"),
            *(
                [
                    F.lit(False).alias("robots_noindex"),
                    F.array().cast("array<string>").alias("nofollow_links"),
                ]
                if self.honor_meta_robots
                else []
            ),
        )
        all_parts = ok_rows.unionByName(failed_rows)
        if has_snap:
            # reused rows take the stored extraction AND the stored
            # out-links verbatim (the snapshot is the link DB):
            # byte-identical html ⟹ identical links, so traversal
            # continues without the parse
            reused_rows = gated.filter(F.col("_reuse")).select(
                "job_id",
                "url",
                "ord",
                "depth",
                F.lit(None).cast("long").alias("fetch_ord"),
                "success",
                F.col("_snap_title").alias("title"),
                F.col("_snap_description").alias("description"),
                F.col("_snap_keywords").alias("keywords"),
                F.col("_snap_text").alias("text"),
                F.col("_snap_markdown").alias("markdown"),
                F.col("_snap_content").alias("content"),
                F.lit(step).alias("superstep"),
                F.col("_snap_links").alias("links"),
                (
                    (F.col("discover") & ~F.col("_snap_nofollow"))
                    if self.honor_meta_robots
                    else F.col("discover")
                ).alias("discover"),
                "base_domain",
                *redir_cols,
                F.lit(True).alias("reused"),
                *(
                    [
                        F.col("_snap_noindex").alias("robots_noindex"),
                        F.col("_snap_nflinks").alias("nofollow_links"),
                    ]
                    if self.honor_meta_robots
                    else []
                ),
            )
            all_parts = all_parts.unionByName(reused_rows)
        # materialize the bundle: extraction runs once per superstep
        all_rows = all_parts.localCheckpoint(eager=True)
        # the bundle is materialized — the gated-batch checkpoint (its
        # only consumer) is dead; release it so superstep storage stays
        # O(current bundle)
        _release_checkpoint(gated)
        new_crawled = all_rows.select(*[f.name for f in schema.CRAWLED.fields])

        nf_cols = ["nofollow_links"] if self.honor_meta_robots else []
        candidates = (
            all_rows.filter(F.col("discover"))
            .select(
                "job_id",
                F.col("ord").alias("parent_ord"),
                (F.col("depth") + 1).alias("depth"),
                "base_domain",
                *nf_cols,
                F.posexplode_outer("links").alias("_i", "link"),
            )
            .select(
                "job_id",
                F.col("link.url").alias("url"),
                "parent_ord",
                F.col("link.pos").alias("pos"),
                "depth",
                "base_domain",
                *nf_cols,
            )
            .filter(F.col("url").isNotNull())
            .filter(filters.client_link_ok(F.col("url"), F.col("base_domain")))
            .drop("base_domain")
        )
        if self.honor_meta_robots:
            # rel=nofollow anchors don't enter the frontier (per-row
            # array membership — no join, the list rides the bundle)
            candidates = candidates.filter(
                ~F.coalesce(
                    F.array_contains(F.col("nofollow_links"), F.col("url")),
                    F.lit(False),
                )
            ).drop("nofollow_links")

        per_job = all_rows.groupBy("job_id").agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.col("success").cast("long")).alias("n_parsed"),
            F.sum((~F.col("success")).cast("long")).alias("n_failed"),
            F.sum(F.col("success").cast("long")).alias("n_budget"),
            F.sum(F.size(F.coalesce(F.col("links"), F.array()))).alias("n_links"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_bytes"),
        )
        return new_crawled, candidates, per_job, all_rows

    # ------------------------------------------------------------- seeder
    def _seeder_step(self, fetched: DataFrame, step: int):
        """One seeder-mode superstep: link extraction over the FULL
        document (`url_seeder.py:132,143-174`), validity filters F1-F6;
        no text extraction (the seeder discovers, it doesn't extract).

        Non-HTML 2xx responses (``success`` but not ``html_ok``) are
        visited-but-skipped (`url_seeder.py:126-129`): they never enter
        the link UDF, contribute no candidates, and are NOT counted as
        failed."""
        # r6: same duplicated-subtree fix as _client_step — the
        # ok/failed branches below each re-plan the drain + fetch-join
        # subtree; materialize the fetched batch once (batch-bounded)
        # and release it after the bundle checkpoint.
        fetched = fetched.localCheckpoint(eager=True)
        redirected = "final_url" in fetched.columns
        base_url = (
            F.coalesce(F.col("final_url"), F.col("url"))
            if redirected
            else F.col("url")
        )
        redir_cols = (
            ["final_url", "n_hops", "redirect_ok"] if redirected else []
        )
        if self.honor_meta_robots:
            # one-parse links+directives kernel; page-level nofollow
            # yields no discovery (page still visited — it consumes
            # its batch slot like the reference's non-HTML skip)
            from website_to_agent_spark.functions.extract import (
                seeder_links_meta_udf,
            )

            ok = (
                fetched.filter(F.col("success") & F.col("html_ok"))
                .withColumn(
                    "_sm", seeder_links_meta_udf(F.col("html"), base_url)
                )
                .withColumn(
                    "links",
                    F.when(
                        F.coalesce(
                            F.col("_sm.robots_nofollow"), F.lit(False)
                        ),
                        F.array().cast(schema.T.ArrayType(schema.LINK)),
                    ).otherwise(F.col("_sm.links")),
                )
                .withColumn(
                    "robots_noindex",
                    F.coalesce(F.col("_sm.robots_noindex"), F.lit(False)),
                )
                .withColumn(
                    "nofollow_links",
                    F.coalesce(
                        F.col("_sm.nofollow_links"),
                        F.array().cast("array<string>"),
                    ),
                )
                .drop("_sm")
            )
        else:
            ok = fetched.filter(
                F.col("success") & F.col("html_ok")
            ).withColumn(
                "links", seeder_links_udf(F.col("html"), base_url)
            )
        # failed ∪ skipped-non-HTML: both get null links; `success` is
        # kept as-is so the skipped rows stay out of n_failed.
        failed = fetched.filter(~F.col("success") | ~F.col("html_ok"))

        meta_ok_cols = (
            ["robots_noindex", "nofollow_links"]
            if self.honor_meta_robots
            else []
        )
        meta_failed_cols = (
            [
                F.lit(False).alias("robots_noindex"),
                F.array().cast("array<string>").alias("nofollow_links"),
            ]
            if self.honor_meta_robots
            else []
        )
        ok_rows = ok.select(
            "job_id", "url", "ord", "depth",
            F.lit(None).cast("long").alias("fetch_ord"),
            "success",
            *[F.lit(None).cast("string").alias(c) for c in ("title", "description")],
            F.lit(None).cast("array<string>").alias("keywords"),
            *[F.lit(None).cast("string").alias(c) for c in ("text", "markdown", "content")],
            F.lit(step).alias("superstep"),
            "links",
            "base_domain",
            *redir_cols,
            *meta_ok_cols,
        )
        failed_rows = failed.select(
            "job_id", "url", "ord", "depth",
            F.lit(None).cast("long").alias("fetch_ord"),
            "success",
            *[F.lit(None).cast("string").alias(c) for c in ("title", "description")],
            F.lit(None).cast("array<string>").alias("keywords"),
            *[F.lit(None).cast("string").alias(c) for c in ("text", "markdown", "content")],
            F.lit(step).alias("superstep"),
            F.lit(None).cast(schema.T.ArrayType(schema.LINK)).alias("links"),
            "base_domain",
            *redir_cols,
            *meta_failed_cols,
        )
        # materialize the bundle: link extraction runs once per superstep
        all_rows = ok_rows.unionByName(failed_rows).localCheckpoint(eager=True)
        _release_checkpoint(fetched)
        new_crawled = all_rows.select(*[f.name for f in schema.CRAWLED.fields])

        nf_cols = ["nofollow_links"] if self.honor_meta_robots else []
        candidates = (
            all_rows.filter(F.col("success")).select(
                "job_id",
                F.col("ord").alias("parent_ord"),
                (F.col("depth") + 1).alias("depth"),
                "base_domain",
                *nf_cols,
                F.posexplode_outer("links").alias("_i", "link"),
            )
            .select(
                "job_id",
                F.col("link.url").alias("url"),
                "parent_ord",
                F.col("link.pos").alias("pos"),
                "depth",
                "base_domain",
                *nf_cols,
            )
            .filter(F.col("url").isNotNull())
            .filter(filters.seeder_link_ok(F.col("url"), F.lower(F.col("base_domain"))))
            .drop("base_domain")
        )
        if self.honor_meta_robots:
            candidates = candidates.filter(
                ~F.coalesce(
                    F.array_contains(F.col("nofollow_links"), F.col("url")),
                    F.lit(False),
                )
            ).drop("nofollow_links")

        per_job = all_rows.groupBy("job_id").agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.col("success").cast("long")).alias("n_parsed"),
            F.sum((~F.col("success")).cast("long")).alias("n_failed"),
            F.sum(F.size(F.coalesce(F.col("links"), F.array()))).alias("n_links"),
            F.sum(F.lit(0)).alias("n_bytes"),
        )
        return new_crawled, candidates, per_job, all_rows


def combined_llmstxt(crawled: DataFrame) -> DataFrame:
    """A9 content concat in crawl order (`crawl4ai_client.py:237,312`):
    per job, the banner-wrapped contents of successful fetches joined by
    ``\\n`` in FIFO order — as one aggregation, no driver loop."""
    b = banner(F.col("url"), F.col("content"))
    return (
        crawled.filter(F.col("success"))
        .select("job_id", "ord", b.alias("bc"))
        .groupBy("job_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "bc"))),
                    lambda s: s["bc"],
                ),
                "\n",
            ).alias("content"),
            F.count("*").alias("pages_scraped"),
        )
    )


def opic_importance(opic: DataFrame,
                    include_sink: bool = False) -> DataFrame:
    """(job_id, url, importance) from a run's final OPIC state: the
    paper's estimate (history + cash) normalized per job (Abiteboul et
    al. WWW'03 use (H+C)/(G+1); a budget-bounded crawl normalizes over
    what it saw). The '' dangling sink is excluded unless
    ``include_sink`` — its share is the cash that left the graph
    through failed/linkless pages (accounted, never silent). One agg +
    one broadcast-sized join (one row per job)."""
    rows = opic if include_sink else opic.filter(F.col("url") != "")
    tot = rows.groupBy("job_id").agg(
        F.sum(F.col("cash") + F.col("hist")).alias("_t")
    )
    return rows.join(tot, "job_id").select(
        "job_id", "url",
        ((F.col("cash") + F.col("hist")) / F.col("_t")).alias("importance"),
    )
