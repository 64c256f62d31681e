"""End-to-end training-corpus pipeline — the composition a user of
the reference would actually run at scale: crawled pages → hygiene →
dedup → curation → split, with a per-stage accounting report.

The reference stops at "extracted markdown per page"
(`crawl4ai_client.py:282-309`); everything after that is what a
100 TB training-data pipeline needs and what this engine's operator
families provide. This module just composes them — every stage is an
independently-tested, independently-oracled operator:

    pii_scrub → C4 line clean + page gate (optional) → gopher gate
    → n-gram repetition gate (optional) → LM-perplexity gate
      (threshold or CCNet bucket-keep form, optional)
      → trained-quality gate (optional) → exact dedup
      → MinHash near-dup dedup → repeated-span excision (optional;
        fixed-gram or exact-suffix-array form)
      → per-domain cap → benchmark decontamination
      → DSIR target-likeness selection (optional)
      → deterministic split

Scale notes: stage order is chosen so the cheapest map-only gates run
first (pure column math drops rows before any shuffle); the first
shuffle is exact dedup's digest groupBy; near-dup dedup shuffles only
band keys; curation and split are one bounded shuffle and map-only
respectively. The stats report runs one ``count`` per enabled stage —
call with ``counts=False`` to skip them in production (lazy plan,
zero extra jobs).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from website_to_agent_spark.operators import curation, dedupe, webtext


def build_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: Optional[str] = None,
    boilerplate_host_col: Optional[str] = None,
    boilerplate_min_frac: float = 0.5,
    boilerplate_min_pages: int = 3,
    fix_unicode: bool = False,
    unicode_form: str = "NFC",
    scrub_pii: bool = True,
    exclude_ids: Optional[DataFrame] = None,
    compression_gate: bool = False,
    min_compression: float = 0.10,
    max_compression: float = 0.95,
    c4_gate: bool = False,
    blocklist: Optional[DataFrame] = None,
    gopher_gate: bool = True,
    repetition_gate: bool = False,
    lm_table: Optional[DataFrame] = None,
    max_perplexity: float = 1e4,
    lm_keep_buckets: Optional[Tuple[str, ...]] = None,
    lm_bucket_sample_frac: float = 1.0,
    lang_col: str = "lang",
    detect_lang: bool = False,
    quality_weights: Optional[list] = None,
    min_quality: float = 0.5,
    near_dup: bool = True,
    near_dup_mode: str = "greedy",
    prior_digests: Optional[DataFrame] = None,
    prior_bands: Optional[DataFrame] = None,
    minhash_threshold: float = 0.9,
    span_dedup: bool = False,
    span_k: int = 8,
    exact_span_dedup: bool = False,
    exact_span_min_len: int = 50,
    domain_cap: Optional[int] = None,
    benchmark: Optional[DataFrame] = None,
    dsir_target: Optional[DataFrame] = None,
    dsir_k: Optional[int] = None,
    dsir_gumbel_salt: Optional[str] = None,
    splits: Optional[Dict[str, float]] = None,
    counts: bool = True,
) -> Tuple[DataFrame, Dict[str, int]]:
    """(corpus, stage_report). ``docs`` needs (id_col, text_col);
    ``domain_col`` enables the per-domain cap; ``benchmark`` (same
    shape as docs) enables decontamination; ``splits`` adds a
    ``split`` column via the deterministic md5 hash-split.

    Incremental runs: pass ``prior_digests``
    (:func:`dedupe.exact_digests` of earlier snapshots) and/or
    ``prior_bands`` (:func:`dedupe.minhash_band_state`) to dedup this
    batch against the rolling corpus right after within-batch exact
    dedup; build the next batch's state from this batch's output with
    the same two functions.

    Near-dup removal: ``near_dup_mode="greedy"`` (default) drops the
    larger id of every pair — at threshold ≥0.9 pair groups are
    near-cliques, so greedy ≈ transitive closure at a fraction of the
    cost; ``"cluster"`` runs exact transitive closure and keeps ONE
    canonical member per connected cluster
    (``dedupe.near_dup_clusters`` — the published FineWeb/RefinedWeb
    behavior, preferable at lower thresholds where chains matter).
    """
    report: Dict[str, int] = {}

    def mark(stage: str, df: DataFrame) -> DataFrame:
        if counts:
            report[stage] = df.count()
        return df

    out = mark("input", docs)

    if exclude_ids is not None:
        # upstream exclusion list — e.g. urls the crawl flagged
        # noindex (pass CrawlResultTables.noindexed.select("url") with
        # url-keyed docs), a takedown list, or a licensing filter.
        # First stage: everything downstream never sees the excluded
        # docs. Anti-join on the id; the list is metadata-scale next
        # to the corpus. A multi-column table must carry id_col by
        # name — silently guessing columns[0] would no-op the
        # exclusion for shapes like noindexed's (job_id, url, …).
        if id_col in exclude_ids.columns:
            ex = exclude_ids.select(id_col)
        elif len(exclude_ids.columns) == 1:
            ex = exclude_ids.selectExpr(
                f"{exclude_ids.columns[0]} as {id_col}"
            )
        else:
            raise ValueError(
                f"exclude_ids must have a '{id_col}' column or exactly "
                f"one column; got {exclude_ids.columns}"
            )
        out = mark(
            "exclude_ids", out.join(ex, id_col, "left_anti")
        )

    if fix_unicode:
        # unicode repair before ANY text consumer: mojibake repair +
        # normalize(unicode_form) + control/zero-width hygiene change
        # digests, shingles, line hashes, and every quality metric —
        # so it precedes even the boilerplate line-digest learner.
        # Map-only Arrow batch; row count unchanged (rewrite, no gate)
        out = mark(
            "fix_unicode",
            out.withColumn(
                text_col,
                webtext.fix_text(F.col(text_col), form=unicode_form)),
        )

    if boilerplate_host_col is not None:
        # site-template strip FIRST: nav/footer/banner lines distort
        # every downstream quality metric (Gopher shape ratios, LM
        # perplexity, dedup shingles). Two digest-only shuffles to
        # learn the per-host flagged set; the strip itself is a
        # broadcast map (webtext.host_boilerplate_lines docstring).
        flagged = webtext.host_boilerplate_lines(
            out, host_col=boilerplate_host_col, id_col=id_col,
            text_col=text_col, min_frac=boilerplate_min_frac,
            min_pages=boilerplate_min_pages)
        out = mark(
            "boilerplate_strip",
            webtext.strip_host_boilerplate(
                out, flagged, host_col=boilerplate_host_col,
                text_col=text_col
            ).drop("n_boilerplate_removed"),
        )

    if scrub_pii:
        out = mark(
            "pii_scrub",
            out.withColumn(text_col, webtext.pii_scrub(F.col(text_col))),
        )
    if c4_gate:
        # C4 line cleaning REWRITES text (terminal-punct lines only),
        # then the page gate filters — both map-only, so they run
        # before the Gopher gate reads the cleaned text.
        out = mark(
            "c4_gate",
            out.withColumn(text_col, webtext.c4_clean_lines(F.col(text_col)))
               .filter(webtext.c4_page_ok(F.col(text_col))),
        )
    if blocklist is not None:
        # C4's word-blocklist pass (big-list broadcast-join form):
        # token-level, so list entries never match inside longer words
        out = mark(
            "blocklist",
            webtext.blocklist_filter(
                out, blocklist, id_col=id_col, text_col=text_col),
        )
    if compression_gate:
        # zlib compression-ratio band (map-only Arrow batch): too
        # compressible = long-range boilerplate/spam loops the n-gram
        # fractions miss; too incompressible = non-text noise
        out = mark(
            "compression_gate",
            out.filter(
                webtext.compression_ok(
                    webtext.compression_ratio(F.col(text_col)),
                    lo=min_compression,
                    hi=max_compression,
                )
            ),
        )
    if gopher_gate:
        out = mark(
            "gopher_gate",
            out.filter(webtext.gopher_quality_ok(F.col(text_col))),
        )
    if repetition_gate:
        # the n-gram half of the Gopher gate (Table A1): map-only
        # since r5 (Arrow kernel), but still costlier per doc than
        # the column gates, so it runs AFTER they have thinned the
        # corpus and joins back as a left-semi on id.
        rep_ok = webtext.gopher_repetition_ok(
            webtext.repetition_metrics(
                out.select(id_col, text_col),
                id_col=id_col, text_col=text_col)
        ).filter(F.col("repetition_ok")).select(id_col)
        out = mark(
            "repetition_gate", out.join(rep_ok, id_col, "left_semi")
        )
    if lm_table is not None:
        # a (lang, gram, cnt) table (webtext.train_char_lms) flips the
        # stage to the PER-LANGUAGE CCNet form: each doc scored under
        # its own language's LM (``lang_col``), cutoffs fit within each
        # language — a multilingual corpus gated by one mono LM wipes
        # every language the trusted subset doesn't cover.
        per_lang = "lang" in lm_table.columns
        if detect_lang and per_lang:
            # CCNet step 1: language-ID BEFORE the per-language gate.
            # Crawl text arrives unlabeled (or partially labeled) —
            # fill missing labels with the trained n-gram classifier
            # so the per-language LM never scores a doc under the
            # wrong model. Trusted labels are kept; only NULL/absent
            # ones are detected. One doc-keyed join; the classifier
            # itself shuffles only (doc_id, lang, doubles).
            det = webtext.detect_language(
                out, lm_table, id_col=id_col, text_col=text_col
            ).select(id_col, F.col("lang").alias("_detected"))
            if lang_col in out.columns:
                out = (
                    out.join(det, id_col, "left")
                    .withColumn(
                        lang_col,
                        F.coalesce(F.col(lang_col), F.col("_detected")),
                    )
                    .drop("_detected")
                )
            else:
                out = out.join(det, id_col, "left").withColumnRenamed(
                    "_detected", lang_col
                )
            out = mark("lang_detect", out)
        if lm_keep_buckets is not None:
            # CCNet form (Wenzek et al. 2020): keep whole perplexity
            # percentile buckets (e.g. ("head", "middle")) rather than
            # a fixed threshold — the cut adapts to the pool, so the
            # same flags work on a clean crawl and a noisy one. At
            # 100 TB pass lm_bucket_sample_frac < 1 so the exact
            # percentile's one-reducer buffer stays bounded (see
            # webtext.perplexity_buckets).
            if per_lang:
                scored = webtext.perplexity_buckets_by_lang(
                    out, lm_table, id_col=id_col, lang_col=lang_col,
                    text_col=text_col,
                    sample_frac=lm_bucket_sample_frac,
                )
            else:
                scored = webtext.perplexity_buckets(
                    out, lm_table, id_col=id_col, text_col=text_col,
                    sample_frac=lm_bucket_sample_frac,
                )
            keep = scored.filter(
                F.col("bucket").isin(*lm_keep_buckets)
            ).select(id_col)
            out = mark("lm_bucket_gate", out.join(keep, id_col, "left_semi"))
        else:
            if per_lang:
                scored = webtext.lm_perplexity_by_lang(
                    out, lm_table, id_col=id_col, lang_col=lang_col,
                    text_col=text_col,
                )
            else:
                scored = webtext.lm_perplexity(
                    out, lm_table, id_col=id_col, text_col=text_col
                )
            out = mark(
                "lm_gate",
                out.join(
                    scored.filter(F.col("perplexity") <= max_perplexity)
                    .select(id_col),
                    id_col, "left_semi",
                ),
            )

    if quality_weights is not None:
        # GPT-3/LLaMA-style trained quality gate (weights from
        # quality_classifier.train_quality_classifier) — map-only
        from website_to_agent_spark.operators import quality_classifier

        out = mark(
            "quality_gate",
            quality_classifier.classify_quality(
                out, quality_weights, text_col=text_col
            )
            .filter(F.col("quality_prob") >= min_quality)
            .drop("quality_prob"),
        )

    # r6 perf: every dedup/curation stage below references `out` on
    # BOTH sides of an anti-join (the corpus and a loser/keeper list
    # derived from it), and Catalyst shares nothing across join sides
    # — without a cache the map-gate prefix above (pii regex scrub,
    # Gopher metrics) re-evaluates once per side per stage. Persist is
    # LAZY (counts=False still plans zero extra jobs; the first
    # consuming action populates it) and MEMORY_AND_DISK — the
    # standard between-major-stages materialization of a production
    # corpus build. The gated corpus is the post-filter minority of
    # the crawl, and everything below reads it repeatedly.
    from pyspark.storagelevel import StorageLevel

    out = out.persist(StorageLevel.MEMORY_AND_DISK)

    # exact dedup first: byte-identical copies are the cheap win and
    # would otherwise flood the near-dup bands; keep each group's
    # smallest id
    exact = dedupe.exact_duplicates(out, id_col=id_col, text_col=text_col)
    losers = (
        exact.select(
            F.explode("doc_ids").alias(id_col),
            F.array_min("doc_ids").alias("_keep"),
        )
        .filter(F.col(id_col) != F.col("_keep"))
        .select(id_col)
    )
    out = mark("exact_dedup", out.join(losers, id_col, "left_anti"))

    if prior_digests is not None:
        # incremental run: this batch is one snapshot of a rolling
        # corpus — drop anything an earlier snapshot already kept
        # (slim digest anti-join; the prior corpus is never re-read)
        out, _ = dedupe.dedup_against_exact(
            out, prior_digests, id_col=id_col, text_col=text_col)
        out = mark("prior_exact", out)
    if prior_bands is not None:
        out, _ = dedupe.dedup_against_bands(
            out, prior_bands, id_col=id_col, text_col=text_col)
        out = mark("prior_near_dup", out)

    if near_dup:
        pairs = dedupe.minhash_lsh_pairs(
            out, id_col=id_col, text_col=text_col,
            threshold=minhash_threshold,
        )
        if near_dup_mode == "cluster":
            # transitive-closure election: exactly one survivor per
            # connected pair cluster (FineWeb/RefinedWeb form) — see
            # dedupe.near_dup_clusters for greedy-vs-cluster semantics
            losers = dedupe.near_dup_clusters(
                pairs, id_col=id_col
            ).filter(~F.col("keep")).select(id_col)
        else:
            losers = pairs.select(
                F.greatest("doc_a", "doc_b").alias(id_col)
            ).distinct()
        out = mark("near_dup", out.join(losers, id_col, "left_anti"))

    if span_dedup:
        # after doc-level dedup (exact + near-dup have removed whole
        # copies), excise the remaining repeated >=span_k-token spans
        # (RefinedWeb/Lee-et-al order). Rewrites text_col to the
        # token-normalized surviving stream; row count is unchanged,
        # so the funnel stays monotone. Other columns survive via the
        # id re-join.
        span = curation.remove_duplicate_spans(
            out.select(id_col, text_col), id_col=id_col,
            text_col=text_col, k=span_k,
        )
        out = mark(
            "span_dedup",
            out.drop(text_col).join(
                span.select(id_col, text_col), id_col
            ),
        )

    if exact_span_dedup:
        # the EXACT form (true suffix array + LCP): every duplicated
        # substring of >= exact_span_min_len CHARS survives exactly
        # once corpus-wide. Strictly stronger than the fixed-gram
        # span_dedup and substantially more expensive (the SA build's
        # ~log(longest-repeat) doubling rounds) — the Lee et al. 2022
        # configuration for final high-value corpora. Same re-join
        # shape: row count unchanged, funnel monotone.
        from website_to_agent_spark.operators import suffixes

        exact = suffixes.remove_duplicate_spans_exact(
            out.select(id_col, text_col), id_col=id_col,
            text_col=text_col, min_len=exact_span_min_len,
        )
        out = mark(
            "exact_span_dedup",
            out.drop(text_col).join(
                exact.select(id_col, text_col), id_col
            ),
        )

    if domain_cap is not None and domain_col is not None:
        out = mark(
            "domain_cap",
            curation.cap_per_domain(out, domain_col, domain_cap,
                                    key_col=id_col),
        )
    if benchmark is not None:
        flagged = curation.decontaminate(
            out, benchmark, id_col=id_col, text_col=text_col
        )
        out = mark(
            "decontaminate",
            flagged.filter(~F.col("contaminated"))
            .drop("contaminated", "n_overlaps"),
        )

    if dsir_target is not None and dsir_k is not None:
        # DSIR importance selection (Xie et al. 2023) is the LAST
        # filter: it scores the cleaned, deduped pool against the
        # trusted target and keeps the k most target-like docs — run
        # earlier it would waste score mass on rows a cheaper gate
        # was about to drop, and the paper's raw distribution is the
        # post-hygiene pool. top-k is a TakeOrderedAndProject; the
        # k-row winner table broadcasts back onto the corpus. The
        # log_weight column is dropped so the funnel's schema doesn't
        # depend on whether selection ran.
        from website_to_agent_spark.operators import sampling

        out = mark(
            "dsir_select",
            sampling.dsir_select(
                out, dsir_target, dsir_k, id_col=id_col,
                text_col=text_col, gumbel_salt=dsir_gumbel_salt,
            ).drop("log_weight"),
        )

    if splits:
        from website_to_agent_spark.operators import sampling

        out = sampling.split_by_hash(out, id_col, splits)
        if counts:
            report["output"] = out.count()
    elif counts:
        report["output"] = report.get(
            list(report)[-1] if report else "input", 0
        )
    return out, report
