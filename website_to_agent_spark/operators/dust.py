"""DUST rule mining — learn URL-alias rewrite rules from observed
content duplicates (Bar-Yossef, Keidar & Schonfeld, "Do Not Crawl in
the DUST: Different URLs with Similar Text", WWW'07 — public paper,
independent implementation).

Different URLs with Similar Text ("DUST") are endemic on real sites:
``/story?id=123`` ≡ ``/story/123``, trailing ``index.html``,
``www.`` host aliases, session-id query params. The reference dedups
exact URL strings only (`crawl4ai_client.py:271-276`), so every alias
is a wasted fetch; at a 10^10-URL frontier the aliases ARE a material
fraction of the fetch budget. DustBuster's insight is that the rules
can be LEARNED from the crawl log itself — no site-specific config —
and then applied to canonicalize the frontier BEFORE fetching.

Mechanism (all pure Catalyst columns through the mining; the tiny
learned rule table is collected and compiled into ONE chained
``regexp_replace`` map-only pass for application):

1. ``url_token_spans``: each URL is tokenized into maximal
   alphanumeric runs and single delimiter chars, and every substring
   that starts/ends on a token boundary and spans ≤ ``max_tokens``
   tokens (including the EMPTY substring at each boundary — deletion
   rules) is emitted as (envelope=(prefix, suffix), middle). This is
   DustBuster's instance table: two URLs u = p·α·s, v = p·β·s
   sharing an envelope witness the candidate rule α ↔ β.
2. One groupBy on the envelope collects the bucket's (middle,
   digest) members — the SAME single-shuffle, mega-bucket-capped
   shape as ``dedupe.banded_candidate_pairs`` (a hot envelope like
   ``host/?id=`` is exactly a trap template; its members mostly
   carry distinct content and would only refute rules, so the
   deterministic id-order cap loses nothing of value). Every i<j
   member pair expands inline to (α, β, same_content, envelope).
3. ``support`` = distinct envelopes where α and β co-occur with
   EQUAL content digests; ``refuted`` = distinct envelopes where
   they co-occur with DIFFERENT digests (the paper's
   counter-example elimination — ``?page=1`` vs ``?page=2`` share
   thousands of envelopes but the content always differs, so the
   rule dies). Rules need ``support ≥ min_support`` and
   ``refuted ≤ max_refuted``.
4. Direction: both α→β and β→α describe the same alias set, so the
   canonical target is chosen deterministically — the SHORTER
   middle, ties to the lexicographically smaller (aliases collapse
   toward the terser form: strip ``index.html``, strip ``www.``,
   strip the session param).

Scale shape: span generation is map-only array HOFs (≈ (tokens+1) ×
(max_tokens+1) spans per URL, bounded by ``max_url_tokens``); mining
is ONE envelope-keyed shuffle (capped buckets, round-robin spread
before the quadratic expansion) + ONE map-side-combinable (α, β)
aggregation whose output is rule-granular (tiny). Application
broadcasts nothing and shuffles nothing — the rule table is collected
driver-side (bounded by ``max_rules``, deterministic order) and
compiled into a single chained, token-boundary-anchored
``regexp_replace`` column, so frontier canonicalization stays inside
whole-stage codegen exactly like ``functions.urlfns.canonical_url``.

Java-regex lookarounds anchor rule application at token boundaries,
so this module's APPLY step is pytest-mirrored (exact pure-Python
twin) rather than DuckDB-oracled (RE2 has no lookbehind); the MINING
dataflow uses only RE2-compatible expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# maximal alnum runs; every other char is its own token — the whole
# URL is covered, so prefix+middle+suffix always reconstructs it
_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9]"
# envelope separator: never appears in a legal URL (control byte)
_ENV_SEP = "\x01"


def _url_tokens(url: Column) -> Column:
    return F.regexp_extract_all(url, F.lit(_TOKEN_RE), 0)


def url_token_spans(url: Column, max_tokens: int = 4) -> Column:
    """array<struct<env, mid>> — every token-boundary substring of ≤
    ``max_tokens`` tokens (plus the empty substring at each boundary),
    with its envelope ``prefix + \\x01 + suffix``. The full-string
    middle (empty envelope both sides) is excluded — a rule with no
    context is "replace the whole URL", which is not a rule."""
    toks = _url_tokens(url)
    n = F.size(toks)
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n),
            lambda i: F.transform(
                F.filter(
                    F.sequence(F.lit(0), F.lit(max_tokens)),
                    lambda ln: (i + ln <= n)
                    & ~((i == F.lit(0)) & (ln == n)),
                ),
                lambda ln: F.struct(
                    F.concat(
                        F.array_join(F.slice(toks, F.lit(1), i), ""),
                        F.lit(_ENV_SEP),
                        F.array_join(
                            F.slice(toks, i + ln + F.lit(1), n - i - ln),
                            "",
                        ),
                    ).alias("env"),
                    F.array_join(
                        F.slice(toks, i + F.lit(1), ln), ""
                    ).alias("mid"),
                ),
            ),
        )
    )
    return F.array_distinct(spans)


def dust_instances(pages: DataFrame, url_col: str = "url",
                   digest_col: str = "digest",
                   max_tokens: int = 4,
                   max_url_tokens: int = 64,
                   impl: str = "arrow") -> DataFrame:
    """(url, digest, env, mid) — the exploded DustBuster instance
    table. One deterministic digest per URL (max over duplicates —
    pass one snapshot per URL for meaningful rules); URLs longer than
    ``max_url_tokens`` tokens are excluded from MINING (span count is
    quadratic-ish in length; monster URLs are trap territory, and
    rules learned from sane URLs still APPLY to long ones).

    ``impl="arrow"`` (default): span generation is an Arrow batch
    kernel — measured 25× faster than the pure-column form at 10k
    urls (28 s → ~1 s): the nested transform-over-sequence with an
    ``array_join``'d slice PER SPAN never reaches whole-stage codegen
    and re-allocates the token array O(spans) times per row, while
    the kernel walks each url once with character-offset prefix sums
    (the same Catalyst-HOF-vs-kernel trade ``repetition_metrics``
    measured; still map-only, still zero row-at-a-time Python UDFs).
    ``impl="sql"`` retains the pure-column twin (value-identical —
    parity-tested) for engines mirroring the dataflow in SQL."""
    one = (
        pages.groupBy(F.col(url_col).alias("url"))
        .agg(F.max(F.col(digest_col)).alias("digest"))
    )
    if impl == "sql":
        kept = one.filter(
            F.size(_url_tokens(F.col("url"))) <= max_url_tokens)
        return kept.select(
            "url", "digest",
            F.explode(
                url_token_spans(F.col("url"), max_tokens)).alias("s"),
        ).select("url", "digest", F.col("s.env").alias("env"),
                 F.col("s.mid").alias("mid"))
    if impl != "arrow":
        raise ValueError(f"dust_instances: unknown impl {impl!r}")

    mt, mut = int(max_tokens), int(max_url_tokens)

    def kernel(it):
        import re as _re

        import pandas as pd

        tok_re = _re.compile(_TOKEN_RE)
        for pdf in it:
            us, ds, es, ms = [], [], [], []
            for url, dig in zip(pdf["url"], pdf["digest"]):
                toks = tok_re.findall(url)
                n = len(toks)
                if n > mut:
                    continue
                offs = [0]
                for t in toks:
                    offs.append(offs[-1] + len(t))
                seen = set()
                for i in range(n + 1):
                    oi = offs[i]
                    pre = url[:oi]
                    top = min(mt, n - i)
                    for ln in range(0, top + 1):
                        if i == 0 and ln == n:
                            continue
                        env = pre + _ENV_SEP + url[offs[i + ln]:]
                        mid = url[oi:offs[i + ln]]
                        k = (env, mid)
                        if k in seen:
                            continue
                        seen.add(k)
                        us.append(url)
                        ds.append(dig)
                        es.append(env)
                        ms.append(mid)
            yield pd.DataFrame(
                {"url": us, "digest": ds, "env": es, "mid": ms})

    return one.mapInPandas(
        kernel, schema="url string, digest string, env string, mid string")


def dust_rules(pages: DataFrame, url_col: str = "url",
               digest_col: str = "digest",
               max_tokens: int = 4,
               max_url_tokens: int = 64,
               min_support: int = 2,
               max_refuted: int = 0,
               max_bucket: int | None = 256,
               impl: str = "arrow") -> DataFrame:
    """(find, replace, support, refuted) — learned substitution rules,
    canonical direction already chosen (``find`` → ``replace``;
    ``replace`` is the shorter-then-lexicographically-smaller middle,
    so ``find`` is never the empty string). ``support``/``refuted``
    count distinct witnessing envelopes (see module docstring).

    ``max_bucket`` caps each (envelope, digest) duplicate group in
    deterministic mid sort order before the quadratic pair expansion
    (None disables — the mirror-test config).

    Support-first dataflow (the decisive scale cut, measured 189 s →
    20 s at 240k urls / local[16]): SUPPORT pairs only
    exist inside an (envelope, digest) group — two middles evidence a
    rule only when their contexts AND contents agree — and duplicate
    groups are tiny (an alias family is 2-3 members), while the huge
    per-template envelope buckets (hundreds of distinct-content
    middles: ``/art/<id>/`` families, trap templates) are exactly the
    ones whose all-pairs expansion produced tens of millions of rows
    that could only ever REFUTE. So pairs are generated per
    (env, dig) group — the mega-buckets vanish (their (env, dig)
    groups are singletons) — and refutation is then checked ONLY for
    the few candidate rules that cleared ``min_support``: two
    mid-membership prefilters against the broadcast candidate middles
    plus one (env, mid)-keyed join over the surviving slivers.
    Identical semantics, linear-in-duplicates work.

    Slim-row discipline: before any shuffle, the envelope and digest
    collapse to ``xxhash64`` longs and the url is dropped — everything
    downstream needs only equality on them (string-width rows through
    the expansion measured 2× slower end-to-end). A 64-bit collision
    would merge two envelopes or equate two digests at odds ~n²/2⁶⁴ —
    immaterial against a min_support threshold."""
    inst = dust_instances(pages, url_col, digest_col,
                          max_tokens, max_url_tokens, impl=impl)
    slim = inst.select(
        F.xxhash64("env").alias("env"),
        "mid",
        F.xxhash64("digest").alias("dig"),
    ).persist()  # three consumers (groups + both refutation scans) —
    # without the cache the span kernel re-runs per consumer (measured
    # 72 s → 20 s at 240k urls together with the support-first cut);
    # released before returning, the rule-granular result is
    # materialized first
    groups = (
        slim.groupBy("env", "dig")
        .agg(F.collect_list("mid").alias("ms"))
        .filter(F.size("ms") > 1)
    )
    if max_bucket is not None:
        # same deterministic-truncation discipline as
        # dedupe.banded_candidate_pairs: a mass-duplicated page set
        # sharing one envelope would still expand quadratically in
        # ONE row without the bound
        groups = groups.withColumn(
            "ms",
            F.when(
                F.size("ms") > max_bucket,
                F.slice(F.array_sort("ms"), 1, max_bucket),
            ).otherwise(F.col("ms")),
        )
    # grouped rows are compact but the expansion is the real cost —
    # spread groups across full parallelism before it (the same AQE
    # coalesce trap banded_candidate_pairs documents)
    sc = pages.sparkSession.sparkContext
    groups = groups.repartition(sc.defaultParallelism * 2)

    pair = F.flatten(
        F.transform(
            "ms",
            lambda m, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), F.size("ms")),
                lambda nn: F.struct(
                    F.least(m, nn).alias("alpha"),
                    F.greatest(m, nn).alias("beta"),
                ),
            ),
        )
    )
    sup_pairs = groups.select(
        F.col("env"), F.explode(pair).alias("p")
    ).select("env", "p.alpha", "p.beta")
    cand = (
        sup_pairs.groupBy("alpha", "beta")
        .agg(F.count_distinct("env").alias("support"))
        .filter(F.col("support") >= F.lit(int(min_support)))
    )

    # refutation, candidate rules only: an envelope refutes (α, β)
    # when both middles occur in it with DIFFERENT digests. The
    # candidate table is rule-granular (tiny — compile_dust_rules
    # already contracts this scale); its middles prefilter the
    # instance table map-side before the (env, mid) join.
    cand_rows = cand.collect()
    if not cand_rows:
        slim.unpersist()
        return cand.select(
            F.col("alpha").alias("find"), F.col("beta").alias("replace"),
            "support", F.lit(0).cast("long").alias("refuted"))
    mids = sorted({r["alpha"] for r in cand_rows}
                  | {r["beta"] for r in cand_rows})
    occ = slim.filter(F.col("mid").isin(mids))
    spark = pages.sparkSession
    cand_df = spark.createDataFrame(
        [(r["alpha"], r["beta"], r["support"]) for r in cand_rows],
        "alpha string, beta string, support long")
    a_occ = occ.join(
        F.broadcast(cand_df),
        occ["mid"] == cand_df["alpha"]).select(
            "env", "alpha", "beta", "support",
            F.col("dig").alias("_dig_a"))
    b_occ = occ.select(
        F.col("env").alias("_env_b"), F.col("mid").alias("_mid_b"),
        F.col("dig").alias("_dig_b"))
    ref = (
        a_occ.join(
            b_occ,
            (a_occ["env"] == b_occ["_env_b"])
            & (a_occ["beta"] == b_occ["_mid_b"]))
        .filter(F.col("_dig_a") != F.col("_dig_b"))
        .groupBy("alpha", "beta")
        .agg(F.count_distinct("env").alias("refuted"))
    )
    kept = (
        cand_df.join(ref, ["alpha", "beta"], "left")
        .withColumn("refuted",
                    F.coalesce(F.col("refuted"), F.lit(0).cast("long")))
        .filter(F.col("refuted") <= F.lit(int(max_refuted)))
    )
    # canonical direction: shorter middle wins, ties lexicographic —
    # alpha ≤ beta lexicographically already, so beta wins only when
    # strictly shorter
    beta_wins = F.length("beta") < F.length("alpha")
    out = kept.select(
        F.when(beta_wins, F.col("alpha")).otherwise(
            F.col("beta")).alias("find"),
        F.when(beta_wins, F.col("beta")).otherwise(
            F.col("alpha")).alias("replace"),
        "support", "refuted",
    ).localCheckpoint(eager=True)  # rule-granular — release the cache
    slim.unpersist()
    return out


def _rule_pattern(find: str) -> str:
    """Java-regex pattern matching ``find`` anchored at token
    boundaries: a middle that starts/ends with an alphanumeric must
    not match inside a longer alphanumeric run (rule "m"→"" must not
    eat the inside of "mm")."""
    pat = re.escape(find)
    if find[:1].isalnum():
        pat = r"(?<![A-Za-z0-9])" + pat
    if find[-1:].isalnum():
        pat = pat + r"(?![A-Za-z0-9])"
    return pat


def compile_dust_rules(rules: DataFrame, max_rules: int = 10000
                       ) -> list[tuple[str, str]]:
    """Deterministically ordered (pattern, replacement) list — support
    descending, then (find, replace) ascending; capped at
    ``max_rules`` (the table is rule-granular and tiny by
    construction; the cap makes the driver-side collect a mechanical
    bound, not an assumption). Replacement strings are escaped for
    java.util.regex ``replaceAll`` ($ and backslash)."""
    rows = (
        rules.orderBy(F.desc("support"), "find", "replace")
        .limit(int(max_rules))
        .collect()
    )
    out = []
    for r in rows:
        if not r["find"]:
            continue  # empty find can't arise (direction invariant)
        repl = r["replace"].replace("\\", "\\\\").replace("$", r"\$")
        out.append((_rule_pattern(r["find"]), repl))
    return out


def apply_dust_rules(urls: DataFrame, rules, url_col: str = "url",
                     out_col: str = "canonical") -> DataFrame:
    """Adds ``out_col``: the URL with every learned rule applied once,
    in compiled order — one chained ``regexp_replace`` column, fully
    inside whole-stage codegen, zero shuffle, zero Python. ``rules``
    is either the :func:`dust_rules` frame or a pre-compiled
    (pattern, replacement) list (frontier supersteps compile once and
    reuse)."""
    if isinstance(rules, DataFrame):
        rules = compile_dust_rules(rules)
    col = F.col(url_col)
    for pat, repl in rules:
        col = F.regexp_replace(col, pat, repl)
    return urls.withColumn(out_col, col)


def dust_savings(pages: DataFrame, rules, url_col: str = "url"
                 ) -> DataFrame:
    """One row (n_urls, n_canonical, saved_fetches) — how many fetches
    frontier canonicalization with these rules would have avoided on
    this URL set."""
    canon = apply_dust_rules(
        pages.select(F.col(url_col).alias("url")).distinct(), rules)
    return canon.agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("canonical").alias("n_canonical"),
        (F.count("*") - F.count_distinct("canonical")
         ).alias("saved_fetches"),
    )
