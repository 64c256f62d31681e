"""Corpus curation — the anti-spam / anti-leakage layer of a
large-scale training-data pipeline (task brief: first-class
beyond-reference operators over the ``documents`` table).

Three operators that sit between hygiene (webtext.py) and selection
(sampling.py):

- ``cap_per_domain``: bound any one domain's contribution to the
  corpus (a handful of mega-hosts otherwise dominate a web crawl).
- ``decontaminate``: flag documents sharing any word n-gram with a
  benchmark/eval set — the GPT-3-style train/test overlap removal.
- ``dedup_paragraphs_across_docs``: remove paragraph-level boilerplate
  repeated across documents (cookie banners, nav footers) while
  keeping the first occurrence, reassembling each document.

All pure column dataflow (zero UDFs); deterministic winners everywhere
(md5-salted order, min-(id,pos) keys) so re-runs and the DuckDB
oracles reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cap_per_domain(df: DataFrame, domain_col: str, k: int,
                   key_col: str = "doc_id",
                   salt: str = "cap-v1") -> DataFrame:
    """Keep at most ``k`` rows per domain; survivors are a
    deterministic uniform sample (ordered by salted md5 of the key, so
    the kept set is unbiased w.r.t. crawl order and stable across
    re-runs/engines).

    Scale shape: one hash shuffle on the domain + a bounded per-domain
    window. A mega-domain's rows land in one window partition — that is
    exactly the skew this operator EXISTS to remove, and the window
    never materializes more than the partition iterator; for corpora
    that are >50% one domain, pre-filter with a count-based gate first.
    """
    u = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(domain_col).orderBy(u, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _word_ngrams(text, n: int) -> F.Column:
    """Lowercased word n-grams (letters+digits tokens) — the shingle
    shape shared with dedupe; short docs yield their whole token run."""
    toks = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def _gram_digests(texts, n: int):
    """Distinct word-``n``-gram digests of each text — the vectorized
    twin of ``_word_ngrams`` ∘ digest: tokens are siphash'd once
    (``pd.util.hash_array``, fixed key — deterministic across workers
    and runs) and each gram digest is a Horner fold of its window's
    token hashes in uint64 wrap arithmetic, so no per-gram string is
    ever built. Short texts (< n tokens) fold their whole token run
    into one digest, mirroring ``_word_ngrams``'s fallback arm; NULL
    text yields no digest (explode-of-NULL semantics). Returns a list
    of np.uint64 arrays (distinct per text)."""
    import re as _re

    import numpy as np
    import pandas as pd

    P = np.uint64(1099511628211)
    out = []
    with np.errstate(over="ignore"):
        for text in texts:
            if text is None:
                out.append(np.empty(0, dtype=np.uint64))
                continue
            toks = _re.findall(r"[a-z0-9]+", text.lower())
            m = len(toks)
            if m == 0:
                # _word_ngrams yields the single "" gram here
                out.append(np.zeros(1, dtype=np.uint64))
                continue
            th = pd.util.hash_array(np.asarray(toks, dtype=object))
            if m >= n:
                g = th[: m - n + 1].copy()
                for j in range(1, n):
                    g = g * P + th[j: j + m - n + 1]
            else:
                acc = np.uint64(0)
                for t in th:
                    acc = acc * P + t
                g = np.asarray([acc], dtype=np.uint64)
            out.append(np.unique(g))
    return out


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text", n: int = 8) -> DataFrame:
    """Train/eval overlap removal: flag every document that shares at
    least one word ``n``-gram with the benchmark set, and count the
    overlapping grams. Returns the input plus (contaminated,
    n_overlaps).

    Scale shape: the benchmark digest set is driver-collected and
    broadcast through the kernel closure (eval suites are tiny next to
    a crawl — the same bound the previous broadcast-join form relied
    on); the corpus side is ONE Arrow pass over (id, text) emitting
    only the contaminated (id, n_overlaps) rows, joined back onto the
    corpus. r6: the pass matches 64-bit gram DIGESTS (token-level
    siphash + Horner fold — ``_gram_digests``) instead of
    materializing every n-gram as a string and broadcast-joining on
    it; measured 3 s of JVM gram-string construction per 5000 docs
    drops to a vectorized numpy fold, and a digest collision
    (~2^-64-scale) can only add one false overlap count, the same
    acceptance class as the xxhash64 span digests elsewhere in this
    pipeline. Text never shuffles.
    """
    import numpy as np

    bench_rows = [r[0] for r in
                  benchmark.select(F.col(bench_text_col)).collect()]
    bench_set = np.unique(
        np.concatenate(_gram_digests(bench_rows, n))
        if bench_rows else np.empty(0, dtype=np.uint64)
    )
    id_type = docs.schema[id_col].dataType.simpleString()

    def _count(batches):
        import pandas as pd

        for b in batches:
            digs = _gram_digests(b[text_col], n)
            counts = [int(np.isin(d, bench_set).sum()) for d in digs]
            res = pd.DataFrame({id_col: b[id_col], "n_overlaps": counts})
            yield res[res["n_overlaps"] > 0]

    hits = docs.select(id_col, text_col).mapInPandas(
        _count, f"{id_col} {id_type}, n_overlaps long"
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_overlaps", F.coalesce("n_overlaps", F.lit(0)))
        .withColumn("contaminated", F.col("n_overlaps") > 0)
    )


def remove_duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Suffix-array-style exact substring dedup at word ``k``-gram
    granularity (the "dedup any repeated >=k-token span, keep its first
    occurrence" pass of modern pretraining pipelines — Lee et al. 2022,
    RefinedWeb): every k-token window whose text occurs more than once
    in the corpus survives ONLY in its globally-first occurrence
    (lexicographic min of (doc key, position)); every other occurrence
    marks its k tokens for removal, overlapping removals are merged
    into maximal spans per document, and each document is reassembled
    from its surviving tokens (single-space joined — token-level
    reassembly, the standard granularity for this pass).

    Returns (id, text, n_tokens, n_tokens_removed, n_spans_removed).
    Documents shorter than ``k`` tokens are never touched (but their
    text is still token-normalized, keeping output uniform).

    ``hash_fn`` — "xxhash64" (default): gram digests are pure 64-bit
    long math — one ``xxhash64`` per TOKEN, then a pairwise
    ``xxhash64(acc, tok_hash)`` fold per gram — zero per-gram string
    allocation. Measured 4→16-core profile showed the md5 path
    DRAM-bandwidth-bound (45M 32-char hex strings + gram-text
    ``array_join``s capped every stage at ~1.8× for 4× cores); the
    long path removes that allocation wall, and 64-bit digests are the
    granularity Lee et al.'s own pipeline accepts (a collision removes
    one k-token span, never a document). "md5": the byte-reproducible
    variant the DuckDB oracle mirrors digest-for-digest — same
    hash-vs-oracle split as ``dedupe.minhash_signatures``.

    Scale shape — what a true distributed suffix array would cost, done
    with two bounded shuffles instead:
    - gram digests: posexplode of per-row digest arrays (map-side; only
      fixed-width digests leave the row, never gram text);
    - winner election + dup marking: a two-level salted window (see
      inline comment) — never a single-task hot digest;
    - interval merge: classic gaps-and-islands per doc (window + one
      groupBy); spans-per-doc is small by construction, so the
      reassembly join carries a bounded struct array;
    - reassembly: a higher-order ``filter(toks, (t, i) -> ...)`` — pure
      codegen, no shuffle, no UDF.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    base = docs.select(F.col(id_col), toks.alias("toks"))
    if hash_fn == "md5":
        grams = F.transform(
            F.sequence(F.lit(0), F.size("toks") - k),
            lambda i: F.md5(F.array_join(F.slice("toks", i + 1, k), " ")),
        )
    else:
        # one xxhash64 over the gram text: a quarter of md5's hash
        # cost and an 8-byte LONG digest (vs a 32-char hex string)
        # through every downstream shuffle/sort. A pairwise
        # xxhash64-fold over per-token hashes (no gram strings at all)
        # was measured SLOWER — k nested interpreted lambda evals per
        # gram cost more than building the gram string once.
        grams = F.transform(
            F.sequence(F.lit(0), F.size("toks") - k),
            lambda i: F.xxhash64(F.array_join(F.slice("toks", i + 1, k), " ")),
        )
    occ = base.filter(F.size("toks") >= k).select(
        F.col(id_col), F.posexplode(grams).alias("pos", "h"),
    )
    # Winner election as a TWO-LEVEL salted window, not one window on
    # h: row_number over partitionBy(h) would put every occurrence of
    # one digest in a single task, so a corpus-wide boilerplate gram
    # (measured: 480k copies of a shared 16-token tail) serializes
    # there. Level 1 ranks within (h, salt) — the hot gram spreads
    # over n_salts tasks; everything ranked >1 is a dup already.
    # Level 2 ranks only the per-salt winners (≤ n_salts rows per
    # gram, hard-bounded) to find the global first occurrence; per-
    # salt winners that lose level 2 are the remaining dups. The
    # global min(id, pos) survives both levels, so the winner is
    # identical to the unsalted window's. Cost: the same one big
    # shuffle+sort of slim (id, pos, h) rows as the plain window,
    # plus a second shuffle of the much smaller level-1 survivors —
    # measured-and-rejected alternatives (groupBy-argmin + join-back,
    # with/without persist, salted join) all recompute or rescan the
    # gram explode and lost 25-150% wall time (BENCH/BASELINE.md).
    n_salts = 64
    salted = occ.withColumn(
        "salt", F.pmod(F.xxhash64(id_col, "pos"), F.lit(n_salts))
    )
    w1 = Window.partitionBy("h", "salt").orderBy(id_col, "pos")
    l1 = salted.withColumn("rn1", F.row_number().over(w1))
    dup1 = l1.filter(F.col("rn1") > 1)
    w2 = Window.partitionBy("h").orderBy(id_col, "pos")
    dup2 = (
        l1.filter(F.col("rn1") == 1)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") > 1)
    )
    dups = dup1.select(
        F.col(id_col), F.col("pos").alias("s"),
        (F.col("pos") + (k - 1)).alias("e"),
    ).unionByName(
        dup2.select(
            F.col(id_col), F.col("pos").alias("s"),
            (F.col("pos") + (k - 1)).alias("e"),
        )
    )
    # gaps-and-islands: merge overlapping/adjacent-by-overlap intervals.
    wd = Window.partitionBy(id_col).orderBy("s")
    prev_max_e = F.max("e").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    grouped = (
        dups.withColumn(
            "new", F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
            .otherwise(0)
        )
        .withColumn("g", F.sum("new").over(wd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "g")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    per_doc = grouped.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("spans"),
        F.count("*").alias("n_spans_removed"),
    )
    spans = F.coalesce("spans", F.array().cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        "toks",
        lambda t, i: ~F.exists(spans, lambda sp: (i >= sp["s"]) & (i <= sp["e"])),
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("text"),
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size(kept)).cast("long").alias("n_tokens_removed"),
            F.coalesce("n_spans_removed", F.lit(0).cast("long"))
            .alias("n_spans_removed"),
        )
    )


def dedup_paragraphs_across_docs(docs: DataFrame, id_col: str = "doc_id",
                                 text_col: str = "text",
                                 sep: str = "\n\n") -> DataFrame:
    """Cross-document paragraph dedup: a paragraph appearing in many
    documents (boilerplate) survives only in its FIRST occurrence —
    first = min (doc key, position) over the exact paragraph text —
    and every document is reassembled from its surviving paragraphs in
    original order. Returns (id, text, n_paragraphs, n_dropped).

    Scale shape: explode paragraphs → md5 digest → one groupBy on the
    digest electing the winner (the 16-byte digest shuffles, not the
    paragraph) → broadcast-sized? no: winner set is joined back by
    digest (hash join), then one groupBy per doc re-joins surviving
    paragraphs with ``collect_list`` sorted by position. Paragraph
    bodies travel through the reassembly join only — each exactly
    twice overall.
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep).cast("string")))
        .alias("pos", "para"),
    ).withColumn("h", F.md5("para"))
    winners = paras.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("wid"), F.col("pos").alias("wpos")))
        .alias("w")
    )
    kept = paras.join(winners, "h").filter(
        (F.col(id_col) == F.col("w.wid")) & (F.col("pos") == F.col("w.wpos"))
    )
    dropped = paras.join(winners, "h").filter(
        ~((F.col(id_col) == F.col("w.wid")) & (F.col("pos") == F.col("w.wpos")))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_paragraphs"),
    )
    n_dropped = dropped.groupBy(id_col).agg(F.count("*").alias("n_dropped"))
    return (
        rebuilt.join(n_dropped, id_col, "left")
        .withColumn("n_dropped", F.coalesce("n_dropped", F.lit(0)))
    )
