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


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text", n: int = 8) -> DataFrame:
    """Train/eval overlap removal: flag every document that shares at
    least one word ``n``-gram with the benchmark set, and count the
    overlapping grams. Returns the input plus (contaminated,
    n_overlaps).

    Scale shape: the benchmark gram set is broadcast (eval suites are
    tiny next to a crawl); the corpus side is explode → broadcast
    semi-ish join → per-doc count → left join back. Only
    (doc_id, gram-hash-sized strings) ever shuffle, never full text.
    """
    bench_grams = benchmark.select(
        F.explode(_word_ngrams(F.col(bench_text_col), n)).alias("gram")
    ).distinct()
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlaps"))
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_overlaps", F.coalesce("n_overlaps", F.lit(0)))
        .withColumn("contaminated", F.col("n_overlaps") > 0)
    )


def remove_duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8) -> DataFrame:
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

    Scale shape — what a true distributed suffix array would cost, done
    with two bounded shuffles instead:
    - gram digests: posexplode of per-row md5(k-gram) arrays (map-side;
      16-byte digests leave the row, never gram text);
    - winner election: ONE row_number window partitioned by digest —
      occurrences of the same span co-locate; a boilerplate mega-span
      concentrates its occurrences in one partition, which is the skew
      the operator exists to remove (run exact + paragraph dedup first,
      as ``build_training_corpus`` does);
    - interval merge: classic gaps-and-islands per doc (window + one
      groupBy); spans-per-doc is small by construction, so the
      reassembly join carries a bounded struct array;
    - reassembly: a higher-order ``filter(toks, (t, i) -> ...)`` — pure
      codegen, no shuffle, no UDF.
    md5 keys make the election byte-reproducible across engines (the
    DuckDB oracle computes the identical digests).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    base = docs.select(F.col(id_col), toks.alias("toks"))
    occ = base.filter(F.size("toks") >= k).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - k),
                lambda i: F.md5(F.array_join(F.slice("toks", i + 1, k), " ")),
            )
        ).alias("pos", "h"),
    )
    # Winner election WITHOUT a per-digest window: row_number over
    # partitionBy(h) puts every occurrence of one digest in ONE task —
    # a corpus-wide boilerplate gram (measured: 480k copies of a shared
    # 16-token tail) serializes there (0.39 scaling efficiency at
    # 4→16 cores). Instead: (1) groupBy(h).min(struct(id,pos)) — the
    # hash-agg has MAP-SIDE partial combine, so the mega-key shuffles
    # one row per map partition, never its occurrence list; (2) mark
    # non-winners via a SALTED join (winner rows replicated to
    # ``salt_buckets`` keys, occurrences spread by pos), bounding any
    # single gram's per-task rows to n/salt_buckets regardless of AQE
    # skew thresholds. Same (id, pos) minimum as the old orderBy.
    salt_buckets = 32
    win = (
        occ.groupBy("h")
        .agg(
            F.min(F.struct(F.col(id_col).alias("i"),
                           F.col("pos").alias("p"))).alias("w"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") > 1)
        .select(
            "h", "w",
            F.explode(
                F.sequence(F.lit(0), F.lit(salt_buckets - 1))
            ).alias("salt"),
        )
    )
    dups = (
        occ.withColumn("salt", F.pmod("pos", F.lit(salt_buckets)))
        .join(win, ["h", "salt"])
        .filter(
            ~((F.col(id_col) == F.col("w.i")) & (F.col("pos") == F.col("w.p")))
        )
        .select(F.col(id_col), F.col("pos").alias("s"),
                (F.col("pos") + (k - 1)).alias("e"))
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
