"""Web-text training-data hygiene operators (task brief: "operations a
large-scale training-data pipeline would need", beyond the reference).

All pure Column math, RE2-compatible regexes only (no lookahead, no
backrefs) so every operator has a value-exact DuckDB oracle:

- ``pii_scrub``: redact emails / phone numbers / IPv4 addresses with
  typed placeholders — the standard pre-training privacy pass.
- ``gopher_metrics`` / ``gopher_quality_ok``: repetition- and
  shape-based document gates in the Gopher/C4 family: duplicate-line
  fraction and character fraction, duplicate-paragraph fraction and
  character fraction, bullet- and ellipsis-line fractions,
  symbol-to-word ratio, mean word length, word count — plus the
  boolean gate with the published thresholds.
- ``repetition_metrics`` / ``gopher_repetition_ok``: the n-gram half
  of the Gopher repetition suite (top-{2,3,4}-gram and
  duplicated-{5..10}-gram character fractions) — map-only since r5
  (one Arrow kernel; the metric is within-doc, so the r4 gram-row
  shuffle was measured wasteful and demoted to the oracle-mirror
  ``impl="sql"`` path).
- ``url_dedup_best``: URL-level dedup on the canonical URL
  (``urlfns.canonical_url``): keep one row per canonical form
  (deterministic winner = min original url) — the cheapest, first
  dedup stage of a crawl corpus, one hash-shuffle on the canonical
  string.

Scale notes: pii_scrub and the metrics are map-only (whole-stage
codegen, no shuffle); url_dedup_best shuffles the canonical key once
with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from website_to_agent_spark.functions import urlfns

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
# Phone shapes only — a bare "optional-+, 2-4-digit groups" pattern
# also ate ISO dates ('2025-01-01'), timestamps, and thousands-grouped
# numbers ('1 000 000'). RE2 has no lookarounds/backrefs, so the
# "international OR long-enough" rule is spelled as an alternation:
#   1. explicit '+' country code, 2-5 digit groups (any separators)
#   2. parenthesized area code: (555) 123-4567
#   3. bare 10-digit 3-3-4: 555-123-4567 / 555.123.4567 / 555 123 4567
# A date's 4-2-2 digit shape matches none of these.
PHONE_RE = (
    r"\+\d{1,3}[ .-]?\d{2,4}([ .-]?\d{2,4}){1,3}"
    r"|\(\d{3}\) ?\d{3}[-. ]\d{4}"
    r"|\d{3}[-. ]\d{3}[-. ]\d{4}"
)


def pii_scrub(text: Column) -> Column:
    """Redact emails, IPv4s, then phone-like digit runs (this order —
    emails/IPs contain digit runs a phone regex would half-eat)."""
    c = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return c


def _lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), F.trim), lambda l: l != ""
    )


def _dup_char_frac(items: Column) -> Column:
    """Fraction of characters belonging to repeat occurrences (beyond
    the first) of items in an array: (Σlen(all) − Σlen(distinct)) /
    max(Σlen(all), 1)."""
    total = F.aggregate(
        items, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    distinct = F.aggregate(
        F.array_distinct(items), F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    return F.round((total - distinct) / F.greatest(total, F.lit(1)), 6)


def gopher_metrics(text: Column) -> Column:
    """struct<n_words, mean_word_len, symbol_word_ratio,
    dup_line_frac, dup_line_char_frac, dup_para_frac,
    dup_para_char_frac, bullet_frac, ellipsis_frac> — Gopher-style
    document shape/repetition metrics (Rae et al. 2021, Table A1),
    all rounded for cross-engine equality.

    Paragraphs split on blank lines (``\\n{2,}``); both line- and
    paragraph-level metrics use trimmed, non-empty items, and the
    duplicate *character* fractions are over the total characters of
    those items (repeat occurrences beyond the first count as
    duplicated). The n-gram repetition fractions need a shuffle and
    live in :func:`repetition_metrics`."""
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    mean_word_len = F.round(
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    n_symbols = F.size(
        F.filter(words, lambda w: w.isin("#", "...", "…"))
    )
    symbol_word_ratio = F.round(
        n_symbols / F.greatest(n_words, F.lit(1)), 6
    )
    lines = _lines(text)
    n_lines = F.size(lines)
    dup_line_frac = F.round(
        (n_lines - F.size(F.array_distinct(lines)))
        / F.greatest(n_lines, F.lit(1)),
        6,
    )
    paras = F.filter(
        F.transform(F.split(text, r"\n{2,}"), F.trim), lambda p: p != ""
    )
    n_paras = F.size(paras)
    dup_para_frac = F.round(
        (n_paras - F.size(F.array_distinct(paras)))
        / F.greatest(n_paras, F.lit(1)),
        6,
    )
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("-") | l.startswith("*")
                | l.startswith("•"),
            )
        )
        / F.greatest(n_lines, F.lit(1)),
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(
                lines, lambda l: l.endswith("...") | l.endswith("…")
            )
        )
        / F.greatest(n_lines, F.lit(1)),
        6,
    )
    return F.struct(
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        dup_line_frac.alias("dup_line_frac"),
        _dup_char_frac(lines).alias("dup_line_char_frac"),
        dup_para_frac.alias("dup_para_frac"),
        _dup_char_frac(paras).alias("dup_para_char_frac"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
    )


def gopher_quality_ok(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_dup_para_frac: float = 0.3,
    max_dup_para_char_frac: float = 0.2,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
) -> Column:
    """The Gopher repetition/shape gate as one boolean Column (the
    map-only signals; pair with :func:`gopher_repetition_ok` over
    :func:`repetition_metrics` for the n-gram signals)."""
    m = gopher_metrics(text)
    return (
        (m["n_words"] >= min_words)
        & (m["n_words"] <= max_words)
        & (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len)
        & (m["symbol_word_ratio"] <= max_symbol_word_ratio)
        & (m["dup_line_frac"] <= max_dup_line_frac)
        & (m["dup_line_char_frac"] <= max_dup_line_char_frac)
        & (m["dup_para_frac"] <= max_dup_para_frac)
        & (m["dup_para_char_frac"] <= max_dup_para_char_frac)
        & (m["bullet_frac"] <= max_bullet_frac)
        & (m["ellipsis_frac"] <= max_ellipsis_frac)
    )


# Gopher Table A1 thresholds for the n-gram repetition signals.
TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_metrics(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       top_ns: tuple = (2, 3, 4),
                       dup_ns: tuple = (5, 6, 7, 8, 9, 10),
                       impl: str = "arrow") -> DataFrame:
    """Gopher n-gram repetition fractions (Rae et al. 2021 §A1.1):
    per doc, ``top_{n}gram_char_frac`` for n in ``top_ns`` (characters
    covered by the single most-repeated word n-gram) and
    ``dup_{n}gram_char_frac`` for n in ``dup_ns`` (characters covered
    by repeat occurrences — beyond the first — of ALL duplicated
    n-grams).

    Deterministic semantics (documented divergences from the paper's
    prose, which leaves them open): words are the pipeline-standard
    lowercase ``[a-z0-9]+`` tokens; the denominator is the character
    length of the space-joined token stream; a gram's character cost
    is its space-joined length; the top-gram numerator is
    ``max over grams of count·len`` (tie-stable — no arbitrary
    most-common pick); overlapping occurrences of duplicated grams
    each count (an upper bound vs position-marking implementations —
    higher = stricter gate). Docs with fewer than n tokens score 0.0
    for that n.

    Scale shape — ``impl="arrow"`` (default): the metric is purely
    WITHIN-doc, so it is computed map-only in one Arrow kernel; no
    gram ever leaves its document, zero shuffle, and scaling is the
    extraction-kernel shape (measured 0.833 N→4N). This replaced the
    r4 posexplode+groupBy form after its own scaling pair measured
    0.423: expanding every doc into ~9·tokens slim gram rows pays two
    exchanges of ~40× the input rows to compute a statistic that
    never needed cross-row data, and the shuffle saturates host
    bandwidth beyond ~8 threads (BENCH/SCALING_r05_repetition_4_16
    .json holds the rejected measurement). ``impl="sql"`` retains
    that pure-column form — it is the structural mirror of the DuckDB
    oracle and stays value-exact vs the kernel (parity-tested); its
    within-doc xxhash64 collisions (~1e-13/doc) are the only
    permitted divergence."""
    if impl == "arrow":
        return _repetition_metrics_arrow(docs, id_col, text_col,
                                         top_ns, dup_ns)
    return _repetition_metrics_sql(docs, id_col, text_col, top_ns,
                                   dup_ns)


def _repetition_metrics_arrow(docs: DataFrame, id_col: str,
                              text_col: str, top_ns: tuple,
                              dup_ns: tuple) -> DataFrame:
    """Map-only Arrow kernel: per doc, count n-grams in a dict keyed
    by the token tuple (exact grams — no hash-collision caveat) and
    emit the rounded fractions. Rounding mirrors Spark's ``round(x,
    6)`` exactly (BigDecimal HALF_UP over the shortest decimal
    representation) so the SQL form and the DuckDB oracle stay
    value-identical."""
    from pyspark.sql import types as T

    top_list, dup_list = tuple(top_ns), tuple(dup_ns)
    sizes = sorted(set(top_list) | set(dup_list))
    frac_cols = ([f"top_{n}gram_char_frac" for n in top_list]
                 + [f"dup_{n}gram_char_frac" for n in dup_list])
    schema = T.StructType(
        [T.StructField(id_col, docs.schema[id_col].dataType)]
        + [T.StructField(c, T.DoubleType()) for c in frac_cols]
    )
    top_set, dup_set = set(top_list), set(dup_list)

    def kernel(batches):
        import re
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        tok_re = re.compile(r"[a-z0-9]+")
        q6 = Decimal("0.000001")

        def r6(x: float) -> float:
            # repr() is the shortest round-trip decimal — the same
            # value BigDecimal.valueOf(double) quantizes in the JVM
            return float(Decimal(repr(x)).quantize(
                q6, rounding=ROUND_HALF_UP))

        for pdf in batches:
            cols: dict = {c: [] for c in frac_cols}
            for text in pdf[text_col]:
                if text is None:
                    for c in frac_cols:
                        cols[c].append(0.0)
                    continue
                toks = tok_re.findall(text.lower())
                nt = len(toks)
                pre = [0]
                for t in toks:
                    pre.append(pre[-1] + len(t))
                denom = max(pre[-1] + max(nt - 1, 0), 1)
                for n in sizes:
                    if nt < n:
                        if n in top_set:
                            cols[f"top_{n}gram_char_frac"].append(0.0)
                        if n in dup_set:
                            cols[f"dup_{n}gram_char_frac"].append(0.0)
                        continue
                    d: dict = {}
                    for i in range(nt - n + 1):
                        k = tuple(toks[i:i + n])
                        e = d.get(k)
                        if e is None:
                            d[k] = [1, pre[i + n] - pre[i] + n - 1]
                        else:
                            e[0] += 1
                    if n in top_set:
                        top = max((c * ln for c, ln in d.values()),
                                  default=0)
                        cols[f"top_{n}gram_char_frac"].append(
                            r6(top / denom))
                    if n in dup_set:
                        dup = sum((c - 1) * ln
                                  for c, ln in d.values() if c > 1)
                        cols[f"dup_{n}gram_char_frac"].append(
                            r6(dup / denom))
            out = {id_col: pdf[id_col]}
            out.update(cols)
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(kernel,
                                                     schema=schema)


def _repetition_metrics_sql(docs: DataFrame, id_col: str,
                            text_col: str, top_ns: tuple,
                            dup_ns: tuple) -> DataFrame:
    """Pure-column form (the r4 shape, retained as the oracle mirror
    — see :func:`repetition_metrics`): ONE posexplode of per-row
    (n, xxhash64(gram), gram_len) structs, then groupBy(doc, n, hash)
    count (map-side combine) and one conditional-agg groupBy(doc);
    both shuffles slim and doc-keyed, no corpus-wide hot key."""
    sizes = sorted(set(top_ns) | set(dup_ns))
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    base = docs.select(
        F.col(id_col),
        toks.alias("toks"),
        F.length(F.array_join(toks, " ")).alias("total_chars"),
    )
    ns = F.array(*[F.lit(n) for n in sizes])
    # per-row: for every n, the (n, hash, len) of each n-gram; gram
    # strings are built once in an inner transform and reduced to an
    # 8-byte hash + length before anything leaves the row.
    gram_structs = F.flatten(F.transform(
        ns,
        lambda n: F.when(
            F.size("toks") >= n,
            F.transform(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
                ),
                lambda s: F.struct(
                    n.alias("n"),
                    F.xxhash64(s).alias("h"),
                    F.length(s).alias("len"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,h:long,len:int>>")),
    ))
    occ = base.select(
        F.col(id_col), "total_chars", F.explode(gram_structs).alias("g")
    ).select(
        F.col(id_col), "total_chars",
        F.col("g.n").alias("n"), F.col("g.h").alias("h"),
        F.col("g.len").alias("len"),
    )
    counts = occ.groupBy(id_col, "total_chars", "n", "h", "len").agg(
        F.count(F.lit(1)).alias("c")
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, F.col("c") * F.col("len")))
            .alias(f"_top{n}")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(F.when((F.col("n") == n) & (F.col("c") > 1),
                         (F.col("c") - 1) * F.col("len")))
            .alias(f"_dup{n}")
        )
    per_doc = counts.groupBy(id_col, "total_chars").agg(*aggs)
    out_cols = [F.col(id_col)]
    denom = F.greatest(F.col("total_chars"), F.lit(1))
    for n in top_ns:
        out_cols.append(
            F.round(F.coalesce(F.col(f"_top{n}"), F.lit(0)) / denom, 6)
            .alias(f"top_{n}gram_char_frac"))
    for n in dup_ns:
        out_cols.append(
            F.round(F.coalesce(F.col(f"_dup{n}"), F.lit(0)) / denom, 6)
            .alias(f"dup_{n}gram_char_frac"))
    scored = per_doc.select(*out_cols)
    # short docs (< min n tokens) produce zero occ rows — restore them
    # with all-zero fractions so output ids == input ids. ONE left
    # join from the id projection (a union + anti-join would plan the
    # gram explode twice — Catalyst shares nothing across join sides).
    frac_cols = ([f"top_{n}gram_char_frac" for n in top_ns]
                 + [f"dup_{n}gram_char_frac" for n in dup_ns])
    return base.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in frac_cols],
    )


def gopher_repetition_ok(rep: DataFrame,
                         top_max: dict = None,
                         dup_max: dict = None) -> DataFrame:
    """Adds ``repetition_ok`` to a :func:`repetition_metrics` frame —
    the Gopher Table A1 n-gram gate with its published thresholds."""
    top_max = TOP_NGRAM_MAX if top_max is None else top_max
    dup_max = DUP_NGRAM_MAX if dup_max is None else dup_max
    ok = F.lit(True)
    for n, t in top_max.items():
        ok = ok & (F.col(f"top_{n}gram_char_frac") <= t)
    for n, t in dup_max.items():
        ok = ok & (F.col(f"dup_{n}gram_char_frac") <= t)
    return rep.withColumn("repetition_ok", ok)


C4_TERMINAL = (".", "!", "?", '"', "”")


def _any_of(*conds: Column) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def c4_clean_lines(text: Column, min_words: int = 5) -> Column:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in a terminal punctuation mark (``. ! ? "`` or a
    closing curly quote), contain at least ``min_words`` words, and do
    not mention "javascript" (case-insensitive). Returns the cleaned
    text with survivors re-joined by newlines — map-only, pure
    higher-order columns."""
    lines = _lines(text)
    kept = F.filter(
        lines,
        lambda l: (
            _any_of(*[l.endswith(t) for t in C4_TERMINAL])
            & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
               >= min_words)
            & ~F.lower(l).contains("javascript")
        ),
    )
    return F.array_join(kept, "\n")


def c4_page_ok(text: Column, min_sentences: int = 3,
               bad_phrases: tuple = ("lorem ipsum",)) -> Column:
    """C4 page-level gate over the ALREADY-CLEANED text (pair with
    :func:`c4_clean_lines`): at least ``min_sentences`` sentences
    (terminal ``.!?`` occurrences in the cleaned text), no curly
    brace (code), and none of ``bad_phrases`` (case-insensitive; the
    published pipeline also applies a large word blocklist — pass
    yours here)."""
    n_sentences = (
        F.length(text) - F.length(F.regexp_replace(text, r"[.!?]", ""))
    )
    ok = (n_sentences >= min_sentences) & ~text.contains("{")
    low = F.lower(text)
    for p in bad_phrases:
        ok = ok & ~low.contains(p.lower())
    return ok


def blocklist_ok(text: Column, words) -> Column:
    """True iff the text contains NONE of ``words`` as a whole token
    (C4's word-blocklist gate). Token-level, not substring: "ass" on
    the list does not trip "assassin" — the false-positive class that
    made naive substring blocklists infamous. One ``arrays_overlap``
    against a literal array (JVM hash-set probe, map-only); for
    blocklists beyond a few thousand entries use
    :func:`blocklist_filter` (broadcast-join form) instead of a mega
    literal."""
    from website_to_agent_spark.operators.bm25 import tokenize

    wl = F.lit([w.lower() for w in words])
    return ~F.arrays_overlap(tokenize(text), wl)


def blocklist_filter(docs: DataFrame, words: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Drop documents containing any blocklisted token — the big-list
    form: tokens explode once, the word list (1 column) broadcasts,
    offending doc ids anti-join back. The corpus text never shuffles;
    the only moving rows are (doc, token) pairs for docs that HIT."""
    from website_to_agent_spark.operators.bm25 import tokenize

    wl = words.toDF("_w").select(F.lower("_w").alias("_w")).distinct()
    hits = (
        docs.select(F.col(id_col),
                    F.explode(tokenize(F.col(text_col))).alias("_w"))
        .join(F.broadcast(wl), "_w", "left_semi")
        .select(id_col).distinct()
    )
    return docs.join(hits, id_col, "left_anti")


def chunk_text(text: Column, chunk_chars: int = 2000,
               overlap: int = 200) -> Column:
    """Split a document into overlapping fixed-width chunks —
    array<struct<chunk_idx int, content string>> — the standard
    pre-training/RAG windowing pass. Pure column math (sequence +
    substring), stride = chunk_chars - overlap; the final partial
    chunk is kept. Empty text → single empty chunk."""
    assert 0 <= overlap < chunk_chars
    stride = chunk_chars - overlap
    n = F.length(text)
    starts = F.sequence(
        F.lit(0),
        F.greatest((n - 1).cast("int"), F.lit(0)),
        F.lit(stride),
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.substring(text, s + 1, chunk_chars).alias("content"),
        ),
    )


def dedup_lines(text: Column) -> Column:
    """Remove EXACT duplicate lines within a document, keeping first
    occurrences in order (boilerplate/nav-fragment removal after HTML
    extraction). Applies to blank lines too: only the first empty line
    survives."""
    lines = F.split(text, "\n")
    # keep line i iff its FIRST occurrence is at i (0-based here,
    # array_position is 1-based). O(lines²) worst case per doc — fine
    # for post-extraction documents (hundreds of lines).
    idx = F.sequence(F.lit(0), F.greatest(F.size(lines) - 1, F.lit(0)))
    kept = F.filter(
        idx, lambda i: F.array_position(lines, lines[i]) == i + 1
    )
    return F.array_join(F.transform(kept, lambda i: lines[i]), "\n")


def compression_ratio(text: Column) -> Column:
    """zlib(compressed)/raw byte ratio — the Dolma/RedPajama-class
    redundancy signal that n-gram fractions miss (long-range repeats,
    templated paragraphs compress far below fluent prose). Arrow-
    batched pandas UDF (zlib is the one honest non-Column kernel
    here — level pinned for determinism); map-only, no shuffle.

    Reading: fluent English lands ≈0.3–0.6; heavy repetition sinks
    toward 0; random/encoded blobs push toward (or past) 1.0. Gate
    with ``compression_ok``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _series(s):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8", "replace")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(one)

    # this module uses `from __future__ import annotations`, which
    # stringifies inline hints — pandas_udf needs REAL type objects,
    # so attach them at runtime
    _series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_series, "double")(text)


def compression_ok(ratio: Column, lo: float = 0.10,
                   hi: float = 0.95) -> Column:
    """Both tails are bad: ``ratio < lo`` = degenerate repetition
    (beyond what the Gopher n-gram gates catch), ``ratio > hi`` =
    high-entropy non-text (base64 blobs, minified bundles, binary
    pasted as text)."""
    return (ratio >= lo) & (ratio <= hi)


def host_boilerplate_lines(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_pages: int = 3,
) -> DataFrame:
    """(host, line_hash, n_pages_with, n_pages, frac) — lines that
    appear on ≥ ``min_frac`` of a host's pages (hosts with ≥
    ``min_pages`` pages): nav bars, footers, cookie banners — the
    SITE-template text that survives per-document extraction.

    Distinct from ``dedup_lines`` (within one document) and
    ``curation.dedup_paragraphs`` (global first-occurrence-wins): a
    boilerplate line is removed from EVERY page of the host,
    including the first, and only when frequent ON THAT HOST — the
    same line may be legitimate content elsewhere.

    Dataflow: explode lines → distinct (host, line, doc) → one
    map-combinable count per (host, line_hash) + one per host, joined
    on host. The flagged set is structurally small: a line needs
    presence on ≥min_frac of the host's pages, so at most
    (lines-per-page / min_frac) rows per host survive — broadcastable
    into the strip pass. Lines travel as xxhash64 digests after the
    first projection; the 100 TB of text never shuffles.
    """
    lines = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.trim(F.col("line")) != "")
    per_line = (
        lines.select("host", "doc", F.xxhash64("line").alias("line_hash"))
        .distinct()
        .groupBy("host", "line_hash")
        .agg(F.count("*").alias("n_pages_with"))
    )
    per_host = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_pages"))
    return (
        per_line.join(per_host, "host")
        .withColumn("frac", F.col("n_pages_with") / F.col("n_pages"))
        .filter((F.col("n_pages") >= min_pages)
                & (F.col("frac") >= min_frac))
    )


def strip_host_boilerplate(
    docs: DataFrame,
    flagged: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Remove every flagged line from every page of its host; adds
    ``n_boilerplate_removed``. The flagged table collapses to one
    digest-array row per host (small by construction — see
    ``host_boilerplate_lines``) and broadcasts; the page text itself
    never shuffles — the strip is a map-side higher-order filter."""
    bl = flagged.groupBy(F.col("host").alias(host_col)).agg(
        F.collect_set("line_hash").alias("_bl"))
    joined = docs.join(F.broadcast(bl), host_col, "left")
    lines = F.split(F.col(text_col), "\n")
    kept = F.when(
        F.col("_bl").isNull(), lines
    ).otherwise(
        F.filter(lines,
                 lambda ln: ~F.array_contains(F.col("_bl"), F.xxhash64(ln)))
    )
    return (
        joined.withColumn(
            "n_boilerplate_removed", F.size(lines) - F.size(kept))
        .withColumn(text_col, F.array_join(kept, "\n"))
        .drop("_bl")
    )


def canonical_of(html: Column) -> Column:
    """The page's ``<link rel="canonical" href=...>`` target (either
    attribute order, case-insensitive), or NULL — the SITE's own
    duplicate-collapse signal, stronger than any URL normalization:
    print views, mobile URLs, and tracking variants all declare the
    same canonical. Pure column regex (RE2-compatible); pass decoded
    text or binary (binary is decoded here)."""
    h = F.when(
        F.lit(True),
        F.coalesce(F.decode(html.cast("binary"), "utf-8"), F.lit("")),
    )
    rel_first = F.regexp_extract(
        h,
        r"""(?i)<link[^>]*rel=["']?canonical["']?[^>]*href=["']?([^"' >]+)""",
        1,
    )
    href_first = F.regexp_extract(
        h,
        r"""(?i)<link[^>]*href=["']?([^"' >]+)["']?[^>]*rel=["']?canonical""",
        1,
    )
    return F.nullif(
        F.when(rel_first != "", rel_first).otherwise(href_first),
        F.lit(""),
    )


def canonical_dedup_best(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """One row per rel-canonical group: key = the page's declared
    canonical (absolute, or root-relative resolved against the page's
    own scheme+authority) when present, else ``urlfns.canonical_url``
    of the page's URL. Other relative canonical forms (rare, and
    officially discouraged) fall back to URL normalization rather
    than guessing a base. Returns (canon_url, url, n_variants) —
    winner = min original url, same contract as ``url_dedup_best``;
    one hash-shuffle on the canonical key."""
    u = F.col(url_col)
    decl = canonical_of(F.col(html_col))
    origin = F.regexp_extract(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)
    resolved = (
        F.when(decl.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), decl)
        .when(decl.startswith("/"), F.concat(origin, decl))
    )
    key = F.coalesce(resolved, urlfns.canonical_url(u))
    c = pages.select(key.alias("canon_url"), u.alias("url"))
    return c.groupBy("canon_url").agg(
        F.min("url").alias("url"), F.count("*").alias("n_variants")
    )


def url_dedup_best(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per canonical URL; winner = lexicographically smallest
    original url (deterministic). Returns (canon_url, url, n_variants).
    One hash-shuffle on the canonical string; at 100 TB the canonical
    key is also the natural bucketing key for the page store."""
    c = pages.select(
        urlfns.canonical_url(F.col(url_col)).alias("canon_url"),
        F.col(url_col).alias("url"),
    )
    return c.groupBy("canon_url").agg(
        F.min("url").alias("url"), F.count("*").alias("n_variants")
    )


# ------------------------------------------------------------------ LM
# CCNet-style language-model quality filtering (Wenzek et al. 2020,
# public): score each document by the perplexity of a character-n-gram
# LM trained on a trusted/clean subset; low perplexity ≈ looks like the
# clean corpus, high ≈ boilerplate/gibberish. The real CCNet uses a
# KenLM 5-gram over SentencePiece tokens; the shape here is the same
# dataflow with a char-trigram table — one groupBy to train, one
# broadcast join to score, zero UDFs.

def lm_normalize(text: Column, max_chars: int = 1000) -> Column:
    """LM input normalization: first ``max_chars`` chars, lowercased,
    whitespace collapsed. Capping is standard for LM quality scoring
    (CCNet scores paragraph prefixes) and bounds the explode at scale."""
    return F.regexp_replace(F.lower(F.substring(text, 1, max_chars)),
                            r"\s+", " ")


def char_ngrams(t: Column, n: int = 3) -> Column:
    """Character n-grams of an ALREADY-NORMALIZED column. ``t`` must be
    a bound column (select ``lm_normalize`` into a column first), not a
    compound expression: ``transform`` inlines its argument into every
    lambda element, so an expression here would re-run the
    normalization regex once per character — O(len²) per doc (measured
    35 s vs 1 s on the sf0.1 bench)."""
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - n + 1),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array(t))


def _py_grams(t, n: int):
    """Python mirror of ``char_ngrams`` + explode: the exact gram
    multiset, in document order. NULL text ⇒ one NULL gram (what the
    column form's ``array(t)`` fallback explodes to)."""
    if t is None:
        return [None]
    if len(t) < n:
        return [t]
    return [t[i:i + n] for i in range(len(t) - n + 1)]


def _gram_count_rows(src: DataFrame, key_cols: list, n: int) -> DataFrame:
    """Per-partition (…keys, gram, pcnt) partial counts via one Arrow
    kernel — the map side of a gram count table. Replaces the
    explode + hash-agg pipeline: the higher-order ``transform`` that
    built the gram array evaluates interpreted (HOFs never reach
    whole-stage codegen), and the JVM hash aggregate then re-hashes
    every gram string — measured 2.3 s vs 1.1 s for the sf0.1 trigram
    train pass. Counts are exact integers, so the downstream sum is
    order-independent and the table is bit-identical to the explode
    form (property: same gram strings — Python slicing and UTF8String
    substring both index by code point)."""
    import pandas as pd

    def gen(batches):
        for b in batches:
            counts: dict = {}
            key_arrays = [b[k] for k in key_cols]
            for row in zip(*key_arrays, b["t"]):
                *keys, t = row
                kt = tuple(keys)
                for g in _py_grams(t, n):
                    k = (kt, g)
                    counts[k] = counts.get(k, 0) + 1
            if counts:
                ks = list(counts.keys())
                data = {
                    kc: [k[0][i] for k in ks]
                    for i, kc in enumerate(key_cols)
                }
                data["gram"] = [k[1] for k in ks]
                data["pcnt"] = [counts[k] for k in ks]
                yield pd.DataFrame(data)

    key_schema = ", ".join(f"{k} string" for k in key_cols)
    sep = ", " if key_schema else ""
    return src.mapInPandas(
        gen, f"{key_schema}{sep}gram string, pcnt long"
    )


def train_char_lm(clean_docs: DataFrame, text_col: str = "text",
                  n: int = 3, max_chars: int = 1000) -> DataFrame:
    """N-gram count table (gram, cnt) from the trusted subset — ONE
    map-only Arrow count kernel + ONE map-side-combined groupBy (r6:
    the explode + JVM hash-agg form retired, see ``_gram_count_rows``;
    counts are integers so the table is identical). Broadcast-sized by
    construction: |table| ≤ charset^n regardless of corpus size."""
    src = clean_docs.select(
        lm_normalize(F.col(text_col), max_chars).alias("t")
    )
    return (
        _gram_count_rows(src, [], n)
        .groupBy("gram")
        .agg(F.sum("pcnt").alias("cnt"))
    )


def lm_perplexity(docs: DataFrame, lm: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  max_chars: int = 1000, alpha: float = 1.0) -> DataFrame:
    """Per-doc perplexity under the trained table with Laplace
    smoothing: ppl = exp(−mean log p(gram)), p = (cnt+α)/(total+α·V).

    Scale shape (r6 rewrite, guide §4.2): the count table is collected
    ONCE (driver-bounded by construction — it shipped to every executor
    as a broadcast before, it ships inside the kernel closure now), the
    per-gram log addends are computed IN the JVM over the tiny table
    (so every double is produced by the exact expression the old
    explode→join plan evaluated), and scoring is ONE map-only Arrow
    kernel that sums a doc's addends in document order — the same
    per-partition accumulation order Spark's partial ``avg`` used, so
    the result is bit-identical while the per-gram explode, the
    broadcast join and the JVM hash re-aggregation of |corpus|·len
    gram rows disappear. Only (doc_id, n_grams, avg_logp) ever leaves
    the map side. Returns (id, n_grams, avg_logp, perplexity)."""
    import pandas as pd

    lm_rows = lm.collect()
    total = float(sum(r.cnt for r in lm_rows))
    denom = total + alpha * float(len(lm_rows))
    spark = docs.sparkSession
    lmdf = spark.createDataFrame(lm_rows, lm.schema)
    logp_expr = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
        / F.lit(denom)
    )
    lp = {
        r["gram"]: r["lp"]
        for r in lmdf.select("gram", logp_expr.alias("lp")).collect()
    }
    miss = spark.range(1).select(
        F.log((F.lit(0) + F.lit(alpha)) / F.lit(denom)).alias("lp")
    ).collect()[0]["lp"]
    normed = docs.select(
        F.col(id_col), lm_normalize(F.col(text_col), max_chars).alias("t")
    )
    id_type = normed.schema[id_col].dataType.simpleString()

    def gen(batches):
        for b in batches:
            ids, ngs, avgs = [], [], []
            for i, t in zip(b[id_col], b["t"]):
                grams = _py_grams(t, n)
                s, nn = 0.0, 0
                for g in grams:
                    a = miss if g is None else lp.get(g, miss)
                    if a is not None:
                        s += a
                        nn += 1
                ids.append(i)
                ngs.append(len(grams))
                avgs.append(s / nn if nn else None)
            yield pd.DataFrame(
                {id_col: ids, "n_grams": ngs, "avg_logp": avgs}
            )

    out = normed.mapInPandas(
        gen, f"{id_col} {id_type}, n_grams long, avg_logp double"
    )
    return out.withColumn("perplexity", F.exp(-F.col("avg_logp")))


def perplexity_buckets(docs: DataFrame, lm: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       quantiles=(1.0 / 3, 2.0 / 3),
                       labels=("head", "middle", "tail"),
                       sample_frac: float = 1.0,
                       salt: str = "ppl-cut-v1", **lm_kwargs) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the trusted-corpus LM and bucket it by
    perplexity percentile — ``head`` is the most-fluent slice that
    CCNet keeps for LM training, ``tail`` the most-noise-like.
    ``quantiles``/``labels`` generalize the split (len(labels) must be
    len(quantiles)+1). Returns (id, n_grams, avg_logp, perplexity,
    bucket).

    Scale shape: cutoffs are EXACT percentiles over a deterministic
    md5-sampled subset of the scored table (``sample_frac``) — Spark's
    ``percentile`` aggregate buffers the pool's values on one reducer,
    so at 100 TB pass a frac that bounds the pool (1e-4 of 10^10 docs
    = a 1M-value buffer), exactly how CCNet itself fits cutoffs on a
    sample. The md5 sample (never ``rand()``) keeps cutoffs — and
    therefore every bucket decision — identical across re-runs,
    retries and cluster sizes. The one-row cutoff table broadcasts;
    assignment is map-side. Cutoffs are rounded to 6 dp before the
    comparison so a 1-ulp percentile-interpolation difference cannot
    flip a boundary doc between engines.
    """
    if len(labels) != len(quantiles) + 1:
        raise ValueError("need len(labels) == len(quantiles) + 1")
    # materialize the doc-scale scored table once — it feeds both the
    # cutoff fit and the final assignment (see perplexity_buckets_by_lang)
    scored = lm_perplexity(docs, lm, id_col=id_col, text_col=text_col,
                           **lm_kwargs).localCheckpoint(eager=True)
    pool = scored
    if sample_frac < 1.0:
        from website_to_agent_spark.operators.sampling import _u60

        pool = scored.filter(_u60(F.col(id_col), salt) < sample_frac)
    cuts = pool.agg(*[
        F.round(F.percentile(F.col("perplexity"), F.lit(float(q))), 6)
        .alias(f"_c{i}")
        for i, q in enumerate(quantiles)
    ])
    bucket = F.lit(labels[-1])
    for i in range(len(quantiles) - 1, -1, -1):
        bucket = F.when(
            F.round("perplexity", 6) <= F.col(f"_c{i}"), F.lit(labels[i])
        ).otherwise(bucket)
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .drop(*[f"_c{i}" for i in range(len(quantiles))])
    )


# Per-language CCNet (Wenzek et al. 2020 §4.3, public): the real CCNet
# pipeline is language-partitioned end to end — language-ID first, one
# KenLM per language (trained on that language's trusted corpus), and
# head/middle/tail cutoffs fit PER LANGUAGE (an absolute perplexity is
# meaningless across languages: character entropy differs, so a fluent
# 'zh' doc and a fluent 'en' doc sit at different ppl scales). The
# single-LM forms above stay as the monolingual fast path; these are
# the language-keyed generalizations with the same dataflow bounds:
# the LM table gains a lang key (still ≤ |langs|·charset^n rows —
# broadcast-sized), scoring is the same explode → broadcast join (now
# on (lang, gram)) → per-doc avg, and the cutoff table is ≤ |langs|
# rows instead of 1.

def train_char_lms(clean_docs: DataFrame, lang_col: str = "lang",
                   text_col: str = "text", n: int = 3,
                   max_chars: int = 1000) -> DataFrame:
    """Per-language n-gram count tables (lang, gram, cnt) from the
    trusted subset — ONE explode + ONE map-side-combined
    (lang, gram) groupBy. Feed it the per-language trusted corpus
    (CCNet uses Wikipedia per language); docs with a NULL lang are
    dropped (no LM to train)."""
    src = (
        clean_docs.filter(F.col(lang_col).isNotNull())
        .select(
            F.col(lang_col).alias("lang"),
            lm_normalize(F.col(text_col), max_chars).alias("t"),
        )
    )
    return (
        _gram_count_rows(src, ["lang"], n)
        .groupBy("lang", "gram")
        .agg(F.sum("pcnt").alias("cnt"))
    )


def lm_perplexity_by_lang(docs: DataFrame, lms: DataFrame,
                          id_col: str = "doc_id",
                          lang_col: str = "lang",
                          text_col: str = "text", n: int = 3,
                          max_chars: int = 1000,
                          alpha: float = 1.0) -> DataFrame:
    """Per-doc perplexity under the doc's OWN language's LM with
    Laplace smoothing — p = (cnt+α)/(total_lang + α·V_lang), the
    per-language denominators of Wenzek et al.'s per-language models.

    Scale shape mirrors ``lm_perplexity``: the count table is
    collected once (broadcast-bounded at |langs|·charset^n by
    construction), per-language totals/vocab are computed driver-side
    from those rows, and scoring is explode → broadcast join on
    (lang, gram) → per-doc avg; only (doc_id, logp) shuffles. Docs
    whose language has no trained LM return NULL perplexity (CCNet
    routes unknown-language docs out of the pipeline rather than
    scoring them against the wrong model).

    Returns (id, lang, n_grams, avg_logp, perplexity).

    r6: same map-only Arrow-kernel rewrite as :func:`lm_perplexity` —
    the per-(lang, gram) log addends are computed in the JVM over the
    collected table (the exact old in-plan expression, including the
    NULL it yields for a lang with no LM), and the kernel sums each
    doc's addends in document order, so results are bit-identical
    while the gram explode + two broadcast joins + corpus-scale hash
    re-aggregation disappear."""
    import pandas as pd

    lm_rows = lms.collect()
    totals: dict = {}
    vocab: dict = {}
    for r in lm_rows:
        totals[r.lang] = totals.get(r.lang, 0.0) + float(r.cnt)
        vocab[r.lang] = vocab.get(r.lang, 0.0) + 1.0
    spark = docs.sparkSession
    lm = spark.createDataFrame(lm_rows, lms.schema)
    denoms = spark.createDataFrame(
        [(lang, totals[lang] + alpha * vocab[lang]) for lang in totals],
        "lang string, denom double",
    )
    logp_expr = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
        / F.col("denom")
    )
    lp: dict = {}
    for r in (
        lm.join(F.broadcast(denoms), "lang")
        .select("lang", "gram", logp_expr.alias("lp")).collect()
    ):
        lp.setdefault(r["lang"], {})[r["gram"]] = r["lp"]
    missd = {
        r["lang"]: r["lp"]
        for r in denoms.select(
            "lang",
            F.log((F.lit(0) + F.lit(alpha)) / F.col("denom")).alias("lp"),
        ).collect()
    }
    normed = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        lm_normalize(F.col(text_col), max_chars).alias("t"),
    )
    id_type = normed.schema[id_col].dataType.simpleString()

    def gen(batches):
        for b in batches:
            ids, langs, ngs, avgs = [], [], [], []
            for i, lang, t in zip(b[id_col], b["lang"], b["t"]):
                grams = _py_grams(t, n)
                table = lp.get(lang)
                miss = missd.get(lang)
                s, nn = 0.0, 0
                if miss is not None or table:
                    for g in grams:
                        if g is None:
                            a = miss
                        elif table is not None:
                            a = table.get(g, miss)
                        else:
                            a = miss
                        if a is not None:
                            s += a
                            nn += 1
                ids.append(i)
                langs.append(lang)
                ngs.append(len(grams))
                avgs.append(s / nn if nn else None)
            yield pd.DataFrame(
                {id_col: ids, "lang": langs, "n_grams": ngs,
                 "avg_logp": avgs}
            )

    out = normed.mapInPandas(
        gen,
        f"{id_col} {id_type}, lang string, n_grams long, avg_logp double",
    )
    return out.withColumn("perplexity", F.exp(-F.col("avg_logp")))


def perplexity_buckets_by_lang(docs: DataFrame, lms: DataFrame,
                               id_col: str = "doc_id",
                               lang_col: str = "lang",
                               text_col: str = "text",
                               quantiles=(1.0 / 3, 2.0 / 3),
                               labels=("head", "middle", "tail"),
                               sample_frac: float = 1.0,
                               salt: str = "ppl-cut-v1",
                               **lm_kwargs) -> DataFrame:
    """Per-language CCNet bucketing: cutoffs are fit WITHIN each
    language (Wenzek et al. fit the head/middle/tail thresholds per
    language for exactly the cross-language-entropy reason above), so
    every language contributes its own head slice to the corpus
    rather than fluent-but-high-entropy languages landing wholesale in
    the tail. Returns (id, lang, n_grams, avg_logp, perplexity,
    bucket); docs whose language has no LM get NULL perplexity and the
    last (tail) label.

    Scale shape: the cutoff table is one exact-percentile aggregate
    per language over a deterministic md5 sample (same bounded-reducer
    argument as ``perplexity_buckets`` — per-language pools only
    shrink the per-group buffer), ≤ |langs| rows, broadcast to a
    map-side assignment."""
    if len(labels) != len(quantiles) + 1:
        raise ValueError("need len(labels) == len(quantiles) + 1")
    # the scored table feeds BOTH the cutoff fit and the final bucket
    # assignment — materialize it once (doc-scale: id + lang + three
    # numerics) so the gram-scale explode+join scoring pass doesn't
    # run twice
    scored = lm_perplexity_by_lang(
        docs, lms, id_col=id_col, lang_col=lang_col, text_col=text_col,
        **lm_kwargs).localCheckpoint(eager=True)
    pool = scored.filter(F.col("perplexity").isNotNull())
    if sample_frac < 1.0:
        from website_to_agent_spark.operators.sampling import _u60

        pool = pool.filter(_u60(F.col(id_col), salt) < sample_frac)
    cuts = pool.groupBy("lang").agg(*[
        F.round(F.percentile(F.col("perplexity"), F.lit(float(q))), 6)
        .alias(f"_c{i}")
        for i, q in enumerate(quantiles)
    ])
    bucket = F.lit(labels[-1])
    for i in range(len(quantiles) - 1, -1, -1):
        bucket = F.when(
            F.round("perplexity", 6) <= F.col(f"_c{i}"), F.lit(labels[i])
        ).otherwise(bucket)
    return (
        scored.join(F.broadcast(cuts), "lang", "left")
        .withColumn("bucket", bucket)
        .drop(*[f"_c{i}" for i in range(len(quantiles))])
    )


def detect_language(docs: DataFrame, lms: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    n: int = 3, max_chars: int = 1000,
                    alpha: float = 1.0, tie_dp: int = 6,
                    with_margin: bool = False) -> DataFrame:
    """Trained n-gram language identification — CCNet step 1 (Wenzek
    et al. 2020 §3.1 run fastText; this is the public Cavnar–Trenkle /
    Dunning character-n-gram Bayes classifier with the same dataflow):
    score every document under EVERY language's char-LM and keep the
    maximum-likelihood language. Completes the per-language pipeline
    for unlabeled crawl text — ``train_char_lms`` on a labeled trusted
    corpus, ``detect_language`` to label the crawl, then the
    per-language perplexity gate.

    Math (Laplace α, per-language total T_l and vocab V_l):
    ``avg_logp(d, l) = (Σ_{g∈d} ln((c_l(g)+α) / (T_l+α·V_l))) / |d|``.
    The unmatched-gram mass is handled WITHOUT a per-language left
    join: per (doc, lang) only the matched grams aggregate, then
    ``Σ = sm + (|d| − m)·ln(α) − |d|·ln(T_l+α·V_l)``.

    Scale shape: the LM is collected once (broadcast-bounded at
    |langs|·charset^n like ``lm_perplexity_by_lang``); grams join the
    broadcast LM on gram alone (per-gram fanout ≤ |langs|), partial-agg
    to ≤|langs| rows per doc, then one map-combinable ``min(struct)``
    argmax per doc — ties break on the ``tie_dp``-rounded score, then
    lexicographically-smallest language, so the winner is deterministic
    and engine-independent. Only (doc_id, lang, two doubles) ever
    shuffles; the text never leaves the map side.

    Returns (id, lang, n_grams, avg_logp, perplexity) — ``lang`` is the
    PREDICTED language; with ``with_margin=True`` adds ``margin`` (best
    minus runner-up avg_logp, the CCNet-style confidence signal; the
    per-doc group is ≤|langs| rows so the sort is bounded).
    """
    import math

    lm_rows = lms.filter(F.col("lang").isNotNull()).collect()
    totals: dict = {}
    vocab: dict = {}
    for r in lm_rows:
        totals[r.lang] = totals.get(r.lang, 0.0) + float(r.cnt)
        vocab[r.lang] = vocab.get(r.lang, 0.0) + 1.0
    spark = docs.sparkSession
    lm = spark.createDataFrame(lm_rows, lms.schema)
    denoms = spark.createDataFrame(
        [(lang, totals[lang] + alpha * vocab[lang]) for lang in totals],
        "lang string, denom double",
    )
    normed = docs.select(
        F.col(id_col),
        lm_normalize(F.col(text_col), max_chars).alias("t"),
    )
    # r6 map-only Arrow-kernel rewrite (same construction as
    # lm_perplexity): the per-(lang, gram) matched addends ln(cnt+α)
    # and the per-lang ln(denom) are computed IN the JVM over the tiny
    # collected table, and the kernel evaluates the closed form
    #   ((sm + (n−m)·lnα) − n·ln(denom)) / n
    # per (doc, lang) with the addends summed in document order — the
    # exact expression tree and accumulation order of the old
    # explode → broadcast-join → hash-agg plan, so every double is
    # bit-identical while the |corpus|·len·|langs| join fanout and two
    # aggregations disappear; only ≤|langs| rows per doc leave the map
    # side.
    import pandas as pd

    la_tbl: dict = {}
    for r in lm.select(
        "lang", "gram",
        F.log(F.col("cnt") + F.lit(alpha)).alias("la"),
    ).collect():
        la_tbl.setdefault(r["lang"], {})[r["gram"]] = r["la"]
    lden = {
        r["lang"]: r["ld"]
        for r in denoms.select(
            "lang", F.log(F.col("denom")).alias("ld")
        ).collect()
    }
    langs_order = sorted(lden)
    ln_alpha = math.log(alpha)
    id_type = normed.schema[id_col].dataType.simpleString()

    def gen(batches):
        for b in batches:
            ids, louts, ngs, avgs = [], [], [], []
            for i, t in zip(b[id_col], b["t"]):
                grams = _py_grams(t, n)
                n_g = 1 if t is None else max(len(t) - n + 1, 1)
                for lang in langs_order:
                    table = la_tbl.get(lang, {})
                    s, m = 0.0, 0
                    for g in grams:
                        if g is None:
                            continue
                        a = table.get(g)
                        if a is not None:
                            s += a
                            m += 1
                    avg = ((s + (n_g - m) * ln_alpha)
                           - n_g * lden[lang]) / n_g
                    ids.append(i)
                    louts.append(lang)
                    ngs.append(n_g)
                    avgs.append(avg)
            yield pd.DataFrame(
                {id_col: ids, "lang": louts, "n_grams": ngs,
                 "avg_logp": avgs}
            )

    crossed = normed.mapInPandas(
        gen,
        f"{id_col} {id_type}, lang string, n_grams long, avg_logp double",
    )
    key = F.struct(
        (-F.round(F.col("avg_logp"), tie_dp)).alias("neg"),
        F.col("lang"),
        F.col("n_grams"),
        F.col("avg_logp"),
    )
    aggs = [F.min(key).alias("b")]
    if with_margin:
        aggs.append(
            F.array_sort(F.collect_list(
                F.struct((-F.round(F.col("avg_logp"), tie_dp)).alias("neg"),
                         F.col("lang"), F.col("avg_logp"))
            )).alias("all")
        )
    picked = crossed.groupBy(id_col).agg(*aggs)
    out = picked.select(
        F.col(id_col),
        F.col("b.lang").alias("lang"),
        F.col("b.n_grams").alias("n_grams"),
        F.col("b.avg_logp").alias("avg_logp"),
        F.exp(-F.col("b.avg_logp")).alias("perplexity"),
        *([
            F.when(
                F.size("all") > 1,
                F.col("b.avg_logp") - F.col("all")[1]["avg_logp"],
            ).otherwise(F.lit(None).cast("double")).alias("margin")
        ] if with_margin else []),
    )
    return out


# ---------------------------------------------------------------------------
# Unicode repair (the ftfy-class cleanup; CCNet/C4 normalize before
# anything reads the text)
# ---------------------------------------------------------------------------

# cp1252 mojibake signature: a UTF-8 lead byte mis-decoded as 'Ã'/'Â'
# (two-byte sequences: Latin supplement) or 'â'+punctuation (three-byte
# sequences: general punctuation — 'â€™' for right single quote)
_MOJIBAKE_RE = r"(Ã.|Â.|â..)"


def fix_text(text: Column, form: str = "NFC") -> Column:
    """Unicode repair pass — run it FIRST, before any digest, shingle,
    language model, or quality metric reads the text (normalization
    changes all of them):

    1. **Mojibake repair**: UTF-8 bytes that were mis-decoded as
       cp1252/latin-1 somewhere upstream ('Ã©' where 'é' was meant,
       'â€™' for a right quote) are re-encoded and decoded back. The
       inverse encoder is "sloppy cp1252" (the ftfy-documented browser
       behavior, independent implementation): cp1252 where mapped,
       the raw byte value for the five undefined C1 slots — so 'â€\\x9d'
       (a mis-decoded '”', whose 0x9d has no cp1252 character) inverts
       too. Repair runs per maximal single-byte-encodable run, so a
       clean-unicode tail (emoji, CJK) never blocks repairing a
       mojibake fragment beside it. Conservative by construction:
       attempted only where the run matches the mojibake signature,
       accepted only when the byte run is strict UTF-8 AND the
       signature count strictly decreases — legitimate text that
       merely *contains* 'Ã' fails one of the two and passes through
       untouched. Applied at most twice (doubly-encoded text exists in
       real crawls; a fixpoint loop does not, by the strict-decrease
       rule).
    2. **Normalization**: ``unicodedata.normalize(form)`` — NFC
       default (canonical compose: é is one codepoint however it
       arrived); NFKC folds width/ligature/compatibility forms, the
       usual choice before tokenizer training.
    3. **Whitespace/control hygiene**: NBSP-family spaces → ' ',
       zero-width chars + BOM dropped, other C0/C1 controls (except
       ``\\t`` ``\\n``) dropped.

    Arrow-batched pandas UDF, map-only, no shuffle. Python is honest
    here: Spark has no unicode-normalize or codec round-trip builtin.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _series(s):
        import re
        import unicodedata

        sig = re.compile(_MOJIBAKE_RE, re.DOTALL)
        # NBSP family → space; zero-width/BOM → drop
        spaces = dict.fromkeys(
            map(ord, "\u00a0\u2007\u202f"), " ")
        drops = dict.fromkeys(
            map(ord, "\u200b\u200c\u200d\ufeff"))

        def to_bytes(run: str) -> bytes:
            # sloppy-cp1252 inverse: cp1252 where mapped, raw byte for
            # the undefined C1 slots (0x81 8d 8f 90 9d pass through a
            # mis-decode as their own codepoints)
            bs = bytearray()
            for ch in run:
                try:
                    bs += ch.encode("cp1252")
                except UnicodeEncodeError:
                    bs.append(ord(ch))   # < 0x100 by run construction
            return bytes(bs)

        def fix_run(run: str) -> str:
            if not sig.search(run):
                return run
            try:
                cand = to_bytes(run).decode("utf-8")
            except UnicodeDecodeError:
                return run
            if len(sig.findall(cand)) < len(sig.findall(run)):
                return cand
            return run

        def single_byte(ch: str) -> bool:
            if ord(ch) < 0x100:
                return True
            try:
                ch.encode("cp1252")
                return True
            except UnicodeEncodeError:
                return False

        def repair(t: str) -> str:
            from itertools import groupby

            for _ in range(2):
                if not sig.search(t):
                    return t
                parts = []
                for enc, grp in groupby(t, key=single_byte):
                    run = "".join(grp)
                    parts.append(fix_run(run) if enc else run)
                cand = "".join(parts)
                if cand == t:
                    return t
                t = cand
            return t

        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, repair(t))
            t = t.translate(spaces).translate(drops)
            return "".join(
                ch for ch in t
                if ch in "\t\n" or unicodedata.category(ch) != "Cc"
            )

        return s.map(one)

    _series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_series, "string")(text)
