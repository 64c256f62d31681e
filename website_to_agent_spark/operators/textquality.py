"""Text-analysis operators for training-data pipelines (task brief):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Column math — zero UDFs.

Also hosts the reference's scalar text transforms as Column
expressions: token estimate (P18, `agents.py:20-22`), 60/20/20
intelligent trim (P19, `agents.py:24-68`), markdown sanitization
(P20, `ui.py:34-90`), title-from-markdown (P21), key-topic extraction
(A8, `crawl4ai_examples.py:383-398`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# `crawl4ai_examples.py:390` stop words (deduplicated by Python set
# semantics at definition time — faithful).
STOP_WORDS = sorted(
    {
        "this", "that", "with", "have", "will", "from", "they", "been",
        "were", "said", "each", "which", "their", "time", "more", "very",
        "what", "know", "just", "first", "into", "over", "think", "also",
        "your", "work", "life", "only", "can", "still", "should", "after",
        "being", "now", "made", "before", "here", "through", "when",
        "where", "how", "all", "any", "both", "few", "most", "other",
        "some", "such", "own", "same", "than", "too", "don",
    }
)

# Small English function-word list for the language-ID heuristic.
_EN_MARKERS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")
_ES_MARKERS = ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por")
_DE_MARKERS = ("der", "die", "und", "das", "von", "mit", "den", "für", "ist", "im")


def token_estimate(text) -> F.Column:
    """P18: `len(text) // 4` (`agents.py:20-22`)."""
    return F.floor(F.length(text) / 4).cast("long")


def word_count(text) -> F.Column:
    """A5: `len(content.split())` — whitespace split, empties dropped."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda w: w != ""))


def words(text) -> F.Column:
    """Lowercased letter-run tokens (length>4, non-stopword filtering is
    the caller's)."""
    return F.filter(F.split(F.lower(text), "[^a-z]+"), lambda t: t != "")


def key_topics(docs: DataFrame, text_col: str = "text", k: int = 10,
               per_doc: bool = False, id_col: str = "doc_id") -> DataFrame:
    """A8 key-topic extraction (`crawl4ai_examples.py:383-398`): tokens
    len>4, stop-word filtered, top-k by count (deterministic tiebreak
    on the word)."""
    toks = docs.select(
        *( [F.col(id_col)] if per_doc else [] ),
        F.explode(words(F.col(text_col))).alias("word"),
    ).filter((F.length("word") > 4) & ~F.col("word").isin(STOP_WORDS))
    if per_doc:
        counts = toks.groupBy(id_col, "word").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("word"))
        return counts.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    counts = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    # Global top-k WITHOUT a single-partition window: orderBy().limit(k)
    # plans as TakeOrderedAndProject (per-partition heaps + driver merge
    # of k rows — scales to any vocabulary size); rank is then derived
    # from the k-row result by one tiny collect_list, no WindowExec.
    top = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(k)
    ranked = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("cnt")).alias("_neg"),
                    F.col("word").alias("word"),
                    F.col("cnt").alias("cnt"),
                )
            )
        ).alias("a")
    )
    return ranked.select(F.posexplode("a").alias("pos", "s")).select(
        F.col("s.word").alias("word"),
        F.col("s.cnt").alias("cnt"),
        (F.col("pos") + 1).alias("rank"),
    )


def trim_intelligently(text, max_tokens: int) -> F.Column:
    """P19 60/20/20 trim (`agents.py:24-68`) as pure column math.

    Mirrors the reference exactly: whitespace pre-pass, then head 60% /
    middle 20% / tail 20% with TRIMMED markers."""
    max_chars = max_tokens * 4
    cleaned = F.regexp_replace(text, r"\n\s*\n\s*\n+", "\n\n")
    cleaned = F.regexp_replace(cleaned, r" +", " ")
    begin_chars = int(max_chars * 0.6)
    middle_chars = int(max_chars * 0.2)
    end_chars = int(max_chars * 0.2)
    n = F.length(cleaned)
    beginning = F.substring(cleaned, 1, begin_chars)
    middle_start = (n / 2).cast("long") - middle_chars // 2  # len//2 - mc//2
    middle = cleaned.substr(middle_start + 1, F.lit(middle_chars))
    ending = cleaned.substr(n - end_chars + 1, F.lit(end_chars))
    marker = "\n\n[... CONTENT TRIMMED FOR ANALYSIS ...]\n\n"
    trimmed = F.concat(
        beginning, F.lit(marker), middle, F.lit(marker), ending
    )
    return (
        F.when(F.length(text) <= max_chars, text)
        .when(n <= max_chars, cleaned)
        .otherwise(trimmed)
    )


def sanitize_markdown(text) -> F.Column:
    """P20 ultra-aggressive sanitization (`ui.py:34-90`) as a chain of
    regexp_replace — exactly Catalyst-friendly; whole-stage codegen'd."""
    c = F.coalesce(text, F.lit(""))
    c = F.regexp_replace(c, r"<[^>]*?>", " ")
    c = F.regexp_replace(c, r"&[a-zA-Z0-9#]+;", " ")
    c = F.regexp_replace(c, r"<!(?:DOCTYPE|--)[^>]*>", " ")
    c = F.regexp_replace(c, r"(?s):::[^:]*?:::", " ")
    c = F.regexp_replace(c, r"\{[^}]*\}", " ")
    c = F.regexp_replace(c, r"\[[^\]]*\](?:\([^)]*\))?", " ")
    c = F.regexp_replace(c, r"---+", " ")
    c = F.regexp_replace(c, r"\|[^|]*\|", " ")
    c = F.regexp_replace(c, r"(?m)^#+\s*", "")
    c = F.regexp_replace(c, r"[<>{}\\|`~\[\]()_*#@$%^&+=]", " ")
    c = F.regexp_replace(c, r"[\x00-\x1F\x7F-\x9F]", " ")
    c = F.regexp_replace(c, r"[^\x20-\x7E]", " ")
    c = F.regexp_replace(c, r"[^\w\s]{2,}", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    c = F.when(
        F.length(c) > 3000, F.concat(F.substring(c, 1, 3000), F.lit(" (truncated)"))
    ).otherwise(c)
    c = F.regexp_replace(c, r"[^a-zA-Z0-9\s.,!?:-]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.when(c != "", c).otherwise(F.lit("Content processed safely"))


def title_from_markdown(md) -> F.Column:
    """P21 (`crawl4ai_examples.py:339-348`): first `# `/`## ` line else
    'Untitled'."""
    t = F.regexp_extract(md, r"(?m)^#{1,2} (.+)$", 1)
    return F.when(F.trim(t) != "", F.trim(t)).otherwise(F.lit("Untitled"))


def extract_sections(md) -> F.Column:
    """P22 section splitter (`crawl4ai_examples.py:351-380`): split
    markdown into array<struct<title,content>> on heading lines —
    lookahead split + per-part struct build, no UDF."""
    def _strip(c):
        # F.trim strips spaces only — Python .strip() strips all ws
        return F.regexp_replace(c, r"(?s)^\s+|\s+$", "")

    # split-before-heading WITHOUT lookahead (RE2 engines — and thus
    # the DuckDB oracle — have no lookahead): insert a \x01 sentinel
    # before each heading line, split on it. Equivalent to
    # split(md, "(?m)(?=^#{1,6} )") for any input without \x01.
    sentinel = "\u0001"
    parts = F.filter(
        F.split(
            F.regexp_replace(md, r"(?m)^(#{1,6} )", sentinel + "$1"),
            sentinel,
        ),
        lambda p: _strip(p) != "",
    )
    return F.transform(
        parts,
        lambda p: F.struct(
            F.when(
                p.rlike(r"(?s)^#{1,6} .*"),
                _strip(F.regexp_replace(
                    F.regexp_extract(p, r"(?s)^(#{1,6} [^\n]*)", 1), "^#+ ", ""
                )),
            ).otherwise(F.lit("Introduction")).alias("title"),
            _strip(
                F.when(
                    p.rlike(r"(?s)^#{1,6} .*"),
                    F.regexp_replace(p, r"(?s)^#{1,6} [^\n]*\n?", ""),
                ).otherwise(p)
            ).alias("content"),
        ),
    )


def safe_error_display(err) -> F.Column:
    """P24 error sanitization (`ui.py:111-130`): regex whitelist +
    whitespace collapse + truncate 500."""
    c = F.regexp_replace(F.coalesce(err, F.lit("")), r"[^\w\s.,!?():-]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.substring(c, 1, 500)


def term_set_intersection(query_terms, title_terms, desc_terms) -> F.Column:
    """J4 (`test_url_seeder.py:440-446`): query ∩ (title ∪ desc) —
    match-explanation term sets."""
    return F.array_sort(
        F.array_intersect(
            query_terms, F.array_union(title_terms, desc_terms)
        )
    )


def content_fingerprint(text) -> F.Column:
    """P23 content hash for change detection — 256-bit stable digest
    (the reference uses Python `hash()`, process-unstable; sha2 is the
    distributed-safe equivalent, `crawl4ai_examples.py:300-335`)."""
    return F.sha2(text, 256)


def rolling_fingerprints(text, window: int = 64, stride: int = 32) -> F.Column:
    """Document fingerprinting: rolling-window substring digests —
    array of xxhash64 over overlapping character windows (winnowing-
    style candidate keys for plagiarism/overlap detection)."""
    n = F.length(text)
    starts = F.sequence(
        F.lit(0),
        F.greatest((n - window).cast("int"), F.lit(0)),
        F.lit(stride),
    )
    return F.transform(
        starts, lambda s: F.xxhash64(F.substring(text, s + 1, window))
    )


def _marker_ratio(toks, markers) -> F.Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(list(markers))))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(text) -> F.Column:
    """Language-ID heuristic: function-word hit ratios for en/es/de;
    'und' (undetermined) when no list clears the floor."""
    toks = F.filter(
        F.split(F.lower(text), "[^a-zA-Zäöüñáéíóú]+"), lambda t: t != ""
    )
    en = _marker_ratio(toks, _EN_MARKERS)
    es = _marker_ratio(toks, _ES_MARKERS)
    de = _marker_ratio(toks, _DE_MARKERS)
    best = F.greatest(en, es, de)
    return (
        F.when(best < 0.03, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )


def quality_score(text) -> F.Column:
    """Composite quality score in [0,1]: length band + alpha ratio +
    punctuation-terminated-line ratio + stopword presence — the usual
    web-text quality gates (Gopher/C4-style), columnar."""
    n = F.length(text)
    len_score = F.when((n >= 200) & (n <= 100_000), 1.0).when(
        n >= 50, 0.5
    ).otherwise(0.0)
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")) / F.greatest(
        n, F.lit(1)
    )
    toks = F.filter(F.split(F.lower(text), "[^a-z]+"), lambda t: t != "")
    stop_ratio = F.size(
        F.filter(toks, lambda t: t.isin(list(_EN_MARKERS)))
    ) / F.greatest(F.size(toks), F.lit(1))
    stop_score = F.when(stop_ratio >= 0.02, 1.0).otherwise(stop_ratio / 0.02)
    return F.round(
        (len_score + F.least(alpha * 2, F.lit(1.0)) + stop_score) / 3.0, 6
    )


def bpe_ish_token_count(text) -> F.Column:
    """Token counting, BPE-ish: words + digits runs + punctuation
    singles (a deterministic regex proxy for a real tokenizer)."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=[^\w])|(?=[^\w])"),
            lambda t: F.trim(t) != "",
        )
    )
