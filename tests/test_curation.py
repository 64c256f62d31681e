"""Corpus curation: per-domain caps, benchmark decontamination,
cross-document paragraph dedup."""

from pyspark.sql import functions as F

from website_to_agent_spark.operators import curation


def test_cap_per_domain_bounds_and_determinism(spark):
    rows = [(i, "big.com" if i < 20 else ("mid.com" if i < 26 else "tiny.com"))
            for i in range(28)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = curation.cap_per_domain(df, "domain", k=5)
    counts = {r.domain: r.n for r in
              out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big.com": 5, "mid.com": 5, "tiny.com": 2}
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in curation.cap_per_domain(df, "domain", 5).collect())
    assert a == b                                   # deterministic winners
    assert set(a) <= set(range(28))
    # a different salt elects a different (still bounded) sample
    c = sorted(r.doc_id for r in
               curation.cap_per_domain(df, "domain", 5, salt="other").collect())
    assert c != a and len(c) == len(a)


def test_decontaminate_flags_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "bid long, text string")
    docs = spark.createDataFrame(
        [
            # contains the benchmark 8-gram verbatim inside other text
            (1, "intro words the quick brown fox jumps over the lazy dog "
                "tonight and more trailing words"),
            # shares words but no 8-gram run
            (2, "the quick brown cat sleeps under the lazy dog tonight"),
            (3, "completely unrelated content about spark shuffles"),
        ],
        "doc_id long, text string")
    out = {r.doc_id: r for r in curation.decontaminate(docs, bench).collect()}
    assert out[1].contaminated and out[1].n_overlaps >= 1
    assert not out[2].contaminated and out[2].n_overlaps == 0
    assert not out[3].contaminated


def test_dedup_paragraphs_across_docs(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        (0, "unique zero" + "\n\n" + boiler + "\n\ncopyright footer"),
        (1, "unique one" + "\n\n" + boiler + "\n\ncopyright footer"),
        (2, boiler),                        # pure boilerplate → vanishes
        (3, "unique three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           curation.dedup_paragraphs_across_docs(docs).collect()}
    # doc 0 (smallest id) keeps everything, in original order
    assert out[0].text == rows[0][1]
    assert out[0].n_paragraphs == 3 and out[0].n_dropped == 0
    # doc 1 keeps only its unique paragraph; 2 boilerplates dropped
    assert out[1].text == "unique one"
    assert out[1].n_paragraphs == 1 and out[1].n_dropped == 2
    # doc 2 was nothing but boilerplate → no surviving row
    assert 2 not in out
    assert out[3].text == "unique three" and out[3].n_dropped == 0


def test_remove_duplicate_spans(spark):
    rows = [
        (1, "A b c d e f g h x y"),          # owns the shared 8-gram
        (2, "z z a b c d e f g h q"),        # loses its copy (pos 2-9)
        (3, "a b c"),                        # shorter than k: untouched
        (4, "a b c d e f g h a b c d e f g h"),  # two copies -> all gone
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           curation.remove_duplicate_spans(docs).collect()}
    # winner (globally smallest (doc_id, pos)) keeps its tokens;
    # output is token-normalized (lowercased, single-space joined)
    assert out[1].text == "a b c d e f g h x y"
    assert out[1].n_tokens_removed == 0 and out[1].n_spans_removed == 0
    # non-winner occurrence excised, surrounding tokens survive
    assert out[2].text == "z z q"
    assert out[2].n_tokens == 11 and out[2].n_tokens_removed == 8
    assert out[2].n_spans_removed == 1
    # docs under k tokens never produce grams
    assert out[3].text == "a b c" and out[3].n_tokens_removed == 0
    # adjacent duplicated windows stay two islands ([0,7],[8,15]) but
    # the whole document is consumed
    assert out[4].text == "" and out[4].n_tokens_removed == 16
    assert out[4].n_spans_removed == 2


def test_remove_duplicate_spans_overlap_merges(spark):
    # doc 6 repeats doc 5's 9-token run: grams at pos 1 and 2 overlap
    # -> ONE merged span [1, 9], not two
    rows = [
        (5, "p q r s t u v w x"),
        (6, "lead p q r s t u v w x tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           curation.remove_duplicate_spans(docs).collect()}
    assert out[5].n_tokens_removed == 0
    assert out[6].text == "lead tail"
    assert out[6].n_tokens_removed == 9 and out[6].n_spans_removed == 1


def test_remove_duplicate_spans_hash_variants_agree(spark):
    # the xxhash64 (long-math, production) and md5 (oracle-mirrorable)
    # digest variants elect identical winners, so the dedup OUTCOME is
    # identical on a collision-free corpus
    rows = [
        (1, "A b c d e f g h x y"),
        (2, "z z a b c d e f g h q"),
        (3, "a b c"),
        (4, "a b c d e f g h a b c d e f g h"),
        (6, "lead one two three four five six seven eight tail"),
        (7, "one two three four five six seven eight closing words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id", "text", "n_tokens", "n_tokens_removed",
            "n_spans_removed"]
    fast = sorted(
        tuple(r) for r in
        curation.remove_duplicate_spans(docs).select(cols).collect())
    mirror = sorted(
        tuple(r) for r in
        curation.remove_duplicate_spans(docs, hash_fn="md5")
        .select(cols).collect())
    assert fast == mirror
