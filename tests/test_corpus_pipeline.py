"""End-to-end training-corpus pipeline: every stage drops what it
should (and only that), the report accounts for it, and the result is
deterministic across re-runs."""

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import corpus, webtext

def _body(i):
    """Per-doc UNIQUE prose-shaped body (passes the gopher gates,
    shares no shingles across docs — so only intended pairs are
    near-dups)."""
    return " ".join(f"t{i}w{j}x{(i * 31 + j) % 97}"
                    for j in range(80)) + "."


BENCH_TEXT = _body(8)


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        (1, _body(1)),
        (2, _body(1)),                                # exact dup of 1
        (3, _body(1) + " tiny near dup tail"),        # near dup of 1
        (4, _body(4)),
        (5, "x " * 400),                              # gopher fail: dup words
        (6, _body(6) + " email me at a@b.com now"),   # pii
        (7, _body(7)),
        (8, BENCH_TEXT),                              # contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_full_pipeline_stages(spark, raw_docs):
    bench = spark.createDataFrame(
        [(100, BENCH_TEXT)], "doc_id long, text string"
    )
    out, report = corpus.build_training_corpus(
        raw_docs,
        benchmark=bench,
        splits={"train": 0.8, "val": 0.2},
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # survivors: 1 (group winner), 4, 6 (scrubbed), 7
    assert set(rows) == {1, 4, 6, 7}
    assert "<EMAIL>" in rows[6]["text"]
    assert set(out.columns) == {"doc_id", "text", "split"}
    assert {r["split"] for r in rows.values()} <= {"train", "val"}
    # the report is a monotone funnel with the right stage drops
    assert report["input"] == 8
    assert report["pii_scrub"] == 8
    assert report["gopher_gate"] == 7          # doc 5 out
    assert report["exact_dedup"] == 6          # doc 2 out
    assert report["near_dup"] == 5             # doc 3 out
    assert report["decontaminate"] == 4        # doc 8 out
    assert report["output"] == 4


def test_pipeline_deterministic_and_lazy(spark, raw_docs):
    a, _ = corpus.build_training_corpus(raw_docs, counts=False)
    b, rep = corpus.build_training_corpus(
        raw_docs.repartition(5), counts=True
    )
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())
    assert rep["near_dup"] == a.count()


def test_pipeline_lm_gate(spark, raw_docs):
    lm = webtext.train_char_lm(raw_docs.filter(F.col("doc_id") == 7))
    out, report = corpus.build_training_corpus(
        raw_docs, lm_table=lm, max_perplexity=1e5,
        near_dup=False,
    )
    # the gate runs and keeps the funnel monotone; the trained doc
    # itself always survives a loose ceiling
    assert report["lm_gate"] <= report["gopher_gate"]
    assert 7 in {r["doc_id"] for r in out.collect()}


def test_pipeline_span_dedup_stage(spark, raw_docs):
    # docs 4 and 7 get the same 10-token tail appended: doc-level dedup
    # cannot drop either (bodies differ), but the span stage excises
    # the repeated tail from the later doc (7) while 4 keeps its copy
    tail = " alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = raw_docs.withColumn(
        "text",
        F.when(F.col("doc_id").isin(4, 7),
               F.concat("text", F.lit(tail))).otherwise(F.col("text")),
    )
    out, report = corpus.build_training_corpus(
        docs, span_dedup=True, scrub_pii=False,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # span stage never drops rows: funnel flat across it
    assert report["span_dedup"] == report["near_dup"]
    assert "alpha beta gamma" in rows[4]
    assert "alpha beta gamma" not in rows[7]
    # unique bodies are untouched apart from token normalization
    assert rows[1].startswith("t1w0x31 t1w1x32")


def test_pipeline_exact_span_dedup_stage(spark, raw_docs):
    # same planted tail as the fixed-gram test, but driven through the
    # suffix-array exact stage: one occurrence survives corpus-wide,
    # rows never drop (funnel flat), and unlike the token-normalizing
    # gram stage the untouched docs pass through BYTE-identical
    tail = (" alpha beta gamma delta epsilon zeta eta theta iota"
            " kappa lambda mu")
    docs = raw_docs.withColumn(
        "text",
        F.when(F.col("doc_id").isin(4, 7),
               F.concat("text", F.lit(tail))).otherwise(F.col("text")),
    )
    out, report = corpus.build_training_corpus(
        docs, exact_span_dedup=True, exact_span_min_len=len(tail),
        scrub_pii=False,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert report["exact_span_dedup"] == report["near_dup"]
    survivors = sum(t.count(tail.strip()) for t in rows.values())
    assert survivors == 1
    before = {r["doc_id"]: r["text"] for r in docs.collect()
              if r["doc_id"] in rows}
    untouched = [d for d in rows if d not in (4, 7)]
    assert untouched and all(rows[d] == before[d] for d in untouched)


def test_pipeline_incremental_prior_state(spark, raw_docs):
    from website_to_agent_spark.operators import dedupe

    # snapshot 1 = the fixture pipeline output; snapshot 2 re-crawls
    # doc 1's text (new id 50) plus one genuinely new doc
    out1, _ = corpus.build_training_corpus(raw_docs, near_dup=False)
    digests = dedupe.exact_digests(out1)
    bands = dedupe.minhash_band_state(out1)
    batch2 = spark.createDataFrame(
        [(50, _body(1)),                            # exact dup of kept 1
         (51, _body(1) + " other small ending"),    # near dup of kept 1/3
         (52, _body(52))],                          # new
        "doc_id long, text string",
    )
    out2, report = corpus.build_training_corpus(
        batch2, prior_digests=digests, prior_bands=bands,
        near_dup=False, scrub_pii=False,
    )
    ids = {r.doc_id for r in out2.collect()}
    assert ids == {52}
    assert report["prior_exact"] == 2       # 50 dropped
    assert report["prior_near_dup"] == 1    # 51 dropped


def test_pipeline_c4_gate(spark, raw_docs):
    # fixture bodies have no terminal-punctuation lines, so docs need
    # C4-shaped prose appended to survive; one gets a brace line
    prose = (" \nOne full sentence sits right here. Another one follows"
             " directly after. And a third closes the paragraph.")
    docs = raw_docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 4,
               F.concat("text", F.lit(prose),
                        F.lit("\nThis code snippet contains a { brace"
                              " character today.")))
        .otherwise(F.concat("text", F.lit(prose))),
    )
    out, report = corpus.build_training_corpus(
        docs, c4_gate=True, gopher_gate=False, near_dup=False,
        scrub_pii=False,
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    assert 4 not in rows                      # brace page dropped
    assert report["c4_gate"] == report["input"] - 1
    # cleaning rewrote every surviving text down to the prose lines
    assert all(t.startswith("One full sentence") for t in rows.values())


def test_pipeline_repetition_gate(spark, raw_docs):
    # a doc that sails through the map-only gopher gate (unique lines,
    # prose-shaped words) but is one 12-token sentence looping — the
    # n-gram repetition gate is the only signal that catches it
    loop = " ".join(
        ["quarterly results exceeded expectations across every region"
         " this period again"] * 12)
    docs = raw_docs.unionByName(
        spark.createDataFrame([(42, loop)], "doc_id long, text string"))
    out, report = corpus.build_training_corpus(
        docs, repetition_gate=True, near_dup=False, scrub_pii=False,
    )
    ids = {r.doc_id for r in out.collect()}
    assert 42 not in ids
    # the fixture's unique prose bodies all pass the n-gram gate
    assert report["repetition_gate"] == report["gopher_gate"] - 1


def test_pipeline_quality_gate(spark, raw_docs):
    from website_to_agent_spark.operators import quality_classifier as qc

    # train on the fixture's own prose vs its reversal (gibberish) and
    # gate the pipeline: every fixture doc is fluent, so the gate must
    # pass what the gopher gate passes — then a gibberish doc is added
    # and must be the one dropped
    gib = raw_docs.select("doc_id", F.reverse("text").alias("text"))
    w = qc.train_quality_classifier(raw_docs, gib, dim=64, iters=15)
    docs = raw_docs.unionByName(
        spark.createDataFrame(
            [(99, "x" + raw_docs.first().text[::-1])],
            "doc_id long, text string"))
    out, report = corpus.build_training_corpus(
        docs, quality_weights=w, near_dup=False, scrub_pii=False,
    )
    ids = {r.doc_id for r in out.collect()}
    assert 99 not in ids
    assert report["quality_gate"] >= report["gopher_gate"] - 1


def test_pipeline_boilerplate_stage(spark):
    foot = "(c) 2025 Acme - All Rights Reserved"
    rows = [(i, "h1.com", f"{_body(i)}\n{foot}") for i in range(4)]
    rows += [(9, "h2.com", _body(9) + "\n" + foot)]   # 1 page: kept
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out, rep = corpus.build_training_corpus(
        docs, boilerplate_host_col="host", near_dup=False,
        gopher_gate=False, scrub_pii=False)
    got = {r.doc_id: r.text for r in out.collect()}
    assert rep["boilerplate_strip"] == 5      # strip rewrites, drops none
    for i in range(4):
        assert "Acme" not in got[i]
        assert f"t{i}w0x" in got[i]
    assert "Acme" in got[9]                   # below min_pages: untouched


def test_pipeline_blocklist_stage(spark, raw_docs):
    wl = spark.createDataFrame([("t4w0x27",)], "w string")  # doc 4's token
    out, rep = corpus.build_training_corpus(
        raw_docs, blocklist=wl, near_dup=False, gopher_gate=False,
        scrub_pii=False)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 4 not in ids and rep["blocklist"] == rep["input"] - 1


def test_pipeline_exclude_ids_stage(spark, raw_docs):
    """Upstream exclusion list (e.g. noindexed urls) is the FIRST
    stage: excluded docs never reach any gate."""
    excl = spark.createDataFrame([(1,), (3,)], "doc_id long")
    out, rep = corpus.build_training_corpus(
        raw_docs, exclude_ids=excl, near_dup=False, gopher_gate=False,
        scrub_pii=False)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert not ids & {1, 3}
    assert rep["exclude_ids"] == rep["input"] - 2


def test_pipeline_compression_gate(spark):
    """The zlib band drops a degenerate loop (too compressible) and a
    random-hex blob (too incompressible) while fluent text passes."""
    import random
    rng = random.Random(7)
    fluent = " ".join(
        "the quick brown fox jumps over a lazy dog near banks of rivers"
        .split()[i % 12] + str(rng.randint(0, 99)) for i in range(300)
    )
    loop = "spam " * 2000
    import string
    alphabet = string.ascii_letters + string.digits + "+/"
    noise = "".join(rng.choice(alphabet) for _ in range(4000))
    docs = spark.createDataFrame(
        [(0, fluent), (1, loop), (2, noise)], "doc_id long, text string"
    )
    out, rep = corpus.build_training_corpus(
        docs, compression_gate=True, max_compression=0.70,
        near_dup=False, gopher_gate=False, scrub_pii=False)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids == {0}
    assert rep["compression_gate"] == 1


def test_exclude_ids_requires_resolvable_column(spark, raw_docs):
    """A multi-column exclusion table must carry id_col by name;
    guessing columns[0] silently no-ops for shapes like
    CrawlResultTables.noindexed (review finding)."""
    import pytest as _pytest

    named = spark.createDataFrame(
        [("j", 1), ("j", 3)], "job_id string, doc_id long"
    )
    out, rep = corpus.build_training_corpus(
        raw_docs, exclude_ids=named, near_dup=False, gopher_gate=False,
        scrub_pii=False)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert not ids & {1, 3}
    bad = spark.createDataFrame([("j", 1)], "job_id string, other long")
    with _pytest.raises(ValueError):
        corpus.build_training_corpus(
            raw_docs, exclude_ids=bad, near_dup=False,
            gopher_gate=False, scrub_pii=False)


def test_pipeline_ccnet_bucket_gate(spark, raw_docs):
    """lm_keep_buckets switches the LM stage to the CCNet form: the
    kept set equals what a direct perplexity_buckets bucket filter on
    the SAME stage input keeps, and is partitioning-invariant."""
    lm = webtext.train_char_lm(raw_docs.filter(F.col("doc_id").isin(1, 4, 7)))
    out, rep = corpus.build_training_corpus(
        raw_docs, lm_table=lm, lm_keep_buckets=("head", "middle"),
        near_dup=False, gopher_gate=False, scrub_pii=False)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    direct = webtext.perplexity_buckets(raw_docs, lm)
    want = {r.doc_id for r in direct.filter(
        F.col("bucket").isin("head", "middle")).select("doc_id").collect()}
    # the stage keeps exactly the direct bucket filter's set; doc 2
    # (exact dup of 1) then falls to the downstream exact-dedup stage
    assert ids == want - {2}
    assert rep["lm_bucket_gate"] == len(want) < rep["input"]
    out2, _ = corpus.build_training_corpus(
        raw_docs.repartition(5), lm_table=lm,
        lm_keep_buckets=("head", "middle"), near_dup=False,
        gopher_gate=False, scrub_pii=False, counts=False)
    assert {r.doc_id for r in out2.select("doc_id").collect()} == ids


def test_pipeline_dsir_select_stage(spark, raw_docs):
    """DSIR selection is the LAST filter (after decontaminate, before
    split): exactly k target-like docs survive, the funnel records the
    stage in order, and the output schema carries no score column."""
    # two dialects: target-like docs reuse the target's vocabulary
    tgt_words = ["signal processing pipeline design notes for engineers."]
    docs = raw_docs.unionByName(spark.createDataFrame(
        [(21, " ".join(tgt_words * 20)),
         (22, " ".join(tgt_words * 19) + " extra tail words here.")],
        "doc_id long, text string"))
    target = spark.createDataFrame(
        [(900, " ".join(tgt_words * 25))], "doc_id long, text string")
    out, rep = corpus.build_training_corpus(
        docs, dsir_target=target, dsir_k=2,
        near_dup=False, gopher_gate=False, scrub_pii=False,
        splits={"train": 1.0})
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    assert ids == {21, 22}                      # the target-like pair
    assert rep["dsir_select"] == 2
    stages = list(rep)
    assert stages.index("dsir_select") == len(stages) - 2  # before output
    assert set(out.columns) == {"doc_id", "text", "split"}
    # deterministic under gumbel resampling too (md5 noise, not RNG)
    a, _ = corpus.build_training_corpus(
        docs, dsir_target=target, dsir_k=2, dsir_gumbel_salt="s1",
        near_dup=False, gopher_gate=False, scrub_pii=False, counts=False)
    b, _ = corpus.build_training_corpus(
        docs.repartition(7), dsir_target=target, dsir_k=2,
        dsir_gumbel_salt="s1", near_dup=False, gopher_gate=False,
        scrub_pii=False, counts=False)
    assert sorted(r.doc_id for r in a.collect()) == \
        sorted(r.doc_id for r in b.collect())


def test_pipeline_per_language_ccnet_gate(spark):
    """A (lang, gram, cnt) lm_table flips the LM stage to per-language
    CCNet: each language keeps its own head slice, where the mono form
    trained on 'en' wipes the other language wholesale."""
    import random

    rng = random.Random(3)
    rows = []
    en_base = ("the quick brown fox jumps over the lazy dog near the "
               "river bank in the morning light every single day ")
    for i in range(24):
        noise = "".join(rng.choice("zqxvjkw ") for _ in range(i * 5))
        rows.append((i, "en", en_base * 2 + noise))
    for i in range(24):
        txt = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                               for _ in range(rng.randint(3, 9)))
                       for _ in range(40 + i * 3))
        rows.append((100 + i, "xx", txt))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string")

    lms = webtext.train_char_lms(docs)
    out, rep = corpus.build_training_corpus(
        docs, lm_table=lms, lm_keep_buckets=("head",),
        near_dup=False, gopher_gate=False, scrub_pii=False)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    kept_en = {i for i in kept if i < 100}
    kept_xx = {i for i in kept if i >= 100}
    assert kept_en and kept_xx          # BOTH languages contribute heads
    assert 6 <= len(kept_en) <= 10 and 6 <= len(kept_xx) <= 10

    # the mono form trained on en only: xx lands almost wholly outside
    # head (cross-language ppl scale), demonstrating the bug class
    mono = webtext.train_char_lm(docs.filter(F.col("lang") == "en"))
    out_m, _ = corpus.build_training_corpus(
        docs, lm_table=mono, lm_keep_buckets=("head",),
        near_dup=False, gopher_gate=False, scrub_pii=False)
    kept_m = {r.doc_id for r in out_m.select("doc_id").collect()}
    assert not {i for i in kept_m if i >= 100}  # xx wiped by mono gate


def test_pipeline_detect_lang_stage(spark):
    """detect_lang=True runs CCNet step 1 inside the funnel: unlabeled
    docs get a detected language BEFORE the per-language gate, so they
    are scored under the right model instead of being routed out as
    unknown-language; trusted labels are never overwritten."""
    import random

    rng = random.Random(5)

    def aa_text(k):
        return " ".join("".join(rng.choice("abcdefghij")
                                for _ in range(rng.randint(2, 6)))
                        for _ in range(k))

    def bb_text(k):
        return " ".join("".join(rng.choice("qrstuvwxyz")
                                for _ in range(rng.randint(2, 6)))
                        for _ in range(k))

    labeled = [(i, "aa", aa_text(40)) for i in range(16)]
    labeled += [(100 + i, "bb", bb_text(40)) for i in range(16)]
    train = spark.createDataFrame(
        labeled, "doc_id long, lang string, text string")
    lms = webtext.train_char_lms(train)

    # the crawl batch: half labeled, half NULL-lang (unlabeled)
    rows = [(i, "aa" if i < 8 else None, aa_text(40)) for i in range(16)]
    rows += [(100 + i, "bb" if i < 8 else None, bb_text(40))
             for i in range(16)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string")

    # without detection: NULL-lang docs have no LM → NULL ppl → the
    # tail label → dropped by a head+middle keep
    out0, rep0 = corpus.build_training_corpus(
        docs, lm_table=lms, lm_keep_buckets=("head", "middle"),
        near_dup=False, gopher_gate=False, scrub_pii=False)
    kept0 = {r.doc_id for r in out0.select("doc_id").collect()}

    # with detection: every doc is scored under its (detected)
    # language's model — the unlabeled half participates normally
    out1, rep1 = corpus.build_training_corpus(
        docs, lm_table=lms, lm_keep_buckets=("head", "middle"),
        detect_lang=True,
        near_dup=False, gopher_gate=False, scrub_pii=False)
    kept1 = {r.doc_id for r in out1.select("doc_id").collect()}
    assert "lang_detect" in rep1 and "lang_detect" not in rep0
    assert rep1["lang_detect"] == 32
    unlabeled = {i for i in range(8, 16)} | {100 + i for i in range(8, 16)}
    # no-detect: every unlabeled doc is unknown-language → tail → gone
    assert not (kept0 & unlabeled)
    # detect: unlabeled docs participate in their language's pool, so
    # its head+middle slice includes some of them
    assert kept1 & unlabeled
    # and the funnel is per-language thirds over the FULL 16-doc pools
    assert 18 <= len(kept1) <= 26

    # determinism across repartition
    out2, _ = corpus.build_training_corpus(
        docs.repartition(7), lm_table=lms,
        lm_keep_buckets=("head", "middle"), detect_lang=True,
        near_dup=False, gopher_gate=False, scrub_pii=False)
    assert {r.doc_id for r in out2.select("doc_id").collect()} == kept1
