"""Distributed suffix array (prefix doubling), LCP (binary lifting),
and the repeated-substring consumers — exact against Python mirrors.

The mirror compares suffixes as integer sequences with the per-doc
sentinel ``-(doc_id)-1`` appended, exactly the operator's contract
(unique sentinels ⇒ no ties, comparisons never continue past a doc)."""

import random

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import suffixes

CORPUS = [
    (1, "banana"),
    (2, "bandana"),
    (7, "ananas"),
    (3, ""),                       # empty doc: sentinel only
    (4, "aaaa"),                   # max-overlap repeats
    (5, "héllo wörld héllo"),      # non-ASCII code points
    (9, None),                     # NULL text = empty doc
]


def _mirror_sa(docs):
    suf = []
    for d, t in docs:
        t = t or ""
        seq = [ord(c) for c in t] + [-d - 1]
        for i in range(len(t)):    # real suffixes only
            suf.append((seq[i:], d, i))
    suf.sort(key=lambda x: x[0])
    return [(d, i) for _, d, i in suf]


def _mirror_lcp(docs):
    suf = []
    for d, t in docs:
        t = t or ""
        seq = [ord(c) for c in t] + [-d - 1]
        for i in range(len(t)):
            suf.append((seq[i:], d, i))
    suf.sort(key=lambda x: x[0])
    out = {}
    for a, b in zip(suf, suf[1:]):
        l = 0
        for x, y in zip(a[0], b[0]):
            if x != y:
                break
            l += 1
        out[(a[1], a[2])] = ((b[1], b[2]), l)
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_suffix_array_matches_mirror(spark, corpus_df):
    want = _mirror_sa(CORPUS)
    got = [(r.doc_id, r.off) for r in
           suffixes.suffix_array(corpus_df).orderBy("sa_rank").collect()]
    assert got == want


def test_suffix_array_partition_invariant(spark, corpus_df):
    want = _mirror_sa(CORPUS)
    got = [(r.doc_id, r.off) for r in
           suffixes.suffix_array(corpus_df.repartition(7))
           .orderBy("sa_rank").collect()]
    assert got == want


def test_suffix_array_sentinels(spark, corpus_df):
    """keep_sentinels adds exactly one off==len row per doc, and
    sentinel ranks all sort below every real suffix."""
    sa = suffixes.suffix_array(corpus_df, keep_sentinels=True).collect()
    lens = {d: len(t or "") for d, t in CORPUS}
    sent = [r for r in sa if r.off == lens[r.doc_id]]
    real = [r for r in sa if r.off < lens[r.doc_id]]
    assert len(sent) == len(CORPUS)
    assert len(sa) == sum(lens.values()) + len(CORPUS)
    assert max(r.sa_rank for r in sent) < min(r.sa_rank for r in real)


def test_adjacent_lcp_matches_mirror(spark, corpus_df):
    want = _mirror_lcp(CORPUS)
    got = {(r.doc_id, r.off): ((r.nxt_doc_id, r.nxt_off), r.lcp)
           for r in suffixes.adjacent_lcp(corpus_df).collect()}
    assert got == want


def test_longest_repeated_substring(spark, corpus_df):
    row = suffixes.longest_repeated_substring(corpus_df).first()
    # "anana" occurs in banana[1:] and ananas[0:]
    assert row.length == 5 and row.substring == "anana"
    assert (row.doc_id, row.off) == (1, 1)


def test_lrs_on_seeded_corpus_vs_brute_force(spark):
    """A deterministic pseudo-random corpus with a planted repeat:
    LRS equals an O(n²) brute force."""
    rng = random.Random(42)
    plant = "the quick brown fox jumps"
    docs = []
    for d in range(6):
        base = "".join(rng.choice("abcdefg ") for _ in range(120))
        pos = rng.randrange(0, 80)
        docs.append((d + 10, base[:pos] + plant + base[pos:]))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def brute(docs):
        best = 0
        all_suf = [(t[i:], d, i) for d, t in docs for i in range(len(t))]
        all_suf.sort(key=lambda x: x[0])
        for (a, _, _), (b, _, _) in zip(all_suf, all_suf[1:]):
            l = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                l += 1
            best = max(best, l)
        return best

    # NOTE the brute force compares raw strings (no sentinels) —
    # equal only because no suffix here is a proper prefix of another
    # that the sentinel ordering would shuffle INTO adjacency; the
    # planted repeat dominates either way.
    row = suffixes.longest_repeated_substring(df).first()
    assert row.length >= len(plant)
    assert row.length == brute(docs)
    texts = dict(docs)
    assert texts[row.doc_id][row.off:row.off + row.length] == row.substring
    assert (texts[row.nxt_doc_id][row.nxt_off:row.nxt_off + row.length]
            == row.substring)


def test_repeated_substrings_threshold(spark, corpus_df):
    """Every witness row is a genuine verbatim repeat of ≥ min_len
    chars at BOTH cited positions, and the witness set covers every
    adjacent mirror pair at the threshold."""
    texts = {d: (t or "") for d, t in CORPUS}
    rows = suffixes.repeated_substrings(corpus_df, min_len=3).collect()
    for r in rows:
        a = texts[r.doc_id][r.off:r.off + 3]
        b = texts[r.nxt_doc_id][r.nxt_off:r.nxt_off + 3]
        assert r.substring == a == b and r.lcp >= 3
    want = {(k, v[0]) for k, v in _mirror_lcp(CORPUS).items() if v[1] >= 3}
    got = {((r.doc_id, r.off), (r.nxt_doc_id, r.nxt_off)) for r in rows}
    assert got == want


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert suffixes.suffix_array(df).count() == 0
    assert suffixes.adjacent_lcp(df).count() == 0


def test_dense_collision_corpus_matches_mirrors(spark):
    """Adversarial property input (repo property-test style: seeded
    randomness, one Spark job per property): 40 short docs over a
    TWO-char alphabet — maximal rank collisions, overlapping repeats,
    nested prefix relations, many docs equal to each other. SA, LCP,
    and the exact dedup must all equal their Python mirrors."""
    rng = random.Random(20260820)
    docs = [(d + 1, "".join(rng.choice("ab") for _ in range(rng.randint(0, 24))))
            for d in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(9)

    assert [(r.doc_id, r.off) for r in
            suffixes.suffix_array(df).orderBy("sa_rank").collect()] \
        == _mirror_sa(docs)
    got_lcp = {(r.doc_id, r.off): ((r.nxt_doc_id, r.nxt_off), r.lcp)
               for r in suffixes.adjacent_lcp(df).collect()}
    assert got_lcp == _mirror_lcp(docs)
    want = _mirror_exact_dedup(docs, 6)
    got = {r.doc_id: r for r in
           suffixes.remove_duplicate_spans_exact(df, min_len=6).collect()}
    for d, _ in docs:
        assert (got[d].text, got[d].n_chars_removed,
                got[d].n_spans_removed) == want[d], d


def _mirror_exact_dedup(docs, min_len):
    """Pure-Python mirror of remove_duplicate_spans_exact: brute SA
    with sentinels, mark [nxt_off, nxt_off+lcp) on the b-side of every
    adjacent pair with lcp >= min_len, merge per-doc extents, cut."""
    suf = []
    for d, t in docs:
        t = t or ""
        seq = [ord(c) for c in t] + [-d - 1]
        for i in range(len(t)):
            suf.append((seq[i:], d, i))
    suf.sort(key=lambda x: x[0])
    marks = {}
    for a, b in zip(suf, suf[1:]):
        l = 0
        for x, y in zip(a[0], b[0]):
            if x != y:
                break
            l += 1
        if l >= min_len:
            marks.setdefault(b[1], []).append((b[2], b[2] + l))
    out = {}
    for d, t in docs:
        t = t or ""
        ivs = sorted(marks.get(d, []))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        kept, pos = [], 0
        for s, e in merged:
            kept.append(t[pos:s])
            pos = e
        kept.append(t[pos:])
        out[d] = ("".join(kept), sum(e - s for s, e in merged),
                  len(merged))
    return out


def _mirror_dup_extents(docs, min_len):
    """Both-sides mark + merge mirror of duplicated_extents."""
    suf = []
    for d, t in docs:
        t = t or ""
        seq = [ord(c) for c in t] + [-d - 1]
        for i in range(len(t)):
            suf.append((seq[i:], d, i))
    suf.sort(key=lambda x: x[0])
    marks = {}
    for a, b in zip(suf, suf[1:]):
        l = 0
        for x, y in zip(a[0], b[0]):
            if x != y:
                break
            l += 1
        if l >= min_len:
            marks.setdefault(a[1], []).append((a[2], a[2] + l))
            marks.setdefault(b[1], []).append((b[2], b[2] + l))
    out = {}
    for d, _ in docs:
        merged = []
        for s, e in sorted(marks.get(d, [])):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        out[d] = merged
    return out


def test_duplicated_extents_and_stats(spark):
    """Audit form: BOTH occurrences of a planted passage are counted
    (the dedup form spares the survivor), extents equal the mirror,
    and dedup's removed chars never exceed the audited dup chars."""
    passage = ("we hold these truths to be self evident that all "
               "docs are created equal")
    docs = [
        (1, "XX " + passage + " YY"),
        (2, passage + " ZZ"),
        (3, "perfectly unique content with no long repeats"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    L = 40
    want = _mirror_dup_extents(docs, L)
    got = {}
    for r in suffixes.duplicated_extents(df, min_len=L).collect():
        got.setdefault(r.doc_id, []).append((r.s, r.e))
    for d in got:
        got[d].sort()
    assert got == {d: iv for d, iv in want.items() if iv}
    stats = {r.doc_id: r for r in
             suffixes.duplication_stats(df, min_len=L).collect()}
    # both planted docs count their occurrence; clean/null docs zero
    assert stats[1].dup_chars >= len(passage)
    assert stats[2].dup_chars >= len(passage)
    assert stats[3].dup_chars == 0 and stats[3].dup_fraction == 0.0
    assert stats[4].n_chars == 0 and stats[4].dup_fraction == 0.0
    # dedup removes at most what the audit counts, and spares one copy
    ded = {r.doc_id: r for r in
           suffixes.remove_duplicate_spans_exact(df, min_len=L).collect()}
    for d, _ in docs:
        assert ded[d].n_chars_removed <= stats[d].dup_chars
    assert sum(r.n_chars_removed for r in ded.values()) \
        < sum(r.dup_chars for r in stats.values())


def test_exact_span_dedup_planted_passage(spark):
    """An 80-char passage planted in 3 docs survives in exactly one
    occurrence; a within-doc verbatim repeat collapses too; clean docs
    pass through byte-identical."""
    passage = ("it was the best of times it was the worst of times "
               "it was the age of wisdom yes")
    assert len(passage) >= 70
    docs = [
        (1, "A" * 30 + passage + "B" * 30),
        (2, "C" * 10 + passage + "D" * 50),
        (3, passage + "E" * 40),
        (4, "unique text with no repeats at all here"),
        (5, "Z" * 5 + passage + "Y" * 3 + passage),  # twice in one doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in
           suffixes.remove_duplicate_spans_exact(df, min_len=60).collect()}
    texts = {d: t for d, t in docs}
    # exactly one surviving full occurrence corpus-wide
    survivors = sum(got[d].text.count(passage) for d, _ in docs)
    assert survivors == 1
    # clean doc untouched
    assert got[4].text == texts[4] and got[4].n_chars_removed == 0
    # every doc's removed count is consistent
    for d, t in docs:
        assert got[d].n_chars == len(t)
        assert len(got[d].text) == len(t) - got[d].n_chars_removed
    # and the whole output equals the Python mirror exactly
    want = _mirror_exact_dedup(docs, 60)
    for d, _ in docs:
        assert (got[d].text, got[d].n_chars_removed,
                got[d].n_spans_removed) == want[d]


def test_exact_span_dedup_matches_mirror_on_seeded_corpus(spark):
    """Seeded pseudo-random corpus with several planted repeats at
    different lengths: the operator equals the Python mirror on every
    doc (text, chars removed, span count)."""
    rng = random.Random(7)
    plants = ["the quick brown fox jumps over the lazy dog",
              "pack my box with five dozen liquor jugs!!"]
    docs = []
    for d in range(8):
        base = "".join(rng.choice("abcdefgh ") for _ in range(150))
        p = plants[d % 2]
        pos = rng.randrange(0, 100)
        docs.append((d + 20, base[:pos] + p + base[pos:]))
    docs.append((40, None))
    docs.append((41, ""))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = _mirror_exact_dedup(docs, 30)
    got = {r.doc_id: r for r in
           suffixes.remove_duplicate_spans_exact(df, min_len=30).collect()}
    assert set(got) == set(want)
    for d in want:
        assert (got[d].text, got[d].n_chars_removed,
                got[d].n_spans_removed) == want[d], d
    # no duplicated >=30-char substring survives twice: re-running the
    # mirror's marker over the DEDUPED texts finds nothing to cut
    # except at cut junctions (which the paper's one-pass form allows);
    # check the planted passages specifically
    joined = " ".join(r.text for r in got.values() if r.text)
    for p in plants:
        assert joined.count(p) == 1
