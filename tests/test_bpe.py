"""Distributed BPE: the learned merge list matches a reference
Python trainer exactly (same word-dict formulation, greedy leftmost
replace, lexicographic tie-break), the Arrow encoder agrees with a
reference encoder, and training is partition-invariant."""

import re
from collections import Counter

from pyspark.sql import functions as F

from website_to_agent_spark.operators import bpe


def _ref_train(texts, n_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, sym in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, sym in vocab.items():
            out = sym[:1]
            for s in sym[1:]:
                if out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def _ref_encode(text, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    out = []
    for w in re.findall(r"[a-z0-9]+", text.lower()):
        sym = list(w)
        while len(sym) >= 2:
            cands = [(ranks[(sym[i], sym[i + 1])], i)
                     for i in range(len(sym) - 1)
                     if (sym[i], sym[i + 1]) in ranks]
            if not cands:
                break
            _, i = min(cands)
            sym[i:i + 2] = [sym[i] + sym[i + 1]]
        out.extend(sym)
    return out


TEXTS = [
    "the lower the newer the wider the lowest",
    "low lower lowest new newer newest wide wider widest",
    "the new low bridge, the wide new river!",
    "newest newest newest lowest lowest wider",
]


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = bpe.train_bpe(docs, n_merges=12)
    want = _ref_train(TEXTS, 12)
    assert got == want and len(got) == 12
    # partition-invariant (integer counts + lexicographic tie-break)
    again = bpe.train_bpe(docs.repartition(5), n_merges=12)
    assert again == got


def test_bpe_encode_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=10)
    tok = bpe.bpe_encode_udf(merges)
    got = {r.doc_id: list(r.toks) for r in
           docs.select("doc_id", tok("text").alias("toks")).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _ref_encode(t, merges), (i, got[i])
    # token counts: trained tokenizer compresses repeated morphology
    counted = {r.doc_id: r.n_bpe_tokens for r in
               bpe.bpe_token_count(docs, merges).collect()}
    chars = {i: sum(len(w) for w in re.findall(r"[a-z0-9]+", t.lower()))
             for i, t in enumerate(TEXTS)}
    assert all(0 < counted[i] < chars[i] for i in counted)


def test_bpe_counts_drive_packing(spark):
    """The trained tokenizer's counts plug into the packing layer: bins
    respect the max_tokens budget measured in REAL BPE tokens."""
    from website_to_agent_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, " ".join(TEXTS) * (1 + i % 3)) for i in range(30)],
        "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=10)
    counted = bpe.bpe_token_count(docs, merges)
    packed = sampling.pack_sequences(
        counted, 400, "doc_id", F.col("n_bpe_tokens"), n_groups=4)
    sums = packed.groupBy("pack_group", "bin_id").agg(
        F.sum("n_bpe_tokens").alias("s"),
        F.max("n_bpe_tokens").alias("mx"))
    for r in sums.collect():
        # documented packing contract: a bin overflows by less than
        # one (whole, never split) document
        assert r.s < 400 + r.mx
