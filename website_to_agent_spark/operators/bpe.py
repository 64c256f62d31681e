"""Trainable byte-pair encoding — REAL distributed BPE vocabulary
training (Sennrich et al. 2016), upgrading the task brief's "BPE-ish
regex token counting" to the actual algorithm every modern tokenizer
family uses.

Why this is Spark-suited: BPE training never needs the corpus after
one pass — it iterates over the DISTINCT-WORD frequency table (the
classic word-dict formulation), so each merge round is one
map-combined pair count over a bounded vocabulary table plus a 1-row
argmax collect. The merge-application step is a pure-column left fold
(``F.aggregate``) implementing the standard greedy leftmost
non-overlapping replace — no UDFs anywhere in training. Each round
localCheckpoints the (tiny) vocab table and releases its predecessor:
without that the lazy plan nests one fold per round and the analyzer,
not the data, becomes the bottleneck.

Encoding (tokenize a corpus with a trained merge list) is kernel-
shaped work — a rank-priority merge loop per word — so it ships as an
Arrow-batched pandas UDF with the ranks dict captured in the closure
(bounded by n_merges) and a per-batch word cache; the honest kernel
boundary, same rationale as the codec/bloom kernels.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from website_to_agent_spark.operators.crawl import _release_checkpoint


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus frequency table — the repo-wide lowercase
    letters+digits tokenizer."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    return (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
    )


def _merge_fold(sym, a: str, b: str) -> F.Column:
    """Greedy leftmost non-overlapping merge of adjacent (a, b) into
    a||b over a symbol array — the standard BPE replace — as one
    ``aggregate`` left fold (out[-1]==a and s==b → fuse, else append)."""
    return F.when(F.size(sym) < 2, sym).otherwise(
        F.aggregate(
            F.slice(sym, 2, F.size(sym) - 1),
            F.array(F.element_at(sym, 1)),
            lambda out, s: F.when(
                (F.element_at(out, -1) == a) & (s == F.lit(b)),
                F.concat(
                    F.slice(out, 1, F.size(out) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(out, F.array(s))),
        )
    )


def train_bpe(docs: DataFrame, text_col: str = "text",
              n_merges: int = 100,
              min_pair_count: int = 2) -> List[Tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list — feed to ``bpe_encode``/``bpe_token_count``.

    Deterministic: pair counts are integer sums; the per-round argmax
    breaks ties lexicographically on the pair, so the learned vocab is
    identical across re-runs, partitionings and engines. Rounds with
    no pair reaching ``min_pair_count`` stop training early.
    """
    vocab = (
        _words(docs, text_col)
        .select(
            "n",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ).alias("sym"),
        )
        .localCheckpoint(eager=True)
    )
    merges: List[Tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                vocab.filter(F.size("sym") >= 2)
                .select(
                    "n",
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size("sym") - 1),
                            lambda i: F.struct(
                                F.element_at("sym", i).alias("a"),
                                F.element_at("sym", i + 1).alias("b"),
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0].cnt < min_pair_count:
                break
            a, b = pairs[0].a, pairs[0].b
            merges.append((a, b))
            nxt = vocab.select(
                "n", _merge_fold(F.col("sym"), a, b).alias("sym")
            ).localCheckpoint(eager=True)
            _release_checkpoint(vocab)
            vocab = nxt
    finally:
        _release_checkpoint(vocab)
    return merges


def bpe_encode_udf(merges: List[Tuple[str, str]]):
    """Arrow-batched tokenizer for a trained merge list: text →
    array<string> of BPE tokens. Ranks ship in the closure; words are
    memoized per batch (web text repeats words heavily)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    word_re = re.compile(r"[a-z0-9]+")

    def _encode_word(w: str, cache: dict) -> list:
        got = cache.get(w)
        if got is not None:
            return got
        sym = list(w)
        while len(sym) >= 2:
            best, bi = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
        cache[w] = sym
        return sym

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            toks: list = []
            for w in word_re.findall((t or "").lower()):
                toks.extend(_encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return _tok


def bpe_token_count(docs: DataFrame, merges: List[Tuple[str, str]],
                    text_col: str = "text",
                    out_col: str = "n_bpe_tokens") -> DataFrame:
    """Append the trained-tokenizer token count — the honest input to
    ``pack_sequences``/``mixture_report`` token budgets (vs the
    whitespace estimate)."""
    tok = bpe_encode_udf(merges)
    return docs.withColumn(out_col, F.size(tok(F.col(text_col))))


BASE_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"


def bpe_vocab(merges: List[Tuple[str, str]]) -> dict:
    """Deterministic token→id table for a trained merge list: base
    charset first (ids 0..35), then one id per merge product in merge
    order (the id order every BPE implementation derives from training
    order), then ``<eos>`` as the last id. The tokenizer's charset is
    closed over [a-z0-9] (``word_re``), so no token can fall outside
    this vocabulary."""
    vocab = {c: i for i, c in enumerate(BASE_CHARS)}
    for a, b in merges:
        prod = a + b
        if prod not in vocab:
            vocab[prod] = len(vocab)
    vocab["<eos>"] = len(vocab)
    return vocab


def bpe_encode_ids_udf(merges: List[Tuple[str, str]]):
    """Arrow-batched tokenizer: text → array<int> of vocabulary ids
    (the training-ready twin of :func:`bpe_encode_udf`; same merge
    loop and per-batch word memoization, mapped through
    :func:`bpe_vocab`)."""
    from pyspark.sql.types import IntegerType

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    vocab = bpe_vocab(merges)
    word_re = re.compile(r"[a-z0-9]+")

    def _encode_word(w: str, cache: dict) -> list:
        got = cache.get(w)
        if got is not None:
            return got
        sym = list(w)
        while len(sym) >= 2:
            best, bi = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
        ids = [vocab[s] for s in sym]
        cache[w] = ids
        return ids

    @F.pandas_udf(ArrayType(IntegerType()))
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            ids: list = []
            for w in word_re.findall((t or "").lower()):
                ids.extend(_encode_word(w, cache))
            out.append(ids)
        return pd.Series(out)

    return _tok
