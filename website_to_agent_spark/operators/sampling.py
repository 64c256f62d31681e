"""Sampling, splitting, mixing and packing — the selection layer of a
large-scale training-data pipeline (task brief: first-class beyond-
reference operators over the ``documents`` table).

All four operators are pure column dataflow (zero UDFs, zero driver
loops) and deterministic: randomness comes from a salted md5 of the
row key reduced to a 60-bit uniform, the same cross-engine trick the
simhash/minhash oracles use, so every row's fate is a pure function of
(key, salt) — reproducible across runs, engines, cluster sizes, and
re-partitioning. That determinism is not a testing convenience: at
100 TB a resumable pipeline must re-derive identical splits after a
partial failure, which ``rand()``-based sampling cannot.

Scale shapes:
- ``split_by_hash`` / ``stratified_sample``: map-only (no shuffle at
  all) — the filter/assignment is a per-row expression.
- ``mixture_report``: one map-side-combined aggregation over strata
  (output rows = number of strata).
- ``pack_sequences``: running token sums are windowed PER GROUP — the
  global-order cumsum a naive implementation would use is a
  single-partition window (the classic scale-killer); here the caller
  shards packing into ``n_groups`` independent streams, so parallelism
  is across groups and each bin is still contiguous within its group.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window, functions as F

# 2^60 — the md5-prefix uniform's denominator (15 hex chars).
_U60 = float(1 << 60)


def _u60(key_col: F.Column, salt: str) -> F.Column:
    """Deterministic uniform in [0, 1): first 15 md5 hex chars of
    (key ‖ salt) as a 60-bit integer over 2^60. Byte-reproducible in
    any engine with md5 (DuckDB mirrors it verbatim)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 15),
            16, 10,
        ).cast("double")
        / F.lit(_U60)
    )


def split_thresholds(weights: Dict[str, float]) -> list:
    """The cumulative [0,1) cutoffs for all but the last split, as the
    EXACT IEEE doubles ``split_by_hash`` compares against. Exposed so a
    cross-engine mirror (the DuckDB oracle) can embed ``repr()`` of the
    same values instead of re-deriving them with a different float
    accumulation order."""
    total = sum(weights.values())
    cum, out = 0.0, []
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append(cum)
    return out


def split_by_hash(df: DataFrame, key_col: str,
                  weights: Dict[str, float],
                  salt: str = "split-v1") -> DataFrame:
    """Assign every row to one named split (train/val/test/…) with the
    given weights — deterministic, map-only, no shuffle.

    The row's uniform u ∈ [0,1) falls into the half-open interval of
    the first split whose cumulative weight exceeds it, so weights
    {train: .8, val: .1, test: .1} give u<.8 → train, u<.9 → val,
    else test. Splits are stable under any re-partitioning and across
    engines (the DuckDB oracle mirrors the md5 arithmetic exactly).
    """
    u = _u60(F.col(key_col), salt)
    names = list(weights)
    expr = None
    for name, cut in zip(names[:-1], split_thresholds(weights)):
        branch = F.when(u < F.lit(cut), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cut), F.lit(name))
    split = (expr.otherwise(F.lit(names[-1]))
             if expr is not None else F.lit(names[-1]))
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Dict[str, float], key_col: str,
                      default_fraction: float = 0.0,
                      salt: str = "sample-v1") -> DataFrame:
    """Keep each row with its stratum's probability — deterministic
    per-key (re-runs keep the SAME rows), map-only, no shuffle.

    Unlike ``DataFrame.sampleBy`` (Bernoulli on a per-task RNG), the
    decision is a pure function of (key, salt): at pipeline scale the
    sample is reproducible after retries/re-partitioning, and
    downstream joins against previously-sampled snapshots line up."""
    u = _u60(F.col(key_col), salt)
    frac = None
    for stratum, f in fractions.items():
        branch = F.when(F.col(strata_col) == stratum, F.lit(float(f)))
        frac = branch if frac is None else frac.when(
            F.col(strata_col) == stratum, F.lit(float(f)))
    frac = (frac.otherwise(F.lit(float(default_fraction)))
            if frac is not None else F.lit(float(default_fraction)))
    return df.filter(u < frac)


def es_key(key_col: F.Column, weight_col: F.Column,
           salt: str = "wsample-v1") -> F.Column:
    """The Efraimidis–Spirakis competition key ln(u)/w for weighted
    sampling WITHOUT replacement (Efraimidis & Spirakis, IPL 2006,
    algorithm A-ES): each row draws u ∈ (0,1) and the k largest
    u^(1/w) form an exact weighted sample without replacement. We
    compete on ln(u)/w — the same ordering (ln is monotone and
    ln(u) < 0, so dividing by a larger w moves the key toward 0) —
    because it avoids pow() and keeps the arithmetic to the ln/divide
    ops the DSIR oracle already proved byte-stable across engines.

    u comes from the salted-md5 60-bit uniform, so the "random" sample
    is a pure function of (key, salt): identical across runs, retries,
    partitionings, and engines — the property a resumable 100-TB
    pipeline needs and rand()-based reservoirs cannot give.
    Non-positive or NULL weights yield a NULL key (never sampled)."""
    u = _u60(key_col, salt)
    w = weight_col.cast("double")
    return F.when(w > 0, F.log(u) / w).otherwise(F.lit(None).cast("double"))


def weighted_sample(df: DataFrame, key_col: str, weight_col: F.Column,
                    k: int, salt: str = "wsample-v1",
                    strata_col: Optional[str] = None) -> DataFrame:
    """Deterministic weighted sampling without replacement: the k rows
    with the largest ``es_key`` (ties broken on the key column — md5
    collisions aside, ties cannot occur). Inclusion probability is
    proportional to weight in the without-replacement sense of A-ES:
    the heaviest rows are near-certain picks, the long tail competes.

    Scale shape: with no strata this is ``ORDER BY … LIMIT k``, which
    Spark compiles to TakeOrderedAndProject — a map-side per-partition
    top-k plus a driver merge of (partitions × k) candidates, NO
    global sort shuffle; right for k up to ~10^6. With ``strata_col``
    the top-k runs per stratum via one hash-partitioned window (one
    shuffle on the stratum key), giving k rows PER stratum — the
    corpus-mixing form (k docs per language/source)."""
    key = es_key(F.col(key_col), weight_col, salt)
    out = df.withColumn("es_key", key).filter(F.col("es_key").isNotNull())
    if strata_col is None:
        return out.orderBy(F.col("es_key").desc(), F.col(key_col)).limit(k)
    w_s = Window.partitionBy(strata_col).orderBy(
        F.col("es_key").desc(), F.col(key_col))
    return (out.withColumn("es_rank", F.row_number().over(w_s))
               .filter(F.col("es_rank") <= k).drop("es_rank"))


def mixture_report(df: DataFrame, strata_col: str, weight_col: F.Column,
                   targets: Optional[Dict[str, float]] = None) -> DataFrame:
    """Per-stratum mixture accounting: row count, total weight (e.g.
    token count), current share, and — when a target mixture is given —
    the sampling multiplier that would hit it (target share / current
    share; >1 means upsample/repeat, <1 means downsample).

    One map-side-combined aggregation; output is one row per stratum.
    This is the planning step of data-mixing (the execution step is
    ``stratified_sample`` with fractions = min(1, multiplier))."""
    agg = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(weight_col.cast("long")).alias("total_weight"),
    )
    w_all = Window.partitionBy()
    # the unpartitioned window here is over the STRATA rows (a handful),
    # not the corpus — post-aggregation, so it never concentrates data.
    agg = agg.withColumn(
        "share",
        F.col("total_weight") / F.sum("total_weight").over(w_all),
    )
    if targets:
        total_t = sum(targets.values())
        t = None
        for stratum, v in targets.items():
            branch = F.when(F.col("stratum") == stratum, F.lit(v / total_t))
            t = branch if t is None else t.when(
                F.col("stratum") == stratum, F.lit(v / total_t))
        agg = agg.withColumn("target_share", t.otherwise(F.lit(0.0)))
        agg = agg.withColumn(
            "multiplier",
            F.when(F.col("share") > 0, F.col("target_share") / F.col("share"))
            .otherwise(F.lit(None).cast("double")),
        )
    return agg


def pack_sequences(df: DataFrame, max_tokens: int, key_col: str,
                   tokens_col: F.Column, n_groups: int = 32) -> DataFrame:
    """Assign documents to fixed-budget training bins (context-window
    packing): within each of ``n_groups`` deterministic shards, docs
    are taken in key order and a new bin starts whenever the running
    token total would pass ``max_tokens``.

    Semantics (documented approximation, standard for throughput
    packing): bin = floor(exclusive-prefix-sum / max_tokens), so a doc
    that straddles a boundary stays whole in the earlier bin and the
    bin may overflow by less than one document; no document is ever
    split. Oversized single docs (> max_tokens) get a bin of their own
    plus the overflow flag.

    Scale shape: the prefix sum is windowed per (group), never
    globally — a global-order cumsum is a one-partition window, the
    exact anti-pattern this engine bans. Groups are ``key % n_groups``
    so the shard assignment is deterministic and oracle-mirrorable;
    size ``n_groups`` ≥ cluster parallelism at real scale.

    Returns the input plus (pack_group, n_tokens, bin_id, bin_overflow).
    """
    g = F.pmod(F.col(key_col).cast("long"), F.lit(n_groups))
    out = df.withColumn("pack_group", g).withColumn(
        "n_tokens", tokens_col.cast("long")
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        out.withColumn(
            "bin_id", F.floor(cum_before / F.lit(max_tokens)).cast("long")
        )
        .withColumn("bin_overflow", F.col("n_tokens") > F.lit(max_tokens))
    )


def global_shuffle(df: DataFrame, key_col: str, n_shards: int,
                   salt: str = "shuffle-v1") -> DataFrame:
    """Deterministic global shuffle for training-shard writing: adds
    ``shard`` (uniform in [0, n_shards)) and ``shard_pos`` (the row's
    position within its shard) — both pure functions of (key, salt),
    so re-running after a failure, on a different cluster size, or on
    a repartitioned input re-derives the identical order (the property
    ``orderBy(rand())`` cannot give a resumable pipeline).

    Scale: the per-shard ``row_number`` window sorts each shard in one
    task — that is the shard writer's inherent unit of work, bounded
    by choosing ``n_shards`` at least the cluster parallelism (shards
    of ~rows/n_shards each, no corpus-wide hot key possible since the
    hash is uniform)."""
    u = _u60(F.col(key_col), salt)
    d = df.withColumn("shard", F.floor(u * n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy(u.asc(), F.col(key_col))
    return d.withColumn("shard_pos", F.row_number().over(w))


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int, salt: str = "shuffle-v1",
                          mode: str = "error") -> None:
    """Shuffle-and-shard sink: :func:`global_shuffle` then one parquet
    directory per shard (``shard=K/``), rows stored in shard order —
    the standard deterministic pre-tokenization layout (readers stream
    shard files independently; epoch variation comes from changing
    ``salt``)."""
    (
        global_shuffle(df, key_col, n_shards, salt)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def apply_mixture(df: DataFrame, strata_col: str, weight_col: F.Column,
                  targets: Dict[str, float], key_col: str,
                  salt: str = "mix-v1") -> DataFrame:
    """EXECUTE a target mixture: each row is emitted ``copies`` times
    where copies = ⌊m⌋ + (1 if u < frac(m) else 0), m = the stratum's
    ``mixture_report`` multiplier and u the row's deterministic
    md5-uniform. One formula covers both directions — m < 1 keeps the
    row with probability m (downsample), m > 1 repeats it ⌊m⌋ or ⌈m⌉
    times (upsample) — so the output's expected per-stratum weight
    share equals the target share.

    Adds ``copy_idx`` (0-based) so downstream can vary per-epoch seeds
    per repeat. Deterministic: re-runs and engines agree row-for-row
    (the DuckDB oracle mirrors the md5 uniform and generate_series).
    Scale shape: the report is |strata| rows → broadcast join;
    the explode is map-only; no shuffle of the corpus beyond the
    report aggregation itself.
    """
    rep = mixture_report(df, strata_col, weight_col, targets).select(
        "stratum", "multiplier"
    )
    u = _u60(F.col(key_col), salt)
    m = F.coalesce(F.col("multiplier"), F.lit(0.0))
    copies = F.floor(m).cast("long") + F.when(
        u < (m - F.floor(m)), F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    return (
        df.join(
            F.broadcast(rep.withColumnRenamed("stratum", strata_col)),
            strata_col, "left",
        )
        .withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)),
        )
        .drop("_copies", "multiplier")
    )


def _word_ngrams_all(text_col, n: int) -> F.Column:
    """Lowercased word n-grams WITH multiplicity (DSIR features count
    occurrences; the dedupe shingle helper deduplicates). Docs shorter
    than ``n`` tokens contribute their whole token run as one gram."""
    toks = F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"),
                    lambda t: t != "")
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array(F.array_join(toks, " ")))


def dsir_importance(docs: DataFrame, target: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    target_text_col: Optional[str] = None,
                    n: int = 2, buckets: int = 4096,
                    smoothing: float = 1.0) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram feature counts are,

        log_weight(x) = Σ_b c_b(x) · (ln p_target[b] − ln p_raw[b]),

    where b ranges over ``buckets`` hashed word-``n``-gram features,
    c_b counts the doc's grams landing in bucket b, and each
    distribution is Laplace-smoothed (+``smoothing`` over
    ``buckets``). The raw distribution is estimated from ``docs``
    itself (the pool being scored, per the paper); ``target`` is the
    small trusted corpus. Returns (id, n_grams, log_weight) — select
    with ``dsir_select`` (top-k, optionally Gumbel-resampled).

    Scale shape: gram→bucket is map-side column math (md5 % buckets —
    byte-reproducible across engines, same idiom as the md5 MinHash
    variant); each distribution is ONE map-combined groupBy whose
    output is ≤``buckets`` rows; scoring aggregates (doc, bucket)
    integer counts, joins the broadcast ``buckets``-row log-ratio
    table, and sums per doc — only bucket ids and counts ever
    shuffle, never text. No UDFs anywhere.
    """
    tcol = target_text_col or text_col
    bucket = lambda g: F.pmod(
        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
        F.lit(buckets),
    )

    def _counts(df, col):
        return (
            df.select(F.explode(_word_ngrams_all(F.col(col), n)).alias("g"))
            .select(bucket(F.col("g")).alias("b"))
            .groupBy("b").agg(F.count("*").alias("cnt"))
        )

    raw = _counts(docs, text_col)
    tgt = _counts(target, tcol).withColumnRenamed("cnt", "tcnt")
    raw_tot = raw.agg(F.sum("cnt").cast("double").alias("rtot"))
    tgt_tot = tgt.agg(
        F.coalesce(F.sum("tcnt"), F.lit(0)).cast("double").alias("ttot")
    )
    denom = float(smoothing) * buckets
    ratio = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            (
                F.log((F.coalesce("tcnt", F.lit(0)) + F.lit(smoothing))
                      / (F.col("ttot") + F.lit(denom)))
                - F.log((F.col("cnt") + F.lit(smoothing))
                        / (F.col("rtot") + F.lit(denom)))
            ).alias("lr"),
        )
    )
    per = (
        docs.select(
            F.col(id_col),
            F.explode(_word_ngrams_all(F.col(text_col), n)).alias("g"),
        )
        .select(F.col(id_col), bucket(F.col("g")).alias("b"))
        .groupBy(id_col, "b").agg(F.count("*").alias("c"))
    )
    scores = (
        per.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lr")).alias("log_weight"),
        )
    )
    return (
        docs.select(id_col).join(scores, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(docs: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                gumbel_salt: Optional[str] = None,
                **kwargs) -> DataFrame:
    """Select the ``k`` most target-like documents by DSIR importance
    weight. With ``gumbel_salt`` set this is true importance
    RESAMPLING (the paper's Gumbel-top-k trick: adding Gumbel(0,1)
    noise to log-weights and taking the top k samples WITHOUT
    replacement ∝ exp(log_weight)) — but deterministic, the noise
    being −ln(−ln(u)) of the row's salted md5-uniform rather than an
    RNG, so re-runs/engines agree row-for-row (the repo-wide
    reproducibility rule; u is clamped away from 0 to keep ln finite).

    Scale: the score table is (id, double); top-k is a
    TakeOrderedAndProject (per-partition heads, never a global sort —
    the single-partition window a naive rank would use is the classic
    scale-killer). Ties break on the id for determinism.
    """
    w = dsir_importance(docs, target, id_col=id_col, text_col=text_col,
                        **kwargs)
    key = F.col("log_weight")
    if gumbel_salt is not None:
        u = _u60(F.col(id_col), gumbel_salt)
        key = key + -F.log(-F.log(F.greatest(u, F.lit(1e-18))))
    ranked = w.withColumn("_k", key).orderBy(
        F.desc("_k"), F.col(id_col)
    ).limit(k)
    return docs.join(
        F.broadcast(ranked.select(id_col, "log_weight")), id_col
    )


def pack_token_windows(df: DataFrame, key_col: str, ids_col: str,
                       seq_len: int, n_shards: int, eos_id: int,
                       salt: str = "pack-v1") -> DataFrame:
    """TRUE GPT-style context-window packing: every document's token
    ids plus a trailing EOS are concatenated into one stream per shard
    and chopped every ``seq_len`` — documents SPLIT across window
    boundaries (unlike :func:`pack_sequences`, which bins whole docs
    for throughput packing). This is the format the training loader
    actually consumes: (shard, window_id, input_ids[seq_len]).

    Deterministic at any parallelism: shard and in-stream order are
    md5-derived from (key, salt) exactly like :func:`global_shuffle`,
    so re-runs, retries and different cluster sizes produce identical
    windows; a new salt is a new epoch permutation.

    Scale shape: one exclusive-prefix-sum window per shard (the same
    per-shard-is-the-unit-of-work bound as ``global_shuffle`` — size
    ``n_shards`` ≥ parallelism), then each doc maps to the ≤
    ⌈n/seq_len⌉+1 windows it touches (pure column ``transform`` +
    ``slice`` — no kernel), and one (shard, window)-keyed shuffle
    reassembles windows from their ordered slices. Token ids shuffle
    once; text never does.

    The final window of each shard is usually short — returned with
    ``complete=false`` rather than silently dropped (filter on it for
    training; Σ over windows of n_ids == Σ doc tokens + one EOS per
    doc, nothing lost).

    Returns (shard, window_id, input_ids, n_ids, n_docs, complete).
    """
    L = int(seq_len)
    u = _u60(F.col(key_col), salt)
    d = df.select(
        F.col(key_col).alias("_k"),
        F.concat(
            F.coalesce(F.col(ids_col), F.array()).cast("array<int>"),
            F.array(F.lit(int(eos_id)).cast("int")),
        ).alias("_ids"),
        F.floor(u * n_shards).cast("int").alias("shard"),
        u.alias("_u"),
    ).withColumn("_n", F.size("_ids").cast("long"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_u"), F.col("_k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_start", F.coalesce(F.sum("_n").over(w), F.lit(0)))
    first = F.floor(F.col("_start") / L)
    last = F.floor((F.col("_start") + F.col("_n") - 1) / L)
    piece = d.select(
        "shard",
        F.explode(
            F.transform(
                F.sequence(first, last),
                lambda k: F.struct(
                    k.alias("window_id"),
                    F.greatest(k * L, F.col("_start")).alias("pos"),
                    F.slice(
                        F.col("_ids"),
                        (F.greatest(k * L, F.col("_start"))
                         - F.col("_start") + 1).cast("int"),
                        (F.least((k + 1) * L,
                                 F.col("_start") + F.col("_n"))
                         - F.greatest(k * L, F.col("_start"))).cast("int"),
                    ).alias("ids"),
                ),
            )
        ).alias("p"),
    ).select("shard", "p.window_id", "p.pos", "p.ids")
    return (
        piece.groupBy("shard", "window_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "ids"))),
                    lambda x: x["ids"],
                )
            ).alias("input_ids"),
            F.count("*").alias("n_docs"),
        )
        .withColumn("n_ids", F.size("input_ids").cast("long"))
        .withColumn("complete", F.col("n_ids") == L)
        .select("shard", "window_id", "input_ids", "n_ids", "n_docs",
                "complete")
    )
