"""Stateful Structured-Streaming operators (SURVEY §2.8).

The batch engine's URL-seen set is a checkpointed table probed with a
``left_anti`` join (reference: ``visited_urls`` set, url_seeder.py:30-32;
``scraped_set``, crawl4ai_client.py:213).  In the continuously-arriving
pages case the same semantics become *stateful streaming dedup*: state
keyed by host (the natural shard — one crawler politeness domain), value
= the set of url fingerprints already emitted, carried across
micro-batches by ``applyInPandasWithState``.

Scale notes (10^10-URL frontier):
- State is keyed by ``host`` so it shards across executors exactly like
  the batch engine's salted reg_domain partitioning; no global set.
- Per-key state stores 8-byte xxhash-style fingerprints, not URL
  strings: ~80 GB total at 10^10 URLs, spread over the key space, and
  the RocksDB state store (``spark.sql.streaming.stateStore
  .providerClass``) keeps it off-heap / on-disk per executor.
- Exactly-once: state commits with the micro-batch epoch, so a killed
  job resumes without re-emitting already-seen URLs — the streaming
  twin of the batch engine's superstep bundle checkpoint (T5).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType, TimestampType,
)

DEDUP_OUT = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
])

# State = the fingerprint set of URLs already emitted for this host.
DEDUP_STATE = StructType([StructField("fps", ArrayType(LongType()))])


def _fp(url: str) -> int:
    """Stable 63-bit fingerprint (sha256-derived; deterministic across
    executors and Python hash seeds, unlike builtin ``hash``)."""
    return int.from_bytes(
        hashlib.sha256(url.encode("utf-8", "replace")).digest()[:8], "big"
    ) & 0x7FFFFFFFFFFFFFFF


def _dedup_fn(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        mask = []
        for url in pdf["url"]:
            f = _fp(url)
            if f in seen:
                mask.append(False)
            else:
                seen.add(f)
                mask.append(True)
        out = pdf.loc[mask, ["host", "url", "warc_ts"]]
        if len(out):
            yield out
    state.update((list(seen),))


def streaming_seen_dedup(pages_stream: DataFrame) -> DataFrame:
    """First-seen-wins URL dedup across micro-batches, keyed by host.

    Streaming twin of the batch ``left_anti`` vs the ``seen`` table
    (J2 / F10): a URL is emitted the first time it arrives on the
    stream and suppressed forever after, even across restarts (state
    lives in the streaming checkpoint).
    """
    keyed = pages_stream.select(
        F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
        "url",
        "warc_ts",
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BUDGET_STATE = StructType([StructField("admitted_total", LongType())])


def _budget_fn_factory(per_batch: int):
    def _fn(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        admitted = 0
        for pdf in pdfs:
            room = max(0, per_batch - admitted)
            take = pdf.iloc[:room]
            admitted += len(take)
            if len(take):
                yield take[["host", "url", "warc_ts"]]
        state.update((total + admitted,))
    return _fn


def streaming_polite_admit(pages_stream: DataFrame,
                           per_batch: int = 5) -> DataFrame:
    """Per-host admission budget per micro-batch — the streaming form of
    the politeness drain quota (T2: ≤5 concurrent fetches per batch,
    url_seeder.py:63-65).  State carries the cumulative admitted count
    per host (a metrics surface; the cap itself is per-trigger)."""
    keyed = pages_stream.select(
        F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
        "url",
        "warc_ts",
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _budget_fn_factory(per_batch),
        outputStructType=DEDUP_OUT,
        stateStructType=BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# State = per-host template → cumulative admitted count, stored as two
# parallel arrays (applyInPandasWithState state rows are flat structs).
TRAP_STATE = StructType([
    StructField("templates", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
])


def _trap_fn_factory(max_urls: int):
    def _fn(key, pdfs, state: GroupState):
        if state.exists:
            templates, counts = state.get
            seen = dict(zip(templates, counts))
        else:
            seen = {}
        for pdf in pdfs:
            mask = []
            for tmpl in pdf["template"]:
                n = seen.get(tmpl, 0)
                ok = n < max_urls
                if ok:
                    seen[tmpl] = n + 1
                mask.append(ok)
            out = pdf.loc[mask, ["host", "url", "warc_ts"]]
            if len(out):
                yield out
        state.update((list(seen.keys()), list(seen.values())))
    return _fn


def streaming_trap_guard(pages_stream: DataFrame,
                         trap_max_urls: int = 32) -> DataFrame:
    """Streaming twin of ``CrawlEngine(trap_max_urls=...)`` — a
    cumulative per-(host, url-template) admission cap carried across
    micro-batches (suppressed = input − output; the per-template
    counts live in the state store).

    The template collapse (operators/traps.py ``url_template``) runs
    CATALYST-side before the stateful grouping, so the Python state
    function only counts pre-computed strings. Unlike the batch
    guard's one-superstep lag, rows stream through the state function
    in arrival order, so the cap here is EXACT — the template's
    ``trap_max_urls``-th url is the last one admitted, within and
    across micro-batches (state commits with the epoch: a restart
    resumes the counts, same T5 discipline as the other stateful
    ops). State is host-sharded like the seen-dedup fingerprints;
    per-host template dictionaries are bounded by the collapse
    (a trap's unbounded URLs are ONE state entry).
    """
    from website_to_agent_spark.functions import urlfns
    from website_to_agent_spark.operators.traps import url_template

    keyed = pages_stream.select(
        F.lower(urlfns.netloc(F.col("url"))).alias("host"),
        url_template(F.col("url")).alias("template"),
        "url",
        "warc_ts",
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _trap_fn_factory(trap_max_urls),
        outputStructType=DEDUP_OUT,
        stateStructType=TRAP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
