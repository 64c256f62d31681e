"""A11/T4: the LLM-agent stage as Spark dataflow.

The reference calls a model per document and, on context-length
failure, trims the content 60/20/20 and retries
(`/root/reference/src/agents.py:70-297`, retry loop
`agents.py:136-222`). This module gives that loop its engine shape:

- ``llm_map``: a ``mapInPandas`` batch stage that sends each row's
  input to an injected ENDPOINT (``Callable[[list[str]],
  list[tuple[bool, str]]]`` — batch of prompts → (ok, completion)
  pairs). The endpoint is a plain picklable callable, so a production
  deployment passes an HTTP/SDK client wrapper; this sandbox has no
  network, so tests use ``DeterministicEndpoint`` (a context-window
  stand-in that fails inputs over ``max_chars`` — exactly the failure
  the reference's retry loop handles).
- The T4 retry loop is driver-side dataflow: attempt k re-runs ONLY
  the still-failing remainder with the next (smaller) ``max_tokens``
  from the schedule, trimming the ORIGINAL text each time
  (``textquality.trim_intelligently`` — the reference's 60/20/20
  trim), and unions the successes. Each attempt is one distributed
  pass over O(failures) rows; attempts are bounded by the schedule
  length.

Everything around the endpoint call is Catalyst dataflow, and with the
deterministic endpoint the WHOLE loop is SQL-mirrorable — the driver
contract checks it value-exact against DuckDB (``llm_retry_summaries``
in ``__spark_entry__.py``).
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from website_to_agent_spark.operators import textquality as tq

Endpoint = Callable[[List[str]], List[Tuple[bool, str]]]


class DeterministicEndpoint:
    """Network-free model stand-in with a hard context window:
    inputs longer than ``max_chars`` fail (the retryable error);
    otherwise the completion is a deterministic digest of the input —
    mirrorable in SQL, so the retry loop gets a value-exact oracle."""

    def __init__(self, max_chars: int = 300):
        self.max_chars = max_chars

    def __call__(self, prompts: List[str]) -> List[Tuple[bool, str]]:
        out: List[Tuple[bool, str]] = []
        for p in prompts:
            p = p or ""
            if len(p) > self.max_chars:
                out.append((False, ""))
            else:
                out.append((True, f"OK({len(p)}):{p[:40]}"))
        return out


def llm_map(
    docs: DataFrame,
    endpoint: Endpoint,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    max_tokens_schedule: Sequence[int] = (100, 50),
) -> DataFrame:
    """Batch-LLM stage with the reference's trim-and-retry loop.

    Returns ``id_cols + (completion string, ok boolean, attempts int)``.
    Attempt 1 sends the RAW text — the reference's first full-content
    call (`agents.py:136-150`) trims nothing, so documents between
    ``schedule[0]*4`` chars and the model window keep their middle.
    The schedule is retry-only: retry k feeds the endpoint
    ``trim_intelligently(text, schedule[k-1])`` of the ORIGINAL text,
    so total attempts = 1 + len(schedule). Rows failing every attempt
    come back ``ok=false`` with their last attempt count — the caller
    decides whether that is fatal (the reference logs and skips,
    `agents.py:214-222`)."""
    ids = list(id_cols)

    def _call(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = endpoint(list(pdf["_input"]))
            out = pdf[ids].copy()
            out["ok"] = [r[0] for r in res]
            out["completion"] = [r[1] for r in res]
            yield out

    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in docs.select(*ids).schema.fields
    )
    out_schema = f"{id_schema}, ok boolean, completion string"

    remaining = docs.select(*ids, F.col(text_col).alias("_text"))
    done_parts: list[DataFrame] = []
    attempts = 0
    # None = the raw full-content first attempt; each schedule entry
    # is one trimmed retry
    for max_tokens in (None, *max_tokens_schedule):
        attempts += 1
        attempt_in = remaining.withColumn(
            "_input",
            F.col("_text")
            if max_tokens is None
            else tq.trim_intelligently(F.col("_text"), max_tokens),
        )
        result = attempt_in.select(*ids, "_input").mapInPandas(
            _call, schema=out_schema
        )
        # one pass per attempt; the remainder shrinks monotonically
        result = result.localCheckpoint(eager=True)
        done_parts.append(
            result.filter(F.col("ok")).withColumn(
                "attempts", F.lit(attempts)
            )
        )
        failed_ids = result.filter(~F.col("ok")).select(*ids)
        # no broadcast hint: on attempt 1 over a web-scale corpus the
        # failure set can exceed broadcast limits — AQE picks the join
        # strategy from the checkpointed result's runtime stats
        remaining = remaining.join(failed_ids, ids, "left_semi")
        if result.filter(~F.col("ok")).isEmpty():
            remaining = None
            break

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    if remaining is not None:
        exhausted = remaining.select(
            *ids,
            F.lit(False).alias("ok"),
            F.lit("").alias("completion"),
            F.lit(attempts).alias("attempts"),
        )
        out = out.unionByName(exhausted)
    return out.select(*ids, "completion", "ok", "attempts")
