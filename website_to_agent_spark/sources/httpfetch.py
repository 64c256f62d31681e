"""Production fetch stage (S1/S2): batch HTTP GET as a ``mapInPandas``
kernel.

In the sandbox the crawl engine "fetches" by joining the frontier
against the Common-Crawl-style ``pages`` table (the BASELINE input
hint); on a live cluster the same slot is this kernel — the Spark-side
contract is identical (drained frontier batch in, one row per URL out,
misses as ``success=false`` rows, never dropped).

Reference semantics reproduced (crawl4ai_client.py:56-75,142-156 and
url_seeder.py:54-59,119-137):
- persistent per-executor session with a browser User-Agent header
  (``crawl4ai_client.py:58-64``) — built once per Python worker via a
  module-level cache, reused across Arrow batches;
- per-request timeout, default 30 s (``config.py:44``);
- HTTP errors / timeouts / connection failures become
  ``success=false`` rows carrying the error string
  (``crawl4ai_client.py:142-156``), routed to the failed set upstream;
- status code and content type are returned as columns so the engine's
  F8/F9 gates stay declarative Column filters.

Scale notes:
- One task = one Arrow batch of URLs fetched sequentially with an
  optional per-host minimum interval; global politeness (token
  buckets, robots) is enforced UPSTREAM by the drain quotas, so this
  kernel never needs cross-task coordination.
- I/O-bound: size the frontier drain so tasks ≫ cores and slow hosts
  don't stall a whole executor; ``spark.task.cpus=1`` with high task
  counts is the right shape (network wait overlaps across tasks).
"""

from __future__ import annotations

import time as _time
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_USER_AGENT = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36"
)  # crawl4ai_client.py:60-62

FETCHED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("elapsed_s", T.DoubleType(), True),
    ]
)

_SESSION = None  # one per executor Python worker (S2)


def _session(user_agent: str):
    global _SESSION
    if _SESSION is None:
        import requests

        s = requests.Session()
        s.headers.update({"User-Agent": user_agent})
        _SESSION = s
    return _SESSION


def http_fetch(
    urls: DataFrame,
    timeout_s: float = 30.0,
    user_agent: str = DEFAULT_USER_AGENT,
    min_interval_s: float = 0.0,
    url_col: str = "url",
) -> DataFrame:
    """GET every URL in ``urls``; one output row per input row.

    ``min_interval_s`` sleeps between consecutive requests within a
    task (the reference's 0.5 s batch pacing, ``url_seeder.py:88``) —
    coarse in-task pacing only; real politeness is the upstream
    per-host drain quota.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sess = _session(user_agent)
        for pdf in batches:
            out = {k: [] for k in (
                "url", "status_code", "content_type", "html",
                "success", "error", "elapsed_s",
            )}
            for u in pdf[url_col]:
                t0 = _time.time()
                status: Optional[int] = None
                ctype: Optional[str] = None
                body: Optional[bytes] = None
                err: Optional[str] = None
                ok = False
                try:
                    resp = sess.get(u, timeout=timeout_s)
                    status = int(resp.status_code)
                    ctype = resp.headers.get("Content-Type")
                    body = resp.content
                    ok = 200 <= status < 300
                    if not ok:
                        err = f"HTTP {status}"
                except Exception as e:  # noqa: BLE001 — any transport error
                    err = f"{type(e).__name__}: {e}"[:500]
                out["url"].append(u)
                out["status_code"].append(status)
                out["content_type"].append(ctype)
                out["html"].append(body)
                out["success"].append(ok)
                out["error"].append(err)
                out["elapsed_s"].append(_time.time() - t0)
                if min_interval_s > 0:
                    _time.sleep(min_interval_s)
            yield pd.DataFrame(out)

    return urls.select(url_col).mapInPandas(_kernel, schema=FETCHED)
