"""TTL result cache (SURVEY §2.1 S7).

The reference caches discovery results for 7 days with a ``force``
bypass (`test_async_url_seeder.py:88`, `test_url_seeder.py:452-514`).
Spark shape: a parquet/Iceberg results table keyed by (cache_key) with
a ``fetched_ts`` freshness predicate; ``force=True`` overwrites the
snapshot.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta, timezone
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_TTL = timedelta(days=7)


def cache_key(**config) -> str:
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:24]


class ResultCache:
    def __init__(self, spark: SparkSession, root: str,
                 ttl: timedelta = DEFAULT_TTL):
        self.spark = spark
        self.root = root
        self.ttl = ttl
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, f"key={key}")

    def get_or_compute(
        self,
        key: str,
        compute: Callable[[], DataFrame],
        force: bool = False,
        now: Optional[datetime] = None,
    ) -> tuple[DataFrame, bool]:
        """Returns (result, was_cached). A hit requires every row's
        ``_fetched_ts`` to be within TTL (freshness predicate); stale or
        missing or ``force`` recomputes and overwrites the snapshot."""
        now = now or datetime.now(timezone.utc)
        path = self._path(key)
        marker = os.path.join(path, "_SUCCESS")
        if not force and os.path.exists(marker):
            cached = self.spark.read.parquet(path)
            cutoff = (now - self.ttl).replace(tzinfo=None)
            stale = cached.filter(
                F.col("_fetched_ts") < F.lit(cutoff)
            ).isEmpty()
            if stale:  # no stale rows → fresh hit
                return cached.drop("_fetched_ts"), True
        df = compute().withColumn(
            "_fetched_ts", F.lit(now.replace(tzinfo=None)).cast("timestamp")
        )
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path).drop("_fetched_ts"), False
