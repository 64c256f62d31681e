"""SparkSession factory tuned for this engine.

Local mode in the sandbox; the same configs are what we'd ship via
``spark-submit --py-files`` to a real cluster (AQE + skew join on,
Arrow on, UTC session TZ for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _ensure_worker_pythonpath() -> None:
    """Make the package importable by executor Python workers.

    On a cluster this is ``spark-submit --py-files engine.zip``; in
    local mode the workers are subprocesses that inherit PYTHONPATH, so
    prepend the package's parent dir before the session starts."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )


def get_spark(
    app_name: str = "website_to_agent_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    _ensure_worker_pythonpath()
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big HTML blobs → keep Arrow batches bounded
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r6: floor the SCAN parallelism at the core count (guide §6 —
        # "spark.sql.files.minPartitionNum sets a floor on scan
        # parallelism"). A compact parquet (text compresses ~10:1, then
        # explodes 100-1000x into shingles/grams) otherwise reads as
        # ONE split and every downstream map stage — regex scrubs,
        # shingle explodes, Arrow kernels, map-side partial aggs —
        # serializes on one core regardless of cluster size. The floor
        # is derived from the session's core count, and big inputs are
        # untouched (the effective split size is still capped by
        # maxPartitionBytes, so a 100 TB table splits exactly as
        # before). openCostInBytes is lowered in proportion so the
        # floor can actually bite on sub-4MB files; at scale the
        # packing difference only affects directories of tiny files,
        # which this engine's sinks never produce (128MB-1GB targets).
        .config("spark.sql.files.minPartitionNum", str(cores))
        .config("spark.sql.files.openCostInBytes", str(16 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
