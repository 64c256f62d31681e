"""Idle A/B of the minhash_lsh bench row against an older tree (r4
verdict ask #7: confirm the r4 8.34 s reading was host load, not a
regression from the max_bucket/Observation plumbing).

Usage: python tools/minhash_ab.py <repo_root> [cpus]
Times exactly the suite's call — ``minhash_lsh_pairs(docs, n_hashes=32,
bands=8, threshold=0.7).count()`` over sf0.1 documents, localCheckpointed
input, one warm run then three timed runs — and prints one JSON line.
Run as a COLD child per tree (CacheManager warm-A/B trap,
BENCH/BASELINE.md).
"""
import json
import os
import sys
import time

root = sys.argv[1]
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
sys.path.insert(0, root)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("minhash-ab")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", "48g")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from website_to_agent_spark.operators import dedupe  # noqa: E402

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
docs = spark.read.parquet(f"{sf}/documents.parquet").localCheckpoint(True)


def run():
    return dedupe.minhash_lsh_pairs(
        docs, n_hashes=32, bands=8, threshold=0.7).count()


n = run()  # warm codegen, as the suite's earlier rows do implicitly
ts = []
for _ in range(3):
    t0 = time.time()
    run()
    ts.append(round(time.time() - t0, 3))
print(json.dumps({
    "tree": root, "cpus": cpus, "pairs": n, "secs": ts,
    "min": min(ts),
    "loadavg": [round(x, 2) for x in os.getloadavg()],
}))
spark.stop()
