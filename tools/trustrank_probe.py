"""Stage-level decomposition of the trustrank iteration cost (r5,
north-rule evidence companion to BENCH/SCALING_r05_trustrank_*.json).

The per-iteration plan after the r5 loop fix is: broadcast the
node-scale ranks table into the pre-partitioned 18M-edge table (zero
edge-side exchange), then ONE dst-keyed aggregation of the weighted
contributions — the only shuffle in the loop. This probe times that
dominant stage IN ISOLATION (pure whole-stage codegen + one exchange
with map-side partial agg, no Python, no loop fixed costs) at two
parallelism levels, exactly like the inverted_index decomposition in
BENCH/BASELINE.md: if the bare stage shows the same sub-linear ceiling
as the full operator, the limit is the host's shared memory bandwidth
(edge rows are very light per byte), not the plan.

Usage: python tools/trustrank_probe.py <cpus> [mult]
Prints one JSON line with the timings; run in a COLD child per level
(the CacheManager warm-A/B trap documented in BENCH/BASELINE.md).
"""
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("trustrank-probe")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # identical deterministic power-law graph to bench.py's
    # trustrank-scaling mode (24M raw links -> ~18M weighted edges)
    n_raw = mult * 250_000
    n_hosts = mult * 2_500
    edges = (
        spark.range(n_raw)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_hosts)).alias("s"),
            F.pmod(
                F.xxhash64("id", F.lit(1)),
                F.pow(F.lit(2.0),
                      F.pmod(F.xxhash64("id", F.lit(2)), F.lit(18))
                      .cast("double")).cast("long") + 1,
            ).alias("d"),
        )
        .select(
            F.concat(F.lit("h"), F.col("s").cast("string"),
                     F.lit(".com")).alias("src"),
            F.concat(F.lit("h"), F.col("d").cast("string"),
                     F.lit(".com")).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
        .repartition("src")
        .sortWithinPartitions("src")
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()

    ranks = (
        edges.select(F.col("src").alias("node")).distinct()
        .select("node", F.lit(1e-5).alias("r"))
        .localCheckpoint(eager=True)
    )

    def timed(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    # stage A: bare edge scan + dst-keyed agg (no join) — the
    # exchange-bearing half of an iteration, pure codegen
    def stage_scan_agg():
        edges.groupBy("dst").agg(F.sum("w")).count()

    # stage B: the full per-iteration body — broadcast rank join,
    # weighted contribution, dst-keyed agg
    def stage_join_agg():
        (edges.join(F.broadcast(ranks),
                    edges["src"] == ranks["node"])
         .groupBy("dst")
         .agg(F.sum(F.col("w") * F.col("r")).alias("c"))
         .count())

    stage_scan_agg()  # warm codegen/JIT once
    a = [timed(stage_scan_agg) for _ in range(3)]
    stage_join_agg()
    b = [timed(stage_join_agg) for _ in range(3)]

    # setup-vs-iteration split of the FULL operator: t(k) = S + k*I,
    # so S = (6*t1 - t6)/5 and I = (t6 - t1)/5. S is the one-time
    # per-call cost (nodes distinct + outw + the 18M-row repartition/
    # sort/checkpoint of the pre-joined edge table); I is the marginal
    # per-iteration cost (broadcast rank join + dst agg + dangling +
    # node-scale checkpoint). Their scaling differs, and the bench
    # pair times t(6), which blends them 6:1 by iteration count but
    # S-heavy by seconds.
    from website_to_agent_spark.operators import linkgraph

    bench_edges = (
        edges.select(F.col("src").alias("src_host"),
                     F.col("dst").alias("dst_host"),
                     F.col("w").alias("weight"))
        .localCheckpoint(eager=True)
    )
    seeds = [f"h{i}.com" for i in range(20)]

    def tr(k):
        return linkgraph.trustrank(
            bench_edges, seeds, iters=k, src_col="src_host",
            dst_col="dst_host", weight_col="weight").count()

    tr(1)  # warm plan shapes once, as the bench does
    t1 = timed(lambda: tr(1))
    t6 = timed(lambda: tr(6))
    setup = round((6 * t1 - t6) / 5, 3)
    per_iter = round((t6 - t1) / 5, 3)
    print(json.dumps({
        "cpus": cpus, "mult": mult, "edges": n_edges,
        "scan_agg_secs": a, "scan_agg_min": min(a),
        "join_agg_secs": b, "join_agg_min": min(b),
        "tr_t1": t1, "tr_t6": t6,
        "tr_setup_est": setup, "tr_per_iter_est": per_iter,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
