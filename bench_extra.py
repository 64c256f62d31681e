"""r06 optimization-round isolation benchmarks (guide §1.4).

NOT part of the frozen driver bench — `bench.py` is the measured
artifact. These probes isolate the operators the r06 round touched so
the before/after numbers cited in OPTIMIZATION_r06.md are
reproducible: each probe warms once, then reports wall seconds and the
Spark job-count delta (the fixed-overhead multiplier at small scale)
for 3 runs. Where a row includes a driver collect in the frozen bench,
the probe keeps the same action so numbers stay comparable.

Usage: python bench_extra.py [probe ...]
  probes: redirect crawl_parity crawl_prod lm simhash soft404 suffix
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from website_to_agent_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext

    def jid() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    docs = spark.read.parquet(
        f"{SF_DIR}/documents.parquet").localCheckpoint(True)
    probes: dict = {}

    # -- redirect whole-store resolution (linear left-join chain) -----
    def _redirect():
        from website_to_agent_spark.operators import redirects as rd

        m10 = F.col("doc_id") % 10
        u = F.format_string("https://r.example.com/p/%d.html",
                            F.col("doc_id"))
        store = docs.select(
            u.alias("url"),
            F.when(m10.isin(1, 2, 3, 4),
                   F.format_string("https://r.example.com/p/%d.html",
                                   F.col("doc_id") - 1))
            .when(m10 == 6,
                  F.format_string("https://r.example.com/p/%d.html",
                                  F.col("doc_id") + 1))
            .when(m10 == 7,
                  F.format_string("https://r.example.com/p/%d.html",
                                  F.col("doc_id") - 1))
            .alias("redirect_to"))
        return lambda: rd.final_destinations(store).count()

    probes["redirect"] = _redirect

    # -- crawl supersteps (slim hit-key probe, gated-batch ckpt) ------
    def _crawl(prod: bool):
        from website_to_agent_spark.operators.crawl import (CrawlEngine,
                                                            CrawlJob)

        n = docs.count()
        base_pages = entry_mod.pages_from_documents(
            spark, SF_DIR).localCheckpoint(eager=True)
        jobs = [CrawlJob(f"job{i}",
                         f"https://docs.example.com/d/{(i * 37) % n}.html",
                         max_urls=15) for i in range(16)]
        kw: dict = {}
        if prod:
            kw = {"robots": spark.createDataFrame(
                [("docs.example.com", [], 0.005)],
                "host string, disallow array<string>, crawl_delay double"),
                "use_bloom": True}

        def run():
            res = CrawlEngine(spark, base_pages, mode="client", **kw).run(jobs)
            out = res.crawled.count()
            res.unpersist()
            return out

        return run

    probes["crawl_parity"] = lambda: _crawl(False)
    probes["crawl_prod"] = lambda: _crawl(True)

    # -- char-LM family (Arrow-kernel train + score) ------------------
    def _lm():
        from website_to_agent_spark.operators import webtext

        def run():
            webtext.detect_language(
                docs, webtext.train_char_lms(docs)
            ).groupBy("lang").count().collect()
            webtext.perplexity_buckets_by_lang(
                docs, webtext.train_char_lms(docs)
            ).groupBy("lang", "bucket").count().collect()
            webtext.lm_perplexity(
                docs, webtext.train_char_lm(
                    docs.filter(F.col("lang") == "en"))
            ).agg(F.avg("perplexity")).collect()

        return run

    probes["lm"] = _lm

    # -- SimHash kernel (both hash families) --------------------------
    def _simhash():
        from website_to_agent_spark.operators import dedupe

        def run():
            dedupe.simhash(docs, "doc_id", "text", "xxhash64").count()
            dedupe.simhash(docs, "doc_id", "text", "md5").count()

        return run

    probes["simhash"] = _simhash

    # -- soft-404 (probe build + classify, single-pass) ---------------
    def _soft404():
        from website_to_agent_spark.operators import soft404 as s4

        tmpl = ("page not found the requested document does not exist "
                "on this server please check the address or return to "
                "the home page and use the site search ") * 6
        host = F.format_string("host%d.example.com", F.col("doc_id") % 50)
        path = F.format_string("/p/%d", F.col("doc_id"))
        soft_host = (F.col("doc_id") % 50) < 10
        is_tmpl = soft_host & (F.col("doc_id") % 7 == 0)
        crawled = docs.select(
            F.concat(F.lit("http://"), host, path).alias("url"),
            F.when(is_tmpl,
                   F.concat(F.lit(tmpl + " requested path "), path,
                            F.lit(" was not found")))
            .otherwise(F.col("text")).alias("text"))
        probes_store = s4.probe_paths(
            docs.filter(soft_host).select(host.alias("host"))
        ).select(F.col("probe_url").alias("url"),
                 F.lit(tmpl + " requested path /probe was not found")
                 .alias("text"))

        def run():
            p = s4.probe_signatures(
                crawled.unionByName(probes_store), text_col="text")
            return s4.classify_soft404(
                crawled, p, max_hamming=8).filter(F.col("soft404")).count()

        return run

    probes["soft404"] = _soft404

    # -- suffix array (window-lead prefix doubling) -------------------
    probes["suffix"] = lambda: (
        lambda: entry_mod.q_suffix_arrays(spark, SF_DIR).count())

    wanted = sys.argv[1:] or list(probes)
    for name in wanted:
        fn = probes[name]()
        fn()  # warm
        for i in range(3):
            j0, t0 = jid(), time.time()
            fn()
            print(f"{name:14s} run{i}: {time.time() - t0:7.2f}s "
                  f"jobs={jid() - j0}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
