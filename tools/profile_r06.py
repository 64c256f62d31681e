"""Per-query profiling for the r06 optimization round.

Times selected heavy bench rows individually and reports wall seconds
plus the number of Spark jobs each one ran (nextJobId delta) — the
job count is the fixed-overhead multiplier that dominates small-scale
rows. Not part of the frozen bench; numbers are cited in
OPTIMIZATION_r06.md.

Usage: python tools/profile_r06.py [row ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from website_to_agent_spark.session import get_spark

    spark = get_spark(app_name="profile_r06", cores=CPUS,
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext

    def job_id() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint(True)

    rows: dict = {}

    def add(name, fn):
        rows[name] = fn

    from website_to_agent_spark.operators import linkgraph as lg_mod

    add("trustrank", lambda: entry_mod.q_trustrank_hosts(spark, SF_DIR).collect())
    add("pagerank", lambda: entry_mod.q_pagerank_hosts(spark, SF_DIR).collect())
    add("components", lambda: entry_mod.q_connected_components(spark, SF_DIR).count())
    add("harmonic", lambda: lg_mod.harmonic_centrality(
        entry_mod._doc_page_edges(spark, SF_DIR), max_t=6, lgk=11).count())
    add("anf", lambda: lg_mod.hyperball(
        entry_mod._doc_page_edges(spark, SF_DIR), max_t=6, lgk=11).count())

    _lpa_edges = entry_mod._doc_page_edges(spark, SF_DIR)
    _lpa_seeds = _lpa_edges.select(F.col("src").alias("node")).distinct() \
        .filter(F.pmod(F.xxhash64("node"), F.lit(50)) < 2) \
        .select("node",
                F.pmod(F.xxhash64("node", F.lit(1)), F.lit(4))
                .cast("string").alias("label"))
    add("label_prop", lambda: lg_mod.label_propagation(
        _lpa_edges, _lpa_seeds, iters=8).count())
    add("k_core", lambda: lg_mod.k_core(
        entry_mod._doc_page_edges(spark, SF_DIR), 4).count())
    add("triangle", lambda: lg_mod.clustering_coefficient(
        entry_mod._doc_page_edges(spark, SF_DIR)).count())

    add("suffix_arrays", lambda: entry_mod.q_suffix_arrays(spark, SF_DIR).count())

    from website_to_agent_spark.operators import corpus as corpus_mod

    add("corpus_pipeline", lambda: corpus_mod.build_training_corpus(
        docs, domain_col="source", domain_cap=200,
        benchmark=docs.filter(F.col("doc_id") % 37 == 0).limit(50),
        splits={"train": .9, "val": .1}, counts=False)[0]
        .groupBy("split").count().collect())

    from website_to_agent_spark.operators import webtext

    add("lang_id", lambda: webtext.detect_language(
        docs, webtext.train_char_lms(docs))
        .groupBy("lang").count().collect())
    add("ccnet_by_lang", lambda: webtext.perplexity_buckets_by_lang(
        docs, webtext.train_char_lms(docs))
        .groupBy("lang", "bucket").count().collect())
    add("lm_perplexity", lambda: webtext.lm_perplexity(
        docs, webtext.train_char_lm(docs.filter(F.col("lang") == "en")))
        .agg(F.avg("perplexity")).collect())

    from website_to_agent_spark.operators import curation

    add("curation_pass", lambda: curation.decontaminate(
        curation.cap_per_domain(docs, "source", 200),
        docs.filter(F.col("doc_id") % 37 == 0))
        .filter("contaminated").count())
    add("dedup_spans", lambda: curation.remove_duplicate_spans(
        docs.select("doc_id", "text"))
        .agg(F.sum("n_tokens_removed")).collect())

    from website_to_agent_spark.operators import dedupe

    add("minhash_lsh", lambda: dedupe.minhash_lsh_pairs(
        docs, n_hashes=32, bands=8, threshold=0.7).count())

    def _dust():
        from website_to_agent_spark.operators import dust as dust_mod

        d = docs.select("doc_id", F.md5(F.col("text")).alias("digest"))
        canon = d.select(
            F.format_string("https://site%d.example.com/art/%d/",
                            F.col("doc_id") % 50,
                            F.col("doc_id")).alias("url"),
            "digest",
        )
        alias = d.select(
            F.format_string(
                "https://site%d.example.com/art/%d/index.html",
                F.col("doc_id") % 50, F.col("doc_id")).alias("url"),
            "digest",
        )
        pagesd = canon.unionByName(alias)
        rules = dust_mod.dust_rules(pagesd)
        return dust_mod.dust_savings(pagesd, rules).collect()

    add("dust_rules", _dust)

    wanted = sys.argv[1:] or list(rows)
    out = {}
    for name in wanted:
        fn = rows[name]
        j0, t0 = job_id(), time.time()
        fn()
        dt, dj = time.time() - t0, job_id() - j0
        out[name] = (round(dt, 2), dj)
        print(f"{name:18s} {dt:8.2f}s  {dj:4d} jobs", flush=True)
    print({k: v for k, v in out.items()})
    spark.stop()


if __name__ == "__main__":
    main()
