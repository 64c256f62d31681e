"""Mirror-host detection — find host PAIRS serving replicated content
so the frontier crawls only one of each (Bharat & Broder, "Mirror,
mirror on the Web: A study of host pairs with replicated content",
WWW'99; Cho, Shivakumar & Garcia-Molina, "Finding replicated Web
collections", SIGMOD'00 — public papers, independent implementation).

Mirrors are the HOST-level form of the alias problem: kernel.org
mirrors, national Debian/CPAN mirrors, CDN vanity hosts. URL-level
dedup (``operators/dust.py``, ``canonical_url``) cannot see them —
the urls share nothing — but their CONTENT does: a mirrored host pair
shares most of its page digests. The reference crawls every host it
is given (`crawl4ai_client.py` has no cross-host content model); at a
10^10-URL frontier, skipping the replica side of known mirrors is a
double-digit-percent fetch saving on real crawls (the WWW'99 study
measured ~10 % of hosts participating in mirroring).

Dataflow (pure Catalyst; the same single-shuffle bucket shape as
``dedupe.banded_candidate_pairs`` with the digest as the band key):

1. (host, digest) profile — distinct page digests per host.
2. digest-keyed groupBy collects each digest's host list; digests on
   more than ``max_hosts`` hosts are DROPPED as stop-digests (empty
   pages, cookie banners, "It works!" defaults — shared boilerplate
   evidences nothing about mirroring, and one such digest at corpus
   scale would expand to a single-task quadratic bomb). The drop is
   the max_df/stopword discipline, bounded and deterministic.
3. every i<j host pair in a bucket expands inline → one map-side-
   combined (host_a, host_b) count = |shared digests|.
4. per-host profile sizes broadcast back; Jaccard
   |A∩B| / (|A|+|B|−|A∩B|) gates the pair report.

``mirror_clusters`` folds pairs into connected components (reusing
``dedupe.near_dup_clusters``'s election: the lexicographically
smallest host is the cluster's canonical — deterministic, engine-
independent) and ``exclude_mirror_hosts`` drops frontier candidates
whose host is a NON-canonical cluster member — a broadcast-size join
against a host-granular table, zero shuffle on the frontier.

Scale shape: the profile is one distinct over (host, digest); the
bucket stage shuffles slim (digest-hash, host) rows once; pair counts
are map-side combinable because a pair's evidence rows are spread
across digest buckets; host-granular outputs broadcast. No iteration,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from website_to_agent_spark.functions import urlfns


def host_digest_profiles(pages: DataFrame, url_col: str = "url",
                         digest_col: str = "digest") -> DataFrame:
    """(host, dig) — distinct content digests per host (digest
    pre-hashed to a long: equality is all downstream needs)."""
    return pages.select(
        F.lower(urlfns.netloc(F.col(url_col))).alias("host"),
        F.xxhash64(F.col(digest_col)).alias("dig"),
    ).distinct()


def mirror_host_pairs(pages: DataFrame, url_col: str = "url",
                      digest_col: str = "digest",
                      min_shared: int = 3,
                      min_jaccard: float = 0.5,
                      max_hosts: int = 64) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, jaccard) — host pairs whose
    distinct-digest profiles overlap by ≥ ``min_shared`` pages AND
    ≥ ``min_jaccard``; host_a < host_b. ``max_hosts`` is the
    stop-digest bound (step 2 in the module docstring)."""
    prof = host_digest_profiles(pages, url_col, digest_col)
    sizes = prof.groupBy("host").agg(F.count("*").alias("n"))
    buckets = (
        prof.groupBy("dig")
        .agg(F.collect_list("host").alias("hosts"))
        .filter((F.size("hosts") > 1)
                & (F.size("hosts") <= F.lit(int(max_hosts))))
        .select(F.array_sort("hosts").alias("hosts"))
    )
    pair = F.flatten(
        F.transform(
            "hosts",
            lambda h, i: F.transform(
                F.slice(F.col("hosts"), i + F.lit(2), F.size("hosts")),
                lambda g: F.struct(h.alias("host_a"), g.alias("host_b")),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(pair).alias("p"))
        .groupBy("p.host_a", "p.host_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= F.lit(int(min_shared)))
    )
    na = sizes.withColumnsRenamed({"host": "host_a", "n": "n_a"})
    nb = sizes.withColumnsRenamed({"host": "host_b", "n": "n_b"})
    out = (
        shared.join(F.broadcast(na), "host_a")
        .join(F.broadcast(nb), "host_b")
        .withColumn(
            "jaccard",
            F.col("shared")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= F.lit(float(min_jaccard)))
    )
    return out.select("host_a", "host_b", "shared", "n_a", "n_b",
                      "jaccard")


def mirror_clusters(pairs: DataFrame) -> DataFrame:
    """(host, canonical) — connected components over the mirror-pair
    graph; ``canonical`` is the cluster's lexicographically smallest
    host (Bharat-Broder's mirror sets, with a deterministic
    representative). Reuses the dedup cluster election."""
    from website_to_agent_spark.operators.dedupe import near_dup_clusters

    renamed = pairs.select(
        F.col("host_a").alias("doc_a"), F.col("host_b").alias("doc_b"))
    # component label IS the min member — the canonical host
    return near_dup_clusters(renamed).select(
        F.col("doc_id").alias("host"),
        F.col("cluster_id").alias("canonical"),
    )


def exclude_mirror_hosts(candidates: DataFrame, clusters: DataFrame,
                         url_col: str = "url") -> DataFrame:
    """Frontier hygiene: drop candidates whose host is a NON-canonical
    member of a mirror cluster (the canonical host's urls crawl
    normally; hosts in no cluster are untouched). The cluster table is
    host-granular — broadcast anti-join, no frontier shuffle."""
    dropped = clusters.filter(
        F.col("host") != F.col("canonical")).select("host")
    keyed = candidates.withColumn(
        "_mh", F.lower(urlfns.netloc(F.col(url_col))))
    return keyed.join(
        F.broadcast(dropped.withColumnRenamed("host", "_mh")),
        "_mh", "left_anti",
    ).drop("_mh")
