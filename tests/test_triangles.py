"""Triangle counting + clustering coefficient vs a brute-force Python
mirror (itertools over adjacency sets) — exactness on a deterministic
pseudo-random graph, closed forms on a clique and a star, robustness
to directed duplicates / self-loops, partition invariance."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import linkgraph


def _mirror(pairs):
    """Per-node triangle counts + coefficients from raw (possibly
    directed, possibly self-looped, possibly duplicated) pairs."""
    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        for v, w in combinations(sorted(nbrs), 2):
            if w in adj.get(v, ()):
                tri[n] += 1
    coeff = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        coeff[n] = 2.0 * tri[n] / (d * (d - 1)) if d >= 2 else 0.0
    return {n: (len(adj[n]), tri[n], coeff[n]) for n in adj}


def _pairs_pseudorandom(n=40):
    # deterministic quadratic-residue-ish edge rule: dense enough to
    # close many triangles, includes directed duplicates + a self-loop
    pairs = []
    for i in range(n):
        for k in (1, 2, 3, 5, 8):
            j = (i * i + k * i + k) % n
            pairs.append((f"n{i}", f"n{j}"))  # self-loop when j == i
    pairs += [(d, s) for (s, d) in pairs[: n // 2]]  # directed dupes
    return pairs


def test_triangles_match_bruteforce_mirror(spark):
    pairs = _pairs_pseudorandom()
    df = spark.createDataFrame(pairs, "src string, dst string")
    out = {r.node: (r.deg, r.triangles, r.coeff)
           for r in linkgraph.clustering_coefficient(df).collect()}
    exp = _mirror(pairs)
    assert set(out) == set(exp)
    for n in exp:
        assert out[n][0] == exp[n][0], f"deg mismatch at {n}"
        assert out[n][1] == exp[n][1], f"tri mismatch at {n}"
        assert out[n][2] == pytest.approx(exp[n][2], abs=1e-12)


def test_clique_and_star_closed_forms(spark):
    k5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    star = [("hub", f"leaf{i}") for i in range(6)]
    df = spark.createDataFrame(k5 + star, "src string, dst string")
    rows = {r.node: r for r in
            linkgraph.clustering_coefficient(df).collect()}
    for i in range(5):  # K5: every node in C(4,2)=6 triangles, c=1
        assert rows[f"c{i}"].triangles == 6
        assert rows[f"c{i}"].coeff == pytest.approx(1.0)
    assert rows["hub"].triangles == 0 and rows["hub"].coeff == 0.0
    for i in range(6):  # leaves: deg 1 → conventional 0.0
        assert rows[f"leaf{i}"].coeff == 0.0
    # global count: Σ per-node / 3
    total = sum(r.triangles for r in rows.values())
    assert total == 3 * 10  # K5 has C(5,3)=10 triangles


def test_partition_invariance(spark):
    pairs = _pairs_pseudorandom(31)
    df = spark.createDataFrame(pairs, "src string, dst string")
    base = sorted(map(tuple, linkgraph.triangle_count(df).collect()))
    rep = sorted(map(tuple,
                     linkgraph.triangle_count(df.repartition(7)).collect()))
    assert base == rep


def _kcore_mirror(pairs, k):
    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items()}


def test_k_core_matches_peeling_mirror(spark):
    pairs = _pairs_pseudorandom(37)
    df = spark.createDataFrame(pairs, "src string, dst string")
    for k in (2, 4, 6):
        out = {r.node: r.deg for r in
               linkgraph.k_core(df, k).collect()}
        assert out == _kcore_mirror(pairs, k), f"k={k}"


def test_k_core_clique_with_pendant_chain(spark):
    k5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [("c0", "p0"), ("p0", "p1"), ("p1", "p2")]
    df = spark.createDataFrame(k5 + chain, "src string, dst string")
    core4 = {r.node for r in linkgraph.k_core(df, 4).collect()}
    assert core4 == {f"c{i}" for i in range(5)}  # chain peels away
    core2 = {r.node for r in linkgraph.k_core(df, 2).collect()}
    assert core2 == {f"c{i}" for i in range(5)}  # chain is a 1-core tail
    assert linkgraph.k_core(df, 5).count() == 0  # K5 max coreness is 4
