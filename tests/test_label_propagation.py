"""Semi-supervised label propagation (linkgraph.label_propagation):
verified against an exact Python mirror of the synchronous clamped-
seed vote algebra (same rounding, same min-(−score,label) tie-break),
plus the structural properties — seeds never move, unreachable nodes
stay NULL, directed vs symmetrized flow, repartition determinism."""

import collections

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import linkgraph as lg

# two dense communities bridged by one edge, plus an isolated island
EDGES = [
    # community around t1..t4 (seed t1 = "tech")
    ("t1", "t2", 2.0), ("t2", "t3", 1.0), ("t3", "t4", 1.0),
    ("t1", "t3", 1.0),
    # community around s1..s4 (seed s1 = "sport")
    ("s1", "s2", 2.0), ("s2", "s3", 1.0), ("s3", "s4", 1.0),
    ("s1", "s3", 1.0),
    # weak bridge
    ("t4", "s4", 0.5),
    # directed-only tail: t2 -> d1 (d1 has no out-edges)
    ("t2", "d1", 1.0),
    # island unreachable from any seed
    ("x1", "x2", 1.0),
]
SEEDS = [("t1", "tech"), ("s1", "sport")]


def _mirror(edges, seeds, iters, directed):
    adj = collections.defaultdict(list)   # dst -> [(src, w)]
    nodes = set()
    sym = list(edges)
    if not directed:
        merged = collections.Counter()
        for a, b, w in edges:
            merged[(a, b)] += w
            merged[(b, a)] += w
        sym = [(a, b, w) for (a, b), w in merged.items()]
    for a, b, w in sym:
        adj[b].append((a, w))
        nodes.update((a, b))
    label = {n: None for n in nodes}
    seedmap = dict(seeds)
    label.update(seedmap)
    for _ in range(iters):
        votes = {n: collections.Counter() for n in nodes}
        for b, ins in adj.items():
            for a, w in ins:
                if label[a] is not None:
                    votes[b][label[a]] += w
        new = {}
        for n in nodes:
            if n in seedmap:
                new[n] = seedmap[n]
            elif votes[n]:
                new[n] = min(
                    ((-round(s, 12), lab) for lab, s in votes[n].items())
                )[1]
            else:
                new[n] = label[n]
        label = new
    score = {}
    for n in nodes:
        if label[n] is None:
            score[n] = None
            continue
        s = sum(w for a, w in adj.get(n, []) if label[a] == label[n])
        score[n] = round(s, 12) if s else None
    return label, score


@pytest.fixture(scope="module")
def graph(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string, w double")
    s = spark.createDataFrame(SEEDS, "node string, label string")
    return e.localCheckpoint(eager=True), s


@pytest.mark.parametrize("directed", [False, True])
def test_matches_python_mirror(spark, graph, directed):
    e, s = graph
    got = {
        r.node: (r.label, r.score)
        for r in lg.label_propagation(
            e, s, iters=6, weight_col="w", directed=directed).collect()
    }
    label, score = _mirror(EDGES, SEEDS, 6, directed)
    assert set(got) == set(label)
    for n in label:
        assert got[n][0] == label[n], (n, got[n], label[n])
        if score[n] is None:
            assert got[n][1] is None, n
        else:
            assert got[n][1] == pytest.approx(score[n], abs=1e-9), n


def test_communities_and_clamping(spark, graph):
    e, s = graph
    got = {r.node: r.label
           for r in lg.label_propagation(e, s, iters=10,
                                         weight_col="w").collect()}
    # each community takes its seed's label; seeds stay clamped
    for n in ("t1", "t2", "t3", "t4"):
        assert got[n] == "tech", n
    for n in ("s1", "s2", "s3", "s4"):
        assert got[n] == "sport", n
    # the island never hears from a seed
    assert got["x1"] is None and got["x2"] is None


def test_directed_respects_edge_direction(spark, graph):
    e, s = graph
    got = {r.node: r.label
           for r in lg.label_propagation(e, s, iters=10, weight_col="w",
                                         directed=True).collect()}
    # d1 is downstream of t2 → labelled under directed flow
    assert got["d1"] == "tech"
    # but t1's label can only flow OUT: s-community stays sport even
    # through the t4→s4 bridge (one-way, reaches s4 only via sym)
    assert got["s2"] == "sport"


def test_repartition_deterministic(spark, graph):
    e, s = graph
    a = sorted(
        (r.node, r.label)
        for r in lg.label_propagation(e, s, iters=5,
                                      weight_col="w").collect())
    b = sorted(
        (r.node, r.label)
        for r in lg.label_propagation(e.repartition(7), s, iters=5,
                                      weight_col="w").collect())
    assert a == b


def test_plan_stays_jvm_side(spark, graph):
    e, s = graph
    out = lg.label_propagation(e, s, iters=2, weight_col="w")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
