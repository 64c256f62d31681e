"""HyperBall neighborhood functions + harmonic centrality
(linkgraph.hyperball / harmonic_centrality): verified against an exact
BFS mirror — at these cardinalities the HLL sketches are in their
exact (sparse) regime, so ball sizes must EQUAL the BFS counts, and
harmonic centrality must equal the exact Σ 1/d."""

import collections

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import linkgraph as lg

# a directed graph with known distance structure:
#   chain a→b→c→d, hub h→{a,b,c}, cycle c→a, island x→y
EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("h", "a"), ("h", "b"),
    ("h", "c"), ("c", "a"), ("x", "y"),
]


def _bfs_balls(edges, reverse):
    adj = collections.defaultdict(set)
    nodes = set()
    for s, d in edges:
        if reverse:
            s, d = d, s
        adj[s].add(d)
        nodes.update((s, d))
    balls = {}
    for v in nodes:
        seen = {v}
        frontier = {v}
        balls[(v, 0)] = 1
        t = 0
        while frontier:
            t += 1
            frontier = {w for u in frontier for w in adj[u]} - seen
            seen |= frontier
            balls[(v, t)] = len(seen)
        balls[(v, "final")] = (len(seen), t - 1 if t > 0 else 0)
    return nodes, balls


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(
        EDGES, "src string, dst string").localCheckpoint(eager=True)


@pytest.mark.parametrize("reverse", [False, True])
def test_balls_equal_exact_bfs(spark, graph, reverse):
    got = {(r.node, r.t): r.ball_size
           for r in lg.hyperball(graph, max_t=8,
                                 reverse=reverse).collect()}
    nodes, balls = _bfs_balls(EDGES, reverse)
    # every reported (node, t) matches BFS; the sweep runs far enough
    # that each node's final reported ball is its full reachable set
    for (v, t), size in got.items():
        exact = balls.get((v, t))
        if exact is None:  # t beyond v's own growth → still its max
            exact = balls[(v, "final")][0]
        assert size == exact, (v, t, size, exact)
    for v in nodes:
        final_t = max(t for (n, t) in got if n == v)
        assert got[(v, final_t)] == balls[(v, "final")][0], v


def test_stops_at_diameter_not_max_t(spark, graph):
    rows = lg.hyperball(graph, max_t=50).collect()
    t_max = max(r.t for r in rows)
    # longest shortest path here is 3 (h→a→b? no: h→c? d(h,d)=2 via
    # c→d; a→b→c→d = 3) → fixpoint detected by t=4, far below 50
    assert t_max <= 4


def test_harmonic_matches_exact(spark, graph):
    got = {r.node: (r.harmonic, r.n_coreachable)
           for r in lg.harmonic_centrality(graph, max_t=10).collect()}
    # exact H(v) = Σ_{u≠v} 1/d(u→v) via forward BFS from every source
    adj = collections.defaultdict(set)
    nodes = set()
    for s, d in EDGES:
        adj[s].add(d)
        nodes.update((s, d))
    H = {v: 0.0 for v in nodes}
    reach = {v: 0 for v in nodes}
    for u in nodes:
        dist = {u: 0}
        frontier = [u]
        while frontier:
            nxt = []
            for n in frontier:
                for w in adj[n]:
                    if w not in dist:
                        dist[w] = dist[n] + 1
                        nxt.append(w)
            frontier = nxt
        for v, d in dist.items():
            if d > 0:
                H[v] += 1.0 / d
                reach[v] += 1
    for v in nodes:
        assert got[v][1] == reach[v], v
        assert got[v][0] == pytest.approx(H[v], abs=1e-9), v


def test_deterministic_and_jvm_side(spark, graph):
    a = sorted((r.node, r.t, r.ball_size)
               for r in lg.hyperball(graph, max_t=6).collect())
    b = sorted((r.node, r.t, r.ball_size)
               for r in lg.hyperball(graph.repartition(5),
                                     max_t=6).collect())
    assert a == b
    out = lg.harmonic_centrality(graph, max_t=3)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p


def test_neighborhood_function_and_diameters(spark, graph):
    """N(t), interpolated effective diameter, and mean distance all
    match driver-side exact-BFS math on the known graph (hyperball is
    exact in the sparse regime at lgk 12)."""
    balls = lg.hyperball(graph, max_t=10, lgk=12)
    nodes, exact = _bfs_balls(EDGES, reverse=False)
    # exact N(t): carry each node's final ball size forward past its
    # personal fixpoint, up to the global max t the run emitted
    tmax = max(r.t for r in balls.collect())
    nt = {}
    for t in range(tmax + 1):
        nt[t] = sum(exact.get((v, t), exact[(v, "final")][0])
                    for v in nodes)
    got_nf = {r.t: r.npairs
              for r in lg.neighborhood_function(balls).collect()}
    assert got_nf == nt

    # interpolated effective diameter at q=0.9, mirrored in Python
    target = 0.9 * nt[tmax]
    exp = None
    for t in range(tmax + 1):
        if nt[t] >= target:
            exp = (t if t == 0 else
                   (t - 1) + (target - nt[t - 1]) / (nt[t] - nt[t - 1]))
            break
    assert abs(lg.effective_diameter(balls, q=0.9) - exp) < 1e-9
    # q=1.0 is the exact (integer) diameter
    assert lg.effective_diameter(balls, q=1.0) == float(tmax)

    # mean finite distance over reachable pairs
    num = sum(t * (nt[t] - nt[t - 1]) for t in range(1, tmax + 1))
    assert abs(lg.avg_distance(balls) - num / (nt[tmax] - nt[0])) < 1e-9
