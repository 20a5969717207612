"""C32 betweenness (reference src/network_analyzer.py:333-340) and
B11 monitor report (reference src/monitor.py:50-114)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from voz_spark.graph import _brandes_betweenness, betweenness


def _edges_df(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, weight double")


def test_betweenness_hand_built_path_graph(spark):
    """a→b→c→d: only interior nodes carry betweenness; b and c are
    symmetric. Directed-normalized values (n=4): b = c =
    2 pair-paths-through / ((n-1)(n-2)) = 2/6."""
    edges = _edges_df(
        spark, [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)]
    )
    got = {r.node: r.betweenness for r in betweenness(edges).collect()}
    assert got["a"] == 0.0 and got["d"] == 0.0
    assert got["b"] == pytest.approx(2 / 6)
    assert got["c"] == pytest.approx(2 / 6)


def test_betweenness_star_center(spark):
    """Star with bidirectional spokes: the hub lies on every
    leaf-to-leaf shortest path → betweenness 1.0 after normalization."""
    leaves = ["x1", "x2", "x3", "x4"]
    triples = [("hub", v, 1.0) for v in leaves] + [(v, "hub", 1.0) for v in leaves]
    got = {r.node: r.betweenness for r in betweenness(_edges_df(spark, triples)).collect()}
    assert got["hub"] == pytest.approx(1.0)
    for v in leaves:
        assert got[v] == 0.0


def test_betweenness_top_n_cutoff(spark):
    """top_n bounds the subgraph exactly like the reference's top-100
    cutoff: nodes outside the top-N by total degree are excluded."""
    triples = [("a", "b", 5.0), ("b", "c", 5.0), ("c", "a", 5.0), ("a", "z", 0.1)]
    out = betweenness(_edges_df(spark, triples), top_n=3)
    assert {r.node for r in out.collect()} == {"a", "b", "c"}


def test_brandes_fallback_matches_networkx(spark):
    """The pure-Python Brandes fallback must agree with networkx on a
    non-trivial digraph (so the environment gate changes nothing)."""
    nx = pytest.importorskip("networkx")
    triples = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("c", "d", 1.0),
        ("d", "a", 1.0), ("b", "d", 1.0), ("d", "e", 1.0), ("e", "a", 1.0),
    ]
    nodes = sorted({t[0] for t in triples} | {t[1] for t in triples})
    pairs = [(s, d) for s, d, _ in triples]
    ours = _brandes_betweenness(nodes, pairs)
    g = nx.DiGraph()
    g.add_nodes_from(nodes)
    g.add_edges_from(pairs)
    ref = nx.betweenness_centrality(g)
    for v in nodes:
        assert ours[v] == pytest.approx(ref[v])


def test_monitor_report_sums_and_rates(spark):
    """monitor_report over a hand-built lineage: success rate per
    round, cumulative totals, and progress percent."""
    from voz_spark import schemas
    from voz_spark.monitor import monitor_report

    rows = [
        # round, part, host, cand, bloom_new, dedup, robots, sched, fetched, failed
        (1, -1, None, 100, 90, 90, 2, 40, 30, 10),
        (2, -1, None, 80, 60, 60, 0, 40, 40, 0),
        (1, 0, "h", 50, 0, 0, 0, 0, 0, 0),  # per-partition rows are excluded
        (3, -1, None, 20, 20, 20, 0, 20, 15, 5),
    ]
    lineage = spark.createDataFrame(rows, schemas.LINEAGE)
    got = {r.round_id: r for r in monitor_report(lineage).collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1].success_rate == pytest.approx(0.75)
    assert got[2].success_rate == pytest.approx(1.0)
    assert got[1].cum_scheduled == 40
    assert got[2].cum_scheduled == 80
    assert got[3].cum_scheduled == 100
    assert got[3].progress_pct == pytest.approx(100.0)
    assert got[1].progress_pct == pytest.approx(40.0)


# ---------------------------------------------------------------------------
# connected_components (alternating star contraction) and k_core
# (iterative peeling): exact parity vs naive sequential algorithms on
# hand graphs, including the long-path worst case that defeats
# diameter-bound label propagation.
# ---------------------------------------------------------------------------


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _naive_k_core(pairs, k):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        low = [n for n, ns in adj.items() if len(ns) < k]
        if not low:
            return {n: len(ns) for n, ns in adj.items()}
        for n in low:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def test_connected_components_matches_union_find(spark):
    from voz_spark.graph import connected_components

    pairs = [
        # component A: triangle + pendant
        (1, 2), (2, 3), (1, 3), (3, 4),
        # component B: two nodes
        (10, 11),
        # component C: long path (diameter 9 — exceeds the handful of
        # star rounds a diameter-bound propagation would need 9 rounds for)
        (20, 21), (21, 22), (22, 23), (23, 24), (24, 25),
        (25, 26), (26, 27), (27, 28), (28, 29),
        # noise: duplicate + reversed + self-loop
        (2, 1), (4, 3), (5, 5), (4, 5),
    ]
    got = {
        r.node: r.component
        for r in connected_components(_pairs_df(spark, pairs)).collect()
    }
    want = _uf_components([(a, b) for a, b in pairs if a != b])
    assert got == want


def test_connected_components_handles_empty(spark):
    from voz_spark.graph import connected_components

    assert connected_components(_pairs_df(spark, [])).count() == 0


def test_k_core_matches_naive_peeling(spark):
    from voz_spark.graph import k_core

    # 4-clique (survives k=3) + a triangle hanging off it (peeled at
    # k=3: each triangle-only node has degree 2) + a chain
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 10), (10, 11), (11, 3), (11, 12), (12, 13)]
    pairs = clique + extra
    got = {
        r.node: r.core_degree
        for r in k_core(_pairs_df(spark, pairs), k=3).collect()
    }
    assert got == _naive_k_core(pairs, 3)
    # k=2: the triangle {3,10,11} also survives; the chain does not
    got2 = {
        r.node: r.core_degree
        for r in k_core(_pairs_df(spark, pairs), k=2).collect()
    }
    assert got2 == _naive_k_core(pairs, 2)


def test_k_core_fully_peeled_graph_is_empty(spark):
    from voz_spark.graph import k_core

    pairs = [(1, 2), (2, 3), (3, 4)]  # path: no 3-core at all
    assert k_core(_pairs_df(spark, pairs), k=3).count() == 0


# --- C32 exact eigenvector centrality (reference src/network_analyzer.py:342-347) ---


def test_eigenvector_matches_networkx_cycle_with_chord(spark):
    """Pin the distributed (Aᵀ+I) power iteration against
    nx.eigenvector_centrality on a hand-built asymmetric digraph —
    same recurrence, so values must agree to iteration tolerance."""
    nx = pytest.importorskip("networkx")
    from voz_spark.graph import eigenvector_centrality

    triples = [
        ("a", "b", 1.0),
        ("b", "c", 1.0),
        ("c", "a", 1.0),
        ("a", "c", 1.0),
        ("d", "a", 1.0),
        ("c", "d", 1.0),
    ]
    got = {
        r.node: r.eigenvector
        for r in eigenvector_centrality(_edges_df(spark, triples)).collect()
    }
    g = nx.DiGraph()
    g.add_edges_from([(s, d) for s, d, _ in triples])
    want = nx.eigenvector_centrality(g, max_iter=500)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-5), (v, got[v], want[v])


def test_eigenvector_symmetric_star_ordering(spark):
    """Bidirectional star: the hub dominates; all leaves are equal by
    symmetry and the vector is L2-normalized."""
    from voz_spark.graph import eigenvector_centrality

    leaves = ["x1", "x2", "x3", "x4"]
    triples = [("hub", v, 1.0) for v in leaves] + [(v, "hub", 1.0) for v in leaves]
    got = {
        r.node: r.eigenvector
        for r in eigenvector_centrality(_edges_df(spark, triples)).collect()
    }
    assert got["hub"] > got["x1"]
    for v in leaves[1:]:
        assert got[v] == pytest.approx(got["x1"], abs=1e-9)
    l2 = sum(v * v for v in got.values()) ** 0.5
    assert l2 == pytest.approx(1.0, abs=1e-6)


# --- HITS hubs/authorities (q189) ---


def test_hits_matches_reference_power_iteration(spark):
    """Pin the distributed HITS alternation against an independent
    pure-Python Kleinberg power iteration (networkx.hits needs scipy,
    absent here — same recurrence, L1-normalized per half-step) on a
    hand-built asymmetric digraph where hubs and authorities are
    genuinely different node sets."""
    from voz_spark.graph import hits

    # h1/h2 are pure hubs (link out to the authorities), a1-a3 pure
    # authorities; x adds asymmetry
    triples = [
        ("h1", "a1", 1.0),
        ("h1", "a2", 1.0),
        ("h1", "a3", 1.0),
        ("h2", "a1", 1.0),
        ("h2", "a2", 1.0),
        ("x", "a1", 1.0),
        ("a3", "x", 1.0),
    ]
    out = {r.node: (r.h, r.a) for r in hits(_edges_df(spark, triples)).collect()}
    nodes = sorted({v for e in triples for v in e[:2]})
    h = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(200):
        a = {v: sum(h[s] for s, d, _ in triples if d == v) for v in nodes}
        sa = sum(a.values()) or 1.0
        a = {v: x / sa for v, x in a.items()}
        h = {v: sum(a[d] for s, d, _ in triples if s == v) for v in nodes}
        sh = sum(h.values()) or 1.0
        h = {v: x / sh for v, x in h.items()}
    assert set(out) == set(nodes)
    for v in nodes:
        assert out[v][0] == pytest.approx(h[v], abs=5e-5), ("hub", v)
        assert out[v][1] == pytest.approx(a[v], abs=5e-5), ("auth", v)
    # structure: h1 is the best hub, a1 the best authority
    assert max(out, key=lambda v: out[v][0]) == "h1"
    assert max(out, key=lambda v: out[v][1]) == "a1"
