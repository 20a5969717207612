"""User-interaction graph analytics (SURVEY §2.C C31-C35; reference:
src/network_analyzer.py, src/detailed_analyzer.py:182-284).

Distributed where the data is big (edge construction, degrees,
PageRank power iteration — all DataFrame ops); driver-side networkx
for the metrics that have no scalable formulation (betweenness,
Louvain-style communities), exactly mirroring the reference's own
top-100-subgraph cutoff (src/network_analyzer.py:335-339) and gated
by an explicit size check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from voz_spark.analytics import op_reply_split

MAX_DRIVER_NODES = 2000  # hard gate for driver-side algorithms


def build_edges(posts_pre: DataFrame) -> DataFrame:
    """C35: reply→OP edges weight 1.0 plus 0.5 reverse edges,
    accumulated per user pair (reference src/network_analyzer.py:74-108)."""
    split = op_reply_split(posts_pre)
    ops = split.where(F.col("is_op")).select(
        "thread_id", F.col("username").alias("op_user")
    )
    replies = split.where(~F.col("is_op")).select(
        "thread_id", F.col("username").alias("reply_user")
    )
    fwd = (
        replies.join(F.broadcast(ops), "thread_id")
        .where(F.col("reply_user") != F.col("op_user"))
        .select(
            F.col("reply_user").alias("src"),
            F.col("op_user").alias("dst"),
            F.lit(1.0).alias("w"),
        )
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(0.5).alias("w"))
    return (
        fwd.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("weight"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """C31: weighted in/out degree per node."""
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("out_degree"), F.count(F.lit(1)).alias("out_edges")
    )
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.sum("weight").alias("in_degree"), F.count(F.lit(1)).alias("in_edges")
    )
    return outd.join(ind, "node", "full_outer").select(
        "node",
        F.coalesce("out_degree", F.lit(0.0)).alias("out_degree"),
        F.coalesce("in_degree", F.lit(0.0)).alias("in_degree"),
        F.coalesce("out_edges", F.lit(0)).alias("out_edges"),
        F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
    )


def pagerank(edges: DataFrame, iterations: int = 10, damping: float = 0.85) -> DataFrame:
    """C32 analogue (eigenvector-style centrality): power iteration as
    iterative DataFrame joins — the distributed formulation; each
    iteration is one join + one aggregation, shuffling on the node key."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("total_out"))
    norm_edges = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("total_out")).alias("p")
    ).cache()
    norm_edges.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            norm_edges.join(ranks, norm_edges.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("p") * F.col("rank")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit((1 - damping) / n) + damping * F.coalesce("csum", F.lit(0.0))).alias("rank"),
        )
    out = ranks.orderBy(F.desc("rank"), "node")
    nodes.unpersist()
    norm_edges.unpersist()
    return out


def eigenvector_centrality(
    edges: DataFrame, max_iter: int = 100, tol: float = 1.0e-6
) -> DataFrame:
    """C32 exact form (reference src/network_analyzer.py:342-347:
    ``nx.eigenvector_centrality(G, max_iter=500)`` — unweighted, since
    networkx's default ``weight=None`` ignores the edge weights): power
    iteration on (Aᵀ + I) with per-step L2 normalization. The +I shift
    is exactly what networkx's ``x = xlast.copy()`` seed encodes — it
    breaks periodicity, so the iteration converges to the same left
    principal eigenvector networkx returns; parity is pinned in
    tests/test_graph_monitor.py.

    Distributed shape: each step is one join + one aggregation
    shuffling on the node key (same shape as :func:`pagerank`), plus
    two O(1) driver scalars — the L2 norm and networkx's L1
    convergence delta (sum |x - xlast| < n·tol). No driver work is
    proportional to the graph; lineage is truncated per iteration with
    localCheckpoint (the :func:`connected_components` discipline) so
    plan analysis stays O(1) per step instead of O(iterations)."""
    adj = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        adj.select(F.col("src").alias("node"))
        .unionByName(adj.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    import math

    x = nodes.select("node", F.lit(1.0 / n).alias("x")).localCheckpoint()
    for _ in range(max_iter):
        contrib = (
            adj.join(x, adj.src == x.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("x").alias("c"))
        )
        # (Aᵀ + I)x : every node keeps its own value and adds in-edge mass
        new = (
            x.join(contrib, "node", "left")
            .select("node", (F.col("x") + F.coalesce("c", F.lit(0.0))).alias("x"))
            .localCheckpoint()
        )
        norm_sq = new.agg(F.sum(F.col("x") * F.col("x"))).first()[0]
        norm = math.sqrt(norm_sq) or 1.0
        new_n = new.select("node", (F.col("x") / F.lit(norm)).alias("x")).localCheckpoint()
        delta = (
            new_n.withColumnRenamed("x", "xn")
            .join(x, "node")
            .agg(F.sum(F.abs(F.col("xn") - F.col("x"))))
            .first()[0]
        )
        x = new_n
        if delta < n * tol:
            break
    out = x.select("node", F.col("x").alias("eigenvector")).orderBy(
        F.desc("eigenvector"), "node"
    )
    adj.unpersist()
    nodes.unpersist()
    return out


def _brandes_betweenness(nodes: list, edge_list: list[tuple]) -> dict:
    """Pure-Python Brandes (directed, unweighted, normalized like
    networkx's default) — fallback when networkx is absent. Public
    algorithm (Brandes 2001, 'A Faster Algorithm for Betweenness
    Centrality')."""
    from collections import deque

    adj: dict = {v: [] for v in nodes}
    for s, d in edge_list:
        adj[s].append(d)
    bc = dict.fromkeys(nodes, 0.0)
    for s in nodes:
        stack, preds = [], {v: [] for v in nodes}
        sigma = dict.fromkeys(nodes, 0.0)
        dist = dict.fromkeys(nodes, -1)
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = dict.fromkeys(nodes, 0.0)
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    n = len(nodes)
    if n > 2:  # networkx directed normalization: 1 / ((n-1)(n-2))
        scale = 1.0 / ((n - 1) * (n - 2))
        bc = {v: c * scale for v, c in bc.items()}
    return bc


def betweenness(edges: DataFrame, top_n: int = 100) -> DataFrame:
    """C32: betweenness centrality of the top-`top_n`-by-total-degree
    subgraph (reference src/network_analyzer.py:333-340:
    nx.betweenness_centrality over the same top-100 cutoff). The
    top-N selection and subgraph edge filtering are distributed
    (degree aggregation + a broadcast semi-filter); only the ≤ top_n
    node subgraph — bounded by construction — crosses to the driver
    for the O(V·E) Brandes pass, mirroring the reference's own
    smallness cutoff. Ties in degree break on node name so the
    subgraph is deterministic."""
    spark = edges.sparkSession
    deg = degrees(edges).select(
        "node", (F.col("out_degree") + F.col("in_degree")).alias("total_degree")
    )
    top = [
        r.node
        for r in deg.orderBy(F.desc("total_degree"), "node").limit(top_n).collect()
    ]
    top_df = F.broadcast(spark.createDataFrame([(v,) for v in top], "node string"))
    sub_df = (
        edges.select("src", "dst")
        .join(top_df, edges.src == top_df.node, "left_semi")
        .join(top_df, F.col("dst") == top_df.node, "left_semi")
    )
    # bounded by construction: ≤ top_n² edges cross to the driver
    sub = [(r.src, r.dst) for r in sub_df.collect()]
    try:
        import networkx as nx

        g = nx.DiGraph()
        g.add_nodes_from(top)
        g.add_edges_from(sub)
        bc = nx.betweenness_centrality(g)
    except ImportError:  # pragma: no cover - environment-gated
        bc = _brandes_betweenness(top, sub)
    return spark.createDataFrame(
        [{"node": v, "betweenness": float(c)} for v, c in sorted(bc.items())],
        "node string, betweenness double",
    )


def graph_stats(edges: DataFrame) -> dict:
    """C34: node/edge counts, avg degree, density (DataFrame aggs);
    SCC count driver-side via networkx under the size gate."""
    n_edges = edges.count()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    stats = {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "avg_out_degree": n_edges / n_nodes if n_nodes else 0.0,
        "density": n_edges / (n_nodes * (n_nodes - 1)) if n_nodes > 1 else 0.0,
    }
    if n_nodes <= MAX_DRIVER_NODES:
        try:
            import networkx as nx

            g = nx.DiGraph()
            for r in edges.collect():
                g.add_edge(r.src, r.dst, weight=r.weight)
            sccs = list(nx.strongly_connected_components(g))
            stats["n_scc"] = len(sccs)
            stats["largest_scc"] = max((len(s) for s in sccs), default=0)
        except ImportError:  # pragma: no cover
            pass
    return stats


def communities(edges: DataFrame) -> DataFrame:
    """C33: community detection. No scalable Catalyst formulation —
    driver-side greedy modularity (networkx) under the size gate,
    mirroring the reference's python-louvain on a tiny user graph
    (src/network_analyzer.py:154-209); raises beyond the gate."""
    spark = edges.sparkSession
    nodes_cnt = (
        edges.select("src").unionByName(edges.select(F.col("dst").alias("src"))).distinct().count()
    )
    if nodes_cnt > MAX_DRIVER_NODES:
        raise ValueError(
            f"community detection gated at {MAX_DRIVER_NODES} nodes; "
            "use label propagation via pregel-style joins for larger graphs"
        )
    import networkx as nx

    g = nx.Graph()
    for r in edges.collect():
        w = g[r.src][r.dst]["weight"] + r.weight if g.has_edge(r.src, r.dst) else r.weight
        g.add_edge(r.src, r.dst, weight=w)
    comms = nx.algorithms.community.greedy_modularity_communities(g, weight="weight")
    rows = [
        {"node": node, "community": ci}
        for ci, comm in enumerate(comms)
        for node in sorted(comm)
    ]
    return spark.createDataFrame(rows, "node string, community int")


def label_propagation(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """C33 scale path: synchronous label propagation as iterative
    DataFrame joins (GraphFrames-free). Deterministic: ties broken by
    min label; undirected via symmetrized edges."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        neigh = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("label"))
        labels = (
            neigh.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("src").alias("node"), "label")
        )
    sym.unpersist()
    return labels


def connected_components(
    edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Distributed connected components via alternating large-star /
    small-star contraction ("Connected Components in MapReduce and
    Beyond", Kiveris et al., MR'14) — converges in O(log² n) rounds
    regardless of component diameter, unlike min-label propagation
    whose round count is the graph diameter (a 10^9-node path graph
    would need 10^9 rounds; star contraction needs ~60).

    ``edges``: undirected (u, v) long pairs, loops/dupes tolerated.
    Returns (node, component) with component = min node id of the
    component — every node appears exactly once, including roots.

    Scale notes: each half-iteration is one groupBy(min) plus one
    shuffle-sharing join on the same key; the edge set only shrinks
    toward the star forest. Lineage is truncated per iteration with
    localCheckpoint (on a cluster: ``spark.sparkContext.setCheckpointDir``
    + ``checkpoint()`` for executor-replicated truncation).
    Convergence is detected with an O(1)-driver aggregate signature
    (count + bit_xor of per-edge xxhash64) instead of a full exceptAll
    diff; iteration is additionally capped at max_iters.
    """
    cur = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def signature(df: DataFrame):
        # bit_xor (not sum) of per-edge hashes: order-independent,
        # cannot overflow under ANSI mode, distinct edges never cancel
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(xxhash64(least(u, v), greatest(u, v)))"
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def star(df: DataFrame, large: bool) -> DataFrame:
        nbrs = df.unionByName(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        joined = nbrs.join(mins, "u")
        if large:
            # connect strictly-larger neighbors to the min
            out = joined.where(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            # connect smaller-or-equal neighbors AND u itself to the min
            out = (
                joined.where(F.col("v") < F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
            )
        return (
            out.where(F.col("u") != F.col("v")).distinct().localCheckpoint()
        )

    sig = signature(cur)
    for _ in range(max_iters):
        cur = star(star(cur, large=True), large=False)
        new_sig = signature(cur)
        if new_sig == sig:
            break
        sig = new_sig
    # converged star forest: every edge is (child, root<child)
    children = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return children.unionByName(roots)


def k_core(edges: DataFrame, k: int, max_iters: int = 100) -> DataFrame:
    """Distributed k-core: iteratively peel nodes of degree < k until
    the fixpoint; returns (node, core_degree) for survivors — the
    maximal subgraph where every node keeps >= k neighbors.

    Each iteration is one degree aggregate + two broadcast-able
    anti-joins against the (shrinking) low-degree node set; the edge
    set only shrinks, and lineage is truncated per iteration with
    localCheckpoint. Iteration count is bounded by the peeling depth
    (<= max degree), with an explicit cap. The only driver-side value
    per iteration is the low-degree node COUNT (O(1)).

    ``edges``: undirected (u, v) long pairs.
    """
    cur = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iters):
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        low = deg.where(F.col("d") < k).select("u").localCheckpoint()
        if low.limit(1).count() == 0:
            final = deg.select(F.col("u").alias("node"), F.col("d").alias("core_degree"))
            return final
        cur = (
            cur.join(low, "u", "left_anti")
            .join(low.select(F.col("u").alias("v")), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint()
        )
    raise RuntimeError(f"k_core did not converge in {max_iters} iterations")


def hits(edges: DataFrame, max_iter: int = 50, tol: float = 1.0e-8) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) — the web-native importance
    pair: a good HUB links to many good authorities (the index/listing
    pages a crawler should expand), a good AUTHORITY is linked from
    many good hubs (the content pages worth fetching first). The
    reference ranks users only by degree (src/network_analyzer.py);
    OPIC (q101) is cash-flow importance — HITS adds the bipartite
    reinforcement view. Matches ``networkx.hits`` semantics: alternate
    a = A^T h, h = A a with L1 normalization per half-step,
    convergence on sum |h - h_last| < tol (parity pinned in tests).

    Distributed shape: each half-step is one join + one aggregation
    shuffling on the node key (the pagerank shape); normalization is
    an O(1) driver scalar; lineage truncated per iteration with
    localCheckpoint (the connected_components discipline)."""
    adj = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        adj.select(F.col("src").alias("node"))
        .unionByName(adj.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    h = nodes.select("node", F.lit(1.0 / n).alias("h")).localCheckpoint()
    for _ in range(max_iter):
        a = (
            adj.join(h, adj.src == h.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        s = a.agg(F.sum("a")).collect()[0][0] or 1.0
        a = nodes.join(a, "node", "left").select(
            "node", (F.coalesce("a", F.lit(0.0)) / F.lit(s)).alias("a")
        ).localCheckpoint()
        h_new = (
            adj.join(a, adj.dst == a.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        s2 = h_new.agg(F.sum("h")).collect()[0][0] or 1.0
        h_new = nodes.join(h_new, "node", "left").select(
            "node", (F.coalesce("h", F.lit(0.0)) / F.lit(s2)).alias("h")
        ).localCheckpoint()
        delta = (
            h_new.join(h.withColumnRenamed("h", "h_last"), "node")
            .agg(F.sum(F.abs(F.col("h") - F.col("h_last"))))
            .collect()[0][0]
        )
        h = h_new
        if delta is not None and delta < tol:
            break
    return nodes.join(h, "node").join(a, "node").select("node", "h", "a")
