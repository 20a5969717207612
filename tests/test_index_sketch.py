"""Semantics tests for the sketch/index wave: q202 count-min heavy
hitters, q203 edge-partition replication audit, q204 inverted-index
conjunctive search, q205 bitmap segment index. Each is recomputed
independently in plain Python from the same parquet input."""

import hashlib
from collections import Counter, defaultdict


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _event_ids(spark, sf_dir):
    from voz_spark.session import load_table

    return [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    ]


def _docs(spark, sf_dir):
    from voz_spark.session import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    ).collect()


def test_q202_countmin_matches_python_sketch(spark, sf_dir):
    """The Spark estimates equal a pure-Python count-min built with
    the same hash rule; estimates never undercount; the two planted
    hot hosts top the ranking and are the heavy set."""
    from voz_spark.crawlops import q202_countmin_heavy_hitters

    hosts = []
    for e in _event_ids(spark, sf_dir):
        if e % 5 < 2:
            hosts.append("hot_a")
        elif e % 5 == 2:
            hosts.append("hot_b")
        else:
            hosts.append(f"h{e % 211}")
    true = Counter(hosts)
    cells = Counter()
    for h in hosts:
        for d in range(4):
            cells[(d, _h60(f"{d}|{h}") % 256)] += 1
    est = {
        h: min(cells[(d, _h60(f"{d}|{h}") % 256)] for d in range(4)) for h in true
    }
    n_total = len(hosts)

    rows = q202_countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == len(true)
    for r in rows:
        assert r["true_n"] == true[r["host"]]
        assert r["est_n"] == est[r["host"]]
        assert r["overcount"] >= 0  # one-sided error, always
        assert r["is_heavy"] == (1 if r["est_n"] * 100 >= n_total else 0)
    assert {rows[0]["host"], rows[1]["host"]} == {"hot_a", "hot_b"}
    assert rows[0]["is_heavy"] == 1 and rows[1]["is_heavy"] == 1


def test_q203_replication_and_balance_vs_python(spark, sf_dir):
    """Exact metric equality with a Python replay, plus the two
    structural claims: the 2d grid cut has bounded replication
    (<= 2*sqrt(P) per vertex) and strictly better worst-shard load
    than 1d on the planted hot-vertex graph."""
    from voz_spark.crawlops import q203_edge_partition_audit

    edges = []
    for e in _event_ids(spark, sf_dir):
        src = 0 if e % 10 < 3 else _h60(f"s|{e}") % 199
        dst = 1 if e % 10 == 3 else _h60(f"d|{e}") % 199
        if src != dst:
            edges.append((src, dst))

    def metrics(shard_of):
        loads = Counter()
        inc = set()
        verts = set()
        for s, d in edges:
            sh = shard_of(s, d)
            loads[sh] += 1
            inc.add((s, sh))
            inc.add((d, sh))
            verts.add(s)
            verts.add(d)
        return {
            "n_edges": len(edges),
            "n_vertices": len(verts),
            "n_shards_used": len(loads),
            "sum_replicas": len(inc),
            "avg_replication_milli": 1000 * len(inc) // len(verts),
            "max_shard_edges": max(loads.values()),
            "load_skew_milli": 1000 * max(loads.values()) * 16 // len(edges),
        }

    want = {
        "1d": metrics(lambda s, d: s % 16),
        "2d": metrics(lambda s, d: (s % 4) * 4 + (d % 4)),
    }
    rows = {r["strategy"]: r for r in q203_edge_partition_audit(spark, sf_dir).collect()}
    assert set(rows) == {"1d", "2d"}
    for strat, m in want.items():
        for k, v in m.items():
            assert rows[strat][k] == v, (strat, k, rows[strat][k], v)
    # grid cut: every vertex <= 2*sqrt(P)=8 replicas -> avg far below;
    # and the hot src spreads over a grid row, so worst load drops
    assert rows["2d"]["avg_replication_milli"] <= 8000
    assert rows["2d"]["load_skew_milli"] < rows["1d"]["load_skew_milli"]
    # 1d puts vertex 0's entire 30% out-degree on one shard
    assert rows["1d"]["load_skew_milli"] >= 3000


def test_q204_conjunctive_topk_vs_bruteforce(spark, sf_dir):
    """Brute-force doc scan: docs containing all three query terms,
    ranked by total tf — the posting-intersection result must match
    the scan exactly, including tie-breaks."""
    from voz_spark.corpus_ops import q204_inverted_index_search

    terms = ("hash", "merge", "window")
    scored = []
    for r in _docs(spark, sf_dir):
        tf = Counter(t for t in r["text"].split(" ") if t in terms)
        if len(tf) == 3:
            scored.append((r["doc_id"], sum(tf.values())))
    scored.sort(key=lambda x: (-x[1], x[0]))
    want = scored[:20]

    rows = q204_inverted_index_search(spark, sf_dir).collect()
    assert [(r["doc_id"], r["tf_total"]) for r in rows] == want
    assert all(r["n_terms"] == 3 for r in rows)


def test_q205_bitmap_equals_direct_on_every_segment(spark, sf_dir):
    """The bitmap-algebra count equals the row-predicate count on
    every segment, and both equal a Python replay; bitmaps stay
    non-negative (the 32-slot design guarantee)."""
    from voz_spark.corpus_ops import q205_bitmap_segment_index

    seg_n = defaultdict(int)
    seg_match = defaultdict(int)
    for r in _docs(spark, sf_dir):
        seg = r["doc_id"] // 32
        seg_n[seg] += 1
        if r["lang"] == "en" and r["source"].startswith("src1") and "spark" not in r["text"]:
            seg_match[seg] += 1

    rows = q205_bitmap_segment_index(spark, sf_dir).collect()
    assert {r["seg"] for r in rows} == set(seg_n)
    for r in rows:
        assert r["n_match_bitmap"] == r["n_match_direct"] == seg_match[r["seg"]]
        assert r["n_docs"] == seg_n[r["seg"]]
        assert 0 <= r["valid_bm"] < (1 << 32)
    assert sum(seg_match.values()) > 0  # the predicate actually selects
