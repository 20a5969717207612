"""Independent Python replays for the round-4 wave (q248-q257) —
semantics pinned against brute-force reimplementations, not just the
DuckDB oracles (which tests/test_oracle_parity.py already covers)."""

from __future__ import annotations

import hashlib
import itertools
import math
from collections import Counter, defaultdict

import pandas as pd

from voz_spark.registry import all_queries, release_caches


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_q248_weighted_sample_replay(spark, sf_dir):
    got = all_queries()["q248_weighted_sample"](spark, sf_dir).collect()
    release_caches(spark)
    d = _docs(sf_dir)
    want = {}
    for _, r in d.iterrows():
        pri = _h60(str(int(r.doc_id))) // max(int(r.n_chars), 1)
        want.setdefault(r.source, []).append((pri, int(r.doc_id)))
    for src in want:
        want[src] = sorted(want[src])[:10]
    for row in got:
        assert (row.pri, row.doc_id) in want[row.source], row
        assert want[row.source][row.rk - 1] == (row.pri, row.doc_id)


def test_q250_triangles_match_bruteforce(spark, sf_dir):
    got = {
        r.node: r.n_triangles
        for r in all_queries()["q250_triangle_count"](spark, sf_dir).collect()
    }
    release_caches(spark)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    per_order = defaultdict(set)
    for ok, pk in zip(li.l_orderkey, li.l_partkey):
        per_order[ok].add(pk)
    edges = set()
    for parts in per_order.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once (a < b < c normalized)
                if a < b < c:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    top = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == dict(top)


def test_q251_moments_replay(spark, sf_dir):
    rows = all_queries()["q251_embedding_moments"](spark, sf_dir).collect()
    release_caches(spark)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")["embedding"]
    for row in rows[:8]:  # spot-check a band of pairs
        i, j = row.i, row.j
        sxy = sum(
            math.floor(float(e[i]) * float(e[j]) * 1_000_000_000_000) for e in emb
        )
        assert row.sxy_e12 == sxy, (i, j, row.sxy_e12, sxy)
        assert row.n == len(emb)


def test_q257_groups_respect_target_plus_one_file(spark, sf_dir):
    """Full Python replay of the start-offset division, plus the real
    packing invariants: (a) files in a group are contiguous and groups
    don't interleave, (b) each non-final group's cumulative bytes CROSS
    its successor's boundary (the next file starts in the successor
    group: succ.group_no * TARGET <= cum_end(g) < (succ.group_no+1) *
    TARGET), and (c) each group's overshoot past its own boundary is
    bounded by its LAST file's bytes (the last file started strictly
    inside the group), not by a fixed multiple of the target."""
    rows = all_queries()["q257_compaction_plan"](spark, sf_dir).collect()
    release_caches(spark)
    from voz_spark.extras_r4 import _Q257_TARGET

    # independent per-file manifest replay from the raw parquet
    o = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    sizes = Counter(
        (p, int(k) % 200) for k, p in zip(o.o_orderkey, o.o_orderpriority)
    )
    file_bytes = {(p, f): 100 * n for (p, f), n in sizes.items()}
    want = {}
    for part in sorted({p for p, _ in file_bytes}):
        cum = 0
        for fid in sorted(f for p, f in file_bytes if p == part):
            b = file_bytes[(part, fid)]
            g = cum // _Q257_TARGET
            row = want.setdefault(
                (part, g), {"n": 0, "tot": 0, "first": fid, "last": fid}
            )
            row["n"] += 1
            row["tot"] += b
            row["last"] = fid
            cum += b
    got = {
        (r.part, r.group_no): {
            "n": r.n_files, "tot": r.total_bytes,
            "first": r.first_file, "last": r.last_file,
        }
        for r in rows
    }
    assert got == want

    by_part = defaultdict(list)
    for r in rows:
        by_part[r.part].append(r)
    for part, grs in by_part.items():
        grs.sort(key=lambda r: r.group_no)
        cum = 0
        for g, succ in itertools.zip_longest(grs, grs[1:]):
            if succ is not None:
                assert g.last_file < succ.first_file, (part, g, succ)
            cum_end = cum + g.total_bytes
            if succ is not None:
                # (b) the next file's start offset lands in the
                # successor group — start-offset division, exactly
                assert succ.group_no * _Q257_TARGET <= cum_end, (part, g, succ)
                assert cum_end < (succ.group_no + 1) * _Q257_TARGET, (part, g, succ)
            # (c) overshoot bounded by this group's own last file
            last_b = file_bytes[(part, g.last_file)]
            assert cum_end <= (g.group_no + 1) * _Q257_TARGET + last_b - 1, (
                part, g, last_b,
            )
            cum = cum_end


def test_q249_phrase_hits_replay(spark, sf_dir):
    got = {
        (r.phrase, r.doc_id): r.n_hits
        for r in all_queries()["q249_phrase_search"](spark, sf_dir).collect()
    }
    release_caches(spark)
    d = _docs(sf_dir)
    want = {}
    for _, r in d.iterrows():
        toks = r.text.strip().split()
        for phrase, w1, w2 in [
            ("table scan", "table", "scan"),
            ("hash join", "hash", "join"),
            ("sort merge", "sort", "merge"),
        ]:
            n = sum(
                1
                for a, b in zip(toks, toks[1:])
                if a == w1 and b == w2
            )
            if n:
                want[(phrase, int(r.doc_id))] = n
    assert got == want
