"""Semantics tests for q215 (novelty curve), q216 (delete-touch
plan), q217 (redirect ban closure)."""

import hashlib
from collections import defaultdict


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q215_novelty_vs_python(spark, sf_dir):
    """Replay trigram shingling and first-seen rounds in Python;
    round 0 is 100% novel by definition; later rounds are strictly
    below 100% (the corpus repeats itself)."""
    from voz_spark.corpus_ops import q215_novelty_curve
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    pres = defaultdict(set)  # round -> shingles
    n_docs = defaultdict(int)
    for r in docs:
        rd = r["doc_id"] % 6
        n_docs[rd] += 1
        tk = r["text"].split(" ")
        for i in range(len(tk) - 2):
            pres[rd].add(" ".join(tk[i : i + 3]))
    first = {}
    for rd in sorted(pres):
        for g in pres[rd]:
            first.setdefault(g, rd)

    rows = {r["round"]: r for r in q215_novelty_curve(spark, sf_dir).collect()}
    assert set(rows) == set(pres)
    for rd, shingles in pres.items():
        novel = sum(1 for g in shingles if first[g] == rd)
        got = rows[rd]
        assert got["n_docs"] == n_docs[rd]
        assert got["n_shingles"] == len(shingles)
        assert got["n_novel"] == novel
        assert got["novelty_milli"] == 1000 * novel // len(shingles)
    assert rows[0]["novelty_milli"] == 1000  # everything is new at round 0
    assert all(rows[rd]["novelty_milli"] < 1000 for rd in rows if rd > 0)


def test_q216_bucket_layout_beats_date_layout(spark, sf_dir):
    """Python replay of both layouts' touch sets; the bucketed layout
    must touch no more partitions than requested users' buckets and
    carry strictly lower rewrite amplification than the date layout."""
    from voz_spark.session import load_table
    from voz_spark.storage import q216_delete_touch_plan

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id").collect()
    parts = defaultdict(lambda: [0, 0])  # (layout, part) -> [n_rows, n_del]
    for r in ev:
        req = r["user_id"] % 29 == 3
        day = int(r["ts"].strftime("%Y%m%d"))
        for layout, part in (("date", day), ("bucket", r["user_id"] % 32)):
            p = parts[(layout, part)]
            p[0] += 1
            p[1] += int(req)
    want = {}
    for layout in ("date", "bucket"):
        ps = {k[1]: v for k, v in parts.items() if k[0] == layout}
        touched = {p: v for p, v in ps.items() if v[1] > 0}
        ndel = sum(v[1] for v in touched.values())
        nrw = sum(v[0] for v in touched.values())
        want[layout] = (len(ps), len(touched), ndel, nrw, 1000 * nrw // ndel)

    rows = {r["layout"]: r for r in q216_delete_touch_plan(spark, sf_dir).collect()}
    assert set(rows) == {"date", "bucket"}
    for layout, (np_, nt, ndel, nrw, amp) in want.items():
        g = rows[layout]
        assert (
            g["n_partitions"],
            g["n_touched"],
            g["n_delete_rows"],
            g["n_rows_rewritten"],
            g["amplification_milli"],
        ) == (np_, nt, ndel, nrw, amp)
    # same rows deleted either way; the layouts differ only in cost
    assert rows["date"]["n_delete_rows"] == rows["bucket"]["n_delete_rows"]
    assert (
        rows["bucket"]["amplification_milli"] < rows["date"]["amplification_milli"]
    )


def test_q217_ban_closure_vs_python(spark, sf_dir):
    """Resolve every chain in Python (follow u -> u-1 to the multiple
    of 7) and replay the rollup; transitive bans exist on clean hosts
    and direct bans are total on banned hosts."""
    from voz_spark.crawlops import q217_redirect_ban_closure

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for u in range(1000):
        t = u - (u % 7)  # terminal of the chain
        host, th = u % 20, t % 20
        a = agg[host]
        a[0] += 1
        a[1] += int(u % 7 == 0)
        a[2] += int(host in (7, 13))
        a[3] += int(host not in (7, 13) and th in (7, 13))

    rows = {r["host"]: r for r in q217_redirect_ban_closure(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for host, (n, nt, nd, ntr) in agg.items():
        g = rows[host]
        assert (g["n_urls"], g["n_terminal"], g["n_direct_banned"], g["n_transitive_banned"]) == (n, nt, nd, ntr)
    assert sum(r["n_transitive_banned"] for r in rows.values()) > 0
    for h in (7, 13):
        assert rows[h]["n_direct_banned"] == rows[h]["n_urls"]


def test_q218_mass_conservation_and_python_replay(spark, sf_dir):
    """Every near-dup cluster contributes exactly 1000 milli of mass;
    per-source rollup equals a Python replay built on q70's own
    cluster output (independent path to the same clusters)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from voz_spark.dataprep import (
        Q70_JACCARD_MIN,
        _jaccard_pairs,
        q218_softdedup_weights,
        q70_text_dedup_clusters,
    )
    from voz_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    # Python union-find over the engine's own pair rule
    pr = [
        (r["doc_a"], r["doc_b"])
        for r in _jaccard_pairs(d)
        .where(F.col("jaccard") >= Q70_JACCARD_MIN)
        .collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pr:
        union(a, b)
    members = defaultdict(list)
    for x in list(parent):
        members[find(x)].append(x)

    docs = d.select("doc_id", "source").collect()
    src_of = {r["doc_id"]: r["source"] for r in docs}
    weight = {i: 1000 for i in src_of}
    for root, ms in members.items():
        ms.sort()
        base, rem = divmod(1000, len(ms))
        for idx, m in enumerate(ms):
            weight[m] = base + (1 if idx < rem else 0)
        assert sum(weight[m] for m in ms) == 1000  # conservation

    want = defaultdict(lambda: [0, 0, 0])
    clustered = {m for ms in members.values() for m in ms}
    for i, s in src_of.items():
        w = want[s]
        w[0] += 1
        w[1] += int(i in clustered)
        w[2] += weight[i]

    rows = {r["source"]: r for r in q218_softdedup_weights(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for s, (n, nc, mass) in want.items():
        g = rows[s]
        assert (g["n_docs"], g["n_in_clusters"], g["eff_mass_milli"]) == (n, nc, mass)
        assert g["uniqueness_milli"] == mass // n
    # total effective mass == 1000 * (number of distinct content units)
    n_units = len(src_of) - len(clustered) + len(members)
    assert sum(r["eff_mass_milli"] for r in rows.values()) == 1000 * n_units
    # consistency with hard dedup: q70's cluster count equals ours
    q70 = q70_text_dedup_clusters(spark, sf_dir).collect()
    assert len(q70) == len(members)



def test_q222_linkage_vs_python_and_quality(spark, sf_dir):
    """Python replay of blocking + scoring + argmax; every A user
    whose true B record survives under at least one blocking key gets
    it back as 'match' or 'possible'; decoys never win over a true
    candidate with a higher score."""
    from collections import defaultdict

    from voz_spark.dataprep import q222_record_linkage
    from voz_spark.session import load_table

    users = sorted(
        {r["user_id"] for r in load_table(spark, sf_dir, "events").select("user_id").collect()}
    )
    A = {u: (f"n{u % 97}", f"c{u % 13}", 1950 + u % 50) for u in users}
    B = {}
    for u in users:
        if u % 9 != 4:
            B[u + 100000] = (
                f"n{(u + 1) % 97}" if u % 5 == 0 else f"n{u % 97}",
                f"c{(u + 1) % 13}" if u % 7 == 2 else f"c{u % 13}",
                1950 + ((u + 1) % 50 if u % 11 == 6 else u % 50),
            )
        if u % 10 == 3:
            B[u + 200000] = (f"n{(u + 43) % 97}", f"c{(u + 5) % 13}", 1950 + (u + 17) % 50)

    best = {}
    for u, (an, ac, ay) in A.items():
        cands = []
        for bid, (bn, bc, by) in B.items():
            if an != bn and ay != by:
                continue  # blocked out
            score = 40 * (an == bn) + 30 * (ay == by) + 20 * (ac == bc)
            cands.append((-score, bid))
        if cands:
            s, bid = min(cands)
            best[u] = (bid, -s)

    rows = {r["a_id"]: r for r in q222_record_linkage(spark, sf_dir).collect()}
    assert set(rows) == set(best)
    for u, (bid, score) in best.items():
        g = rows[u]
        assert (g["best_b_id"], g["score"]) == (bid, score)
        want_dec = "match" if score >= 60 else ("possible" if score >= 30 else "nonmatch")
        assert g["decision"] == want_dec
        assert g["is_true"] == (1 if bid == u + 100000 else 0)
    # linkage quality on this fixture: every decided 'match' is true
    matches = [r for r in rows.values() if r["decision"] == "match"]
    assert matches and all(r["is_true"] == 1 for r in matches)
    # and some true links exist only at 'possible' strength (noise)
    assert any(r["decision"] == "possible" and r["is_true"] == 1 for r in rows.values())
