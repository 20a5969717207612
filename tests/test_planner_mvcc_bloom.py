"""Semantics tests for the planner/MVCC/bloom wave: q209 join
cardinality estimation, q210 time-travel diff, q211 bloom sizing
sweep — each replayed independently in plain Python."""

import hashlib
from collections import Counter


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_q209_estimates_and_exact_vs_python(spark, sf_dir):
    """Exact Σ dA·dB replay plus both estimator formulas; on the
    planted-Zipf key the MCV estimate must beat the textbook ndv
    estimate by an order of magnitude."""
    from voz_spark.relational import q209_join_cardinality_estimate
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type").collect()

    def key(e):
        return e % 5 if e % 3 == 0 else 1000 + (e % 797)

    da = Counter(key(r["event_id"]) for r in ev)
    db = Counter(
        key(r["event_id"]) for r in ev if r["event_type"] in ("click", "view")
    )
    exact = sum(da[k] * db[k] for k in da if k in db)
    n_a, n_b = sum(da.values()), sum(db.values())
    ndv_a, ndv_b = len(da), len(db)
    est_basic = n_a * n_b // max(ndv_a, ndv_b)

    def mcv(d):
        return dict(sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:10])

    ma, mb = mcv(da), mcv(db)
    common = set(ma) & set(mb)
    mcv_n = sum(ma[k] * mb[k] for k in common)
    sa_m = sum(ma[k] for k in common)
    sb_m = sum(mb[k] for k in common)
    est_mcv = mcv_n + (n_a - sa_m) * (n_b - sb_m) // max(
        ndv_a - len(common), ndv_b - len(common)
    )

    [r] = q209_join_cardinality_estimate(spark, sf_dir).collect()
    assert (r["n_a"], r["n_b"], r["ndv_a"], r["ndv_b"]) == (n_a, n_b, ndv_a, ndv_b)
    assert r["exact_n"] == exact
    assert r["est_basic"] == est_basic
    assert r["est_mcv"] == est_mcv
    assert r["err_basic_milli"] == 1000 * abs(est_basic - exact) // exact
    assert r["err_mcv_milli"] == 1000 * abs(est_mcv - exact) // exact
    # MCV stats price the planted skew back in; the uniform formula
    # under-prices the join ~20x here
    assert r["err_mcv_milli"] < 100 < r["err_basic_milli"]


def test_q210_snapshot_diff_vs_python(spark, sf_dir):
    """Replay the commit log per doc in Python and diff snapshots
    T=2 vs T=4 — exact row equality, and every planted class
    (added is impossible here, removed, changed) behaves."""
    from voz_spark.session import load_table
    from voz_spark.storage import q210_time_travel_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {}
    for r in docs:
        i, text = r["doc_id"], r["text"]
        log = [(1, "upsert", _md5(text))]
        if i % 7 == 1:
            log.append((2, "upsert", _md5("v2:" + text)))
        if i % 11 == 2:
            log.append((3, "delete", None))
        if i % 5 == 0:
            log.append((4, "upsert", _md5("v4:" + text)))

        def state(t):
            live = [e for e in log if e[0] <= t]
            seq, op, content = max(live)
            return content if op != "delete" else None

        v2, v4 = state(2), state(4)
        if v2 is None and v4 is None:
            continue
        if v2 is None:
            want[i] = ("added", "-", v4)
        elif v4 is None:
            want[i] = ("removed", v2, "-")
        elif v2 != v4:
            want[i] = ("changed", v2, v4)

    rows = q210_time_travel_diff(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["status"], r["content_t2"], r["content_t4"]) for r in rows}
    assert got == want
    statuses = {s for s, _, _ in want.values()}
    # deleted-then-reupserted docs (i%55==35) surface as 'changed';
    # plain deletes as 'removed'; v2/v4 rewrites as 'changed'
    assert "removed" in statuses and "changed" in statuses


def test_q211_bloom_model_vs_python_and_no_false_negatives(spark, sf_dir):
    """Replay both sizings bit-for-bit in Python; FPR shrinks with
    bits/key; and the same model over the SEEN set itself has zero
    false negatives (every seen key hits all k positions)."""
    from voz_spark.crawlops import q211_bloom_sizing_sweep
    from voz_spark.session import load_table

    ev = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    ]
    seen = [2 * e for e in ev]
    cand = [2 * e + 1 for e in ev]
    rows = {r["bits_per_key"]: r for r in q211_bloom_sizing_sweep(spark, sf_dir).collect()}
    assert set(rows) == {8, 16}
    for bpk, k in ((8, 4), (16, 8)):
        m = len(seen) * bpk
        bits = {_h60(f"b{i}|{u}") % m for u in seen for i in range(k)}
        fp = sum(
            1
            for u in cand
            if all(_h60(f"b{i}|{u}") % m in bits for i in range(k))
        )
        r = rows[bpk]
        assert r["n_seen"] == len(seen) and r["n_candidates"] == len(cand)
        assert r["n_bits"] == m
        assert r["n_bits_set"] == len(bits)
        assert r["fill_milli"] == 1000 * len(bits) // m
        assert r["n_false_positive"] == fp
        assert r["fpr_micro"] == 1_000_000 * fp // len(cand)
        # no false negatives: every seen key passes its own filter
        assert all(
            all(_h60(f"b{i}|{u}") % m in bits for i in range(k)) for u in seen[:200]
        )
    assert rows[16]["fpr_micro"] <= rows[8]["fpr_micro"]
    assert rows[8]["n_false_positive"] > 0  # the sweep actually measures something


def test_q221_scd2_slices_reproduce_time_travel(spark, sf_dir):
    """Python replay of the interval build, plus the cross-query
    consistency gate: slicing the SCD2 table at seq 2 and seq 4
    reproduces q210's snapshots (and therefore its diff) exactly."""
    from voz_spark.session import load_table
    from voz_spark.storage import q210_time_travel_diff, q221_scd2_history

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = []  # (doc_id, from, to, content, is_current)
    snap = {2: {}, 4: {}}
    for r in docs:
        i, text = r["doc_id"], r["text"]
        log = [(1, "upsert", _md5(text))]
        if i % 7 == 1:
            log.append((2, "upsert", _md5("v2:" + text)))
        if i % 11 == 2:
            log.append((3, "delete", None))
        if i % 5 == 0:
            log.append((4, "upsert", _md5("v4:" + text)))
        for k, (seq, op, content) in enumerate(log):
            nxt = log[k + 1][0] if k + 1 < len(log) else None
            if op == "delete":
                continue
            to = (nxt - 1) if nxt is not None else 9999
            cur = 1 if nxt is None else 0
            want.append((i, seq, to, content, cur))
            for t in (2, 4):
                if seq <= t <= to:
                    snap[t][i] = content

    rows = q221_scd2_history(spark, sf_dir).collect()
    got = [
        (r["doc_id"], r["valid_from_seq"], r["valid_to_seq"], r["content"], r["is_current"])
        for r in rows
    ]
    assert sorted(got) == sorted(want)
    # every doc has exactly one current version unless its last op was
    # a delete with no re-upsert
    cur = [g for g in got if g[4] == 1]
    assert len(cur) == len({g[0] for g in cur})

    # SCD2 slice at T == q210 snapshot -> same diff
    diff = {}
    keys = set(snap[2]) | set(snap[4])
    for i in keys:
        v2, v4 = snap[2].get(i), snap[4].get(i)
        if v2 is None and v4 is not None:
            diff[i] = ("added", "-", v4)
        elif v4 is None and v2 is not None:
            diff[i] = ("removed", v2, "-")
        elif v2 != v4:
            diff[i] = ("changed", v2, v4)
    q210 = {
        r["doc_id"]: (r["status"], r["content_t2"], r["content_t4"])
        for r in q210_time_travel_diff(spark, sf_dir).collect()
    }
    assert q210 == diff
