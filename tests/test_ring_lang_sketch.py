"""Semantics tests for q228 (consistent-hash ring audit), q229
(code-switch segmentation), q230 (KMV set algebra) — each pinned
against an independent pure-Python replay."""

import hashlib
import re
from collections import defaultdict


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q228_ring_vs_python_and_consistency_property(spark, sf_dir):
    """Replay the ring assignment; every moved host must land on the
    NEW shard (ring_moved_to_survivor == 0) and modulo churn must be
    several times the ring churn."""
    from voz_spark.crawlops import (
        _Q228_HOSTS,
        _Q228_K,
        _Q228_V,
        q228_consistent_ring_audit,
    )
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    load = defaultdict(int)
    for r in ev:
        load[r["event_id"] % _Q228_HOSTS] += 1

    def ring(k):
        pts = sorted(
            (_h60(f"ring:{s}:{v}"), s) for s in range(k) for v in range(_Q228_V)
        )
        return pts

    r16, r17 = ring(_Q228_K), ring(_Q228_K + 1)

    def assign(pts, h):
        for pos, s in pts:
            if pos >= h:
                return s
        return pts[0][1]

    want = defaultdict(lambda: [0, 0, 0, 0, 0])  # shard -> stats
    for host, n in load.items():
        h = _h60(str(host))
        s16, s17 = assign(r16, h), assign(r17, h)
        st = want[s16]
        st[0] += 1
        st[1] += n
        if s17 != s16:
            st[2] += 1
            if s17 != _Q228_K:
                st[3] += 1
        if host % _Q228_K != host % (_Q228_K + 1):
            st[4] += 1
    rows = {r["shard"]: r for r in q228_consistent_ring_audit(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for s, (nh, nu, rm, rms, mm) in want.items():
        r = rows[s]
        assert (
            r["n_hosts"], r["n_urls"], r["ring_moved"],
            r["ring_moved_to_survivor"], r["mod_moved_from_here"],
        ) == (nh, nu, rm, rms, mm)
    # the consistent-hashing guarantee + the modulo pathology
    assert all(r["ring_moved_to_survivor"] == 0 for r in rows.values())
    ring_total = sum(r["ring_moved"] for r in rows.values())
    mod_total = sum(r["mod_moved_from_here"] for r in rows.values())
    assert mod_total > 3 * ring_total > 0


_STOP = {"the", "a", "of", "and", "to", "in", "is"}


def test_q229_segments_vs_python(spark, sf_dir):
    """Replay paragraph langid + island merge; doc counts must match
    exactly and the fixture must actually contain code-switch docs."""
    from voz_spark.corpus_ops import _Q229_PARA, q229_code_switch_segments
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    want = {}
    for d in docs:
        w = re.split(r"\s+", d["text"].strip())
        paras = [
            " ".join(w[i * _Q229_PARA : (i + 1) * _Q229_PARA])
            for i in range((len(w) + _Q229_PARA - 1) // _Q229_PARA)
        ]
        preds = []
        for p in paras:
            toks = p.split(" ")
            preds.append("en" if 20 * sum(t in _STOP for t in toks) >= len(toks) else "unk")
        segs = []
        for p in preds:
            if not segs or segs[-1][0] != p:
                segs.append([p, 0])
            segs[-1][1] += 1
        want[d["doc_id"]] = (
            d["lang"], len(preds), len(segs),
            sum(n for p, n in segs if p == "en"),
            max(n for _, n in segs),
        )
    rows = {r["doc_id"]: r for r in q229_code_switch_segments(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for did, (lang, np_, ns, ne, mr) in want.items():
        r = rows[did]
        assert (r["lang"], r["n_paras"], r["n_segments"], r["n_en_paras"], r["max_run"]) == (
            lang, np_, ns, ne, mr,
        )
    assert any(r["n_segments"] > 1 for r in rows.values())


def test_q230_kmv_algebra_vs_python(spark, sf_dir):
    """Replay the merged sketches and estimates; exact counts must
    match a set replay, rho must match, and estimates must agree with
    the replay formula to float tolerance AND sit within 60% of the
    exact answer (k=64 accuracy sanity)."""
    from voz_spark.dataprep import _KMV_K, _KMV_SPACE, q230_kmv_set_algebra
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    users = defaultdict(set)
    for r in ev:
        users[r["event_type"]].add(r["user_id"])
    hs = {
        t: sorted(hashlib.md5(str(u).encode()).hexdigest()[:12] for u in us)
        for t, us in users.items()
    }
    sk = {t: set(v[:_KMV_K]) for t, v in hs.items()}
    rows = {(r["ta"], r["tb"]): r for r in q230_kmv_set_algebra(spark, sf_dir).collect()}
    types = sorted(users)
    expect_pairs = {(a, b) for i, a in enumerate(types) for b in types[i + 1 :]}
    assert set(rows) == expect_pairs
    for (a, b), r in rows.items():
        eu = len(users[a] | users[b])
        ei = len(users[a] & users[b])
        merged = sorted(sk[a] | sk[b])[:_KMV_K]
        rho = sum(1 for h in merged if h in sk[a] and h in sk[b])
        if len(merged) < _KMV_K:
            est_u = float(len(merged))
        else:
            est_u = (_KMV_K - 1) * _KMV_SPACE / int(merged[-1], 16)
        est_i = rho * est_u / _KMV_K
        assert (r["exact_union"], r["exact_inter"], r["rho"]) == (eu, ei, rho)
        assert abs(r["est_union"] - est_u) < 1e-4
        assert abs(r["est_inter"] - est_i) < 1e-4
        # sketch quality: within 60% relative error at k=64
        assert abs(est_u - eu) <= 0.6 * eu
        if ei >= 20:
            assert abs(est_i - ei) <= 0.6 * ei


def test_q231_incremental_merge_equals_recompute_and_is_incremental(spark, sf_dir):
    """Python full-recompute replay must equal the merged view, and
    the delta batch must actually change standing cells (the merge is
    exercised, not a no-op)."""
    from decimal import Decimal

    from voz_spark.session import load_table
    from voz_spark.storage import q231_incremental_view_merge

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "user_id", "value"
    ).collect()
    full, base = {}, {}
    for r in ev:
        key = (r["event_type"], r["ts"].strftime("%Y-%m-%d"))
        for tgt in ([full, base] if r["event_id"] % 10 < 8 else [full]):
            cell = tgt.setdefault(key, [0, Decimal(0), set()])
            cell[0] += 1
            cell[1] += Decimal(str(round(r["value"], 3)))
            cell[2].add(r["user_id"])
    rows = {(r["event_type"], r["day"]): r for r in q231_incremental_view_merge(spark, sf_dir).collect()}
    assert set(rows) == set(full)
    for key, (n, sv, us) in full.items():
        r = rows[key]
        assert (r["n_events"], r["n_users"]) == (n, len(us))
        assert abs(Decimal(str(r["sum_value"])) - sv) < Decimal("0.001")
    changed = [k for k in full if full[k][0] != base.get(k, [0])[0]]
    assert changed  # the delta actually touched standing cells


def test_q232_walks_vs_python(spark, sf_dir):
    """Replay the hash-deterministic walks; every step must follow a
    graph edge and match the argmin-md5 choice exactly."""
    from voz_spark.relational import _Q232_STARTS, _Q232_STEPS, q232_deterministic_walks
    from voz_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    pair_orders = defaultdict(int)
    for ps in orders.values():
        s = sorted(ps)
        for i, u in enumerate(s):
            for v in s[i + 1 :]:
                pair_orders[(u, v)] += 1
    adj = defaultdict(set)
    for (u, v), w in pair_orders.items():
        if w >= 2:
            adj[u].add(v)
            adj[v].add(u)
    starts = sorted(adj)[:_Q232_STARTS]
    want = []
    for wk in starts:
        node = wk
        want.append((wk, 0, node))
        for k in range(1, _Q232_STEPS + 1):
            node = min(
                adj[node],
                key=lambda d: (hashlib.md5(f"{wk}:{k}:{d}".encode()).hexdigest(), d),
            )
            want.append((wk, k, node))
    got = [
        (r["walker"], r["step"], r["node"])
        for r in q232_deterministic_walks(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)
    # walk validity: each step follows an edge
    pos = {(w, s): n for w, s, n in got}
    for (w, s), n in pos.items():
        if s > 0:
            assert n in adj[pos[(w, s - 1)]]


def test_q233_grid_join_vs_bruteforce(spark, sf_dir):
    """Brute-force O(n^2) distance truth must equal the grid join's
    band histogram exactly — the 3x3 probe provably loses nothing."""
    import itertools
    import math

    from voz_spark.relational import _Q233_EPS, _Q233_SPACE, q233_grid_neighbor_join
    from voz_spark.session import load_table

    ids = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events")
        .select("event_id")
        .where("event_id % 5 = 0")
        .collect()
    ]
    pts = {
        i: (_h60(f"{i}:x") % _Q233_SPACE, _h60(f"{i}:y") % _Q233_SPACE) for i in ids
    }
    bands = defaultdict(lambda: [0, 0])
    for a, b in itertools.combinations(sorted(pts), 2):
        d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
        if d2 <= _Q233_EPS * _Q233_EPS:
            bd = int(math.floor(math.sqrt(d2))) // 5
            bands[bd][0] += 1
            bands[bd][1] += d2
    got = {r["band"]: (r["n_pairs"], r["sum_d2"]) for r in q233_grid_neighbor_join(spark, sf_dir).collect()}
    assert got == {k: tuple(v) for k, v in bands.items()}
    assert sum(v[0] for v in got.values()) > 0


def test_q234_funnel_vs_python(spark, sf_dir):
    """Replay the strictly-ordered min-timestamp funnel per user."""
    from voz_spark.relational import q234_ordered_funnel
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_type"]))
    n = [0, 0, 0]
    for evs in by_user.values():
        t1 = min((t for t, e in evs if e == "view"), default=None)
        if t1 is None:
            continue
        n[0] += 1
        t2 = min((t for t, e in evs if e == "click" and t > t1), default=None)
        if t2 is None:
            continue
        n[1] += 1
        t3 = min((t for t, e in evs if e == "purchase" and t > t2), default=None)
        if t3 is not None:
            n[2] += 1
    rows = {r["stage"]: r for r in q234_ordered_funnel(spark, sf_dir).collect()}
    assert [rows[s]["n_users"] for s in (1, 2, 3)] == n
    assert rows[2]["conv_from_prev_milli"] == 1000 * n[1] // n[0]
    assert rows[3]["conv_from_prev_milli"] == 1000 * n[2] // n[1]
    assert rows[3]["conv_from_first_milli"] == 1000 * n[2] // n[0]
    assert n[0] >= n[1] >= n[2] > 0  # monotone, non-degenerate


def test_q235_retention_vs_python(spark, sf_dir):
    """Replay cohorting; day_offset 0 is always 1000 milli and equals
    the cohort size."""
    from voz_spark.relational import q235_retention_cohorts
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    days = defaultdict(set)
    for r in ev:
        days[r["user_id"]].add(r["ts"].date())
    cohort = {u: min(ds) for u, ds in days.items()}
    size = defaultdict(int)
    for u in cohort:
        size[cohort[u]] += 1
    cells = defaultdict(int)
    for u, ds in days.items():
        for d in ds:
            cells[(cohort[u], (d - cohort[u]).days)] += 1
    rows = {
        (r["cohort_day"], r["day_offset"]): r
        for r in q235_retention_cohorts(spark, sf_dir).collect()
    }
    assert set(rows) == {(d.strftime("%Y-%m-%d"), o) for d, o in cells}
    for (d, o), na in cells.items():
        r = rows[(d.strftime("%Y-%m-%d"), o)]
        assert (r["n_active"], r["cohort_size"]) == (na, size[d])
        assert r["retention_milli"] == 1000 * na // size[d]
    for (cd, o), r in rows.items():
        if o == 0:
            assert r["retention_milli"] == 1000 and r["n_active"] == r["cohort_size"]


def test_q236_skipgram_vs_python(spark, sf_dir):
    """Replay window-2 skip-gram extraction over the replayed walks;
    pair counts must match with multiplicity and every pair must be
    symmetric (directed both ways with equal counts)."""
    from voz_spark.relational import (
        _Q232_STARTS,
        _Q232_STEPS,
        _Q236_WINDOW,
        q236_skipgram_pairs,
    )
    from voz_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    pair_orders = defaultdict(int)
    for ps in orders.values():
        s = sorted(ps)
        for i, u in enumerate(s):
            for v in s[i + 1 :]:
                pair_orders[(u, v)] += 1
    adj = defaultdict(set)
    for (u, v), w in pair_orders.items():
        if w >= 2:
            adj[u].add(v)
            adj[v].add(u)
    walks = []
    for wk in sorted(adj)[:_Q232_STARTS]:
        node, walk = wk, [wk]
        for k in range(1, _Q232_STEPS + 1):
            node = min(
                adj[node],
                key=lambda d: (hashlib.md5(f"{wk}:{k}:{d}".encode()).hexdigest(), d),
            )
            walk.append(node)
        walks.append(walk)
    want = defaultdict(int)
    for walk in walks:
        for i, c in enumerate(walk):
            for j, x in enumerate(walk):
                if i != j and abs(i - j) <= _Q236_WINDOW:
                    want[(c, x)] += 1
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in q236_skipgram_pairs(spark, sf_dir).collect()
    }
    assert got == dict(want)
    for (c, x), n in got.items():
        assert got[(x, c)] == n  # symmetric multiplicity


def test_q237_profile_vs_python(spark, sf_dir):
    """Replay the per-column profile: rows/nulls/NDV exact for every
    column; min/max strings exact for int/string/timestamp columns and
    value-checked (to rounding) for doubles."""
    from voz_spark.relational import _Q237_COLS, q237_data_profile
    from voz_spark.session import load_table

    rows = {
        (r["table_name"], r["column_name"]): r
        for r in q237_data_profile(spark, sf_dir).collect()
    }
    assert set(rows) == {(t, c) for t, c, _ in _Q237_COLS}
    for table in ("orders", "events", "documents"):
        cols = [(c, k) for t, c, k in _Q237_COLS if t == table]
        data = load_table(spark, sf_dir, table).select([c for c, _ in cols]).collect()
        for c, k in cols:
            vals = [r[c] for r in data]
            nn = [v for v in vals if v is not None]
            r = rows[(table, c)]
            assert (r["n_rows"], r["n_nulls"], r["ndv"]) == (
                len(vals), len(vals) - len(nn), len(set(nn)),
            )
            if k == "int":
                assert (r["min_str"], r["max_str"]) == (str(min(nn)), str(max(nn)))
            elif k == "str":
                assert (r["min_str"], r["max_str"]) == (min(nn), max(nn))
            elif k == "ts":
                assert r["min_str"] == min(nn).strftime("%Y-%m-%d %H:%M:%S")
                assert r["max_str"] == max(nn).strftime("%Y-%m-%d %H:%M:%S")
            else:  # double: engine-stable DECIMAL(18,3) string
                assert abs(float(r["min_str"]) - min(nn)) < 0.001
                assert abs(float(r["max_str"]) - max(nn)) < 0.001
                assert r["min_str"].count(".") == 1 and len(r["min_str"].split(".")[1]) == 3


def test_q238_anomaly_vs_python(spark, sf_dir):
    """Replay daily counts + spike, median/MAD, and the outlier rule;
    the planted spike day must be flagged."""
    import statistics

    from voz_spark.crawlops import _Q238_SPIKE, _Q238_SPIKE_DAY, q238_metric_anomaly_days
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["ts"].strftime("%Y-%m-%d")] += 1
    if _Q238_SPIKE_DAY in daily:
        daily[_Q238_SPIKE_DAY] += _Q238_SPIKE
    med = round(statistics.median(daily.values()), 4)
    devs = {d: abs(n - med) for d, n in daily.items()}
    mad = round(statistics.median(devs.values()), 4)
    rows = {r["day"]: r for r in q238_metric_anomaly_days(spark, sf_dir).collect()}
    assert set(rows) == set(daily)
    for d, n in daily.items():
        r = rows[d]
        assert r["n"] == n
        assert abs(r["abs_dev"] - round(devs[d], 4)) < 1e-9
        assert r["is_outlier"] == int(devs[d] > 3 * max(mad, 1.0))
    if _Q238_SPIKE_DAY in daily:
        assert rows[_Q238_SPIKE_DAY]["is_outlier"] == 1


def test_q239_backfill_vs_python(spark, sf_dir):
    """Replay expected-vs-present partitions and gap islanding; the
    planted view hole must appear as one contiguous 3-day gap when its
    days fall inside the calendar span."""
    from datetime import timedelta

    from voz_spark.crawlops import q239_backfill_gaps
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    present = set()
    types = set()
    lo = hi = None
    for r in ev:
        d = r["ts"].date()
        lo = d if lo is None or d < lo else lo
        hi = d if hi is None or d > hi else hi
        types.add(r["event_type"])
        day = d.strftime("%Y-%m-%d")
        if (r["event_type"] == "view" and "2024-01-10" <= day <= "2024-01-12") or (
            r["event_type"] == "error" and day == "2024-01-20"
        ):
            continue
        present.add((r["event_type"], day))
    missing = defaultdict(list)
    d = lo
    while d <= hi:
        day = d.strftime("%Y-%m-%d")
        for t in types:
            if (t, day) not in present:
                missing[t].append(day)
        d += timedelta(days=1)
    want = set()
    for t, days in missing.items():
        run = [days[0]]
        from datetime import date as _date

        def _next(a, b):
            ya, ma, da = map(int, a.split("-"))
            yb, mb, db = map(int, b.split("-"))
            return (_date(yb, mb, db) - _date(ya, ma, da)).days == 1

        for prev, cur in zip(days, days[1:]):
            if _next(prev, cur):
                run.append(cur)
            else:
                want.add((t, run[0], run[-1], len(run)))
                run = [cur]
        want.add((t, run[0], run[-1], len(run)))
    got = {
        (r["event_type"], r["gap_start"], r["gap_end"], r["n_days"])
        for r in q239_backfill_gaps(spark, sf_dir).collect()
    }
    assert got == want
    view_gaps = {g for g in got if g[0] == "view" and g[1] <= "2024-01-12" and g[2] >= "2024-01-10"}
    if lo.strftime("%Y-%m-%d") <= "2024-01-10" and hi.strftime("%Y-%m-%d") >= "2024-01-12":
        assert any(g[3] >= 3 for g in view_gaps)


def test_q240_asof_enrich_vs_python(spark, sf_dir):
    """Replay the commit log, intervals, and the as-of lookup; deleted
    gaps must surface as no_version and every 'ok' content must equal
    the q210-style snapshot at that seq."""
    import hashlib as _hl

    from voz_spark.session import load_table
    from voz_spark.storage import q240_scd2_asof_enrich

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    log = defaultdict(list)  # doc -> [(seq, op, content)]
    for r in docs:
        did, txt = r["doc_id"], r["text"]
        log[did].append((1, "upsert", _hl.md5(txt.encode()).hexdigest()))
        if did % 7 == 1:
            log[did].append((2, "upsert", _hl.md5(("v2:" + txt).encode()).hexdigest()))
        if did % 11 == 2:
            log[did].append((3, "delete", None))
        if did % 5 == 0:
            log[did].append((4, "upsert", _hl.md5(("v4:" + txt).encode()).hexdigest()))

    def version_at(did, at):
        vers = [e for e in log[did] if e[0] <= at]
        if not vers:
            return None
        seq, op, content = max(vers)
        return None if op == "delete" else content

    facts = set()
    for r in docs:
        did = r["doc_id"]
        facts.add((did, 1 + did % 4))
        if did % 3 == 0:
            facts.add((did, 4))
    want = {}
    for did, at in facts:
        c = version_at(did, at)
        want[(did, at)] = ("-", "no_version") if c is None else (c, "ok")
    rows = {(r["doc_id"], r["at_seq"]): (r["content"], r["status"])
            for r in q240_scd2_asof_enrich(spark, sf_dir).collect()}
    assert rows == want
    assert any(v[1] == "no_version" for v in rows.values())  # the gap is real


def test_q241_recrawl_vs_python(spark, sf_dir):
    """Replay the change observations and the interval table; class
    monotonicity must hold in aggregate (static always 32d; fast docs
    mostly 2d) and the interval is monotone in n_changed."""
    from voz_spark.crawlops import q241_recrawl_schedule
    from voz_spark.session import load_table

    ids = [r["doc_id"] for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()]
    table = {0: 32, 1: 16, 2: 8, 3: 4}
    want = {}
    for did in ids:
        cls = ["static", "slow", "medium", "fast"][did % 4]
        nc = 0
        for i in range(2, 7):
            h = _h60(f"{did}:{i}")
            if did % 4 == 0:
                ch = 0
            elif did % 4 == 1:
                ch = int(h % 5 == 0)
            elif did % 4 == 2:
                ch = int(h % 2 == 0)
            else:
                ch = int(h % 10 != 0)
            nc += ch
        want[did] = (cls, nc, table.get(nc, 2))
    rows = {r["doc_id"]: r for r in q241_recrawl_schedule(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for did, (cls, nc, days) in want.items():
        r = rows[did]
        assert (r["rate_class"], r["n_obs"], r["n_changed"], r["revisit_days"]) == (
            cls, 5, nc, days,
        )
    statics = [r for r in rows.values() if r["rate_class"] == "static"]
    fasts = [r for r in rows.values() if r["rate_class"] == "fast"]
    assert statics and all(r["revisit_days"] == 32 for r in statics)
    assert fasts and sum(r["revisit_days"] <= 4 for r in fasts) > len(fasts) * 0.8


def test_q242_stream_equals_batch(spark, sf_dir):
    """The streaming anomaly monitor must reproduce the batch q238
    rows exactly (same policy, same oracle — the q178 discipline)."""
    from voz_spark.crawlops import q238_metric_anomaly_days
    from voz_spark.streaming import q242_streaming_anomaly

    batch = sorted(map(tuple, q238_metric_anomaly_days(spark, sf_dir).collect()))
    stream = sorted(map(tuple, q242_streaming_anomaly(spark, sf_dir).collect()))
    assert stream == batch
    assert len(batch) > 1


def test_q243_interval_overlap_vs_bruteforce(spark, sf_dir):
    """Brute-force all A x B interval overlaps must equal the bucketed
    join's histogram exactly (first-shared-bucket crediting emits each
    pair once)."""
    from voz_spark.relational import q243_interval_overlap_join
    from voz_spark.session import load_table

    ids = [r["event_id"] for r in load_table(spark, sf_dir, "events").select("event_id").collect()]

    def iv(eid):
        s = (eid * 37) % 10000
        return (s, s + 1 + _h60(f"{eid}:len") % 50)

    A = [iv(e) for e in ids if e % 3 == 0]
    B = [iv(e) for e in ids if e % 3 == 1]
    bands = defaultdict(lambda: [0, 0])
    for sa, ea in A:
        for sb, eb in B:
            if sa <= eb and sb <= ea:
                ov = min(ea, eb) - max(sa, sb) + 1
                bands[ov // 10][0] += 1
                bands[ov // 10][1] += ov
    got = {r["band"]: (r["n_pairs"], r["sum_overlap"]) for r in q243_interval_overlap_join(spark, sf_dir).collect()}
    assert got == {k: tuple(v) for k, v in bands.items()}
    assert sum(v[0] for v in got.values()) > 0


def test_q244_host_mirror_vs_python(spark, sf_dir):
    """Replay host shingle unions + 8 minhashes + 2-minhash bands; the
    planted mirror pair (h3, m3) must surface at 8/8 matches."""
    import re as _re

    from voz_spark.crawlops import q244_host_mirror_minhash
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    hosts = defaultdict(set)
    for r in docs:
        tk = _re.split(r"\s+", r["text"].strip())
        sh = {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        hosts[f"h{r['doc_id'] % 19}"] |= sh
        if r["doc_id"] % 19 == 3:
            hosts["m3"] |= sh
    sk = {
        h: [min(hashlib.md5(f"{s}#{j}".encode()).hexdigest() for s in ss) for j in range(8)]
        for h, ss in hosts.items()
    }
    names = sorted(sk)
    want = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            banded = any(
                sk[a][x] == sk[b][x] and sk[a][y] == sk[b][y]
                for x, y in [(0, 1), (2, 3), (4, 5), (6, 7)]
            )
            if banded:
                m = sum(sk[a][j] == sk[b][j] for j in range(8))
                want[(a, b)] = (m, 1000 * m // 8)
    got = {
        (r["host_a"], r["host_b"]): (r["n_match"], r["est_milli"])
        for r in q244_host_mirror_minhash(spark, sf_dir).collect()
    }
    assert got == want
    assert got.get(("h3", "m3")) == (8, 1000)


def test_q245_reputation_vs_python(spark, sf_dir):
    """Replay the integer shift-decay; fresher successes must weigh
    exponentially more and every value is float-free exact."""
    from voz_spark.crawlops import q245_decayed_host_reputation
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    d1 = max(r["ts"].date() for r in ev)
    want = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        h = f"h{r['user_id'] % 20}"
        ok = int(r["event_type"] != "error")
        age_w = min((d1 - r["ts"].date()).days // 7, 10)
        st = want[h]
        st[0] += 1
        st[1] += ok
        st[2] += ok * (1024 >> age_w)
    rows = {r["host"]: r for r in q245_decayed_host_reputation(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for h, (n, s, rep) in want.items():
        r = rows[h]
        assert (r["n_events"], r["n_success"], r["rep_score"]) == (n, s, rep)


def test_q246_transitions_vs_python(spark, sf_dir):
    """Replay sessionized transitions; per-from milli probabilities
    must sum to <= 1000 with DIV truncation and the matrix must cover
    exactly the observed pairs."""
    from voz_spark.relational import q246_session_transitions
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for (pt, _, pe), (ct, _, ce) in zip(evs, evs[1:]):
            if (ct - pt).total_seconds() <= 1800:
                trans[(pe, ce)] += 1
    tot = defaultdict(int)
    for (f, _), n in trans.items():
        tot[f] += n
    rows = {(r["from_type"], r["to_type"]): r for r in q246_session_transitions(spark, sf_dir).collect()}
    assert set(rows) == set(trans)
    for (f, t), n in trans.items():
        r = rows[(f, t)]
        assert (r["n_trans"], r["prob_milli"]) == (n, 1000 * n // tot[f])
    for f in tot:
        s = sum(r["prob_milli"] for (ff, _), r in rows.items() if ff == f)
        assert 995 <= s <= 1000  # DIV truncation loses < 5 per row set


def test_q247_attribution_vs_python(spark, sf_dir):
    """Replay U-shaped credit; every session's credit must sum to
    exactly 1000 milli (conservation) and the per-type rollup must
    match exactly."""
    from voz_spark.relational import q247_position_attribution
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    want = defaultdict(lambda: [0, 0, 0, 0])
    total_sessions = 0
    for evs in by_user.values():
        evs.sort()
        sessions, cur = [], [evs[0]]
        for prev, e in zip(evs, evs[1:]):
            if (e[0] - prev[0]).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(e)
        sessions.append(cur)
        for sess in sessions:
            total_sessions += 1
            n = len(sess)
            credits = []
            if n == 1:
                credits = [1000]
            elif n == 2:
                credits = [500, 500]
            else:
                base, rem = divmod(200, n - 2)
                credits = (
                    [400]
                    + [base + (1 if i + 1 <= rem else 0) for i in range(n - 2)]
                    + [400]
                )
            assert sum(credits) == 1000  # conservation by construction
            for pos, ((_, _, typ), cr) in enumerate(zip(sess, credits), 1):
                st = want[typ]
                st[3] += cr
                if pos == 1:
                    st[0] += 1
                elif pos == n:
                    st[1] += 1
                else:
                    st[2] += 1
    rows = {r["event_type"]: r for r in q247_position_attribution(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for typ, (nf, nl, nm, cm) in want.items():
        r = rows[typ]
        assert (r["n_first"], r["n_last"], r["n_middle"], r["credit_milli"]) == (
            nf, nl, nm, cm,
        )
    # global conservation: total credit == 1000 * sessions
    assert sum(r["credit_milli"] for r in rows.values()) == 1000 * total_sessions
