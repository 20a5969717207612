"""Semantics + plan-shape tests for the anti-entropy / salted-join /
bandit-policy wave (q199-q201)."""

import hashlib
import re


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q199_finds_exactly_the_drifted_buckets(spark, sf_dir):
    """Independent Python recompute: the dirty-bucket set equals the
    buckets of the planted drop sets, and the per-bucket missing
    counts equal the planted drops (drift, not corpus)."""
    from voz_spark.crawlops import q199_seen_antientropy

    drop_a = {}  # bucket -> keys missing from A (present in B)
    drop_b = {}
    for u in range(20000):
        h = _h60(str(u))
        bkt = h % 64
        if bkt == 7 and h % 13 == 0:
            drop_a.setdefault(bkt, []).append(u)
        if bkt == 42 and h % 11 == 0:
            drop_b.setdefault(bkt, []).append(u)
    want_dirty = set(drop_a) | set(drop_b)
    rows = {r["bucket"]: r for r in q199_seen_antientropy(spark, sf_dir).collect()}
    assert set(rows) == want_dirty
    for bkt, r in rows.items():
        assert r["n_missing_in_a"] == len(drop_a.get(bkt, []))
        assert r["n_missing_in_b"] == len(drop_b.get(bkt, []))
        if drop_a.get(bkt):
            assert r["first_missing_in_a"] == min(drop_a[bkt])
        else:
            assert r["first_missing_in_a"] == -1


def test_q199_repair_reads_are_partition_pruned(spark, sf_dir):
    """The pass-2 scans carry PartitionFilters on the dirty-bucket
    IN-list — the repair never re-reads clean buckets (only buckets
    7 and 42 carry planted drift; e.g. 23 must be absent)."""
    from voz_spark.crawlops import q199_seen_antientropy

    plan = _formatted_plan(q199_seen_antientropy(spark, sf_dir))
    pf = re.findall(r"PartitionFilters: \[[^\]]*bucket[^\]]*\bIN(?:SET)?\b[^\]]*\]", plan)
    assert len(pf) >= 2, plan  # one per replica repair read
    for flt in pf:
        assert re.search(r"\b7\b", flt) and re.search(r"\b42\b", flt), flt
        assert not re.search(r"\b23\b", flt), flt  # a clean bucket stays pruned


def test_q200_salted_exchange_and_hot_host_share(spark, sf_dir):
    """The fact-side exchange partitions on (host, salt) — not host
    alone — and the planted hot host owns the top row."""
    from voz_spark.relational import q200_skew_salted_join

    df = q200_skew_salted_join(spark, sf_dir)
    plan = _formatted_plan(df)
    assert re.search(r"hashpartitioning\(host#\d+[^)]*salt#\d+", plan), plan
    rows = df.collect()
    assert rows[0]["host"] == "megahost.example"
    total = sum(r["n_items"] for r in rows)
    assert abs(rows[0]["n_items"] / total - 0.6) < 0.02
    # 21 hosts: megahost (l_orderkey%10<6) + the 20 residues of
    # l_orderkey%50 whose last digit is in {6,7,8,9}
    assert len(rows) == 21
    assert {r["host"] for r in rows} == {"megahost.example"} | {
        f"h{k}.example" for k in range(50) if k % 10 >= 6
    }


def test_q201_ucb_matches_independent_recompute(spark, sf_dir):
    """Recompute mean/bonus/decision in plain Python for every host."""
    import math

    from voz_spark.crawlops import q201_crawl_policy_ucb
    from voz_spark.session import load_table as lt

    ev = [r["event_id"] for r in lt(spark, sf_dir, "events").select("event_id").collect()]
    stats = {}
    for e in ev:
        host = e % 53
        h = _h60(str(e))
        n, s = stats.get(host, (0, 0))
        stats[host] = (n + 1, s + (1 if h % 5 < host % 4 + 1 else 0))
    rows = q201_crawl_policy_ucb(spark, sf_dir).collect()
    assert len(rows) == len(stats)
    for r in rows:
        n, s = stats[r["host"]]
        assert (r["n_trials"], r["n_success"]) == (n, s)
        assert r["mean_milli"] == 1000 * s // n
        assert r["bonus_milli"] == math.floor(1000.0 * math.sqrt(32.0 / n))
        want_explore = _h60(f"host:{r['host']}") % 1000 < 50
        assert r["decision"] == ("explore" if want_explore else "exploit")
        assert r["scheduled"] == (
            1 if want_explore or r["mean_milli"] + r["bonus_milli"] >= 400 else 0
        )


def test_q219_policy_stack_composition(spark, sf_dir):
    """The stack is consistent with its stages: hosts/decisions equal
    q201's output; allocations are a water-fill over exactly the
    scheduled hosts summing to Σdemand/4; drain is ceil(demand/alloc);
    unscheduled hosts get zero."""
    from voz_spark.crawlops import q201_crawl_policy_ucb, q219_schedule_policy_stack

    pol = {r["host"]: r for r in q201_crawl_policy_ucb(spark, sf_dir).collect()}
    rows = {r["host"]: r for r in q219_schedule_policy_stack(spark, sf_dir).collect()}
    assert set(rows) == set(pol)

    sched = {h for h, p in pol.items() if p["scheduled"] == 1}
    demand = {h: pol[h]["n_trials"] for h in sched}
    budget = sum(demand.values()) // 4

    # python water-fill replay over the scheduled subset
    n = len(demand)
    hosts = sorted(demand.items(), key=lambda kv: (kv[1], kv[0]))
    js, s_base, sj = 0, 0, 0
    for idx, (h, d) in enumerate(hosts, start=1):
        sj += d
        if sj + (n - idx) * d <= budget:
            js, s_base = idx, sj
    level = budget // n if js == 0 else (budget - s_base) // (n - js)
    base = {h: min(d, level) for h, d in demand.items()}
    r = budget - sum(base.values())
    for h in sorted(h for h, d in demand.items() if d > level)[:r]:
        base[h] += 1

    for h, row in rows.items():
        assert row["ucb_milli"] == pol[h]["ucb_milli"]
        assert row["decision"] == pol[h]["decision"]
        assert row["scheduled"] == pol[h]["scheduled"]
        if h in sched:
            assert row["alloc"] == base[h]
            if row["alloc"] > 0:
                assert row["rounds_to_drain"] == -(-row["demand"] // row["alloc"])
        else:
            assert row["alloc"] == 0 and row["rounds_to_drain"] == -1
    assert sum(row["alloc"] for row in rows.values()) == budget
    assert any(row["capped"] for row in rows.values())
