"""Semantics tests for the advisor/training-pair wave: q206 encoding
advisor, q207 hard-negative mining, q208 lazy priority aging — each
replayed independently in plain Python."""

import hashlib
from collections import defaultdict


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q206_for_bitwidths_vs_python(spark, sf_dir):
    """Exact metric replay per (layout, col), plus the layout claim:
    clustered blocks keep the sort key narrow, hash scattering
    inflates it toward the raw width."""
    from voz_spark.session import load_table
    from voz_spark.storage import q206_encoding_advisor

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    ).collect()
    blocks = defaultdict(list)  # (layout, col, block) -> values
    for r in rows:
        cl = r["l_orderkey"] // 256
        sc = _h60(f"{r['l_orderkey']}:{r['l_linenumber']}") % 64
        for col in ("l_orderkey", "l_partkey"):
            blocks[("clustered", col, cl)].append(r[col])
            blocks[("scattered", col, sc)].append(r[col])
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_rows, n_blocks, enc_bits, maxb
    for (layout, col, _), vals in blocks.items():
        rng = max(vals) - min(vals)
        bits = rng.bit_length()  # == length(bin(rng)) for rng>0, 0 for 0
        a = agg[(layout, col)]
        a[0] += len(vals)
        a[1] += 1
        a[2] += len(vals) * bits
        a[3] = max(a[3], bits)

    got = {(r["layout"], r["col"]): r for r in q206_encoding_advisor(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for key, (n_rows, n_blocks, enc_bits, maxb) in agg.items():
        g = got[key]
        assert g["n_rows"] == n_rows
        assert g["n_blocks"] == n_blocks
        assert g["enc_bits"] == enc_bits
        assert g["raw_bits"] == n_rows * 64
        assert g["ratio_milli"] == 1000 * enc_bits // (n_rows * 64)
        assert g["max_block_bits"] == maxb
    # the claim that motivates sort-before-write
    assert (
        got[("clustered", "l_orderkey")]["ratio_milli"]
        < got[("scattered", "l_orderkey")]["ratio_milli"]
    )


def test_q207_hard_negative_vs_bruteforce(spark, sf_dir):
    """Brute-force replay of the fixture: banded candidates (bucket
    cap mirrored), hamming 11..24, caption-different, per-anchor
    argmin — exact row equality; and no selected negative is a
    duplicate (hamming <= 10) of its anchor."""
    from voz_spark.imagedup import Q207_IC_PATH, q207_hard_negative_mining

    got = q207_hard_negative_mining(spark, sf_dir).collect()

    p = {
        r["image_id"]: (r["caption"], r["phash"])
        for r in spark.read.parquet(Q207_IC_PATH).collect()
    }
    buckets = defaultdict(list)
    for iid, (_, ph) in p.items():
        for k in range(4):
            buckets[(k, (ph >> (16 * k)) & 0xFFFF)].append(iid)
    cand = set()
    for members in buckets.values():
        if len(members) > 1000:  # the bucket cap
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    best = {}
    ncand = defaultdict(int)
    for a, b in cand:
        ham = bin(p[a][1] ^ p[b][1]).count("1")
        if not (11 <= ham <= 24) or p[a][0] == p[b][0]:
            continue
        for anchor, neg in ((a, b), (b, a)):
            ncand[anchor] += 1
            cur = best.get(anchor)
            if cur is None or (ham, neg) < cur:
                best[anchor] = (ham, neg)

    assert {r["anchor"] for r in got} == set(best)
    for r in got:
        ham, neg = best[r["anchor"]]
        assert (r["hamming"], r["hard_negative"]) == (ham, neg)
        assert r["n_candidates"] == ncand[r["anchor"]]
        # never a duplicate: the anchor's selected negative is outside
        # the dedup band by construction
        assert bin(p[r["anchor"]][1] ^ p[r["hard_negative"]][1]).count("1") > 10
    assert len(got) > 0  # the band actually yields hard negatives


def test_q208_lazy_equals_eager_aging(spark, sf_dir):
    """The decomposed lazy schedule equals a full eager recompute; and
    the static key really is round-invariant (orderings at two rounds
    agree within every tier)."""
    from voz_spark.crawlops import q208_priority_aging
    from voz_spark.session import load_table

    ev = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    ]
    slopes = {0: 10, 1: 25, 2: 60}
    rows = []
    for e in ev:
        tier = e % 3
        base = _h60(f"p|{e}") % 100000
        enq = _h60(f"e|{e}") % 100
        rows.append((e, tier, base, enq, base + slopes[tier] * (100 - enq)))
    rows.sort(key=lambda x: (-x[4], x[0]))
    want = rows[:20]

    got = q208_priority_aging(spark, sf_dir).collect()
    assert [(r["url_id"], r["tier"], r["base_pri"], r["enq_round"], r["eff_pri"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, 21))

    # round-invariance of the static key: within a tier the ordering
    # at R=100 equals the ordering at R=500 (aging never rewrites)
    for tier in (0, 1, 2):
        t = [r for r in rows if r[1] == tier]
        by_r100 = sorted(t, key=lambda x: (-(x[2] + slopes[tier] * (100 - x[3])), x[0]))
        by_r500 = sorted(t, key=lambda x: (-(x[2] + slopes[tier] * (500 - x[3])), x[0]))
        assert [x[0] for x in by_r100] == [x[0] for x in by_r500]
