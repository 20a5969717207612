"""Semantics tests for q212 (watermark late-data audit), q213
(water-filling budget), q214 (schema-evolution audit)."""

from collections import Counter


def test_q212_late_drops_match_protocol_replay(spark, sf_dir):
    """Replay the measured micro-batch protocol (lag-2 watermark) in
    Python: exact window equality, real drops occurred, every
    on-time row survived, and a lag-1 model would NOT fit."""
    from voz_spark.streaming import (
        _Q212_BASE_US,
        _Q212_DELAY_US,
        _Q212_FILES,
        _Q212_LATE_US,
        _Q212_N,
        _Q212_SENTINEL_US,
        _Q212_SPACING_US,
        _Q212_WIN_US,
        q212_stream_late_audit,
    )

    rows = []
    bounds = [_Q212_N * k // _Q212_FILES for k in range(_Q212_FILES + 1)]
    for i in range(_Q212_N):
        b = next(k for k in range(_Q212_FILES) if bounds[k] <= i < bounds[k + 1])
        arr = _Q212_BASE_US + i * _Q212_SPACING_US
        ev = arr - (_Q212_LATE_US if i % 17 == 5 else 0)
        rows.append((b, i, arr, ev))
    bmax = {}
    for b, _, _, ev in rows:
        bmax[b] = max(bmax.get(b, 0), ev)
    bmax[_Q212_FILES] = _Q212_SENTINEL_US
    bmax[_Q212_FILES + 1] = _Q212_SENTINEL_US + _Q212_WIN_US

    def model(lag):
        acc = {}
        dropped = 0
        for b, _, arr, ev in rows:
            prior = [bmax[g] for g in range(max(0, b - lag + 1))]
            wm = max(prior) - _Q212_DELAY_US if prior else None
            win = ev // _Q212_WIN_US * _Q212_WIN_US
            if wm is not None and win + _Q212_WIN_US <= wm:
                dropped += 1
                continue
            n, late = acc.get(win, (0, 0))
            acc[win] = (n + 1, late + (1 if ev < arr else 0))
        return acc, dropped

    want, n_dropped = model(lag=2)
    got = {
        r["win_us"]: (r["n_accepted"], r["n_late_accepted"])
        for r in q212_stream_late_audit(spark, sf_dir).collect()
    }
    assert got == want
    assert n_dropped > 0  # the watermark really dropped late rows
    # every on-time row survived
    n_on_time = sum(1 for i in range(_Q212_N) if i % 17 != 5)
    assert sum(n - late for n, late in got.values()) == n_on_time
    # some late rows were still accepted (batches before the
    # watermark could know better)
    assert sum(late for _, late in got.values()) > 0
    # calibration is meaningful: a lag-1 protocol model does not fit
    lag1, _ = model(lag=1)
    assert lag1 != got


def test_q213_waterfill_vs_python_and_invariants(spark, sf_dir):
    """Independent Python water-filling replay; Σ alloc == budget
    exactly; max-min property (no uncapped host below its demand;
    capped hosts within 1 unit of the level)."""
    from voz_spark.crawlops import q213_waterfill_budget
    from voz_spark.session import load_table

    ev = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    ]
    demand = Counter(
        (e % 3) if e % 10 < 4 else 3 + e % 38 for e in ev
    )
    n = len(demand)
    budget = sum(demand.values()) // 3
    hosts = sorted(demand.items(), key=lambda kv: (kv[1], kv[0]))
    js, s_base = 0, 0
    sj = 0
    for idx, (h, d) in enumerate(hosts, start=1):
        sj += d
        if sj + (n - idx) * d <= budget:
            js, s_base = idx, sj
    level = budget // n if js == 0 else (budget - s_base) // (n - js)
    base = {h: min(d, level) for h, d in demand.items()}
    r = budget - sum(base.values())
    capped = sorted(h for h, d in demand.items() if d > level)
    alloc = dict(base)
    for h in capped[:r]:
        alloc[h] += 1

    rows = q213_waterfill_budget(spark, sf_dir).collect()
    assert len(rows) == n
    for row in rows:
        assert row["demand"] == demand[row["host"]]
        assert row["level"] == level
        assert row["alloc"] == alloc[row["host"]]
        assert row["capped"] == (1 if demand[row["host"]] > level else 0)
        if not row["capped"]:
            assert row["alloc"] == row["demand"]  # max-min: uncapped = satisfied
        else:
            assert level <= row["alloc"] <= level + 1
    assert sum(row["alloc"] for row in rows) == budget  # exact, always
    assert any(row["capped"] for row in rows)  # budget genuinely scarce


def test_q214_union_by_name_null_fill(spark, sf_dir):
    """The union-by-name read fills exactly the absent generations'
    columns: gen1 lang+quality null, gen2 only quality, gen3 none."""
    from voz_spark.file_io import q214_schema_evolution_audit

    rows = {r["gen"]: r for r in q214_schema_evolution_audit(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    for g in (1, 2, 3):
        assert rows[g]["n_rows"] == 1000
    assert rows[1]["n_lang_null"] == 1000 and rows[1]["n_quality_null"] == 1000
    assert rows[2]["n_lang_null"] == 0 and rows[2]["n_quality_null"] == 1000
    assert rows[3]["n_lang_null"] == 0 and rows[3]["n_quality_null"] == 0
    assert rows[1]["min_lang"] == "-" and rows[2]["min_lang"] == "de"


def test_q220_stream_novelty_equals_batch_first_seen(spark, sf_dir):
    """Python replay of the fixture's first-seen accounting; novelty
    decays monotonically (coupon collector) and totals the distinct
    trigram count; streaming dedup credits first ARRIVAL == min
    round because rounds arrive in order."""
    import hashlib
    from collections import defaultdict

    from voz_spark.streaming import (
        _Q220_DOCS,
        _Q220_ROUNDS,
        _Q220_TOKENS,
        _Q220_VOCAB,
        q220_stream_novelty,
    )

    first = {}
    for r in range(_Q220_ROUNDS):
        for i in range(_Q220_DOCS):
            if i % _Q220_ROUNDS != r:
                continue
            toks = [
                f"t{int(hashlib.md5(f'{i}:{j}'.encode()).hexdigest()[:15], 16) % _Q220_VOCAB}"
                for j in range(_Q220_TOKENS)
            ]
            for k in range(len(toks) - 2):
                first.setdefault(" ".join(toks[k : k + 3]), r)
    want = defaultdict(int)
    for g, r in first.items():
        want[r] += 1

    rows = {r["round"]: r["n_novel"] for r in q220_stream_novelty(spark, sf_dir).collect()}
    assert rows == dict(want)
    vals = [rows[r] for r in sorted(rows)]
    assert vals == sorted(vals, reverse=True)  # novelty only decays here
    assert sum(vals) == len(first) <= _Q220_VOCAB**3
