"""Cuckoo seen-index (voz_spark/cuckoo.py + cuckoo_state.py).

Contract under test (same as the bloom's, SURVEY §5.2 item 4, plus
deletion): NO false negatives for inserted keys, FPR within the
fingerprint-size bound, deletes remove exactly the targeted keys, and
the distributed broadcast / cogroup membership paths agree bit-for-bit
with each other and with exact membership."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from voz_spark import cuckoo as C
from voz_spark import cuckoo_state as CS

RNG = np.random.default_rng(42)


def _keys(n: int) -> np.ndarray:
    return RNG.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


# -- kernel ---------------------------------------------------------------


def test_no_false_negatives_at_design_load():
    keys = np.unique(_keys(40_000))
    t = C.empty_table(C.n_buckets_for(len(keys), 0.84))
    C.add_hashes(t, keys)
    assert C.maybe_contains(t, keys).all()


def test_fpr_within_fingerprint_bound():
    keys = np.unique(_keys(40_000))
    t = C.empty_table(C.n_buckets_for(len(keys), 0.84))
    C.add_hashes(t, keys)
    fresh = np.unique(_keys(200_000) | np.uint64(1) << np.uint64(63))  # disjoint range
    fpr = C.maybe_contains(t, fresh).mean()
    # theoretical bound ~ 2 * SLOTS / 2^16 ≈ 1.2e-4; allow 4x headroom
    assert fpr < 5e-4, fpr


def test_over_capacity_raises_not_drops():
    t = C.empty_table(8)  # 32 slots
    with pytest.raises(RuntimeError):
        C.add_hashes(t, np.unique(_keys(64)))


def test_delete_removes_only_targets():
    keys = np.unique(_keys(20_000))
    t = C.empty_table(C.n_buckets_for(len(keys), 0.84))
    C.add_hashes(t, keys)
    drop, keep = keys[::2], keys[1::2]
    found = C.delete_hashes(t, drop)
    assert found.all()  # every previously-inserted key was found
    assert C.maybe_contains(t, keep).all()  # survivors intact
    # dropped keys now read absent, up to fingerprint-collision FPR
    assert C.maybe_contains(t, drop).mean() < 5e-4


def test_delete_missing_keys_reports_not_found():
    keys = np.unique(_keys(1_000))
    t = C.empty_table(C.n_buckets_for(len(keys), 0.5))
    C.add_hashes(t, keys)
    missing = np.unique(_keys(1_000) | np.uint64(1) << np.uint64(63))
    found = C.delete_hashes(t, missing)
    assert found.mean() < 5e-3  # only fingerprint collisions "delete"
    assert C.maybe_contains(t, keys).all()  # originals survive


# -- distributed state ----------------------------------------------------

N_SHARDS = 8


def _seen_df(spark, n, offset=0):
    return (
        spark.range(offset, offset + n)
        .select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
        .distinct()
    )


def test_build_then_split_paths_agree(spark):
    seen = _seen_df(spark, 5_000).persist()
    state = CS.build_from_seen(seen, N_SHARDS).persist()
    cand = seen.unionByName(_seen_df(spark, 5_000, offset=1_000_000)).persist()

    via_bcast = CS.split_broadcast(spark, cand, CS.blobs_from(state), N_SHARDS)
    via_cogrp = CS.split_cogroup(cand, state, N_SHARDS)
    a = {r.url_hash: r.maybe_seen for r in via_bcast.collect()}
    b = {r.url_hash: r.maybe_seen for r in via_cogrp.collect()}
    assert a == b  # the two physical strategies are bit-equivalent

    seen_hashes = {r.url_hash for r in seen.collect()}
    assert all(a[h] for h in seen_hashes)  # no false negatives
    fresh = [h for h in a if h not in seen_hashes]
    fpr = sum(a[h] for h in fresh) / max(1, len(fresh))
    assert fpr < 5e-3
    for df in (seen, state, cand):
        df.unpersist()


def test_incremental_update_equals_rebuild(spark):
    seen0 = _seen_df(spark, 3_000).persist()
    new = _seen_df(spark, 3_000, offset=500_000).persist()
    both = seen0.unionByName(new).distinct().persist()

    state0 = CS.build_from_seen(seen0, N_SHARDS)
    state1 = CS.updated(both, new, state0, N_SHARDS).persist()
    # no shard was left as an overflow marker
    assert state1.where(F.col("n_buckets") == 0).count() == 0
    memb = CS.split_cogroup(both, state1, N_SHARDS)
    assert memb.where(~F.col("maybe_seen")).count() == 0  # no false negatives
    for df in (seen0, new, both, state1):
        df.unpersist()


def test_overflowing_shard_is_rebuilt_from_seen(spark):
    seen0 = _seen_df(spark, 200).persist()  # tiny tables per shard
    new = _seen_df(spark, 20_000, offset=500_000).persist()
    both = seen0.unionByName(new).distinct().persist()

    state0 = CS.build_from_seen(seen0, N_SHARDS)
    state1 = CS.updated(both, new, state0, N_SHARDS).persist()
    rows = state1.collect()
    assert len(rows) == N_SHARDS
    assert all(r.n_buckets > 0 for r in rows)  # markers all replaced
    # rebuilt tables hold the FULL post-update key set
    memb = CS.split_cogroup(both, state1, N_SHARDS)
    assert memb.where(~F.col("maybe_seen")).count() == 0
    for df in (seen0, new, both, state1):
        df.unpersist()


def test_engine_cuckoo_matches_bloom_schedule(spark):
    """Full engine E2E: a crawl run under seen_filter="cuckoo" (both
    the broadcast and the forced-cogroup membership paths) must produce
    the same crawl schedule, seen set, and results as the default bloom
    engine — the membership strategy is a physical choice, never a
    semantic one."""
    import tempfile

    from voz_spark.config import CrawlConfig
    from voz_spark.rounds import CrawlEngine

    def run(cfg):
        eng = CrawlEngine(
            spark, tempfile.mkdtemp(prefix="cuckoopath-"), n_seeds=5, n_images=150, cfg=cfg
        )
        eng.run()
        seen = sorted(r.canon_url for r in eng.seen().collect())
        results = sorted(
            (r.round_id, r.canon_url, r.status) for r in eng.results().collect()
        )
        return seen, eng.schedule_order(), results

    base = run(CrawlConfig())
    cuckoo = run(CrawlConfig(seen_filter="cuckoo"))
    cuckoo_cogroup = run(CrawlConfig(seen_filter="cuckoo", bloom_broadcast_max_bytes=0))
    assert base == cuckoo
    assert base == cuckoo_cogroup


def test_engine_filter_switch_rebuilds_state(spark):
    """Resuming a bloom-run crawl under seen_filter="cuckoo" (and the
    reverse) must rebuild the new filter from the authoritative seen
    table — never trust the other strategy's stale blobs — and the
    finished crawl still matches the sequential simulator exactly."""
    import tempfile

    from voz_spark.config import CrawlConfig
    from voz_spark.oracle_sim import simulate
    from voz_spark.rounds import CrawlEngine

    wd = tempfile.mkdtemp(prefix="filterswitch-")
    eng = CrawlEngine(spark, wd, n_seeds=5, n_images=150)  # bloom
    eng.bootstrap()
    eng.run_round()
    eng.run_round()

    cfg2 = CrawlConfig(seen_filter="cuckoo")
    eng2 = CrawlEngine(spark, wd, n_seeds=5, n_images=150, cfg=cfg2)
    # the rebuilt cuckoo state has NO false negatives over committed seen
    state = eng2._validated_cuckoo_table().persist()
    memb = CS.split_cogroup(eng2.seen(), state, cfg2.n_bloom_shards)
    assert memb.where(~F.col("maybe_seen")).count() == 0
    state.unpersist()

    eng2.run_round()  # commits seen_cuckoo, empties seen_bloom
    man = eng2.cat.manifest()
    assert man["meta"]["seen_filter"] == "cuckoo"
    assert man["tables"].get("seen_cuckoo")
    assert not man["tables"].get("seen_bloom")

    # switch BACK to bloom mid-crawl and finish: simulator parity holds
    eng3 = CrawlEngine(spark, wd, n_seeds=5, n_images=150)
    eng3.run()
    sim = simulate(n_seeds=5, n_images=150)
    assert eng3.schedule_order() == sim.schedule
    assert {r.canon_url for r in eng3.seen().collect()} == sim.seen


def test_engine_reopen_recrawls_urls(spark):
    """Recrawl story end-to-end, both filter strategies: reopened URLs
    leave `seen` and the filter, re-enter the frontier with their
    original priority fields, and the next run fetches them AGAIN
    (one extra results row each); every other URL stays crawled-once."""
    import tempfile
    from collections import Counter

    from voz_spark.config import CrawlConfig
    from voz_spark.rounds import CrawlEngine

    for cfg in (CrawlConfig(seen_filter="cuckoo"), CrawlConfig()):
        eng = CrawlEngine(
            spark, tempfile.mkdtemp(prefix="reopen-"), n_seeds=5, n_images=150, cfg=cfg
        )
        eng.run()
        threads = sorted(
            {r.canon_url for r in eng.results().where(F.col("kind") == "thread").collect()}
        )
        targets = threads[:3]
        seen_before = {r.canon_url for r in eng.seen().collect()}
        st = eng.reopen(
            spark.createDataFrame([(u,) for u in targets], "canon_url string")
        )
        assert st["n_reopened"] == len(targets)
        seen_mid = {r.canon_url for r in eng.seen().collect()}
        assert seen_mid == seen_before - set(targets)

        eng.run()  # fetches exactly the reopened URLs, then drains
        assert {r.canon_url for r in eng.seen().collect()} == seen_before
        counts = Counter(r.canon_url for r in eng.results().collect())
        for u in targets:
            assert counts[u] == 2, (cfg.seen_filter, u, counts[u])
        untouched = [u for u in threads if u not in targets]
        assert all(counts[u] == 1 for u in untouched)


def test_delete_reopens_urls_without_rebuild(spark):
    """The recrawl story: removing URLs from the seen index makes them
    schedulable again — in place, no full rebuild (bloom cannot)."""
    seen = _seen_df(spark, 4_000).persist()
    state = CS.build_from_seen(seen, N_SHARDS)
    recrawl = seen.limit(500).persist()
    state2 = CS.deleted(recrawl, state, N_SHARDS).persist()

    memb = CS.split_broadcast(spark, seen, CS.blobs_from(state2), N_SHARDS)
    got = {r.url_hash: r.maybe_seen for r in memb.collect()}
    reopened = {r.url_hash for r in recrawl.collect()}
    still = [h for h in got if h not in reopened]
    assert all(got[h] for h in still)  # untouched URLs still filtered
    fp = sum(got[h] for h in reopened) / len(reopened)
    assert fp < 5e-3  # reopened URLs read unseen (up to FPR)
    # occupancy bookkeeping followed the deletes
    n_keys = sum(r.n_keys for r in state2.collect())
    assert n_keys == seen.count() - len(reopened)
    for df in (seen, recrawl, state2):
        df.unpersist()
