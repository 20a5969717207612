"""Bloom-filter properties (SURVEY §5.2 item 4): zero false negatives
ever; measured FPR within 2× of design FPR."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from voz_spark import bloom as B

NBITS, K = 1 << 16, 5


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_no_false_negatives(keys):
    bits = B.empty_shard(NBITS)
    h = np.array(keys, dtype=np.uint64)
    B.add_hashes(bits, h, NBITS, K)
    if len(h):
        assert B.maybe_contains(bits, h, NBITS, K).all()


def test_fpr_within_design():
    rng = np.random.default_rng(42)
    n = 4000  # load factor chosen for ~1% design FPR at 2^16 bits, k=5
    inserted = rng.integers(0, 2**63, n, dtype=np.uint64).astype(np.uint64)
    probes = rng.integers(2**63, 2**64, 20000, dtype=np.uint64).astype(np.uint64)
    bits = B.empty_shard(NBITS)
    B.add_hashes(bits, inserted, NBITS, K)
    fp = B.maybe_contains(bits, probes, NBITS, K).mean()
    design = (1 - np.exp(-K * n / NBITS)) ** K
    assert fp <= 2 * design, f"fpr={fp:.4f} design={design:.4f}"


def test_shard_routing_matches_spark_pmod():
    h = np.array([-5, -1, 0, 1, 2**63 - 1], dtype=np.int64).astype(np.uint64)
    shards = B.shard_of(h, 16)
    assert ((shards >= 0) & (shards < 16)).all()
    # pmod semantics: non-negative result for negative hashes
    assert B.shard_of(np.array([np.uint64(2**64 - 5)]), 16)[0] == (-5 % 16)
