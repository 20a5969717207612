"""Partitioned cuckoo filter over the URL-seen set — the deletion-capable
alternative to the bloom shards (BASELINE.json north_star names
"bloom/cuckoo URL-seen filter"; design from the public cuckoo-filter
paper: Fan, Andersen, Kaminsky, Mitzenmacher, CoNEXT 2014).

Why a second filter: bloom bits cannot be unset, so *removing* URLs
from the seen set (recrawl of a stale host, retry-after-expiry, GDPR
delete) forces a full shard rebuild from the authoritative `seen`
table. A cuckoo filter deletes in O(1) per key, so the seen-filter
state can follow the seen table through both inserts AND deletes
incrementally.

Layout mirrors the bloom shards exactly (same ``pmod(url_hash,
n_shards)`` routing, one binary blob row per shard) so the broadcast /
shard-aligned-cogroup dispatch and the catalog persistence are shared.
Within a shard: ``n_buckets`` (power of two) buckets x 4 slots of
16-bit fingerprints, partial-key cuckoo hashing (alt bucket =
``i XOR mix(fp)``), empty slot = fingerprint 0 (real fingerprints are
forced nonzero).

At the 10^10 design point a shard holding 2.4M keys needs 2^19 buckets
x 4 slots x 2 bytes = 4 MiB — ~16 bits/key at <=95%% occupancy vs the
bloom's ~13 bits/key at the same FPR class, the documented price of
deletability.

Everything is numpy-vectorized per Arrow batch: inserts place whole
key batches via grouped rank-into-free-slot rounds (the per-key
eviction walk only ever sees the tiny remainder that two vectorized
rounds could not place), lookups and deletes are pure array ops.

Correctness contract is the bloom one (SURVEY §5.2 item 4): membership
says "maybe seen" / "definitely unseen" with NO false negatives for
present keys; "maybe seen" rows always pass through the exact
anti-join, so fingerprint collisions cannot drop URLs. Deletion keeps
that contract only for keys actually inserted (deleting a never-
inserted key can evict a colliding fingerprint — the standard cuckoo
caveat; callers delete only rows coming from the seen table itself).
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
MAX_KICKS = 500

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def _mix_u64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (same mixer family as bloom.py)."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _M1).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(30))) * _M2).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(27))) * _M3).astype(np.uint64)
        return (z ^ (z >> np.uint64(31))).astype(np.uint64)


def n_buckets_for(n_keys: int, load: float = 0.84) -> int:
    """Smallest power-of-two bucket count holding n_keys at <= load."""
    need = max(1, int(np.ceil(n_keys / (SLOTS * load))))
    return 1 << int(np.ceil(np.log2(need)))


def empty_table(n_buckets: int) -> np.ndarray:
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16)


def fingerprints(hashes: np.ndarray) -> np.ndarray:
    """Nonzero 16-bit fingerprints from 64-bit keys."""
    f = (_mix_u64(hashes) >> np.uint64(48)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def bucket1(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    """Primary bucket from the MIXED hash, not the raw low bits: shard
    routing is ``pmod(url_hash, n_shards)``, so within a shard the raw
    low bits are constant — indexing buckets with them would fold every
    key into 1/n_shards of the buckets and jam the cuckoo graph long
    before design load. The mixer decorrelates bucket choice from the
    shard route (fp uses bits 48-63 of the same mix; bucket uses the low
    bits — disjoint ranges of one splitmix64 output)."""
    return (_mix_u64(hashes.astype(np.uint64)) & np.uint64(n_buckets - 1)).astype(
        np.int64
    )


def alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: i XOR mix(fp), power-of-two table."""
    h = _mix_u64(fp.astype(np.uint64))
    return ((bucket.astype(np.uint64) ^ h) & np.uint64(n_buckets - 1)).astype(np.int64)


def _place_round(table: np.ndarray, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
    """Vectorized bulk placement: key k with within-bucket rank r takes
    its target bucket's r-th free slot. Returns the placed mask."""
    n = len(buckets)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    b = buckets[order]
    starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
    sizes = np.diff(np.r_[starts, n])
    ranks = np.arange(n) - np.repeat(starts, sizes)
    free = table[b] == 0  # (n, SLOTS); identical rows share a bucket,
    # ranks make each key claim a DIFFERENT free slot of that row
    cum = np.cumsum(free, axis=1)
    match = free & (cum - 1 == ranks[:, None])
    placed_sorted = match.any(axis=1)
    slot = np.argmax(match, axis=1)
    table[b[placed_sorted], slot[placed_sorted]] = fps[order][placed_sorted]
    placed = np.zeros(n, dtype=bool)
    placed[order] = placed_sorted
    return placed


def add_hashes(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Insert a batch of 64-bit keys; returns the updated table.

    Raises if the table is over capacity (the builder sizes tables with
    :func:`n_buckets_for`, so this only fires on misconfiguration —
    matching the bloom path, which silently degrades instead; a seen
    filter that silently LOSES keys would violate the no-false-negative
    contract, hence the loud failure here).
    """
    if len(hashes) == 0:
        return table
    nb = table.shape[0]
    h = hashes.astype(np.uint64)
    fp = fingerprints(h)
    i1 = bucket1(h, nb)
    i2 = alt_bucket(i1, fp, nb)

    placed = _place_round(table, i1, fp)
    if not placed.all():
        rem = ~placed
        placed2 = _place_round(table, i2[rem], fp[rem])
        rem_idx = np.flatnonzero(rem)[~placed2]
    else:
        rem_idx = np.zeros(0, dtype=np.int64)

    # eviction walk for the tiny remainder (deterministic victim slot)
    for j in rem_idx:
        cur_fp = fp[j]
        cur_b = int(i1[j])
        done = False
        for kick in range(MAX_KICKS):
            row = table[cur_b]
            free = np.flatnonzero(row == 0)
            if len(free):
                table[cur_b, free[0]] = cur_fp
                done = True
                break
            victim = (kick + cur_b) % SLOTS
            cur_fp, table[cur_b, victim] = row[victim].copy(), cur_fp
            cur_b = int(alt_bucket(np.array([cur_b]), np.array([cur_fp]), nb)[0])
        if not done:
            raise RuntimeError(
                f"cuckoo shard over capacity: {table.shape[0]} buckets, "
                f"insert failed after {MAX_KICKS} kicks"
            )
    return table


def maybe_contains(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Boolean array: True = maybe seen, False = definitely unseen."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    nb = table.shape[0]
    h = hashes.astype(np.uint64)
    fp = fingerprints(h)
    i1 = bucket1(h, nb)
    i2 = alt_bucket(i1, fp, nb)
    return ((table[i1] == fp[:, None]).any(axis=1)) | (
        (table[i2] == fp[:, None]).any(axis=1)
    )


def delete_hashes(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Remove ONE stored copy of each key's fingerprint; returns a mask
    of keys actually found (False = key was not in the filter).

    Vectorized with conflict rounds: when several keys of one batch
    resolve to the same (bucket, slot), only the first deletes there
    and the rest retry against the updated table next round.
    """
    n = len(hashes)
    found = np.zeros(n, dtype=bool)
    if n == 0:
        return found
    nb = table.shape[0]
    h = hashes.astype(np.uint64)
    fp = fingerprints(h)
    i1 = bucket1(h, nb)
    i2 = alt_bucket(i1, fp, nb)

    active = np.arange(n)
    while len(active):
        af, a1, a2 = fp[active], i1[active], i2[active]
        m1 = table[a1] == af[:, None]
        in1 = m1.any(axis=1)
        m2 = table[a2] == af[:, None]
        in2 = (~in1) & m2.any(axis=1)
        bucket = np.where(in1, a1, a2)
        slot = np.where(in1, np.argmax(m1, axis=1), np.argmax(m2, axis=1))
        hit = in1 | in2
        if not hit.any():
            break
        flat = bucket[hit] * SLOTS + slot[hit]
        uniq, first = np.unique(flat, return_index=True)
        hit_idx = np.flatnonzero(hit)
        winners = hit_idx[first]
        table[bucket[winners], slot[winners]] = 0
        found[active[winners]] = True
        # losers of a (bucket, slot) conflict retry; true misses stop
        losers = np.setdiff1d(hit_idx, winners, assume_unique=False)
        active = active[losers]
    return found
