"""Image-payload perceptual dedup gates (imagedup.py, phash.py).

The reference caches images by URL filename only
(src/image_processor.py:44-56); content-level near-dup detection is a
new capability the 100 TB crawl needs. These tests pin:
- the pHash function itself (invariance to rescale/re-noise, spread
  for unrelated images),
- the decode→hash parity contract (exact for lossless png, bounded
  drift for the lossy vqz codec — the hash analogue of PSNR ≥ 40 dB),
- the banded LSH recall semantics on planted near-duplicates
  (pigeonhole-guaranteed subset + measured recall).
Oracle exactness for q61 is covered by test_oracle_parity.
"""

from __future__ import annotations

import random

from voz_spark import synth
from voz_spark.codec import decode_image
from voz_spark.phash import hamming64, phash64


def _planted_pairs(n: int) -> list[tuple[int, int]]:
    return [(i - 1, i) for i in range(1, n) if i % 7 == 3]


def test_phash_invariance_and_spread():
    ham_var = [
        hamming64(synth.image_phash(a), synth.image_phash(b)) for a, b in _planted_pairs(420)
    ]
    assert max(ham_var) <= 10  # rescaled+re-noised copies stay close
    rng = random.Random(1)
    ham_rand = []
    while len(ham_rand) < 200:
        a, b = rng.sample(range(420), 2)
        if synth.image_pattern_idx(a) != synth.image_pattern_idx(b):
            ham_rand.append(hamming64(synth.image_phash(a), synth.image_phash(b)))
    assert min(ham_rand) > 10  # unrelated images never near-dup
    assert sum(ham_rand) / len(ham_rand) > 25  # ~32 expected


def test_phash_decode_parity():
    for idx in range(80):
        decoded = decode_image(synth.image_bytes(idx), synth.image_fmt(idx))
        hd = hamming64(phash64(decoded), synth.image_phash(idx))
        if synth.image_fmt(idx) == "png":
            assert hd == 0, f"lossless decode must reproduce phash (idx={idx})"
        else:
            assert hd <= 4, f"lossy decode drifted {hd} bits (idx={idx})"


def test_q60_all_rows_ok(spark, sf_dir):
    from voz_spark.imagedup import q60_image_phash

    rows = q60_image_phash(spark, sf_dir).collect()
    assert len(rows) == 256
    bad = [r.image_id for r in rows if not r.ok]
    assert not bad, f"phash parity failed for {bad}"


def test_q61_planted_recall(spark, sf_dir):
    from voz_spark.imagedup import _N_IMAGES, q61_phash_neardup

    result = q61_phash_neardup(spark, sf_dir).collect()
    found = {(r.id_a, r.id_b) for r in result}
    planted = {
        (synth.image_id(a), synth.image_id(b)) for a, b in _planted_pairs(_N_IMAGES)
    }
    # pigeonhole: hamming <= 3 across 4 disjoint 16-bit bands forces an
    # equal band, so those pairs are ALWAYS candidates
    guaranteed = {
        (synth.image_id(a), synth.image_id(b))
        for a, b in _planted_pairs(_N_IMAGES)
        if hamming64(synth.image_phash(a), synth.image_phash(b)) <= 3
    }
    assert guaranteed <= found
    recall = len(found & planted) / len(planted)
    assert recall >= 0.95, f"banded recall {recall:.2f} below contract"
    # verify stage is exact: nothing beyond the hamming threshold
    assert all(r.hamming <= 10 for r in result)


def test_q65_clusters_keep_best_resolution(spark, sf_dir):
    from voz_spark.imagedup import _N_IMAGES, q65_image_dedup_clusters

    rows = q65_image_dedup_clusters(spark, sf_dir).collect()
    assert rows, "planted variants must form clusters"
    # every planted (source, variant) pair must land in one cluster and
    # the survivor must be the larger-resolution member of its cluster
    by_cluster = {r.cluster: r for r in rows}
    assert len(by_cluster) == len(rows), "one survivor per cluster"
    for a, b in _planted_pairs(_N_IMAGES):
        ha = hamming64(synth.image_phash(a), synth.image_phash(b))
        if ha > 3:
            continue  # only pigeonhole-guaranteed pairs are certain
        ida, idb = synth.image_id(a), synth.image_id(b)
        cluster = min(ida, idb)
        assert cluster in by_cluster, f"pair ({ida},{idb}) missing cluster"
        r = by_cluster[cluster]
        assert r.n_members >= 2
        wa, haa = synth.image_dims(a)
        wb, hb = synth.image_dims(b)
        if r.n_members == 2:  # pure pair: survivor is argmax(w*h)
            best = ida if wa * haa > wb * hb or (wa * haa == wb * hb and ida < idb) else idb
            assert r.kept_id == best


def test_q66_rehosts_found_exactly(spark, sf_dir):
    from voz_spark.imagedup import _N_IMAGES, q66_image_exact_dedup

    rows = q66_image_exact_dedup(spark, sf_dir).collect()
    planted = [i for i in range(_N_IMAGES) if i % 9 == 4]
    assert len(rows) == len(planted), "each rehost forms exactly one group"
    for r in rows:
        assert r.n_copies == 2
        assert not r.kept_id.endswith("~r"), "original id wins the min tie"


def test_q67_mismatch_is_subset_of_neardups(spark, sf_dir):
    from voz_spark.imagedup import q61_phash_neardup, q67_caption_mismatch

    nd = {(r.id_a, r.id_b) for r in q61_phash_neardup(spark, sf_dir).collect()}
    mm = q67_caption_mismatch(spark, sf_dir).collect()
    assert mm, "per-idx captions make planted variants disagree"
    for r in mm:
        assert (r.id_a, r.id_b) in nd
        assert r.caption_a != r.caption_b


def test_q89_batches_are_deterministic_and_full(spark, sf_dir):
    """Aspect-bucket batch assembly invariants: every image lands in
    exactly one batch; batches never exceed B and never mix buckets;
    within a (bucket, shard) batch ids are dense from 0 and only the
    LAST batch may be short; the bucket is the nearest ladder entry to
    the integer milli-ratio (ties to the narrower bucket)."""
    from voz_spark.imagedup import (
        _N_IMAGES,
        _Q89_BATCH,
        _Q89_BUCKETS,
        q89_aspect_bucket_batches,
    )

    rows = q89_aspect_bucket_batches(spark, sf_dir).collect()
    assert sum(r.n_images for r in rows) == _N_IMAGES
    by_group: dict[tuple, list] = {}
    for r in rows:
        assert 1 <= r.n_images <= _Q89_BATCH
        assert r.bucket_milli in _Q89_BUCKETS
        assert r.min_ratio_milli <= r.max_ratio_milli
        by_group.setdefault((r.bucket_milli, r.shard), []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r.batch_id)
        assert [r.batch_id for r in grp] == list(range(len(grp)))
        for r in grp[:-1]:  # every batch but the last is full
            assert r.n_images == _Q89_BATCH
    # nearest-bucket rule on the batch ratio envelope: every ratio in
    # [min,max] must be at least as close to its bucket as to any other
    for r in rows:
        for x in (r.min_ratio_milli, r.max_ratio_milli):
            d_own = abs(x - r.bucket_milli)
            for b in _Q89_BUCKETS:
                d_b = abs(x - b)
                assert d_own < d_b or (d_own == d_b and r.bucket_milli <= b)


def test_q91_caption_canon_rule(spark, sf_dir):
    """The canonical caption must be the (max length, then lexicographic
    max) element of each byte-identical group — recomputed here from the
    fixture rows directly — and the mirror world must exercise BOTH
    directions of the rule (truncated mirror loses, extended mirror wins)."""
    from voz_spark.imagedup import Q91_BYTES_PATH, q91_caption_canon

    out = {r.content_md5: r for r in q91_caption_canon(spark, sf_dir).collect()}
    assert out, "no duplicate groups found"

    fixture = spark.read.parquet(Q91_BYTES_PATH).selectExpr(
        "md5(hex(bytes)) AS content_md5", "caption"
    )
    groups: dict[str, list[str]] = {}
    for r in fixture.collect():
        groups.setdefault(r.content_md5, []).append(r.caption)

    mirror_wins = orig_wins = 0
    for md5, row in out.items():
        caps = groups[md5]
        assert row.n_copies == len(caps)
        assert row.n_caption_variants == len(set(caps))
        expected = max(caps, key=lambda c: (len(c), c))
        assert row.canonical_caption == expected
        if "gương" in expected:
            mirror_wins += 1
        else:
            orig_wins += 1
    assert mirror_wins > 0 and orig_wins > 0
    # groups with a single caption variant never appear with n_copies < 2
    for md5, caps in groups.items():
        if len(caps) >= 2:
            assert md5 in out


def test_q103_watermark_tile_found_exactly(spark, sf_dir):
    """Exactly one corner tile is shared (the planted stamp, on every
    idx % 3 == 0 image); all natural corners are unique."""
    from voz_spark.imagedup import _Q103_N, q103_watermark_tiles

    rows = q103_watermark_tiles(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.is_watermark
    assert r.n_images == len(range(0, _Q103_N, 3))


def test_q104_survivor_is_highest_resolution(spark, sf_dir):
    from voz_spark.imagedup import _multires_rows, q104_best_resolution_dedup

    pdf = _multires_rows()
    rows = q104_best_resolution_dedup(spark, sf_dir).collect()
    assert rows, "downscaled variants must form groups"
    by_phash = {}
    for rec in pdf.to_dict("records"):
        by_phash.setdefault(rec["phash"], []).append(rec)
    for r in rows:
        grp = by_phash[r.phash]
        assert r.n_copies == len(grp) >= 2
        best = max(grp, key=lambda g: (g["w"] * g["h"], g["image_id"]))
        assert r.survivor_id == best["image_id"]
        assert r.survivor_pixels == best["w"] * best["h"]
        assert r.bytes_total == sum(len(g["bytes"]) for g in grp)
        assert r.bytes_reclaimed == r.bytes_total - len(best["bytes"])
        # the whole point: the kept copy is the original, not the thumb
        assert not r.survivor_id.endswith("~s")
    # every planted multires pair is found (plus any natural phash
    # collisions between planted near-dup renders)
    planted = {rec["phash"] for rec in pdf.to_dict("records") if rec["image_id"].endswith("~s")}
    assert planted <= {r.phash for r in rows}


def test_q105_cuts_at_scene_boundaries_only(spark, sf_dir):
    from voz_spark.imagedup import _Q105_VIDEOS, q105_scene_cuts

    rows = q105_scene_cuts(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r.video_id, []).append(r.frame_no)
    assert set(got) == {f"v{v:02d}" for v in range(_Q105_VIDEOS)}
    for v, frames in got.items():
        assert sorted(frames) == [8, 16], (v, frames)


def test_q129_planted_corner_variants_share_exactly_three_tiles(spark, sf_dir):
    """Every idx % 6 == 1 image has a '~w' variant whose only change is
    a stamp inside the bottom-right quadrant: the pair must surface
    with exactly 3 of 4 tile hashes shared, and every planted pair
    must be present."""
    from voz_spark.imagedup import _Q129_N_IMAGES, q129_tile_variant_pairs

    got = {
        (r.id_a, r.id_b): r.n_shared_tiles
        for r in q129_tile_variant_pairs(spark, sf_dir).collect()
    }
    from voz_spark import synth

    planted = 0
    for idx in range(_Q129_N_IMAGES):
        if idx % 6 == 1:
            iid = synth.image_row(idx)["image_id"]
            key = (iid, iid + "~w") if iid < iid + "~w" else (iid + "~w", iid)
            assert key in got, f"missing planted variant pair {key}"
            assert got[key] == 3, (key, got[key])
            planted += 1
    assert planted == _Q129_N_IMAGES // 6


def test_q131_flags_exactly_the_planted_misaligned_pairs(spark, sf_dir):
    """Only the idx % 11 == 5 pairs (caption class swapped) fall below
    the alignment threshold, and their scores sit at noise level while
    no aligned pair is flagged."""
    from voz_spark import synth
    from voz_spark.imagedup import _Q131_N, q131_crossmodal_alignment

    got = {r.image_id: r for r in q131_crossmodal_alignment(spark, sf_dir).collect()}
    planted = {
        synth.image_id(idx) for idx in range(_Q131_N) if idx % 11 == 5
    }
    assert set(got) == planted
    for r in got.values():
        assert r.img_cls != r.cap_cls
        assert r.align_score < 0.3, (r.image_id, r.align_score)


def test_q134_equals_crossplit_subset_of_q61(spark, sf_dir):
    """The incremental delta-vs-standing result must equal exactly the
    q61 full-corpus pairs that cross the md5 split (bucket caps never
    bind on the fixture), oriented delta-side first."""
    import hashlib

    from voz_spark.imagedup import (
        q61_phash_neardup,
        q134_incremental_image_neardup,
    )

    def is_base(iid: str) -> bool:
        return hashlib.md5(iid.encode()).hexdigest()[0] < "8"

    full = q61_phash_neardup(spark, sf_dir).collect()
    want = {}
    for r in full:
        a_base, b_base = is_base(r.id_a), is_base(r.id_b)
        if a_base != b_base:
            delta_id, base_id = (r.id_b, r.id_a) if a_base else (r.id_a, r.id_b)
            want[(delta_id, base_id)] = r.hamming
    got = {
        (r.delta_id, r.base_id): r.hamming
        for r in q134_incremental_image_neardup(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_q131_plan_has_zero_shuffles(spark, sf_dir):
    """q131's scan→project→filter claim, pinned: no hashpartitioning
    Exchange anywhere — the only allowed exchange is the final
    orderBy's rangepartitioning."""
    import re

    from voz_spark.imagedup import q131_crossmodal_alignment

    d = q131_crossmodal_alignment(spark, sf_dir)
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    ex = re.findall(r"Exchange (\w+)", plan)
    assert all(k == "rangepartitioning" for k in ex), plan


def test_q136_planted_sprites_are_flagged_with_one_distinct_tile(spark, sf_dir):
    """Every idx%7==3 image (top-left quadrant tiled 2x2) collapses to
    a single distinct quadrant hash and carries the sprite flag."""
    from voz_spark import synth
    from voz_spark.imagedup import _Q136_N_IMAGES, q136_sprite_images

    got = {r.image_id: r for r in q136_sprite_images(spark, sf_dir).collect()}
    for idx in range(_Q136_N_IMAGES):
        if idx % 7 == 3:
            iid = synth.image_row(idx)["image_id"]
            assert iid in got, iid
            assert got[iid].n_distinct_tiles == 1
            assert got[iid].is_sprite


def test_q137_gps_rows_scrubbed_others_untouched(spark, sf_dir):
    """idx%5==2 rows lose exactly their three gps_* tags; every other
    row keeps its full tag list; no output row retains a gps_ tag."""
    from voz_spark import synth
    from voz_spark.imagedup import _Q137_N, q137_exif_gps_scrub

    got = {r.image_id: r for r in q137_exif_gps_scrub(spark, sf_dir).collect()}
    assert len(got) == _Q137_N
    for idx in range(_Q137_N):
        r = got[synth.image_id(idx)]
        if idx % 5 == 2:
            assert r.had_gps and r.n_removed == 3
        else:
            assert not r.had_gps and r.n_removed == 0
        assert "gps_" not in r.kept_tags
        assert f"make=cam{idx % 4}" in r.kept_tags


def test_q140_diameter_bounds_and_chain_flag_consistency(spark, sf_dir):
    """Every audited cluster's diameter is at least the pair threshold
    floor (members connect via <=_HAMMING_MAX edges, so a 2-member
    cluster's diameter IS its edge weight) and the collapse flag is
    exactly diameter > threshold; singleton clusters never appear."""
    from voz_spark.imagedup import (
        _HAMMING_MAX,
        q61_phash_neardup,
        q140_cluster_diameter_audit,
    )

    rows = q140_cluster_diameter_audit(spark, sf_dir).collect()
    assert rows, "fixture plants near-dup groups; clusters must exist"
    pair_h = {
        (r.id_a, r.id_b): r.hamming for r in q61_phash_neardup(spark, sf_dir).collect()
    }
    max_pair = max(pair_h.values())
    for r in rows:
        assert r.n_members >= 2
        assert r.diameter_bits >= 0
        assert r.chain_collapsed == (r.diameter_bits > _HAMMING_MAX)
        if r.n_members == 2:
            # a 2-member cluster is one verified pair: its diameter is
            # that pair's hamming, so it can never be collapse-flagged
            assert r.diameter_bits <= max_pair
            assert not r.chain_collapsed


def test_q141_clips_found_compilation_rejected(spark, sf_dir):
    """Every planted clip maps to its source with containment >= 900
    milli; the compilation (5 scenes from each of three sources) never
    reaches the threshold; sources never pair with each other."""
    from voz_spark.imagedup import _Q141_CLIPS, q141_video_clip_containment

    rows = {(r.clip_id, r.source_id): r
            for r in q141_video_clip_containment(spark, sf_dir).collect()}
    for c in range(_Q141_CLIPS):
        key = (f"clip{c:02d}", f"src{c % 10:02d}")
        assert key in rows, key
        r = rows[key]
        assert r.n_shared == 10 + c
        assert r.n_clip_scenes == 11 + c
        assert r.containment_milli == 1000 * (10 + c) // (11 + c) >= 900
    assert not any("comp" in a or "comp" in b for a, b in rows)
    assert not any(a.startswith("src") and b.startswith("src") for a, b in rows)


def test_q143_totals_reconcile_with_fixture(spark, sf_dir):
    """Per-format byte totals and candidate counts equal a pandas
    recount of the same fixture rows."""
    from voz_spark.imagedup import (
        _Q143_CAND_MILLI,
        Q143_SIZES_PATH,
        q143_storage_audit,
    )

    got = {r.fmt: r for r in q143_storage_audit(spark, sf_dir).collect()}
    pdf = spark.read.parquet(Q143_SIZES_PATH).toPandas()
    assert set(got) == set(pdf["fmt"].unique())
    for fmt, grp in pdf.groupby("fmt"):
        r = got[fmt]
        raw = 3 * grp["w"].astype("int64") * grp["h"].astype("int64")
        ratio = 1000 * grp["nbytes"].astype("int64") // raw
        assert r.n_images == len(grp)
        assert r.total_bytes == int(grp["nbytes"].sum())
        assert r.fleet_ratio_milli == 1000 * int(grp["nbytes"].sum()) // int(raw.sum())
        assert r.n_transcode_candidates == int((ratio >= _Q143_CAND_MILLI).sum())


def test_q147_planted_orientations_cluster_exactly(spark, sf_dir):
    """Every planted rotation/flip pairs with its base image via the
    dihedral canonical key; any extra cluster must be a
    pattern-sharing near-dup pair (idx % 7 == 3 riding idx-1's
    pattern) whose pHash coincides bit-exactly — never a random
    collision between unrelated images."""
    from voz_spark.imagedup import _Q147_N, q147_dihedral_dedup

    rows = q147_dihedral_dedup(spark, sf_dir).collect()
    clusters = [tuple(sorted(r.members.split(","))) for r in rows]
    planted = {
        (f"img{i - 1:05d}", f"img{i:05d}")
        for i in range(_Q147_N)
        if i % 9 == 4
    }
    got = set(clusters)
    assert planted <= got, planted - got
    for pair in got - planted:
        assert len(pair) == 2
        a, b = (int(p[3:]) for p in pair)
        assert b == a + 1 and b % 7 == 3, pair
    assert all(r.n_images == 2 for r in rows)


def test_q149_packing_matches_bruteforce(spark, sf_dir):
    """Bucket snap and per-shard packing counts equal a pandas recount
    with the same integer argmin / floor-div rules."""
    import hashlib
    from collections import defaultdict

    from voz_spark.imagedup import (
        _Q149_BATCH,
        _Q149_BUCKETS,
        Q143_SIZES_PATH,
        q149_aspect_bucket_packing,
    )

    buckets = [int(x) for x in _Q149_BUCKETS.split(",")]
    # run the query FIRST so the write-once fixture exists even when
    # this test runs alone in a fresh /tmp
    got = {r.bucket: r for r in q149_aspect_bucket_packing(spark, sf_dir).collect()}
    pdf = spark.read.parquet(Q143_SIZES_PATH).toPandas()
    cells = defaultdict(int)
    for _, r in pdf.iterrows():
        ratio = 1000 * int(r.w) // int(r.h)
        bk = min(buckets, key=lambda b: (abs(ratio - b), b))
        shard = hashlib.md5(r.image_id.encode()).hexdigest()[0]
        cells[(bk, shard)] += 1
    per_bucket = defaultdict(lambda: [0, 0, 0, 0])
    for (bk, _), cnt in cells.items():
        s = per_bucket[bk]
        s[0] += cnt
        s[1] += cnt // _Q149_BATCH
        s[2] += cnt % _Q149_BATCH
        s[3] += 1
    assert set(got) == set(per_bucket)
    for bk, (n, full, strag, shards) in per_bucket.items():
        r = got[bk]
        assert (r.n_images, r.n_full_batches, r.n_stragglers, r.n_shards) == (
            n, full, strag, shards,
        )
    assert sum(r.n_full_batches for r in got.values()) > 0


def test_q150_flags_are_exclusive_and_match_recount(spark, sf_dir):
    """Gate flags follow the fixture priority (placeholder > empty >
    generic) and per-source counts equal a plain-Python recount."""
    from collections import defaultdict

    from voz_spark.imagedup import q150_caption_quality_gate
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    stats = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        i = r.doc_id
        s = stats[r.source]
        s[0] += 1
        if i % 13 == 6:
            s[1] += 1
        elif i % 17 == 8:
            s[2] += 1
        elif i % 19 == 11:
            s[3] += 1
    got = {r.source: r for r in q150_caption_quality_gate(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for src, (n, ph, em, gen) in stats.items():
        r = got[src]
        assert (r.n_pairs, r.n_placeholder, r.n_empty, r.n_generic) == (n, ph, em, gen)
        assert r.n_pass == n - ph - em - gen
        assert r.pass_rate_milli == 1000 * r.n_pass // n


def test_q151_planted_graphics_flag_with_margin(spark, sf_dir):
    """Every planted 4-color graphic is gated; every real photo clears
    the threshold with a wide margin (no photo anywhere near 16
    quantized colors); counts reconcile with the fixture rule."""
    from voz_spark.imagedup import (
        _Q151_GRAPHIC_MAX_COLORS,
        _Q151_N,
        Q151_COLORSTATS_PATH,
        q151_graphic_photo_gate,
    )

    got = {r.fmt: r for r in q151_graphic_photo_gate(spark, sf_dir).collect()}
    planted = len([i for i in range(_Q151_N) if i % 11 == 7])
    assert sum(r.n_graphics for r in got.values()) == planted
    assert sum(r.n_images for r in got.values()) == _Q151_N
    pdf = spark.read.parquet(Q151_COLORSTATS_PATH).toPandas()
    photos = pdf[~pdf.image_id.str.slice(3).astype(int).mod(11).eq(7)]
    assert int(photos.n_quant_colors.min()) > 4 * _Q151_GRAPHIC_MAX_COLORS
    graphics = pdf[pdf.image_id.str.slice(3).astype(int).mod(11).eq(7)]
    assert int(graphics.n_quant_colors.max()) <= 4


def test_q152_direction_and_bruteforce_parity(spark, sf_dir):
    """Thumbnail relations equal a plain-Python recount of the same
    band-hit + hamming + 4x-area rule; every found planted pair points
    thumb -> original (never reversed); recall over planted pairs is
    high (band-miss is the only allowed loss)."""
    from collections import defaultdict

    from voz_spark.imagedup import (
        _BANDS,
        _BUCKET_CAP,
        _HAMMING_MAX,
        _Q152_AREA_RATIO,
        _Q152_N,
        Q152_THUMBS_PATH,
        q152_thumbnail_pairs,
    )

    # run the query FIRST: it materializes the write-once fixture, so
    # the direct fixture read below works in a fresh /tmp too
    got = {tuple(r) for r in q152_thumbnail_pairs(spark, sf_dir).collect()}
    pdf = spark.read.parquet(Q152_THUMBS_PATH).toPandas()
    info = {r.image_id: (int(r.phash) & 0xFFFFFFFFFFFFFFFF, int(r.w) * int(r.h)) for r in pdf.itertuples()}
    buckets = defaultdict(list)
    for iid, (ph, _) in info.items():
        for k in range(_BANDS):
            buckets[(k, (ph >> (16 * k)) & 0xFFFF)].append(iid)
    cand = set()
    for members in buckets.values():
        if len(members) > _BUCKET_CAP:
            continue
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                cand.add((min(a, b), max(a, b)))
    expect = set()
    for a, b in cand:
        ham = bin(info[a][0] ^ info[b][0]).count("1")
        if ham > _HAMMING_MAX:
            continue
        aa, ab = info[a][1], info[b][1]
        if max(aa, ab) >= _Q152_AREA_RATIO * min(aa, ab):
            t, o = (a, b) if aa <= ab else (b, a)
            expect.add((t, o, ham, 1000 * max(aa, ab) // min(aa, ab)))
    assert got == expect
    planted = {
        (f"img{i:05d}", f"img{i - 1:05d}") for i in range(_Q152_N) if i % 8 == 5
    }
    found_planted = {(t, o) for t, o, _, _ in got if (t, o) in planted}
    assert len(found_planted) >= 0.9 * len(planted)
    # direction is never reversed on a planted pair
    assert not any((o, t) in planted for t, o, _, _ in got)


def test_q153_remap_consistent_with_q65_clusters(spark, sf_dir):
    """Alias count equals sum(n_members - 1) over q65 clusters; no
    alias is itself a survivor; every target is one."""
    from voz_spark.imagedup import q65_image_dedup_clusters, q153_dedup_remap

    remap = q153_dedup_remap(spark, sf_dir).collect()
    clusters = q65_image_dedup_clusters(spark, sf_dir).collect()
    kept = {r.kept_id for r in clusters}
    assert len(remap) == sum(r.n_members - 1 for r in clusters)
    assert not any(r.alias_id in kept for r in remap)
    assert all(r.kept_id in kept for r in remap)
    assert len({r.alias_id for r in remap}) == len(remap)


def test_q154_matrix_matches_pair_fold(spark, sf_dir):
    """The source matrix equals a plain fold of the q61 pair list with
    the same unordered-key and least-size rate rules."""
    from collections import defaultdict

    from voz_spark.imagedup import (
        _N_IMAGES,
        _Q154_SOURCES,
        q61_phash_neardup,
        q154_cross_source_dup_matrix,
    )

    pairs = q61_phash_neardup(spark, sf_dir).collect()
    fold = defaultdict(int)
    for r in pairs:
        sa = int(r.id_a[3:]) % _Q154_SOURCES
        sb = int(r.id_b[3:]) % _Q154_SOURCES
        fold[(min(sa, sb), max(sa, sb))] += 1
    sizes = defaultdict(int)
    for i in range(_N_IMAGES):
        sizes[i % _Q154_SOURCES] += 1
    got = {(r.source_a, r.source_b): r for r in q154_cross_source_dup_matrix(spark, sf_dir).collect()}
    assert set(got) == set(fold)
    for (sa, sb), n in fold.items():
        r = got[(sa, sb)]
        assert r.n_pairs == n
        assert r.dup_rate_milli == 1000 * n // min(sizes[sa], sizes[sb])


# ---------------------------------------------------------------- q159


def test_q159_collage_plants_flagged_and_naturals_clean(spark, sf_dir):
    """Every idx % 9 == 4 plant must flag as 'grid' (1 distinct tile),
    every idx % 9 == 7 as 'banded' (2), and flagged naturals — images
    whose quadrants genuinely collapse — must be confirmed by
    recomputing the quadrant hashes from the pixels."""
    from voz_spark import synth
    from voz_spark.imagedup import _Q159_N_IMAGES, q159_collage_detection
    from voz_spark.phash import phash64

    rows = q159_collage_detection(spark, sf_dir).collect()
    got = {r["image_id"]: (r["n_distinct_tiles"], r["collage_kind"]) for r in rows}
    grids = [synth.image_row(i)["image_id"] for i in range(_Q159_N_IMAGES) if i % 9 == 4]
    bands = [synth.image_row(i)["image_id"] for i in range(_Q159_N_IMAGES) if i % 9 == 7]
    for iid in grids:
        assert got.get(iid) == (1, "grid"), iid
    for iid in bands:
        assert got.get(iid) == (2, "banded"), iid
    # anything flagged beyond the plants must truly have <= 2 distinct
    # quadrant hashes of its NATURAL pixels
    ids = {synth.image_row(i)["image_id"]: i for i in range(_Q159_N_IMAGES)}
    for iid in set(got) - set(grids) - set(bands):
        px = synth.image_pixels(ids[iid])
        h, w = px.shape[0], px.shape[1]
        qs = {
            phash64(px[: h // 2, : w // 2]),
            phash64(px[: h // 2, w // 2 :]),
            phash64(px[h // 2 :, : w // 2]),
            phash64(px[h // 2 :, w // 2 :]),
        }
        assert len(qs) <= 2, iid


# ---------------------------------------------------------------- q161


def test_q161_blur_plants_flagged_with_margin(spark, sf_dir):
    """Flagged set must be EXACTLY the idx % 8 == 5 blur plants, every
    plant must score under a third of the gate, and every natural must
    score over 3x the gate (the separation the gate constant claims)."""
    from voz_spark import synth
    from voz_spark.imagedup import (
        _Q161_GATE_MILLI,
        _Q161_N_IMAGES,
        Q161_STATS_PATH,
        q161_blur_gate,
    )

    got = {
        r["image_id"]: r["sharpness_milli"]
        for r in q161_blur_gate(spark, sf_dir).collect()
    }
    plants = {
        synth.image_row(i)["image_id"]
        for i in range(_Q161_N_IMAGES)
        if i % 8 == 5
    }
    assert set(got) == plants
    assert all(v < _Q161_GATE_MILLI // 3 for v in got.values())
    # naturals carry >= 3x the gate's energy (read the full stat table)
    full = {
        r["image_id"]: 1000 * r["lap_energy"] // r["n_px"]
        for r in spark.read.parquet(Q161_STATS_PATH).collect()
    }
    for iid, score in full.items():
        if iid not in plants:
            assert score > 3 * _Q161_GATE_MILLI, (iid, score)


# ---------------------------------------------------------------- q163


def test_q163_bars_found_with_exact_crop(spark, sf_dir):
    """Every letterbox plant must flag as 'letterbox' with crop_h
    shrunk by exactly 2*(h//4) (pillarbox symmetrically), the flagged
    set must be exactly the plants, and the crop rectangle must never
    be empty."""
    from voz_spark import synth
    from voz_spark.imagedup import _Q163_N_IMAGES, q163_letterbox_detection

    rows = q163_letterbox_detection(spark, sf_dir).collect()
    got = {r["image_id"]: r for r in rows}
    letters = {i for i in range(_Q163_N_IMAGES) if i % 7 == 2}
    pillars = {i for i in range(_Q163_N_IMAGES) if i % 7 == 5}
    ids = {i: synth.image_row(i)["image_id"] for i in range(_Q163_N_IMAGES)}
    assert set(got) == {ids[i] for i in letters | pillars}
    for i in letters:
        r = got[ids[i]]
        h, w = r["h"], r["w"]
        assert r["bar_kind"] == "letterbox"
        assert r["top_rows"] == r["bottom_rows"] == h // 4
        assert r["crop_h"] == h - 2 * (h // 4) and r["crop_w"] <= w
        assert r["crop_h"] > 0 and r["crop_w"] > 0
    for i in pillars:
        r = got[ids[i]]
        w = r["w"]
        assert r["bar_kind"] == "pillarbox"
        assert r["left_cols"] == r["right_cols"] == w // 4
        assert r["crop_w"] == w - 2 * (w // 4)
        assert r["crop_h"] > 0 and r["crop_w"] > 0


def test_q164_exposure_gate_flags_exactly_the_planted_images(spark, sf_dir):
    """Every idx%9==4 fixture image is flagged 'over', every idx%9==7
    'under', and no natural image is flagged at all (the gate band has
    >3x margin on both sides)."""
    from voz_spark import synth
    from voz_spark.imagedup import _Q164_N, q164_exposure_gate

    rows = q164_exposure_gate(spark, sf_dir).collect()
    got = {r["image_id"]: r["exposure"] for r in rows}
    want = {}
    for idx in range(_Q164_N):
        if idx % 9 == 4:
            want[synth.image_id(idx)] = "over"
        elif idx % 9 == 7:
            want[synth.image_id(idx)] = "under"
    assert got == want
    for r in rows:
        if r["exposure"] == "over":
            assert r["mean_luma_milli"] > 176_000 and r["bright_milli"] >= 0
        else:
            assert r["mean_luma_milli"] < 80_000


# ---------------------------------------------------------------- q174


def test_q174_burst_sessionize_replay(spark, sf_dir):
    """Bursts must match the planted layout exactly: 60 bursts, sizes
    1 + (k % 5), survivor = first shot, span = n_shots - 1 seconds,
    and per-camera burst_seq increments in shot order."""
    from voz_spark.imagedup import q174_burst_clusters

    rows = q174_burst_clusters(spark, sf_dir).collect()
    assert len(rows) == 60
    by_survivor = {r["survivor"]: r for r in rows}
    for k in range(60):
        cam = f"cam{k % 8}"
        r = by_survivor[f"{cam}-{k:04d}-0"]
        assert r["camera"] == cam
        assert r["n_shots"] == 1 + k % 5
        assert r["span_s"] == r["n_shots"] - 1
        assert r["burst_start"] == 1_700_000_000 + k * 600
    for cam in {r["camera"] for r in rows}:
        seqs = sorted(r["burst_seq"] for r in rows if r["camera"] == cam)
        assert seqs == list(range(1, len(seqs) + 1))


# ---------------------------------------------------------------- q176


def test_q176_confusion_counts_against_independent_truth(spark, sf_dir):
    """n_truth must equal the planted-pair count derived independently
    from the synth rule; every hit must be a planted pair (precision
    1.000 on this corpus — random cosine fields don't collide under
    hamming<=10); recall must be high but is allowed to miss pairs
    whose rescale+renoise pushed the hash past the threshold."""
    from voz_spark.imagedup import _N_IMAGES, q176_dedup_eval

    want_truth = sum(1 for i in range(1, _N_IMAGES) if i % 7 == 3)
    rows = q176_dedup_eval(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_truth"] == want_truth == 80
    assert r["n_hit"] <= r["n_pred"] and r["n_hit"] <= r["n_truth"]
    assert r["precision_milli"] == 1000  # zero false positives
    assert r["recall_milli"] >= 900
    assert r["precision_milli"] == 1000 * r["n_hit"] // r["n_pred"]
    assert r["recall_milli"] == 1000 * r["n_hit"] // r["n_truth"]


# ---------------------------------------------------------------- q179


def test_q179_curve_consistent_with_q176_operating_point(spark, sf_dir):
    """The PR curve's cumulative counts at hamming <= 10 must equal
    q176's single-point confusion counts; recall must be nondecreasing
    in the threshold and the banded-recall ceiling must match q176's
    recall at the top of the curve."""
    from voz_spark.imagedup import _HAMMING_MAX, q176_dedup_eval, q179_dedup_pr_curve

    curve = q179_dedup_pr_curve(spark, sf_dir).collect()
    point = q176_dedup_eval(spark, sf_dir).collect()[0]
    recalls = [r["recall_milli"] for r in curve]
    assert recalls == sorted(recalls)
    at_op = [r for r in curve if r["hamming"] <= _HAMMING_MAX][-1]
    assert at_op["cum_pred"] == point["n_pred"]
    assert at_op["cum_hit"] == point["n_hit"]
    assert at_op["recall_milli"] == point["recall_milli"]
    # every cum_pred step equals its bin count
    for prev, cur in zip(curve, curve[1:]):
        assert cur["cum_pred"] == prev["cum_pred"] + cur["n_pairs"]
        assert cur["cum_hit"] >= prev["cum_hit"]


# ---------------------------------------------------------------- q180


def test_q180_layout_tradeoff_and_q176_consistency(spark, sf_dir):
    """Candidate volume must grow with band count, the surfaced-truth
    ceiling must be nondecreasing, the 4-band row must agree with
    q176's confusion counts, and 8x8 banding must surface every
    planted pair on this corpus."""
    from voz_spark.imagedup import q176_dedup_eval, q180_band_sweep

    rows = {r["bands"]: r for r in q180_band_sweep(spark, sf_dir).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2]["n_cand"] < rows[4]["n_cand"] < rows[8]["n_cand"]
    assert (
        rows[2]["surfaced_milli"] <= rows[4]["surfaced_milli"] <= rows[8]["surfaced_milli"]
    )
    point = q176_dedup_eval(spark, sf_dir).collect()[0]
    assert rows[4]["n_pred"] == point["n_pred"]
    assert rows[4]["n_hit"] == point["n_hit"]
    assert rows[8]["surfaced_milli"] == 1000
    for r in rows.values():
        assert r["n_hit"] <= r["n_surfaced"] <= r["n_cand"]


# ---------------------------------------------------------------- q181


def test_q181_strictest_license_wins_via_independent_union_find(spark, sf_dir):
    """Cluster membership, survivor, and effective license must match
    an independent Python union-find over q61's (already-oracled)
    pairs plus the id-parsed license ranks."""
    import pandas as pd

    from voz_spark.imagedup import (
        Q65_IMAGES_PATH,
        q61_phash_neardup,
        q181_license_propagation,
    )

    pairs = [(r["id_a"], r["id_b"]) for r in q61_phash_neardup(spark, sf_dir).collect()]
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = pd.read_parquet(Q65_IMAGES_PATH).set_index("image_id")
    members: dict[str, list] = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    names = ["restricted", "attribution", "permissive"]
    rows = {r["cluster"]: r for r in q181_license_propagation(spark, sf_dir).collect()}
    assert len(rows) == len(members)
    for root, nodes in members.items():
        r = rows[root]
        assert r["n_members"] == len(nodes)
        keep = min(nodes, key=lambda n: (-int(sizes.loc[n, "w"] * sizes.loc[n, "h"]), n))
        assert r["kept_id"] == keep
        ranks = [int(n[3:]) % 3 for n in nodes]
        assert r["effective_license"] == names[min(ranks)]
        assert r["own_license"] == names[int(keep[3:]) % 3]
        assert r["tainted"] == (int(keep[3:]) % 3 > min(ranks))
    assert any(r["tainted"] for r in rows.values())


# ---------------------------------------------------------------- q182


def test_q182_funnel_replay_and_conservation(spark, sf_dir):
    """The capstone funnel must match an independent pandas replay of
    all six gate rules over the same stats fixture + a Python
    union-find for dedup/license, and must conserve counts stage to
    stage."""
    import pandas as pd

    from voz_spark.imagedup import (
        Q65_IMAGES_PATH,
        Q182_STATS_PATH,
        _Q182_DIGIT_MILLI,
        _Q182_OVER_MILLI,
        _Q182_RES_MIN_PX,
        _Q182_SHARP_MILLI,
        _Q182_UNDER_MILLI,
        q61_phash_neardup,
        q182_image_corpus_build,
    )

    rows = q182_image_corpus_build(spark, sf_dir).collect()
    assert [r["stage_no"] for r in rows] == [1, 2, 3, 4, 5, 6]
    for a, b in zip(rows, rows[1:]):
        assert a["n_out"] == b["n_in"]
        assert a["n_in"] - a["n_fail"] == a["n_out"]
    assert rows[0]["n_in"] == 560
    assert all(r["n_fail"] > 0 for r in rows)  # every gate has prey

    # independent replay
    stats = pd.read_parquet(Q182_STATS_PATH)
    sizes = pd.read_parquet(Q65_IMAGES_PATH).set_index("image_id")
    pairs = [(r["id_a"], r["id_b"]) for r in q61_phash_neardup(spark, sf_dir).collect()]
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[str, list] = {}
    for node in parent:
        clusters.setdefault(find(node), []).append(node)
    kept, strict = {}, {}
    for nodes in clusters.values():
        keep = min(nodes, key=lambda n: (-int(sizes.loc[n, "w"] * sizes.loc[n, "h"]), n))
        mn = min(int(n[3:]) % 3 for n in nodes)
        for n in nodes:
            kept[n] = n == keep
            strict[n] = mn
    fails = [0] * 7
    for _, s in stats.iterrows():
        iid, cap = s["image_id"], s["caption"]
        luma = 1000 * s["luma_sum"] // s["n_px"]
        digits = sum(ch.isdigit() for ch in cap)
        if s["w"] * s["h"] < _Q182_RES_MIN_PX:
            f = 1
        elif luma < _Q182_UNDER_MILLI or luma > _Q182_OVER_MILLI:
            f = 2
        elif 1000 * s["lap_energy"] // s["n_px_lap"] < _Q182_SHARP_MILLI:
            f = 3
        elif 1000 * digits // len(cap) > _Q182_DIGIT_MILLI:
            f = 4
        elif iid in kept and not kept[iid]:
            f = 5
        elif strict.get(iid, int(iid[3:]) % 3) == 0:
            f = 6
        else:
            f = 0
        fails[f] += 1
    n_in = 560
    for r in rows:
        assert r["n_in"] == n_in
        assert r["n_fail"] == fails[r["stage_no"]]
        n_in -= fails[r["stage_no"]]
    assert rows[-1]["n_out"] == n_in == fails[0]


# ---------------------------------------------------------------- q184


def test_q184_byte_attribution_consistent_with_q182(spark, sf_dir):
    """Byte attribution must agree with the funnel's image counts per
    stage, conserve total bytes, and the kept row must exist: the
    bytes-per-kept-sample economics derive from these two tables."""
    from voz_spark.imagedup import (
        q182_image_corpus_build,
        q184_curation_byte_attribution,
    )

    funnel = {r["stage_no"]: r for r in q182_image_corpus_build(spark, sf_dir).collect()}
    attr = {r["stage_no"]: r for r in q184_curation_byte_attribution(spark, sf_dir).collect()}
    assert 0 in attr and attr[0]["stage"] == "0_kept"
    assert attr[0]["n_images"] == funnel[6]["n_out"]
    for k in range(1, 7):
        assert attr[k]["n_images"] == funnel[k]["n_fail"]
        assert attr[k]["stage"] == funnel[k]["stage"]
    total_imgs = sum(r["n_images"] for r in attr.values())
    assert total_imgs == funnel[1]["n_in"] == 560
    total_bytes = sum(r["n_bytes"] for r in attr.values())
    assert all(r["n_bytes"] > 0 for r in attr.values())
    shares = sum(r["byte_share_milli"] for r in attr.values())
    assert 990 <= shares <= 1000  # integer-floor shares sum to <= 1000
    for r in attr.values():
        assert r["byte_share_milli"] == 1000 * r["n_bytes"] // total_bytes


# ---------------------------------------------------------------- q185


def test_q185_ablation_invariants_and_funnel_tie(spark, sf_dir):
    """Per gate: unique kills <= funnel-attributed <= independent
    fails; funnel-attributed counts must equal q182's n_fail column;
    and the corpus's planted structure must show through — exposure
    has ZERO unique kills (the exposure curves also flatten Laplacian
    energy, so sharpness catches every one) while license carries the
    most."""
    from voz_spark.imagedup import q182_image_corpus_build, q185_gate_ablation

    abl = {r["gate_no"]: r for r in q185_gate_ablation(spark, sf_dir).collect()}
    funnel = {r["stage_no"]: r for r in q182_image_corpus_build(spark, sf_dir).collect()}
    assert set(abl) == set(range(1, 7))
    for k, r in abl.items():
        assert r["n_unique"] <= r["n_first"] <= r["n_fail"]
        assert r["n_first"] == funnel[k]["n_fail"]
        assert r["gate"] == funnel[k]["stage"]
        want = 0 if r["n_fail"] == 0 else 1000 * r["n_unique"] // r["n_fail"]
        assert r["unique_milli"] == want
    assert abl[2]["n_unique"] == 0  # exposure fully shadowed by sharpness
    assert abl[6]["n_unique"] == max(r["n_unique"] for r in abl.values())


# ---------------------------------------------------------------- q186


def test_q186_donor_election_replay(spark, sf_dir):
    """Every clustered junk-caption image must appear exactly once;
    each donor must be the highest-resolution non-junk member of the
    same cluster (tie: min id); a junk plant can never donate."""
    import pandas as pd

    from voz_spark.imagedup import (
        Q65_IMAGES_PATH,
        Q182_STATS_PATH,
        q61_phash_neardup,
        q186_caption_repair,
    )

    stats = pd.read_parquet(Q182_STATS_PATH).set_index("image_id")
    sizes = pd.read_parquet(Q65_IMAGES_PATH).set_index("image_id")

    def is_junk(iid):
        cap = stats.loc[iid, "caption"]
        d = sum(ch.isdigit() for ch in cap)
        return 1000 * d // len(cap) > 280

    pairs = [(r["id_a"], r["id_b"]) for r in q61_phash_neardup(spark, sf_dir).collect()]
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[str, list] = {}
    for n in parent:
        clusters.setdefault(find(n), []).append(n)
    rows = {r["image_id"]: r for r in q186_caption_repair(spark, sf_dir).collect()}
    expected = []
    for nodes in clusters.values():
        good = [n for n in nodes if not is_junk(n)]
        donor = (
            min(good, key=lambda n: (-int(sizes.loc[n, "w"] * sizes.loc[n, "h"]), n))
            if good
            else None
        )
        for n in nodes:
            if is_junk(n):
                expected.append((n, donor))
    assert len(rows) == len(expected) > 0
    for iid, donor in expected:
        r = rows[iid]
        if donor is None:
            assert not r["repaired"] and r["donor_id"] == ""
        else:
            assert r["repaired"] and r["donor_id"] == donor
            assert r["new_caption"] == stats.loc[donor, "caption"]
            assert not is_junk(donor)


# ---------------------------------------------------------------- q187


def test_q187_delta_funnel_replay(spark, sf_dir):
    """The delta funnel must match a full Python replay: gates from
    the delta stats, dedup from a banded-hamming check against both
    the standing index and earlier delta images, license on the own
    tag; stage counts conserve."""
    import pandas as pd

    from voz_spark.imagedup import (
        _BANDS,
        _HAMMING_MAX,
        Q61_PHASH_PATH,
        Q187_DELTA_PHASH_PATH,
        Q187_DELTA_STATS_PATH,
        q187_incremental_funnel,
    )

    rows = q187_incremental_funnel(spark, sf_dir).collect()
    stats = pd.read_parquet(Q187_DELTA_STATS_PATH)
    dph = pd.read_parquet(Q187_DELTA_PHASH_PATH).set_index("image_id")["phash"]
    sph = pd.read_parquet(Q61_PHASH_PATH).set_index("image_id")["phash"]

    def bands(h):
        return [(k, (int(h) >> (16 * k)) & 0xFFFF) for k in range(_BANDS)]

    buckets: dict[tuple, list] = {}
    for iid, h in sph.items():
        for b in bands(h):
            buckets.setdefault(b, []).append((iid, int(h)))
    for iid, h in dph.items():
        for b in bands(h):
            buckets.setdefault(b, []).append((iid, int(h)))

    def is_dup(iid):
        h = int(dph[iid])
        seen = set()
        for b in bands(h):
            for oid, oh in buckets.get(b, []):
                if oid in seen or oid == iid:
                    continue
                seen.add(oid)
                earlier_delta = oid in dph.index and oid < iid
                standing = oid in sph.index
                if (standing or earlier_delta) and bin(h ^ oh).count("1") <= _HAMMING_MAX:
                    return True
        return False

    fails = [0] * 7
    for _, s in stats.iterrows():
        iid, cap = s["image_id"], s["caption"]
        luma = 1000 * s["luma_sum"] // s["n_px"]
        digits = sum(ch.isdigit() for ch in cap)
        if s["w"] * s["h"] < 1024:
            f = 1
        elif luma < 80_000 or luma > 176_000:
            f = 2
        elif 1000 * s["lap_energy"] // s["n_px_lap"] < 100_000:
            f = 3
        elif 1000 * digits // len(cap) > 280:
            f = 4
        elif is_dup(iid):
            f = 5
        elif int(iid[3:]) % 3 == 0:
            f = 6
        else:
            f = 0
        fails[f] += 1
    n_in = len(stats)
    assert n_in == 80
    for r in rows:
        assert r["n_in"] == n_in
        assert r["n_fail"] == fails[r["stage_no"]]
        n_in -= fails[r["stage_no"]]
    assert rows[-1]["n_out"] == n_in == fails[0]
    assert fails[5] > 0  # the delta really collides with the standing set


# ---------------------------------------------------------------- q193


def test_q193_no_straddle_and_capacity(spark, sf_dir):
    """No window exceeds the patch budget, every window is filled to
    capacity except possibly the last of its (shard, patches) group,
    and the image total conserves."""
    from voz_spark.imagedup import _N_IMAGES, _Q193_BUDGET, q193_patch_packing

    rows = q193_patch_packing(spark, sf_dir).collect()
    assert sum(r["n_images"] for r in rows) == _N_IMAGES
    groups: dict[tuple, list] = {}
    for r in rows:
        assert r["patches_used"] == r["n_images"] * r["patches"]
        assert r["patches_used"] <= _Q193_BUDGET
        assert r["waste"] == _Q193_BUDGET - r["patches_used"]
        groups.setdefault((r["shard"], r["patches"]), []).append(r)
    for (shard, patches), g in groups.items():
        g.sort(key=lambda r: r["window_id"])
        cap = _Q193_BUDGET // patches
        assert [r["window_id"] for r in g] == list(range(len(g)))
        for r in g[:-1]:
            assert r["n_images"] == cap  # full windows
        assert 1 <= g[-1]["n_images"] <= cap
