"""Catalog maintenance gates: snapshot expiry, orphan vacuum, and
small-file compaction (the Iceberg expireSnapshots / removeOrphanFiles
/ rewriteDataFiles trio — SURVEY §2.A A11's long-run storage story).

Pinned invariants:
- expiry never touches the latest version and removes exactly the
  manifests outside the keep window; expired versions stop resolving;
- vacuum deletes ONLY files no retained manifest references, and the
  age guard protects an in-flight writer's uncommitted output;
- compaction changes layout, never data: same rows before/after, one
  new snapshot, old version still time-travels until expired.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from voz_spark.tables import SnapshotCatalog


def _df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") * 2).cast("long").alias("val"),
    )


def _schema(spark):
    return _df(spark, 0, 1).schema


def test_expire_snapshots_keeps_window_and_latest(spark):
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="voz-cat-"))
    for i in range(5):
        cat.commit(appends={"t": cat.write_files(_df(spark, i * 10, i * 10 + 10), "t")})
    assert cat.latest_version() == 5
    expired = cat.expire_snapshots(keep_last=2)
    assert expired == [1, 2, 3]
    assert cat._all_versions() == [4, 5]
    # latest still reads the full appended history
    assert cat.read(spark, "t", _schema(spark)).count() == 50
    # an expired version no longer resolves
    with pytest.raises(FileNotFoundError):
        cat.manifest(2)
    # idempotent / window already satisfied
    assert cat.expire_snapshots(keep_last=2) == []
    with pytest.raises(ValueError):
        cat.expire_snapshots(keep_last=0)


def test_vacuum_deletes_only_unreferenced_old_files(spark):
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="voz-cat-"))
    committed = cat.write_files(_df(spark, 0, 10), "t")
    cat.commit(appends={"t": committed})
    # a round that died between write_files and commit: orphaned files
    orphaned = cat.write_files(_df(spark, 10, 20), "t")
    # a replace leaves the replaced files unreferenced too
    replacement = cat.write_files(_df(spark, 0, 30), "t")
    cat.commit(replaces={"t": replacement})
    cat.expire_snapshots(keep_last=1)  # v1 (referencing `committed`) expires

    # age guard: everything here is seconds old, so a 1h grace window
    # sees no orphans at all
    assert cat.orphan_files(min_age_s=3600.0) == []
    # with the guard off, exactly the crashed write + the expired
    # version's files are orphans
    victims = cat.vacuum(min_age_s=0.0)
    assert sorted(victims) == sorted(committed + orphaned)
    for p in replacement:
        assert os.path.exists(p)
    assert cat.read(spark, "t", _schema(spark)).count() == 30


def test_compact_preserves_rows_and_time_travel(spark):
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="voz-cat-"))
    for i in range(4):  # 4 appends -> many small files
        cat.commit(appends={"t": cat.write_files(_df(spark, i * 5, i * 5 + 5), "t")})
    before_files = cat.manifest()["tables"]["t"]
    assert len(before_files) > 1
    before_rows = sorted(
        (r.id, r.val) for r in cat.read(spark, "t", _schema(spark)).collect()
    )

    v = cat.compact(spark, "t", _schema(spark), target_files=1)
    assert v == 5
    after_files = cat.manifest()["tables"]["t"]
    assert len(after_files) == 1
    after_rows = sorted(
        (r.id, r.val) for r in cat.read(spark, "t", _schema(spark)).collect()
    )
    assert after_rows == before_rows
    # snapshot isolation: the pre-compaction version still reads the
    # old layout until expired
    old_rows = sorted(
        (r.id, r.val) for r in cat.read(spark, "t", _schema(spark), version=4).collect()
    )
    assert old_rows == before_rows
    # after expiry + vacuum the old small files are gone, data intact
    cat.expire_snapshots(keep_last=1)
    victims = cat.vacuum(min_age_s=0.0)
    assert sorted(victims) == sorted(before_files)
    assert sorted(
        (r.id, r.val) for r in cat.read(spark, "t", _schema(spark)).collect()
    ) == before_rows


def test_maintenance_between_rounds_preserves_exact_resume(spark):
    """The full composition: kill after 2 rounds, run the maintenance
    trio on the committed catalog (compact `seen` + expire to the
    latest snapshot + vacuum with the age guard off), then resume.
    Final seen-set, schedule order, and results must still be
    byte-identical to an uninterrupted run — maintenance is a storage
    concern and must never leak into crawl semantics (in particular,
    compaction must carry the manifest meta forward or resume would
    restart from round 0 / rebuild the seen filter)."""
    from voz_spark import schemas
    from voz_spark.rounds import CrawlEngine

    n_seeds, n_images = 8, 300

    wd_a = tempfile.mkdtemp(prefix="crawl-plain-")
    full = CrawlEngine(spark, wd_a, n_seeds=n_seeds, n_images=n_images)
    full.run()

    wd_b = tempfile.mkdtemp(prefix="crawl-maint-")
    first = CrawlEngine(spark, wd_b, n_seeds=n_seeds, n_images=n_images)
    first.run(max_rounds=2)
    round_before = first.last_round()
    del first

    maint = CrawlEngine(spark, wd_b, n_seeds=n_seeds, n_images=n_images)
    n_files_before = len(maint.cat.manifest()["tables"]["seen"])
    maint.cat.compact(spark, "seen", schemas.SEEN, target_files=1)
    assert maint.last_round() == round_before  # meta carried forward
    maint.cat.expire_snapshots(keep_last=1)
    maint.cat.vacuum(min_age_s=0.0)
    assert len(maint.cat.manifest()["tables"]["seen"]) <= n_files_before
    del maint

    resumed = CrawlEngine(spark, wd_b, n_seeds=n_seeds, n_images=n_images)
    assert resumed.last_round() == round_before
    resumed.run()

    def state(eng):
        seen = sorted(r.canon_url for r in eng.seen().collect())
        results = sorted(
            (r.round_id, r.canon_url, r.status, r.n_children)
            for r in eng.results().collect()
        )
        return seen, eng.schedule_order(), results

    assert state(full) == state(resumed)


def test_zorder_compaction_tightens_file_boxes(spark):
    """compact(cluster_by=(x, y)) must (a) preserve rows exactly and
    (b) emit files whose (x, y) bounding boxes each cover a small
    fraction of the key domain — the min/max statistics a rectangle
    query prunes on. A random/round-robin layout gives every file
    ~the whole domain; the z-order rewrite gives each file a tile."""
    import duckdb

    from voz_spark.session import load_table as T
    from voz_spark.tables import SnapshotCatalog

    li = T(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    )
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="voz-zc-"))
    cat.commit(appends={"t": cat.write_files(li, "t")})
    before = sorted((r.pk, r.sk) for r in cat.read(spark, "t", li.schema).collect())

    cat.compact(spark, "t", li.schema, target_files=4, cluster_by=("pk", "sk"))
    files = cat.manifest()["tables"]["t"]
    assert len(files) == 4
    after = sorted((r.pk, r.sk) for r in cat.read(spark, "t", li.schema).collect())
    assert after == before

    pk_lo = min(p for p, _ in before)
    pk_hi = max(p for p, _ in before)
    sk_lo = min(s for _, s in before)
    sk_hi = max(s for _, s in before)
    domain = (pk_hi - pk_lo + 1) * (sk_hi - sk_lo + 1)
    for f in files:
        lo_p, hi_p, lo_s, hi_s = duckdb.sql(
            f"SELECT MIN(pk), MAX(pk), MIN(sk), MAX(sk) FROM read_parquet('{f}')"
        ).fetchone()
        area = (hi_p - lo_p + 1) * (hi_s - lo_s + 1)
        assert area <= 0.5 * domain  # each file is a tile, not the domain


def test_schema_evolution_add_column(spark):
    """Iceberg add-column semantics over the snapshot catalog: files
    written before a column existed read back with nulls under the
    evolved schema (forward), and an old reader's schema simply prunes
    the new column from newer files (backward) — no rewrite of
    historical data when a crawl adds a field mid-run."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from voz_spark.tables import SnapshotCatalog

    v1 = StructType([StructField("id", LongType()), StructField("a", StringType())])
    v2 = StructType(
        [
            StructField("id", LongType()),
            StructField("a", StringType()),
            StructField("b", LongType()),
        ]
    )
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="voz-evo-"))
    old = spark.range(3).select(F.col("id"), F.lit("x").alias("a"))
    cat.commit(appends={"t": cat.write_files(old, "t")})
    new = spark.range(3, 6).select(
        F.col("id"), F.lit("y").alias("a"), (F.col("id") * 7).alias("b")
    )
    cat.commit(appends={"t": cat.write_files(new, "t")})

    # forward: evolved reader sees nulls for pre-evolution files
    rows = sorted(tuple(r) for r in cat.read(spark, "t", v2).collect())
    assert rows == [
        (0, "x", None), (1, "x", None), (2, "x", None),
        (3, "y", 21), (4, "y", 28), (5, "y", 35),
    ]
    # backward: an old reader prunes the new column from newer files
    rows_v1 = sorted(tuple(r) for r in cat.read(spark, "t", v1).collect())
    assert rows_v1 == [(0, "x"), (1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y")]
    # maintenance under evolution: compaction normalizes everything to
    # the evolved schema without losing a row
    cat.compact(spark, "t", v2, target_files=1)
    assert sorted(tuple(r) for r in cat.read(spark, "t", v2).collect()) == rows
