"""Kill/resume exactness (SURVEY §5.2 item 3; reference analogue:
checkpoint.json resume at src/main.py:94-128): running K rounds, losing
the process, and resuming from the committed catalog must produce
byte-identical final state vs an uninterrupted run."""

from __future__ import annotations

import tempfile

from voz_spark.rounds import CrawlEngine

N_SEEDS, N_IMAGES = 8, 300


def _state(eng: CrawlEngine):
    seen = sorted(r.canon_url for r in eng.seen().collect())
    sched = eng.schedule_order()
    results = sorted(
        (r.round_id, r.canon_url, r.status, r.n_children)
        for r in eng.results().collect()
    )
    return seen, sched, results


def test_resume_reproduces_uninterrupted_run(spark):
    wd_a = tempfile.mkdtemp(prefix="crawl-uninterrupted-")
    full = CrawlEngine(spark, wd_a, n_seeds=N_SEEDS, n_images=N_IMAGES)
    full.run()

    wd_b = tempfile.mkdtemp(prefix="crawl-killed-")
    first = CrawlEngine(spark, wd_b, n_seeds=N_SEEDS, n_images=N_IMAGES)
    first.run(max_rounds=2)
    # "kill": drop the engine object entirely; a new engine discovers
    # state only from the committed catalog
    resumed = CrawlEngine(spark, wd_b, n_seeds=N_SEEDS, n_images=N_IMAGES)
    assert resumed.last_round() == 2
    resumed.run()

    assert _state(full) == _state(resumed)


def test_uncommitted_files_invisible(spark):
    """Crash model: data files written without a manifest commit are
    never read (Iceberg semantics of the snapshot catalog)."""
    import pandas as pd

    from voz_spark import schemas
    from voz_spark.tables import SnapshotCatalog

    wd = tempfile.mkdtemp(prefix="cat-")
    cat = SnapshotCatalog(wd)
    df = spark.createDataFrame(
        pd.DataFrame([{"url_hash": 1, "canon_url": "https://a/", "first_round": 1}]),
        schemas.SEEN,
    )
    cat.write_files(df, "seen")  # crash before commit: files orphaned
    assert cat.read(spark, "seen", schemas.SEEN).count() == 0
    files = cat.write_files(df, "seen")
    cat.commit(appends={"seen": files}, meta={"round_id": 1})
    assert cat.read(spark, "seen", schemas.SEEN).count() == 1
    # version history is intact and addressable (time travel)
    assert cat.manifest(1)["tables"]["seen"] == files
