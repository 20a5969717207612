"""North-rule correctness gate (SURVEY §5.2 item 1): the distributed
engine must reproduce the sequential reference semantics exactly —
crawl ordering, final URL-seen set, per-URL fetch status — plus the
per-row image invariants (PSNR ≥ 40 dB lossy / exact lossless decode,
caption equality)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from voz_spark.oracle_sim import simulate
from voz_spark.rounds import CrawlEngine

N_SEEDS, N_IMAGES = 10, 400


@pytest.fixture(scope="module")
def crawl(spark):
    wd = tempfile.mkdtemp(prefix="crawl-order-")
    eng = CrawlEngine(spark, wd, n_seeds=N_SEEDS, n_images=N_IMAGES)
    eng.run()
    sim = simulate(n_seeds=N_SEEDS, n_images=N_IMAGES)
    return eng, sim


def test_schedule_order_matches_reference(crawl):
    eng, sim = crawl
    assert eng.schedule_order() == sim.schedule


def test_seen_set_matches_reference(crawl):
    eng, sim = crawl
    got = {r.canon_url for r in eng.seen().collect()}
    assert got == sim.seen


def test_fetch_status_parity(crawl):
    eng, sim = crawl
    got = {(r.round_id, r.canon_url): r.status for r in eng.results().collect()}
    exp = {(r["round_id"], r["canon_url"]): r["status"] for r in sim.results}
    assert got == exp


def test_image_validation_invariants(crawl):
    """input_hint: decoded-pixel allclose (PSNR=inf for png),
    PSNR ≥ 40 dB for lossy, exact caption equality on every ok row."""
    eng, _ = crawl
    ok_imgs = eng.results().where(
        (F.col("kind") == "image") & (F.col("status") == "ok")
    ).collect()
    assert len(ok_imgs) > 0
    for r in ok_imgs:
        assert r.caption_ok is True
        assert r.psnr_db is not None and r.psnr_db >= 40.0


def test_no_url_scheduled_twice(crawl):
    eng, _ = crawl
    n = eng.results().count()
    n_distinct = eng.results().select("canon_url").distinct().count()
    assert n == n_distinct


def test_lineage_funnel_recorded(crawl):
    eng, _ = crawl
    funnel = eng.lineage().where(F.col("partition_id") == -1)
    assert funnel.count() == len({r for r, _ in eng.schedule_order()})
    row = funnel.orderBy("round_id").first()
    assert row.n_candidates > 0 and row.n_scheduled > 0


def test_checkpoints_advance(crawl):
    eng, _ = crawl
    rounds = [r.round_id for r in eng.checkpoints().orderBy("round_id").collect()]
    assert rounds == list(range(1, len(rounds) + 1))


def test_thread_limit_and_sticky_parity(spark):
    """A1 LIMIT + B7 sticky filter must match the simulator too."""
    wd = tempfile.mkdtemp(prefix="crawl-limit-")
    eng = CrawlEngine(spark, wd, n_seeds=40, n_images=200, thread_limit=6)
    eng.run()
    sim = simulate(n_seeds=40, n_images=200, thread_limit=6)
    assert eng.schedule_order() == sim.schedule
    assert {r.canon_url for r in eng.seen().collect()} == sim.seen


def test_robots_table_join_matches_compiled_boolean(spark):
    """The table-join robots path (millions-of-rules scale) must flag
    exactly the same rows as the compiled Catalyst boolean."""
    import pandas as pd
    from pyspark.sql import functions as F

    from voz_spark import synth
    from voz_spark.frontier import _robots_flag, _robots_flag_table

    rules = synth.robots_rules()
    rows = []
    hosts = sorted({r["host"] for r in rules}) + ["unlisted.example"]
    i = 0
    for h in hosts:
        for p in ["/", "/blocked", "/blocked/img/x.png", "/img/a.png", "/blocke", "/BLOCKED/x"]:
            rows.append({"canon_url": f"https://{h}{p}", "host": h, "path": p, "i": i})
            i += 1
    df = spark.createDataFrame(pd.DataFrame(rows))
    compiled = {r["i"]: r["robots_blocked"] for r in _robots_flag(df, rules).collect()}
    robots_df = spark.createDataFrame(pd.DataFrame(rules))
    table = {r["i"]: r["robots_blocked"] for r in _robots_flag_table(df, robots_df).collect()}
    assert compiled == table
    assert any(compiled.values()) and not all(compiled.values())
