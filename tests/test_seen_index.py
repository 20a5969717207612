"""Bucketed seen-index (voz_spark/seen_index.py): the exact anti-join
must keep identical semantics under cfg.seen_store="bucketed" while its
physical plan loses the seen-side exchange entirely.

Reference parity target: the same crawled-set membership the reference
checks per thread against its cache dir (src/thread_crawler.py:46-59).
"""

from __future__ import annotations

import re
import tempfile

import pytest
from pyspark.sql import functions as F

from voz_spark.config import CrawlConfig
from voz_spark.rounds import CrawlEngine


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _run(spark, cfg, workdir=None, rounds=None):
    eng = CrawlEngine(
        spark,
        workdir or tempfile.mkdtemp(prefix="seenidx-"),
        n_seeds=5,
        n_images=150,
        cfg=cfg,
    )
    eng.run(max_rounds=rounds)
    seen = sorted(r.canon_url for r in eng.seen().collect())
    return eng, seen


def test_bucketed_engine_matches_plain_schedule(spark):
    """Full E2E: seen_store is a physical choice, never a semantic one
    — same crawl schedule, same seen set, same results."""
    plain, plain_seen = _run(spark, CrawlConfig())
    buck, buck_seen = _run(spark, CrawlConfig(seen_store="bucketed", seen_buckets=8))
    assert plain_seen == buck_seen
    assert plain.schedule_order() == buck.schedule_order()
    assert sorted(
        (r.round_id, r.canon_url, r.status) for r in plain.results().collect()
    ) == sorted((r.round_id, r.canon_url, r.status) for r in buck.results().collect())


def test_anti_join_plan_has_no_seen_side_exchange(spark):
    """The point of the index: with broadcast disabled (the 10^10-state
    regime — seen never fits a broadcast), the left-anti plan reads the
    bucketed seen scan in place. Exactly ONE exchange total (the small
    candidate side), and the scan is bucketed."""
    cfg = CrawlConfig(seen_store="bucketed", seen_buckets=8)
    eng, _ = _run(spark, cfg, rounds=2)
    idx_df = eng.seen_idx.sync(eng.cat)
    cand = (
        spark.range(500)
        .select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            F.concat(F.lit("https://x/"), F.col("id")).alias("canon_url"),
        )
    )
    with _no_broadcast(spark):
        anti = cand.join(
            idx_df.select("url_hash", "canon_url"),
            ["url_hash", "canon_url"],
            "left_anti",
        )
        plan = _formatted_plan(anti)
    assert "Bucketed: true" in plan, plan
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1, plan


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *a):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_reopen_triggers_index_rebuild(spark):
    """CrawlEngine.reopen REPLACES seen wholesale; the derived index
    must detect the non-append change, rebuild, and the recrawl must
    still match a plain-store engine doing the same reopen."""

    def crawl_reopen_crawl(cfg):
        eng, _ = _run(spark, cfg)
        urls = eng.seen().select("canon_url").orderBy("canon_url").limit(3)
        targets = sorted(r.canon_url for r in urls.collect())
        eng.reopen(eng.spark.createDataFrame([(u,) for u in targets], "canon_url string"))
        eng.run()
        results = sorted(
            (r.round_id, r.canon_url, r.status) for r in eng.results().collect()
        )
        return targets, results, sorted(r.canon_url for r in eng.seen().collect())

    base = crawl_reopen_crawl(CrawlConfig())
    buck = crawl_reopen_crawl(CrawlConfig(seen_store="bucketed", seen_buckets=8))
    assert base == buck


def test_index_reregisters_after_catalog_loss(spark):
    """A session restart empties the in-memory metastore; sync() must
    re-register the table over its on-disk bucketed files and return
    the full content."""
    cfg = CrawlConfig(seen_store="bucketed", seen_buckets=8)
    eng, seen = _run(spark, cfg, rounds=2)
    n = eng.seen().count()
    assert n > 0
    spark.sql(f"DROP TABLE IF EXISTS {eng.seen_idx.table}")  # simulate restart
    df = eng.seen_idx.sync(eng.cat)
    assert df.count() == n
    assert sorted(r.canon_url for r in df.collect()) == sorted(
        r.canon_url for r in eng.seen().select("canon_url").collect()
    )
    plan = _formatted_plan(df)
    assert "Bucketed: true" in plan or "bucketed" in plan.lower()


def test_index_appends_only_delta_files(spark):
    """Steady state pays O(new rows): after round k the marker lists
    exactly the catalog's seen files, and a subsequent sync with no new
    commit appends nothing (file set in the index dir is unchanged)."""
    import os

    cfg = CrawlConfig(seen_store="bucketed", seen_buckets=8)
    eng, _ = _run(spark, cfg, rounds=2)
    # sync runs at the START of a round, so the final round's delta is
    # absorbed by this first explicit sync; the second must be a no-op
    eng.seen_idx.sync(eng.cat)
    files_before = sorted(os.listdir(eng.seen_idx.path))
    eng.seen_idx.sync(eng.cat)
    assert sorted(os.listdir(eng.seen_idx.path)) == files_before
    synced = eng.seen_idx._synced_files()
    assert sorted(synced) == sorted(eng.cat.manifest()["tables"]["seen"])
