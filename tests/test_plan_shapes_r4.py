"""Plan-shape pins for the round-4 optimizations (VERDICT r3 items
2 and 5): the q223 verify path must stay in-row (array_intersect on
doc-keyed joins, no exploded pair shuffle / pair re-aggregation), and
the scheduling window exchange is on its byte diet — url_hash is shed
from the exchange (re-derived in-row post-schedule) and the salt is a
narrow int.  The host stays a STRING in the exchange: the
dictionary-encoded host_id variant was A/B-measured and rejected
(-13% at 4N — PLANS.md round-4 notes), so this test pins the shipped
shape, not that variant."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q223_verify_is_in_row_intersection(spark, sf_dir):
    """One parquet scan (the persisted base covers all rereads), the
    ONLY pair-keyed exchange is the candidate distinct (no pair
    re-aggregation after verification), and the intersection count is
    the in-row array_intersect — not an exploded (pair x shingle)
    join."""
    from voz_spark.dataprep import q223_prefix_filter_join
    from voz_spark.registry import release_caches

    release_caches(spark)
    plan = _formatted_plan(q223_prefix_filter_join(spark, sf_dir))
    release_caches(spark)
    assert "array_intersect" in plan, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    pair_exchanges = [
        ex
        for ex in re.findall(r"Arguments: hashpartitioning\([^)]*\)", plan)
        if re.search(r"\bdoc_a#\d+", ex) and re.search(r"\bdoc_b#\d+", ex)
    ]
    assert len(pair_exchanges) == 1, (pair_exchanges, plan)
    # the old exploded verify re-aggregated candidate pairs — pinned out
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) <= 7, plan


def test_schedule_window_exchange_sheds_url_hash(spark):
    """The scheduling window exchange must not carry url_hash (8B/row
    shed — re-derived post-schedule by its definition) and its salt is
    an int, while the output contract still exposes both host and
    url_hash."""
    from voz_spark.frontier import (
        _canonicalize,
        _dedup_in_batch,
        _host_path,
        _schedule,
    )

    frontier = spark.range(1000).select(
        F.concat(F.lit("https://voz.test/img/"), F.pmod("id", F.lit(50))).alias("url"),
        F.lit(None).cast("string").alias("base_url"),
        F.pmod("id", F.lit(7)).cast("int").alias("seed_rank"),
        F.pmod("id", F.lit(3)).cast("int").alias("page_no"),
        F.pmod("id", F.lit(2)).cast("int").alias("post_no"),
        F.lit(0).cast("int").alias("attempt"),
    )
    cand = _host_path(_dedup_in_batch(_canonicalize(frontier)))
    out = _schedule(cand.drop("path"), {"voz.test": 5}, 5, 4, [], do_persist=False)
    plan = _formatted_plan(out)
    window_exchanges = [
        ex
        for ex in re.findall(r"Arguments: hashpartitioning\([^)]*\)", plan)
        if re.search(r"\bsalt#\d+", ex)
    ]
    assert window_exchanges, plan
    for ex in window_exchanges:  # partitions on (host, salt), no url_hash
        assert re.search(r"\bhost#\d+", ex), (ex, plan)
        assert "url_hash" not in ex, (ex, plan)
    # no Window/Sort operator carries url_hash — the ONLY url_hash in
    # the plan is the final in-row re-derivation
    for wargs in re.findall(r"\(\d+\) Window\s*\nArguments: \[[^\]]*\]", plan):
        assert "url_hash" not in wargs, (wargs,)
    assert re.search(r"xxhash64\(canon_url", plan), plan
    assert {"host", "url_hash", "canon_url", "scheduled"} <= set(out.columns)
