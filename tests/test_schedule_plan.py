"""Plan-shape pins for the frontier scheduling pipeline (round-3
stage profile findings — these regressions are silent otherwise).

The in-batch dedup MUST stay a primitive-buffer HashAggregate: the
lexicographically-equivalent min(struct(_pri, attempt)) formulation
silently plans a SortAggregate, which costs two full sorts of the
frontier (map side before the exchange, reduce side after) — the
single largest CPU item in the profiled round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from voz_spark.frontier import _canonicalize, _dedup_in_batch, _host_path


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _frontier(spark, n=1000):
    return spark.range(n).select(
        F.concat(F.lit("https://voz.test/img/"), F.pmod("id", F.lit(50))).alias("url"),
        F.lit(None).cast("string").alias("base_url"),
        F.pmod("id", F.lit(7)).cast("int").alias("seed_rank"),
        F.pmod("id", F.lit(3)).cast("int").alias("page_no"),
        F.pmod("id", F.lit(2)).cast("int").alias("post_no"),
        F.lit(0).cast("int").alias("attempt"),
    )


def test_dedup_is_hash_aggregate_not_sort_aggregate(spark):
    d = _dedup_in_batch(_canonicalize(_frontier(spark)))
    plan = _formatted_plan(d)
    assert "SortAggregate" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_packed_dedup_min_equals_struct_min(spark):
    """The packed-long min must pick exactly the same survivor row as
    the struct formulation on a batch with priority AND attempt ties."""
    base = _canonicalize(_frontier(spark, n=2000))
    # perturb attempts so (priority tie, attempt differs) cases exist
    src = base.withColumn("attempt", F.pmod(F.xxhash64("canon_url", "_pri"), F.lit(3)).cast("int"))
    got = _dedup_in_batch(src)
    want = (
        src.groupBy("url_hash", "canon_url")
        .agg(F.min(F.struct("_pri", "attempt")).alias("_p"))
        .select("url_hash", "canon_url", "_p.*")
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b


def test_schedule_columns_shed_before_window(spark):
    """path/robots_blocked must not ride the scheduling window
    exchange (they have no consumer past the robots filter)."""
    from voz_spark.frontier import _robots_flag, _schedule
    from voz_spark.synth import robots_rules

    cand = _host_path(_dedup_in_batch(_canonicalize(_frontier(spark))))
    flagged = _robots_flag(cand, robots_rules())
    allowed = flagged.where(~F.col("robots_blocked")).drop("robots_blocked", "path")
    out = _schedule(allowed, {"voz.test": 5}, 5, 4, [], do_persist=False)
    assert "path" not in out.columns and "robots_blocked" not in out.columns
    assert {"canon_url", "host", "scheduled", "seed_rank", "page_no", "post_no"} <= set(out.columns)
