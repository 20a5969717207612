"""Crawl progress monitor (SURVEY §2.B B11; reference:
analyze_progress at src/monitor.py:50-114).

The reference walks every thread JSON and reports totals + progress
percentages. The engine's analogue is a pure aggregation over the
committed `lineage` table (one funnel row per round, partition_id=-1):
per-round counts, success rate, cumulative crawled, and overall
progress percent — all expressible in ANSI SQL, so the registered
query q45 carries a full DuckDB oracle over the same parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# q45 writes the lineage of a deterministic small crawl here so the
# DuckDB oracle can read the SAME files (the driver's oracle runs on
# pre-registered TPC-H-ish views only; this path is the one extra,
# deterministic input both engines share).
Q45_LINEAGE_PATH = "/tmp/voz_spark_q45_lineage"


def monitor_report(lineage: DataFrame) -> DataFrame:
    """Per-round progress report over funnel rows (partition_id = -1):

    - the round's own funnel counters,
    - success_rate   = fetched / scheduled (reference's per-thread
      image_processed / image_count ratio, :80-92),
    - cum_scheduled  = running total of scheduled URLs,
    - progress_pct   = cumulative share of all scheduled work
      (reference's thread_progress percentage, :97-99).
    """
    funnel = lineage.where(F.col("partition_id") == -1).select(
        "round_id",
        "n_candidates",
        "n_bloom_new",
        "n_scheduled",
        "n_fetched",
        "n_failed",
    )
    w_run = Window.orderBy("round_id").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return funnel.select(
        "round_id",
        "n_candidates",
        "n_bloom_new",
        "n_scheduled",
        "n_fetched",
        "n_failed",
        F.round(
            F.col("n_fetched").cast("double")
            / F.nullif(F.col("n_scheduled"), F.lit(0)).cast("double"),
            6,
        ).alias("success_rate"),
        F.sum("n_scheduled").over(w_run).alias("cum_scheduled"),
        F.round(
            F.sum("n_scheduled").over(w_run).cast("double")
            * 100.0
            / F.sum("n_scheduled").over(w_all).cast("double"),
            6,
        ).alias("progress_pct"),
    ).orderBy("round_id")


Q45_ORACLE = f"""
WITH funnel AS (
  SELECT round_id, n_candidates, n_bloom_new, n_scheduled, n_fetched, n_failed
  FROM read_parquet('{Q45_LINEAGE_PATH}/*.parquet')
  WHERE partition_id = -1
)
SELECT round_id, n_candidates, n_bloom_new, n_scheduled, n_fetched, n_failed,
       ROUND(CAST(n_fetched AS DOUBLE) / NULLIF(n_scheduled, 0), 6) AS success_rate,
       CAST(SUM(n_scheduled) OVER (ORDER BY round_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_scheduled,
       ROUND(CAST(SUM(n_scheduled) OVER (ORDER BY round_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) * 100.0
         / CAST(SUM(n_scheduled) OVER () AS DOUBLE), 6) AS progress_pct
FROM funnel
ORDER BY round_id
"""
