"""Rows-only driver queries for the non-SQL-expressible surfaces:
the crawl-frontier engine and the posts-world analytics pipeline
(both run over deterministic synthetic inputs — DuckDB has no crawl
engine or pandas-UDF text pipeline to oracle them against; the REAL
correctness gates are the sequential-simulator parity tests in
tests/test_frontier_order.py and the semantics tests in
tests/test_textops_extract.py / test_analytics_posts.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voz_spark.registry import register


@register("q40_crawl_schedule", oracle=None)
def q40_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full frontier engine (bootstrap → rounds → drain) on a
    small synthetic world; returns the committed crawl schedule. The
    content is deterministic (seed=42 world); ordering parity vs the
    sequential reference simulator is pinned in tests."""
    from voz_spark.rounds import CrawlEngine

    wd = tempfile.mkdtemp(prefix="crawl-q40-")
    eng = CrawlEngine(spark, wd, n_seeds=6, n_images=200)
    eng.run()
    return (
        eng.results()
        .select("round_id", "seed_rank", "page_no", "post_no", "canon_url", "kind", "status")
        .orderBy("round_id", "seed_rank", "page_no", "post_no", "canon_url")
    )


def _q45_oracle() -> str:
    from voz_spark.monitor import Q45_ORACLE

    return Q45_ORACLE


@register("q45_crawl_monitor", oracle=_q45_oracle())
def q45_crawl_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: per-round progress report (reference analyze_progress,
    src/monitor.py:50-114) over the lineage table of a deterministic
    small crawl. The lineage parquet is materialized at a fixed path
    and BOTH engines aggregate those same files — a full value-hash
    oracle for the monitor, not a rows-only check."""
    from voz_spark.monitor import Q45_LINEAGE_PATH, monitor_report
    from voz_spark.rounds import CrawlEngine

    wd = tempfile.mkdtemp(prefix="crawl-q45-")
    eng = CrawlEngine(spark, wd, n_seeds=6, n_images=200)
    eng.run()
    eng.lineage().coalesce(1).write.mode("overwrite").parquet(Q45_LINEAGE_PATH)
    return monitor_report(spark.read.parquet(Q45_LINEAGE_PATH))


@register("q41_voz_thread_analysis", oracle=None)
def q41_voz_thread_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dataset build (reference create_datasets.py §3.2):
    preprocess → budget/purpose extraction → per-thread analysis."""
    from voz_spark.analytics import preprocess, thread_analysis
    from voz_spark.synth_posts import gen_posts_df, gen_threads_df

    posts = preprocess(gen_posts_df(spark, 20))
    out = thread_analysis(posts, gen_threads_df(spark, 20))
    # The driver's canonicalizer sorts rows by every column; an array
    # column is unsortable in pandas, so join `purposes` into a scalar
    # string (C25 combination-key machinery) for the harness surface.
    return out.withColumn("purposes", F.array_join("purposes", "+")).orderBy("thread_id")


@register("q42_voz_recommendation_matrix", oracle=None)
def q42_voz_recommendation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C36 composition: suggestions ⋈ threads → binning → top-k per
    group → nested JSON recommendation matrix."""
    from voz_spark.analytics import (
        component_suggestions,
        preprocess,
        recommendation_matrix,
        thread_analysis,
    )
    from voz_spark.synth_posts import gen_posts_df, gen_threads_df

    posts = preprocess(gen_posts_df(spark, 20)).cache()
    threads = thread_analysis(posts, gen_threads_df(spark, 20))
    sugg = component_suggestions(posts)
    return recommendation_matrix(sugg, threads)


@register("q43_voz_user_graph", oracle=None)
def q43_voz_user_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C31/C32/C35: interaction edges → degrees + distributed PageRank
    + top-100-subgraph betweenness (reference
    src/network_analyzer.py:333-347 centrality bundle)."""
    from voz_spark.analytics import preprocess
    from voz_spark.graph import betweenness, build_edges, degrees, pagerank
    from voz_spark.synth_posts import gen_posts_df

    posts = preprocess(gen_posts_df(spark, 20))
    edges = build_edges(posts).cache()
    d = degrees(edges)
    pr = pagerank(edges, iterations=5)
    bc = betweenness(edges)
    return (
        d.join(pr, "node")
        .join(bc, "node", "left")
        .withColumn("betweenness", F.coalesce("betweenness", F.lit(0.0)))
        .orderBy(F.desc("rank"), "node")
    )


@register("q44_voz_sentiment", oracle=None)
def q44_voz_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13/C29: component sentiment stats via the vectorized scorer."""
    from voz_spark.analytics import component_suggestions, preprocess
    from voz_spark.sentiment import component_sentiment
    from voz_spark.synth_posts import gen_posts_df

    posts = preprocess(gen_posts_df(spark, 20))
    return component_sentiment(component_suggestions(posts)).orderBy("component_type")
