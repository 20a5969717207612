"""A7-A10: CSV/JSON file sources and sinks round-trip with declared
schemas (reference: create_datasets.py CSV writers at :218-222,
load_thread_files JSON reads at src/data_analyzer.py:132-147)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from voz_spark import file_io
from voz_spark.analytics import component_suggestions, preprocess, thread_analysis
from voz_spark.synth_posts import gen_posts_df, gen_threads_df


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_dataset_files_roundtrip(spark):
    """write_dataset_files → read_dataset_files reproduces the
    in-memory analysis exactly, through BOTH the CSV and the JSON
    surface (the reference's analytics stage depends on this)."""
    posts = preprocess(gen_posts_df(spark, 12)).cache()
    threads = thread_analysis(posts, gen_threads_df(spark, 12)).cache()
    sugg = component_suggestions(posts)

    outdir = tempfile.mkdtemp(prefix="voz-fileio-")
    paths = file_io.write_dataset_files(threads, sugg, outdir)
    back = file_io.read_dataset_files(spark, paths)

    t_cols = [f.name for f in file_io.THREADS_ANALYSIS_SCHEMA.fields]
    expected_threads = _sorted_rows(
        threads.withColumn("purposes", F.array_join("purposes", "+"))
        .withColumn("budget", F.col("budget").cast("double"))
        .withColumn("n_replies", F.col("n_replies").cast("long"))
        .withColumn("n_reply_images", F.col("n_reply_images").cast("long")),
        t_cols,
    )
    assert expected_threads, "fixture produced no threads"
    assert _sorted_rows(back["threads_analysis"], t_cols) == expected_threads
    # A7/A10: the JSON surface carries the identical rows
    assert _sorted_rows(back["threads_json"], t_cols) == expected_threads

    s_cols = [f.name for f in file_io.COMPONENT_SUGGESTIONS_SCHEMA.fields]
    expected_sugg = _sorted_rows(
        sugg.withColumn("likes", F.col("likes").cast("long")).withColumn(
            "thanks", F.col("thanks").cast("long")
        ),
        s_cols,
    )
    assert expected_sugg, "fixture produced no suggestions"
    assert _sorted_rows(back["component_suggestions"], s_cols) == expected_sugg

    from voz_spark.analytics import budget_distribution

    b_cols = [f.name for f in file_io.BUDGET_DISTRIBUTION_SCHEMA.fields]
    expected_dist = _sorted_rows(
        budget_distribution(threads).withColumn("n_threads", F.col("n_threads").cast("long")),
        b_cols,
    )
    assert _sorted_rows(back["budget_distribution"], b_cols) == expected_dist


def test_csv_read_uses_declared_schema_not_inference(spark):
    """The CSV source must come back with the DECLARED types even when
    inference would guess differently (e.g. a numeric-looking string
    column stays a string)."""
    df = spark.createDataFrame(
        [("007", 1), ("42", 2)], ["code", "n"]
    )
    path = tempfile.mkdtemp(prefix="voz-fileio-") + "/csv"
    file_io.write_csv(df, path)
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("code", StringType(), True), StructField("n", LongType(), True)]
    )
    back = file_io.read_csv(spark, path, schema)
    assert dict(back.dtypes) == {"code": "string", "n": "bigint"}
    assert sorted(r.code for r in back.collect()) == ["007", "42"]
