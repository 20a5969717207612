"""File sources/sinks: CSV + JSON with explicit schemas (SURVEY §2.A
A7-A10).

The reference round-trips its entire analytics stage through files:
CSV sinks threads_analysis / component_suggestions / budget_distribution
(src/create_datasets.py:218-222, read back by
src/visualization_creator.py:79,132,221 and src/detailed_analyzer.py:
98-115), and JSON thread files written by the crawler and re-read by
load_thread_files (src/data_analyzer.py:132-147) plus the analysis
JSON round-trips (src/op_analyzer.py:291-314, src/reply_analyzer.py:
365-388).

Spark-first mapping:
- `df.write.csv(header=True)` / `spark.read.schema(S).csv` — never
  schema inference: an inference pass is a full extra scan of the
  input, unacceptable at 100 TB, and silently drifts types.
- `df.write.json` / `spark.read.schema(S).json` — same discipline
  (SURVEY maps A7 to `spark.read.schema(S).json` explicitly).
- Writers emit one file per partition (the distributed sink shape);
  readers glob the directory, so the round-trip is partition-count
  agnostic.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from voz_spark.registry import register


# -- generic typed sinks/sources --------------------------------------------


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A8: CSV sink with header (reference create_*_csv writers)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """A9: CSV source with a DECLARED schema — no inference scan."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A10: JSON-lines sink (reference json.dump per analysis dict)."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """A7: JSON source with a DECLARED schema (SURVEY's
    `spark.read.schema(S).json` mapping of load_thread_files)."""
    return spark.read.schema(schema).json(path)


# -- dataset-build file surface (create_datasets.py analogue) ----------------

THREADS_ANALYSIS_SCHEMA = StructType(
    [
        StructField("thread_id", StringType(), True),
        StructField("budget", DoubleType(), True),
        StructField("budget_range", StringType(), True),
        StructField("purposes", StringType(), True),
        StructField("n_replies", LongType(), True),
        StructField("n_reply_images", LongType(), True),
        StructField("reply_count", IntegerType(), True),
        StructField("view_count", IntegerType(), True),
    ]
)

COMPONENT_SUGGESTIONS_SCHEMA = StructType(
    [
        StructField("thread_id", StringType(), True),
        StructField("post_id", StringType(), True),
        StructField("username", StringType(), True),
        StructField("component_type", StringType(), True),
        StructField("keyword", StringType(), True),
        StructField("context", StringType(), True),
        StructField("likes", LongType(), True),
        StructField("thanks", LongType(), True),
    ]
)

BUDGET_DISTRIBUTION_SCHEMA = StructType(
    [
        StructField("budget_range", StringType(), True),
        StructField("n_threads", LongType(), True),
    ]
)


def write_dataset_files(
    threads: DataFrame, suggestions: DataFrame, outdir: str
) -> dict[str, str]:
    """§3.2 step 5 (src/create_datasets.py:218-222): materialize the
    three analysis CSVs + the per-thread JSON analysis files. Array
    columns are joined to '+'-separated strings for the CSV surface
    (CSV is flat; the reference stores them the same way)."""
    from voz_spark.analytics import budget_distribution

    paths = {
        "threads_analysis": f"{outdir}/threads_analysis_csv",
        "component_suggestions": f"{outdir}/component_suggestions_csv",
        "budget_distribution": f"{outdir}/budget_distribution_csv",
        "threads_json": f"{outdir}/threads_analysis_json",
    }
    t_flat = threads.select(
        "thread_id",
        F.col("budget").cast("double").alias("budget"),
        F.col("budget_range").cast("string").alias("budget_range"),
        F.array_join("purposes", "+").alias("purposes"),
        F.col("n_replies").cast("long").alias("n_replies"),
        F.col("n_reply_images").cast("long").alias("n_reply_images"),
        "reply_count",
        "view_count",
    )
    write_csv(t_flat, paths["threads_analysis"])
    # JSON keeps the same flattened row (A10 analytic sink)
    write_json(t_flat, paths["threads_json"])
    write_csv(
        suggestions.select(
            "thread_id",
            "post_id",
            "username",
            "component_type",
            "keyword",
            "context",
            F.col("likes").cast("long").alias("likes"),
            F.col("thanks").cast("long").alias("thanks"),
        ),
        paths["component_suggestions"],
    )
    write_csv(
        budget_distribution(threads).select(
            F.col("budget_range").cast("string").alias("budget_range"),
            F.col("n_threads").cast("long").alias("n_threads"),
        ),
        paths["budget_distribution"],
    )
    return paths


def read_dataset_files(spark: SparkSession, paths: dict[str, str]) -> dict[str, DataFrame]:
    """data_analyzer/visualization_creator read-back side: every file
    comes back through its declared schema."""
    return {
        "threads_analysis": read_csv(
            spark, paths["threads_analysis"], THREADS_ANALYSIS_SCHEMA
        ),
        "component_suggestions": read_csv(
            spark, paths["component_suggestions"], COMPONENT_SUGGESTIONS_SCHEMA
        ),
        "budget_distribution": read_csv(
            spark, paths["budget_distribution"], BUDGET_DISTRIBUTION_SCHEMA
        ),
        "threads_json": read_json(spark, paths["threads_json"], THREADS_ANALYSIS_SCHEMA),
    }


# -- driver-oracled round-trip queries ---------------------------------------

_Q36_SCHEMA = StructType(
    [
        StructField("o_orderpriority", StringType(), True),
        StructField("n_orders", LongType(), True),
        StructField("n_customers", LongType(), True),
    ]
)


@register(
    "q36_csv_roundtrip",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderpriority
""",
)
def q36_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A9 proof: aggregate → CSV sink → CSV source (declared
    schema) → return the re-read rows. The oracle is the aggregate
    alone, so any loss/retyping in the file round-trip fails the
    value hash."""
    from voz_spark.relational import T

    agg = (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )
    path = tempfile.mkdtemp(prefix="voz-q36-") + "/csv"
    write_csv(agg, path)
    return read_csv(spark, path, _Q36_SCHEMA)


_Q37_SCHEMA = StructType(
    [
        StructField("n_name", StringType(), True),
        StructField("r_name", StringType(), True),
        StructField("n_customers", LongType(), True),
        StructField("total_acctbal", DoubleType(), True),
    ]
)


@register(
    "q37_json_roundtrip",
    oracle="""
SELECT n_name, r_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""",
)
def q37_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+A10 proof: join+aggregate → JSON sink → schema'd JSON source
    → return the re-read rows (oracle = the aggregate alone)."""
    from voz_spark.relational import T

    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    agg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )
    path = tempfile.mkdtemp(prefix="voz-q37-") + "/json"
    write_json(agg, path)
    return read_json(spark, path, _Q37_SCHEMA)


@register("q38_dataset_files", oracle=None)
def q38_dataset_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dataset-build FILE surface (create_datasets step 5):
    posts world → thread analysis + suggestions → three CSVs + JSON →
    read back with declared schemas → return the re-read thread rows.
    Rows-only (posts world has no DuckDB view); the CSV≡JSON≡in-memory
    equality is pinned in tests/test_file_io.py."""
    from voz_spark.analytics import component_suggestions, preprocess, thread_analysis
    from voz_spark.synth_posts import gen_posts_df, gen_threads_df

    posts = preprocess(gen_posts_df(spark, 20)).cache()
    threads = thread_analysis(posts, gen_threads_df(spark, 20))
    sugg = component_suggestions(posts)
    outdir = tempfile.mkdtemp(prefix="voz-q38-")
    paths = write_dataset_files(threads, sugg, outdir)
    back = read_dataset_files(spark, paths)
    return back["threads_analysis"].orderBy("thread_id")


# -- columnar sinks beyond parquet -------------------------------------------


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (built into Spark core — columnar, predicate-pushdown
    capable, the natural interchange format with Hive-era warehouses).
    Avro is NOT registered: the spark-avro datasource module is a
    separate deploy-time artifact (--packages org.apache.spark:spark-avro)
    and is absent here, so it is deliberately not claimed."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC source with a declared schema (same no-inference discipline
    as CSV/JSON — never pay a schema pass over 100 TB)."""
    return spark.read.schema(schema).orc(path)


_Q39_SCHEMA = StructType(
    [
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("n_items", LongType(), True),
        StructField("total_qty", DoubleType(), True),
    ]
)


@register(
    "q39_orc_roundtrip",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q39_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source proof: aggregate → ORC sink → schema'd ORC
    source → re-read rows (oracle = the aggregate alone, so the file
    round-trip must preserve every value and type)."""
    from voz_spark.relational import T

    agg = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"),
        )
    )
    path = tempfile.mkdtemp(prefix="voz-q39-") + "/orc"
    write_orc(agg, path)
    return read_orc(spark, path, _Q39_SCHEMA)


# ---------------------------------------------------------------------------
# q214: schema-evolution reconciliation — a long-lived crawl corpus
# is written by MANY generations of the pipeline, and the schema
# grows: generation 1 shipped (doc_id, text_len), generation 2 added
# lang, generation 3 added quality. Reading them as ONE table must
# not require rewriting 100 TB of old files: the union-by-name read
# fills absent columns with NULL, and this query audits exactly what
# that fill did — per generation, row counts and per-added-column
# null counts — the evidence a schema-migration review wants.
#
# Scale shape: each generation reads with its own schema (no casts of
# live data); unionByName(allowMissingColumns) is a zero-shuffle plan
# node; the audit is one partial-combining rollup on the bounded
# generation key. Oracle: DuckDB's read_parquet(union_by_name=true)
# over the same files — two engines' schema-merge semantics agreeing
# IS the gate. Fixture is synthesized write-once (sf-independent).
# ---------------------------------------------------------------------------

Q214_GEN_DIR = "/tmp/voz_spark_q214_generations"
_Q214_TAG = "q214:v1:3gens:n1000each"


def _q214_fixture(spark: SparkSession) -> str:
    import os

    marker = os.path.join(Q214_GEN_DIR, "_VOZ_FIXTURE")
    try:
        with open(marker) as fh:
            have = fh.read()
    except OSError:
        have = None
    if have != _Q214_TAG:
        langs = "CASE ABS(id) % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr' ELSE 'zh' END"
        g1 = spark.range(0, 1000).selectExpr(
            "id AS doc_id",
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            " % 500 AS text_len",
        )
        g2 = spark.range(1000, 2000).selectExpr(
            "id AS doc_id",
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            " % 500 AS text_len",
            f"{langs} AS lang",
        )
        g3 = spark.range(2000, 3000).selectExpr(
            "id AS doc_id",
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            " % 500 AS text_len",
            f"{langs} AS lang",
            "CAST(id % 100 AS BIGINT) AS quality",
        )
        for name, df in (("gen=1", g1), ("gen=2", g2), ("gen=3", g3)):
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(Q214_GEN_DIR, name)
            )
        with open(marker, "w") as fh:
            fh.write(_Q214_TAG)
    return Q214_GEN_DIR


_Q214_ORACLE = f"""
WITH u AS (
  SELECT doc_id, text_len, lang, quality,
         CAST(doc_id // 1000 + 1 AS BIGINT) AS gen
  FROM read_parquet('{Q214_GEN_DIR}/gen=*/*.parquet', union_by_name=true)
)
SELECT gen,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_null,
       CAST(SUM(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_null,
       CAST(SUM(text_len) AS BIGINT) AS sum_text_len,
       COALESCE(MIN(lang), '-') AS min_lang
FROM u GROUP BY gen ORDER BY gen
"""


@register("q214_schema_evolution_audit", oracle=_Q214_ORACLE)
def q214_schema_evolution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-by-name read across three schema generations; per-gen
    null-fill audit of the added columns."""
    base = _q214_fixture(spark)
    g1 = spark.read.parquet(f"{base}/gen=1")
    g2 = spark.read.parquet(f"{base}/gen=2")
    g3 = spark.read.parquet(f"{base}/gen=3")
    u = g1.unionByName(g2, allowMissingColumns=True).unionByName(
        g3, allowMissingColumns=True
    )
    return (
        u.withColumn("gen", (F.expr("doc_id div 1000") + 1).cast("long"))
        .groupBy("gen")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_lang_null"),
            F.sum(F.when(F.col("quality").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_null"),
            F.sum("text_len").cast("long").alias("sum_text_len"),
            F.coalesce(F.min("lang"), F.lit("-")).alias("min_lang"),
        )
        .orderBy("gen")
    )
