"""Storage-layout operators: bucketed co-located joins and partitioned
sinks with partition pruning (the A-axis scale levers).

Neither has a reference analogue — the reference holds everything in
driver-memory pandas frames (src/data_analyzer.py) — but both are
mandatory at 100 TB:

- q62: a fact-fact join (orders ⋈ lineitem) re-shuffles BOTH tables on
  every query unless the tables are stored bucketed on the join key.
  Writing them `bucketBy(B, key).sortBy(key)` once makes every later
  equi-join on that key a zero-Exchange merge join — the plan evidence
  is asserted in tests/test_storage.py (no Exchange under the
  SortMergeJoin; a per-partition in-memory Sort remains because the
  Spark ≥3.0 bucketed reader intentionally drops file ordering to keep
  scans parallel per file) and recorded in PLANS.md.
- q63: a date-partitioned sink (`partitionBy(event_date)`) turns a
  time-windowed query from a full scan into a directory listing: the
  scan's PartitionFilters prune to the 5 matching date directories
  before any file is opened.

Both queries carry full DuckDB oracles: the *result* of the layout-
aware plan must equal the layout-oblivious SQL over the original
tables — storage layout is a physical concern and must never change
answers.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voz_spark.registry import register
from voz_spark.session import load_table as T

_N_BUCKETS = 8


def write_bucketed(
    df: DataFrame, name: str, path: str, key: str, n_buckets: int = _N_BUCKETS
) -> None:
    """Persist `df` as an external bucketed+sorted table: the one-time
    shuffle that amortizes every future join/agg on `key`."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.repartition(n_buckets, key)  # align write tasks with buckets
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def bucketed_orders_lineitem(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    base = tempfile.mkdtemp(prefix="voz-bucketed-")
    write_bucketed(
        T(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "orderkey"),
        "voz_orders_b",
        os.path.join(base, "orders"),
        "orderkey",
    )
    write_bucketed(
        T(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey"),
        "voz_lineitem_b",
        os.path.join(base, "lineitem"),
        "orderkey",
    )
    return spark.table("voz_orders_b"), spark.table("voz_lineitem_b")


@register(
    "q62_bucketed_join",
    oracle="""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28, 8))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderpriority
ORDER BY priority
""",
)
def q62_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority over a bucket-co-located orders ⋈
    lineitem merge join: both sides are read pre-hashed on the join
    key, so the physical plan has NO Exchange — at 100 TB that is the
    difference between re-shuffling two fact tables per query and a
    streaming merge over co-located buckets. The `merge` hint pins the
    strategy (a tiny test-scale orders side would otherwise broadcast,
    bypassing the layout being exercised)."""
    orders, lineitem = bucketed_orders_lineitem(spark, sf_dir)
    joined = (
        orders.where(F.col("o_orderstatus") == "F")
        .hint("merge")
        .join(lineitem.hint("merge"), "orderkey")
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("priority")
    )


_PRUNE_LO, _PRUNE_HI = "2024-01-05", "2024-01-09"


@register(
    "q63_partition_pruning",
    oracle=f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28, 8))) AS DOUBLE) AS total_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{_PRUNE_LO}' AND DATE '{_PRUNE_HI}'
GROUP BY 1, 2
ORDER BY event_date, event_type
""",
)
def q63_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events date-partitioned, then answer a 5-day window query
    from the partitioned copy: the parquet scan lists only the 5
    matching `event_date=...` directories (PartitionFilters — asserted
    in tests/test_storage.py), never touching the other ~25 days. The
    oracle runs the same window over the unpartitioned view — layout
    must not change the answer."""
    path = os.path.join(tempfile.mkdtemp(prefix="voz-part-"), "events")
    (
        T(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    ev = spark.read.parquet(path).where(
        F.col("event_date").between(F.lit(_PRUNE_LO), F.lit(_PRUNE_HI))
    )
    return (
        ev.groupBy(F.col("event_date").cast("string").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,8)")).cast("double").alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


# ---------------------------------------------------------------------------
# q86: raw-file ingest via Spark's `binaryFile` source — the missing
# first hop of every multimodal pipeline: media arrives as FILES (an
# object-store prefix of .png/.vqz blobs), not as parquet rows. The
# reference's analogue is the image download loop writing loose files
# (src/image_processor.py:77-118); here the directory is read back as
# a DataFrame in ONE distributed scan (`format("binaryFile")` gives
# path/length/content), decoded in mapInPandas with the repo codecs,
# and normalized into the images-table shape.
#
# Scale shape: binaryFile splits the listing across executors (each
# task reads its own files — no driver loop over paths) and pushes the
# glob down to the listing; decode is Arrow-batched partition-local
# (zero shuffles until the final order for display). At 100 TB you
# would raise spark.sql.files.maxPartitionBytes so each task batches
# many small blobs.
#
# The registered q86 surface is the INGEST MANIFEST — (image_id, fmt,
# file_len, content_md5) straight off the distributed scan — which a
# DuckDB read_blob() over the same fixture directory reproduces
# byte-exactly, so the driver check is hash-exact instead of
# rows-only (VERDICT r4 item 4). The decode stage lives in
# `binaryfile_decode_ingest` below; its pixel fidelity vs the
# generator is pinned in tests/test_media_ingest.py.
# ---------------------------------------------------------------------------

_BINFILE_N = 64


def _binaryfile_fixture_dir() -> str:
    """Write the deterministic media files once (idempotent): one
    .png/.vqz file per synth image, named <image_id>.<fmt>."""
    from voz_spark import synth

    base = os.path.join(tempfile.gettempdir(), "voz-binfiles-v1")
    done = os.path.join(base, "_COMPLETE")
    if not os.path.exists(done):
        os.makedirs(base, exist_ok=True)
        for i in range(_BINFILE_N):
            r = synth.image_row(i)
            p = os.path.join(base, f"{r['image_id']}.{r['fmt']}")
            with open(p, "wb") as fh:
                fh.write(r["bytes"])
        with open(done, "w") as fh:
            fh.write(str(_BINFILE_N))
    return base


# Materialized at import time so the q86 oracle string below can
# reference an absolute directory that is GUARANTEED to exist in any
# process able to see the oracle (the /tmp fixture does not survive
# reboots; import-time idempotent creation removes the Spark-vs-DuckDB
# run-order hazard).
_BINFILE_DIR = _binaryfile_fixture_dir()


@register(
    "q86_binaryfile_ingest",
    oracle=f"""
SELECT regexp_extract(filename, '([^/]+)\\.(png|vqz)$', 1) AS image_id,
       regexp_extract(filename, '([^/]+)\\.(png|vqz)$', 2) AS fmt,
       CAST(size AS BIGINT) AS file_len,
       md5(hex(content)) AS content_md5
FROM read_blob('{_BINFILE_DIR}/*.*')
WHERE filename NOT LIKE '%_COMPLETE'
ORDER BY image_id
""",
)
def q86_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory of raw .png/.vqz blobs → the distributed ingest
    manifest (path-derived ids + length + content hash), one
    binaryFile scan, no decode — hash-exact vs a DuckDB read_blob of
    the same directory. Spark's hex() and DuckDB's hex() both emit
    uppercase, so md5-of-hex matches bit-for-bit."""
    base = _binaryfile_fixture_dir()
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.*")
        .load(base)
        .where(~F.col("path").endswith("_COMPLETE"))
        .select(
            F.regexp_extract("path", r"([^/]+)\.(png|vqz)$", 1).alias("image_id"),
            F.regexp_extract("path", r"([^/]+)\.(png|vqz)$", 2).alias("fmt"),
            F.col("length").cast("long").alias("file_len"),
            F.md5(F.hex("content")).alias("content_md5"),
        )
        .orderBy("image_id")
    )


def binaryfile_decode_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory of raw .png/.vqz blobs → images-table rows: one
    distributed binaryFile scan + Arrow-batched codec decode (the
    decode hop of q86's ingest; fidelity pinned in
    tests/test_media_ingest.py)."""
    import numpy as np
    import pandas as pd

    from voz_spark.codec import decode_image

    base = _binaryfile_fixture_dir()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.*")
        .load(base)
        .where(~F.col("path").endswith("_COMPLETE"))
        .select("path", "length", "content")
    )

    out_schema = (
        "image_id string, fmt string, file_len bigint, status string,"
        " w int, h int, mean_px double"
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                name = r["path"].rsplit("/", 1)[-1]
                image_id, fmt = name.rsplit(".", 1)
                try:
                    px = decode_image(bytes(r["content"]), fmt).astype(np.float64)
                    rows.append(
                        (image_id, fmt, int(r["length"]), "ok",
                         int(px.shape[1]), int(px.shape[0]), float(round(px.mean(), 6)))
                    )
                except Exception:
                    rows.append((image_id, fmt, int(r["length"]), "decode_error",
                                 None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "file_len", "status", "w", "h", "mean_px"],
            )

    return files.mapInPandas(decode, out_schema).orderBy("image_id")


# ---------------------------------------------------------------------------
# q88: incremental aggregate maintenance — the don't-rescan-the-corpus
# lever: a per-(source, lang) stats table maintained as a materialized
# partial-aggregate, updated by MERGING yesterday's partials with the
# delta batch's partials instead of recomputing over the full corpus.
# Works for any commutative-mergeable aggregate (count/sum/min/max
# here; sketches like q59's KMV merge the same way). The reference's
# analogue is its cache-driven incrementality (only new threads are
# crawled, src/thread_crawler.py:46-59) — applied to analytics.
#
# Scale shape: the full corpus is scanned ONCE ever (the base
# partials); each update scans only the delta and merges two
# |sources×langs|-row tables — at 100 TB the daily update costs
# O(delta) + a tiny merge, not O(corpus). The DuckDB oracle is the
# FULL recompute over all documents, so the driver check proves the
# merge algebra is exact, not approximately right.
# ---------------------------------------------------------------------------

_DELTA_MOD = 11  # doc_id % 11 == 3 plays the role of "today's arrivals"


@register(
    "q88_incremental_agg",
    oracle="""
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
""",
)
def q88_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus stats maintained incrementally: base
    partials (the standing materialized view) merged with the delta
    batch's partials — the result must equal the full recompute (the
    oracle), proving the merge algebra exact."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tok"),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("source", "lang").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )

    is_delta = F.pmod("doc_id", F.lit(_DELTA_MOD)) == 3
    base = partials(d.where(~is_delta))  # the standing view (scanned once ever)
    delta = partials(d.where(is_delta))  # today's arrivals only
    merged = base.unionByName(delta)
    return (
        merged.groupBy("source", "lang")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("min_chars").cast("long").alias("min_chars"),
            F.max("max_chars").cast("long").alias("max_chars"),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# q92: Z-order (Morton) layout — the multi-dimensional twin of q63.
# Partitioning prunes on ONE column; a 100 TB table queried by
# rectangles over TWO columns (part × supplier, width × height, lat ×
# lon) needs interleaved-bit clustering: sorting by the Morton code
# places rows close in BOTH dimensions into the same files, so
# min/max row-group stats prune box queries in either or both axes
# (the Delta/Iceberg `OPTIMIZE ZORDER BY` pattern; Spark's own
# sortWithinPartitions is the write-side mechanism).
#
# The z-value is pure integer bit-interleaving, so BOTH engines
# compute it bit-exactly from the same statically generated 32-term
# sum (one syntax per engine, same terms — the unrolled-SQL idiom the
# k-core oracle uses). The query reports, per z-range bucket (the
# file-sized unit a z-sorted writer would emit), the bucket's
# bounding box over both key columns plus whether a fixed rectangle
# query would have to read it — making the pruning win MEASURABLE:
# buckets with touched=false are skipped entirely by min/max stats,
# and the tests pin that the touched fraction is small while a
# one-column sort would touch ~everything on the other axis.
# ---------------------------------------------------------------------------

_Z_BITS = 16
_Z_BUCKET_SHIFT = 8  # bucket = z div 2^8: ~file-sized z-ranges
# rectangle probe: a selective box on BOTH axes
_Z_PK_LO, _Z_PK_HI = 80, 120
_Z_SK_LO, _Z_SK_HI = 3, 6


def _morton_terms(x: str, y: str, spark_syntax: bool) -> str:
    """The 32-term interleave sum Σ bit_i(x)·4^i·1 + bit_i(y)·4^i·2,
    identical term-by-term in both engines' integer arithmetic."""
    terms = []
    for i in range(_Z_BITS):
        if spark_syntax:
            terms.append(f"shiftleft(cast(shiftright({x}, {i}) & 1 as bigint), {2 * i})")
            terms.append(f"shiftleft(cast(shiftright({y}, {i}) & 1 as bigint), {2 * i + 1})")
        else:
            terms.append(f"(CAST(({x} >> {i}) & 1 AS BIGINT) << {2 * i})")
            terms.append(f"(CAST(({y} >> {i}) & 1 AS BIGINT) << {2 * i + 1})")
    return " + ".join(terms)


_Q92_ORACLE = f"""
WITH z AS (
  SELECT l_partkey, l_suppkey,
         {_morton_terms("l_partkey", "l_suppkey", spark_syntax=False)} AS zval
  FROM lineitem
)
SELECT CAST(zval >> {_Z_BUCKET_SHIFT} AS BIGINT) AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey,
       MIN(l_suppkey) AS min_suppkey, MAX(l_suppkey) AS max_suppkey,
       (MIN(l_partkey) <= {_Z_PK_HI} AND MAX(l_partkey) >= {_Z_PK_LO}
        AND MIN(l_suppkey) <= {_Z_SK_HI} AND MAX(l_suppkey) >= {_Z_SK_LO}) AS touched
FROM z GROUP BY 1
ORDER BY z_bucket
"""


@register("q92_zorder_layout", oracle=_Q92_ORACLE)
def q92_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code clustering report over lineitem's (l_partkey,
    l_suppkey): per z-range bucket, row count, the bucket's bounding
    box on both keys, and whether the fixed rectangle probe
    [{_Z_PK_LO}..{_Z_PK_HI}]×[{_Z_SK_LO}..{_Z_SK_HI}] intersects it
    (touched=false ⇒ a z-sorted file with these min/max stats is
    pruned without being opened). The z-value is one codegen'd integer
    expression — no UDF, no shuffle beyond the single bucket
    aggregate."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = li.withColumn(
        "zval", F.expr(_morton_terms("l_partkey", "l_suppkey", spark_syntax=True))
    )
    return (
        z.groupBy(
            F.shiftright("zval", _Z_BUCKET_SHIFT).cast("long").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
            F.min("l_suppkey").alias("min_suppkey"),
            F.max("l_suppkey").alias("max_suppkey"),
            (
                (F.min("l_partkey") <= _Z_PK_HI)
                & (F.max("l_partkey") >= _Z_PK_LO)
                & (F.min("l_suppkey") <= _Z_SK_HI)
                & (F.max("l_suppkey") >= _Z_SK_LO)
            ).alias("touched"),
        )
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# q93: MERGE INTO (upsert) — the recrawl write path. When the frontier
# re-fetches a URL (CrawlEngine.reopen), the new document must REPLACE
# the old row and newly discovered URLs must INSERT, atomically — the
# Iceberg/Delta `MERGE INTO target USING delta ON key` shape. The
# reference overwrites its JSON files wholesale per run
# (src/main.py:252-262); at 100 TB the merge must be one shuffle, not
# a rewrite of the corpus.
#
# Scale shape: union(base, delta) → ONE hash aggregate on doc_id with
# the argmax-as-max(struct(version, md5)) idiom (partial aggregation
# applies, so the shuffle carries one candidate row per (doc, version)
# — at most 2 here). No window over the corpus, no join: MERGE
# reduces to the same single uniform-key aggregate as exact dedup.
# ---------------------------------------------------------------------------

_Q93_UPDATE_MOD = 7   # pmod(doc_id, 7) == 3 -> recrawled with new content
_Q93_INSERT_MOD = 11  # pmod(doc_id, 11) == 5 -> discovers doc_id + 100000
_Q93_MARK = " [recrawled v2]"

_Q93_ORACLE = f"""
WITH base AS (
  SELECT doc_id, 1 AS version, md5(text) AS content_md5 FROM documents
),
delta AS (
  SELECT doc_id, 2 AS version, md5(text || '{_Q93_MARK}') AS content_md5
  FROM documents WHERE doc_id % {_Q93_UPDATE_MOD} = 3
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, 2 AS version, md5(text) AS content_md5
  FROM documents WHERE doc_id % {_Q93_INSERT_MOD} = 5
),
u AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
per AS (
  SELECT doc_id, COUNT(*) AS n_versions, MAX(version) AS live_version
  FROM u GROUP BY 1
),
best AS (
  SELECT u.doc_id, MAX(u.content_md5) AS content_md5
  FROM u JOIN per ON u.doc_id = per.doc_id AND u.version = per.live_version
  GROUP BY 1
)
SELECT per.doc_id, per.n_versions, per.live_version, best.content_md5
FROM per JOIN best USING (doc_id)
ORDER BY doc_id
"""


@register("q93_upsert_merge", oracle=_Q93_ORACLE)
def q93_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins MERGE of a recrawl delta (updates for every
    doc_id % {mod} == 3, inserts of newly discovered doc_id + 100000)
    into the document corpus: one union + one hash aggregate on the
    uniform doc_id key; the survivor is max(struct(version, md5)) —
    a total order, so both engines pick the same row."""
    d = T(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.lit(1).alias("version"), F.md5("text").alias("content_md5")
    )
    updates = d.where(F.pmod("doc_id", F.lit(_Q93_UPDATE_MOD)) == 3).select(
        "doc_id",
        F.lit(2).alias("version"),
        F.md5(F.concat(F.col("text"), F.lit(_Q93_MARK))).alias("content_md5"),
    )
    inserts = d.where(F.pmod("doc_id", F.lit(_Q93_INSERT_MOD)) == 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.lit(2).alias("version"),
        F.md5("text").alias("content_md5"),
    )
    u = base.unionByName(updates).unionByName(inserts)
    return (
        u.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.max(
                F.struct(F.col("version").alias("v"), F.col("content_md5").alias("m"))
            ).alias("best"),
        )
        .select(
            "doc_id",
            "n_versions",
            F.col("best.v").alias("live_version"),
            F.col("best.m").alias("content_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q206: columnar encoding advisor — frame-of-reference (FOR) bit-width
# per block, measured under two physical layouts of the SAME rows:
#   clustered — blocks follow ingestion order (adjacent l_orderkey
#               ranges together, the natural arrival layout);
#   scattered — blocks assigned by hash (what a careless repartition
#               produces before the write).
# A FOR-encoded block stores min(block) once and each value in
# ceil(log2(max-min+1)) bits, so the block's bit-width IS the layout
# quality signal: clustered blocks keep the sort-adjacent column
# narrow (orderkeys within a block span ~block-size values), while
# hash-scattering inflates every block's range to ~the full domain.
# This is the measurement behind "sort before write" — at 100 TB the
# resulting 2-5× parquet size difference is the dominant scan cost.
#
# Scale shape: one 4-way tagged union (layout × column) feeding ONE
# partial-combining (layout, col, block) min/max/count aggregate; the
# per-block bit math is in-row (length(bin(range)) — no log, engine-
# portable); the final rollup has 4 keys. No sort, no window.
# ---------------------------------------------------------------------------

_Q206_BLOCK = 256  # clustered block: l_orderkey div 256 (8-bit in-block range)
_Q206_SCATTER = 64  # scattered layout: md5 % 64 blocks

_Q206_ORACLE = f"""
WITH src AS (
  SELECT l_orderkey, l_linenumber, l_partkey,
         l_orderkey // {_Q206_BLOCK} AS cl_block,
         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
              CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT)
           % {_Q206_SCATTER} AS sc_block
  FROM lineitem
),
tagged AS (
  SELECT 'clustered' AS layout, 'l_orderkey' AS col, cl_block AS block,
         l_orderkey AS v FROM src
  UNION ALL
  SELECT 'clustered', 'l_partkey', cl_block, l_partkey FROM src
  UNION ALL
  SELECT 'scattered', 'l_orderkey', sc_block, l_orderkey FROM src
  UNION ALL
  SELECT 'scattered', 'l_partkey', sc_block, l_partkey FROM src
),
blocks AS (
  SELECT layout, col, block, COUNT(*) AS n,
         MAX(v) - MIN(v) AS vrange
  FROM tagged GROUP BY 1, 2, 3
),
bw AS (
  SELECT layout, col, n,
         CASE WHEN vrange = 0 THEN 0
              ELSE length(bin(vrange)) END AS bits
  FROM blocks
)
SELECT layout, col,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(n * bits) AS BIGINT) AS enc_bits,
       CAST(SUM(n) * 64 AS BIGINT) AS raw_bits,
       CAST(1000 * SUM(n * bits) // (SUM(n) * 64) AS BIGINT) AS ratio_milli,
       CAST(MAX(bits) AS BIGINT) AS max_block_bits
FROM bw GROUP BY 1, 2 ORDER BY layout, col
"""


@register("q206_encoding_advisor", oracle=_Q206_ORACLE)
def q206_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block FOR bit-widths under clustered vs hash-scattered
    layouts — the sort-before-write size argument, measured."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.expr(f"l_orderkey div {_Q206_BLOCK}").alias("cl_block"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("l_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _Q206_SCATTER
        ).alias("sc_block"),
    )
    # ONE scan: the 4 (layout, col) branches are an in-row explode of
    # a struct array, not a 4-way union that would re-read the table
    # 4x (plan-asserted: a single parquet scan)
    tagged = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("clustered").alias("layout"),
                    F.lit("l_orderkey").alias("col"),
                    F.col("cl_block").alias("block"),
                    F.col("l_orderkey").alias("v"),
                ),
                F.struct(
                    F.lit("clustered").alias("layout"),
                    F.lit("l_partkey").alias("col"),
                    F.col("cl_block").alias("block"),
                    F.col("l_partkey").alias("v"),
                ),
                F.struct(
                    F.lit("scattered").alias("layout"),
                    F.lit("l_orderkey").alias("col"),
                    F.col("sc_block").alias("block"),
                    F.col("l_orderkey").alias("v"),
                ),
                F.struct(
                    F.lit("scattered").alias("layout"),
                    F.lit("l_partkey").alias("col"),
                    F.col("sc_block").alias("block"),
                    F.col("l_partkey").alias("v"),
                ),
            )
        ).alias("t")
    ).select("t.layout", "t.col", "t.block", "t.v")
    blocks = tagged.groupBy("layout", "col", "block").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("v") - F.min("v")).alias("vrange"),
    )
    bw = blocks.select(
        "layout",
        "col",
        "n",
        F.when(F.col("vrange") == 0, F.lit(0))
        .otherwise(F.length(F.bin(F.col("vrange"))))
        .cast("long")
        .alias("bits"),
    )
    return (
        bw.groupBy("layout", "col")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.col("n") * F.col("bits")).cast("long").alias("enc_bits"),
            (F.sum("n") * 64).cast("long").alias("raw_bits"),
            F.expr("1000 * sum(n * bits) div (sum(n) * 64)")
            .cast("long")
            .alias("ratio_milli"),
            F.max("bits").cast("long").alias("max_block_bits"),
        )
        .orderBy("layout", "col")
    )


# ---------------------------------------------------------------------------
# q210: time-travel reads from a commit log — MVCC the lakehouse way:
# the table IS an append-only log of (key, commit_seq, op, payload);
# any snapshot is "latest op per key with seq <= T, drop deletes".
# Reading two snapshots and diffing them answers the operational
# question every 100 TB deployment eventually asks ("what changed
# between last week's corpus and today's?") WITHOUT having stored two
# copies. q93 is the single-merge write path and q116 diffs two
# materialized tables; this reconstructs arbitrarily many versions
# from ONE log.
#
# Scale shape: one log scan; each snapshot is a max_by(struct) hash
# aggregate on the uniform key (seq is a total order, both engines
# pick the same survivor); the diff is a key-partitioned full-outer
# join of two already-aggregated sides. Nothing is rewritten to move
# T — that is the point.
#
# Log fixture (from documents, deterministic): seq 1 inserts all,
# seq 2 updates doc_id % 7 == 1, seq 3 deletes doc_id % 11 == 2,
# seq 4 updates doc_id % 5 == 0. Diff is snapshot@2 vs snapshot@4.
# ---------------------------------------------------------------------------

_Q210_LOG = """
  SELECT doc_id, 1 AS seq, 'upsert' AS op, md5(text) AS content FROM documents
  UNION ALL
  SELECT doc_id, 2, 'upsert', md5('v2:' || text) FROM documents WHERE doc_id % 7 = 1
  UNION ALL
  SELECT doc_id, 3, 'delete', NULL FROM documents WHERE doc_id % 11 = 2
  UNION ALL
  SELECT doc_id, 4, 'upsert', md5('v4:' || text) FROM documents WHERE doc_id % 5 = 0
"""

_Q210_ORACLE = f"""
WITH log AS ({_Q210_LOG}),
s2 AS (
  SELECT doc_id, max_by(op, seq) AS op, max_by(content, seq) AS content
  FROM log WHERE seq <= 2 GROUP BY 1
),
v2 AS (SELECT doc_id, content FROM s2 WHERE op <> 'delete'),
s4 AS (
  SELECT doc_id, max_by(op, seq) AS op, max_by(content, seq) AS content
  FROM log WHERE seq <= 4 GROUP BY 1
),
v4 AS (SELECT doc_id, content FROM s4 WHERE op <> 'delete'),
d AS (
  SELECT COALESCE(v2.doc_id, v4.doc_id) AS doc_id,
         v2.content AS content_t2,
         v4.content AS content_t4,
         CASE WHEN v2.doc_id IS NULL THEN 'added'
              WHEN v4.doc_id IS NULL THEN 'removed'
              WHEN v2.content <> v4.content THEN 'changed'
              ELSE 'same' END AS status
  FROM v2 FULL OUTER JOIN v4 ON v2.doc_id = v4.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, status,
       COALESCE(content_t2, '-') AS content_t2,
       COALESCE(content_t4, '-') AS content_t4
FROM d WHERE status <> 'same' ORDER BY doc_id
"""


def _q210_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared MVCC commit-log fixture (q210/q221): seq 1 inserts
    all docs, 2 updates doc_id%7==1, 3 deletes %11==2, 4 updates
    %5==0 — mirrors _Q210_LOG exactly."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.select(
            "doc_id",
            F.lit(1).alias("seq"),
            F.lit("upsert").alias("op"),
            F.md5("text").alias("content"),
        )
        .unionByName(
            d.where(F.col("doc_id") % 7 == 1).select(
                "doc_id",
                F.lit(2).alias("seq"),
                F.lit("upsert").alias("op"),
                F.md5(F.concat(F.lit("v2:"), F.col("text"))).alias("content"),
            )
        )
        .unionByName(
            d.where(F.col("doc_id") % 11 == 2).select(
                "doc_id",
                F.lit(3).alias("seq"),
                F.lit("delete").alias("op"),
                F.lit(None).cast("string").alias("content"),
            )
        )
        .unionByName(
            d.where(F.col("doc_id") % 5 == 0).select(
                "doc_id",
                F.lit(4).alias("seq"),
                F.lit("upsert").alias("op"),
                F.md5(F.concat(F.lit("v4:"), F.col("text"))).alias("content"),
            )
        )
    )


@register("q210_time_travel_diff", oracle=_Q210_ORACLE)
def q210_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct snapshots T=2 and T=4 from the commit log (max_by
    per key) and report added/removed/changed keys."""
    log = _q210_log(spark, sf_dir)

    def snapshot(t: int) -> DataFrame:
        return (
            log.where(F.col("seq") <= t)
            .groupBy("doc_id")
            .agg(
                F.expr("max_by(op, seq)").alias("op"),
                F.expr("max_by(content, seq)").alias("content"),
            )
            .where(F.col("op") != "delete")
            .select("doc_id", "content")
        )

    v2 = snapshot(2).select("doc_id", F.col("content").alias("content_t2"))
    v4 = snapshot(4).select("doc_id", F.col("content").alias("content_t4"))
    return (
        v2.join(v4, "doc_id", "full_outer")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.when(F.col("content_t2").isNull(), F.lit("added"))
            .when(F.col("content_t4").isNull(), F.lit("removed"))
            .when(F.col("content_t2") != F.col("content_t4"), F.lit("changed"))
            .otherwise(F.lit("same"))
            .alias("status"),
            F.coalesce("content_t2", F.lit("-")).alias("content_t2"),
            F.coalesce("content_t4", F.lit("-")).alias("content_t4"),
        )
        .where(F.col("status") != "same")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q216: deletion-touch planning — a right-to-be-forgotten request
# ("purge these users") must REWRITE every file containing a matching
# row, so the physical layout decides whether a 3% user purge costs
# 3% of the corpus or all of it:
#   date layout   — partitioned by event day (the natural ingestion
#                   layout): every requested user's rows smear across
#                   every day, so nearly every partition is touched;
#   bucket layout — partitioned by user_id % 32: a request touches
#                   only its users' buckets, and the rewrite
#                   amplification (rows rewritten per row deleted)
#                   drops by the bucket fan-out.
# The governance twin of q206's sort-before-write argument; q137
# scrubs fields in-row, this prices the row-level purge.
#
# Scale shape: ONE scan; the two layouts are an in-row struct-array
# explode (the q206 discipline, plan-asserted upstream); per-
# (layout, partition) counts partial-combine; the layout rollup has
# 2 keys. The request set is a hash predicate in-row — at production
# scale it is a broadcast semi-join against the request table.
# ---------------------------------------------------------------------------

# ~3% of users request deletion; a plain modulo keeps the request
# set non-empty at every test SF (user domains start at 0)
_Q216_REQ = "CAST(user_id % 29 = 3 AS INT)"
_Q216_REQ_SPARK = "user_id % 29 = 3"

_Q216_ORACLE = f"""
WITH r AS (
  SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day,
         user_id % 32 AS bucket,
         {_Q216_REQ} AS req
  FROM events
),
t AS (
  SELECT 'date' AS layout, day AS part, req FROM r
  UNION ALL
  SELECT 'bucket', bucket, req FROM r
),
p AS (
  SELECT layout, part, COUNT(*) AS n_rows, SUM(req) AS n_del
  FROM t GROUP BY 1, 2
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(SUM(CASE WHEN n_del > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_touched,
       CAST(SUM(CASE WHEN n_del > 0 THEN n_del ELSE 0 END) AS BIGINT)
         AS n_delete_rows,
       CAST(SUM(CASE WHEN n_del > 0 THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_rewritten,
       CAST(1000 * SUM(CASE WHEN n_del > 0 THEN n_rows ELSE 0 END)
            // SUM(CASE WHEN n_del > 0 THEN n_del ELSE 0 END) AS BIGINT)
         AS amplification_milli
FROM p GROUP BY layout ORDER BY layout
"""


@register("q216_delete_touch_plan", oracle=_Q216_ORACLE)
def q216_delete_touch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitions touched and rewrite amplification of a user-purge
    request under date-partitioned vs user-bucketed layouts."""
    ev = T(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyyMMdd").cast("long").alias("day"),
        (F.col("user_id") % 32).alias("bucket"),
        F.expr(_Q216_REQ_SPARK).cast("int").alias("req"),
    )
    t = ev.select(
        F.explode(
            F.array(
                F.struct(F.lit("date").alias("layout"), F.col("day").alias("part")),
                F.struct(F.lit("bucket").alias("layout"), F.col("bucket").alias("part")),
            )
        ).alias("lp"),
        "req",
    ).select("lp.layout", "lp.part", "req")
    p = t.groupBy("layout", "part").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("req").alias("n_del")
    )
    touched_rows = F.when(F.col("n_del") > 0, F.col("n_rows")).otherwise(0)
    touched_del = F.when(F.col("n_del") > 0, F.col("n_del")).otherwise(0)
    return (
        p.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum(F.when(F.col("n_del") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_touched"),
            F.sum(touched_del).cast("long").alias("n_delete_rows"),
            F.sum(touched_rows).cast("long").alias("n_rows_rewritten"),
        )
        .withColumn(
            "amplification_milli",
            F.expr("1000 * n_rows_rewritten div n_delete_rows").cast("long"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# q221: SCD2 history build — the warehouse's other answer to "what
# did this row look like at time T": instead of replaying the log per
# query (q210), materialize each key's VERSION INTERVALS once —
# (valid_from_seq, valid_to_seq, is_current) per version, deletes
# closing the interval without opening a new one. Any as-of read then
# becomes a range predicate on the interval columns (and composes
# with q53's binned range join at scale).
#
# Scale shape: one log scan, one per-key window (lead over seq inside
# the key partition — state O(1) per row); no self-join, no driver
# work. Consistency with q210 is pinned in tests: slicing the SCD2
# table at seq 2 and 4 reproduces the time-travel snapshots exactly.
# ---------------------------------------------------------------------------

_Q221_ORACLE = f"""
WITH log AS ({_Q210_LOG}),
v AS (
  SELECT doc_id, seq, op, content,
         LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS next_seq
  FROM log
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(seq AS BIGINT) AS valid_from_seq,
       CAST(COALESCE(next_seq - 1, 9999) AS BIGINT) AS valid_to_seq,
       COALESCE(content, '-') AS content,
       CAST(CASE WHEN next_seq IS NULL AND op <> 'delete' THEN 1 ELSE 0 END
            AS INT) AS is_current
FROM v WHERE op <> 'delete'
ORDER BY doc_id, valid_from_seq
"""


@register("q221_scd2_history", oracle=_Q221_ORACLE)
def q221_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize version-validity intervals from the commit log:
    one per-key lead window, deletes close intervals."""
    from pyspark.sql.window import Window

    log = _q210_log(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("seq")
    v = log.withColumn("next_seq", F.lead("seq").over(w))
    return (
        v.where(F.col("op") != "delete")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("seq").cast("long").alias("valid_from_seq"),
            F.coalesce(F.col("next_seq") - 1, F.lit(9999))
            .cast("long")
            .alias("valid_to_seq"),
            F.coalesce("content", F.lit("-")).alias("content"),
            F.when(F.col("next_seq").isNull() & (F.col("op") != "delete"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_current"),
        )
        .orderBy("doc_id", "valid_from_seq")
    )


# ---------------------------------------------------------------------------
# q231: incremental view maintenance (IVM) — the warehouse pattern
# that keeps a materialized rollup fresh without re-scanning the
# standing fact table: maintain MERGEABLE partial state per view key
# (count, DECIMAL sum — and for COUNT DISTINCT, which is NOT
# mergeable from its final form, the classic two-level sub-rollup:
# per-(key, user) counts whose merge IS mergeable), apply a delta
# batch by unioning delta partials with the state and re-aggregating,
# and the result must equal a full recompute bit-for-bit.
#
# Fixture: the standing base is events with event_id % 10 < 8; the
# delta batch is the remaining 20%. The Spark side computes
# state(base) ⊎ partials(delta); the ORACLE is the full recompute
# over all of events — two algorithms, one answer (q208 discipline):
# their equality IS the IVM correctness proof.
#
# Scale shape: the delta pass scans ONLY delta rows; the merge
# shuffles state-sized tables on the view key (bounded by |view|,
# not |facts|); the user sub-rollup merge is likewise keyed by
# (view key, user) — never a fact re-scan. Money sums ride DECIMAL
# through both levels so merge order cannot change a bit.
# ---------------------------------------------------------------------------


@register(
    "q231_incremental_view_merge",
    oracle="""
WITH ud AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id,
         COUNT(*) AS n, SUM(CAST(ROUND(value, 3) AS DECIMAL(18,3))) AS sv
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, day,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(CAST(SUM(sv) AS DECIMAL(18,3)) AS DOUBLE) AS sum_value,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud
GROUP BY event_type, day
ORDER BY event_type, day
""",
)
def q231_incremental_view_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge a 20% delta batch into the standing rollup's mergeable
    partial state (two-level for COUNT DISTINCT); oracled against the
    full recompute — equality is the IVM proof."""
    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
        F.round("value", 3).cast("decimal(18,3)").alias("v"),
    )

    def sub_rollup(df: DataFrame) -> DataFrame:
        # mergeable per-(view key, user) partials
        return df.groupBy("event_type", "day", "user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    base_state = sub_rollup(ev.where(F.col("event_id") % 10 < 8))
    delta_state = sub_rollup(ev.where(F.col("event_id") % 10 >= 8))
    # the merge: union of partials re-aggregated on the SAME keys —
    # work proportional to |state| + |delta partials|, never the facts
    merged = (
        base_state.unionByName(delta_state)
        .groupBy("event_type", "day", "user_id")
        .agg(F.sum("n").alias("n"), F.sum("sv").cast("decimal(18,3)").alias("sv"))
    )
    return (
        merged.groupBy("event_type", "day")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("sv").cast("decimal(18,3)").cast("double").alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q240: temporal dimension enrichment — the late-arriving-fact join
# every SCD2 deployment exists FOR: each fact row carries an as-of
# version coordinate (seq here; event time in production) and joins
# the dimension version whose validity interval contains it. Facts
# hitting a deleted gap (the %11 deletes between their delete seq and
# a later re-upsert) legitimately find NO version and surface as
# 'no_version' instead of silently joining the wrong one — the bug
# this pattern prevents.
#
# Composes the shared q210 commit log through q221's interval build:
# the SCD2 table is the write-once artifact; the enrichment is a
# doc-keyed equi-join with the interval predicate IN-ROW (intervals
# per key are non-overlapping by construction, so each fact matches
# at most one version; at scale this is q197's bucketed range join
# shape on the version axis).
# ---------------------------------------------------------------------------

_Q240_FACTS = """
  SELECT DISTINCT doc_id, at_seq FROM (
    SELECT doc_id, 1 + doc_id % 4 AS at_seq FROM documents
    UNION ALL
    SELECT doc_id, 4 FROM documents WHERE doc_id % 3 = 0
  )
"""

_Q240_ORACLE = f"""
WITH log AS ({_Q210_LOG}),
v AS (
  SELECT doc_id, seq, op, content,
         LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS next_seq
  FROM log
),
scd AS (
  SELECT doc_id, seq AS valid_from_seq,
         COALESCE(next_seq - 1, 9999) AS valid_to_seq, content
  FROM v WHERE op <> 'delete'
),
facts AS ({_Q240_FACTS})
SELECT CAST(f.doc_id AS BIGINT) AS doc_id, CAST(f.at_seq AS BIGINT) AS at_seq,
       COALESCE(s.content, '-') AS content,
       CASE WHEN s.doc_id IS NULL THEN 'no_version' ELSE 'ok' END AS status
FROM facts f LEFT JOIN scd s
  ON s.doc_id = f.doc_id
 AND s.valid_from_seq <= f.at_seq AND f.at_seq <= s.valid_to_seq
ORDER BY doc_id, at_seq
"""


@register("q240_scd2_asof_enrich", oracle=_Q240_ORACLE)
def q240_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich (doc_id, at_seq) facts with the SCD2 version valid at
    that seq; facts inside a deleted gap report 'no_version'."""
    from pyspark.sql.window import Window

    log = _q210_log(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("seq")
    scd = (
        log.withColumn("next_seq", F.lead("seq").over(w))
        .where(F.col("op") != "delete")
        .select(
            "doc_id",
            F.col("seq").alias("valid_from_seq"),
            F.coalesce(F.col("next_seq") - 1, F.lit(9999)).alias("valid_to_seq"),
            "content",
        )
    )
    d = T(spark, sf_dir, "documents").select("doc_id")
    facts = (
        d.select("doc_id", (1 + F.col("doc_id") % 4).alias("at_seq"))
        .unionByName(
            d.where(F.col("doc_id") % 3 == 0).select(
                "doc_id", F.lit(4).cast("long").alias("at_seq")
            )
        )
        .distinct()
    )
    s = scd.select(
        F.col("doc_id").alias("s_doc"), "valid_from_seq", "valid_to_seq", "content"
    )
    return (
        facts.join(
            s,
            (facts["doc_id"] == s["s_doc"])
            & (s["valid_from_seq"] <= facts["at_seq"])
            & (facts["at_seq"] <= s["valid_to_seq"]),
            "left",
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("at_seq").cast("long").alias("at_seq"),
            F.coalesce("content", F.lit("-")).alias("content"),
            F.when(F.col("s_doc").isNull(), F.lit("no_version"))
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
        .orderBy("doc_id", "at_seq")
    )
