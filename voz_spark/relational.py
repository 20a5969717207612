"""Relational / analytic operators (SURVEY.md §2.C) over the driver's
TPC-H-ish tables.

Each query re-expresses one (or a composition) of the reference's
pandas analytics (src/detailed_analyzer.py, src/data_analyzer.py,
src/op_analyzer.py — see per-function citations) as a declarative
DataFrame plan that Catalyst can push down / prune / broadcast.

Scale notes (100 TB design point) are in each docstring: which side
broadcasts, where the shuffle is, and why the plan survives 1000×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from voz_spark.registry import register
from voz_spark.session import load_table as T

# ---------------------------------------------------------------------------
# C11/C13: multi-stat hash aggregate (reference: src/data_analyzer.py:620-628,
# src/detailed_analyzer.py:737-744). Partial aggregation is map-side; the only
# shuffle is on the (tiny-cardinality) group key, so this is scan-bound at any
# scale. DECIMAL sums → order-independent exact results.
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filter + groupBy + 4 aggregates."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_base_price"),
            F.sum(F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# C20: sort + limit / top-k (reference: src/detailed_analyzer.py:233-235,
# 855-862 — `most_common(n)` / `sort_values().head(n)`).
# Spark executes as TakeOrdered (per-partition top-k + driver merge): no
# global sort shuffle, O(k) driver memory — correct at any scale.
# ---------------------------------------------------------------------------


@register(
    "q02_top_orders",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q02_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price; unique tie-break key pins the set."""
    o = T(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# C9/C10: enrichment joins via broadcast (reference: pandas.merge at
# src/detailed_analyzer.py:131-135; dict map-join :303-311).
# customer/nation are dimensions: broadcast-hash join, zero shuffle of the
# fact side beyond the final tiny agg. At 100 TB the orders fact streams
# through map-side joins.
# ---------------------------------------------------------------------------


@register(
    "q03_orders_by_nation",
    oracle="""
SELECT n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q03_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim) ⋈ broadcast(dim) → groupBy."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# C16: pivot / cross-tab (reference: pd.pivot_table at
# src/detailed_analyzer.py:146-153). Explicit pivot values → single-pass
# pivot (no extra distinct job) and a deterministic schema.
# ---------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "q04_priority_segment_pivot",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS AUTOMOBILE,
       COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS BUILDING,
       COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE')  AS FURNITURE,
       COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')  AS HOUSEHOLD,
       COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS MACHINERY
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderpriority
""",
)
def q04_priority_segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab order priority × market segment (counts)."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    piv = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderpriority")
        .pivot("c_mktsegment", _SEGMENTS)
        .count()
    )
    return piv.na.fill(0, _SEGMENTS)


# ---------------------------------------------------------------------------
# C17: row-normalized percentage (reference: src/detailed_analyzer.py:156,
# 343-345). Window-sum over the row group; group cardinality is tiny, so the
# window is cheap at any scale.
# ---------------------------------------------------------------------------


@register(
    "q05_status_priority_pct",
    oracle="""
WITH g AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus, o_orderpriority, cnt,
       CAST(cnt AS DOUBLE) * 100.0 / SUM(cnt) OVER (PARTITION BY o_orderstatus) AS pct
FROM g
""",
)
def q05_status_priority_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage of each priority within its order status."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("o_orderstatus")
    return g.withColumn("pct", F.col("cnt").cast("double") * 100.0 / F.sum("cnt").over(w))


# ---------------------------------------------------------------------------
# C18/C19: half-open binning + ordered categorical sort (reference: pd.cut
# right=False at src/op_analyzer.py:358-361, ordering via pd.Categorical at
# src/create_budget_distribution.py:68). CASE chain = same half-open [lo,hi)
# semantics; bin_ord replaces the categorical ordering.
# ---------------------------------------------------------------------------

_BIN_EDGES = [0, 50_000, 100_000, 150_000, 200_000, 300_000]
_BIN_LABELS = ["0-50k", "50-100k", "100-150k", "150-200k", "200-300k", "300k+"]


def _bin_case_sql(col: str) -> str:
    whens = []
    for i in range(len(_BIN_EDGES) - 1):
        whens.append(
            f"WHEN {col} >= {_BIN_EDGES[i]} AND {col} < {_BIN_EDGES[i + 1]} "
            f"THEN '{_BIN_LABELS[i]}'"
        )
    whens.append(f"WHEN {col} >= {_BIN_EDGES[-1]} THEN '{_BIN_LABELS[-1]}'")
    return "CASE " + " ".join(whens) + " END"


def _bin_ord_sql(col: str) -> str:
    whens = [f"WHEN '{lab}' THEN {i}" for i, lab in enumerate(_BIN_LABELS)]
    return f"CASE {col} " + " ".join(whens) + " END"


@register(
    "q06_price_bins",
    oracle=f"""
WITH b AS (
  SELECT {_bin_case_sql("o_totalprice")} AS price_bin FROM orders
)
SELECT price_bin, {_bin_ord_sql("price_bin")} AS bin_ord, COUNT(*) AS n
FROM b GROUP BY price_bin
""",
)
def q06_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of order totals with pd.cut(right=False) semantics."""
    o = T(spark, sf_dir, "orders").select("o_totalprice")
    b = o.select(F.expr(_bin_case_sql("o_totalprice")).alias("price_bin"))
    return b.groupBy("price_bin").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "bin_ord", F.expr(_bin_ord_sql("price_bin"))
    ).select("price_bin", "bin_ord", "n")


# ---------------------------------------------------------------------------
# C8: first-post / rest split (reference: posts[0] vs posts[1:] at
# src/data_analyzer.py:312,354). row_number window partitioned by the entity
# key — shuffle on customer key only; at 100 TB this is the canonical
# "sessionize by key" shuffle and AQE handles stragglers.
# ---------------------------------------------------------------------------


@register(
    "q07_first_vs_later_orders",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT CASE WHEN rn = 1 THEN 'first' ELSE 'later' END AS order_kind,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM r GROUP BY 1
""",
)
def q07_first_vs_later_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-vs-replies analogue: each customer's first order vs the rest."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice", "o_orderdate", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("order_kind", F.when(F.col("rn") == 1, "first").otherwise("later"))
        .groupBy("order_kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# C21: top-k per group (reference: top-3 keywords per (range, component) at
# src/detailed_analyzer.py:936-958). row_number ≤ k — partial top-k happens
# map-side under AQE; tie-break on the unique key pins determinism (§4.3).
# ---------------------------------------------------------------------------


@register(
    "q08_top3_orders_per_segment",
    oracle="""
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM j
)
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM r WHERE rnk <= 3
""",
)
def q08_top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each market segment."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rnk")
    )


# ---------------------------------------------------------------------------
# C24/C25: self-join pair generation / co-occurrence (reference: component
# pairs per reply at src/detailed_analyzer.py:624-642). distinct-then-self-
# join on the shared key; a.brand < b.brand halves the pair space; the join
# key (orderkey) has bounded fan-out (≤7 lines/order) so the self-join is
# linear — the property that keeps this safe at 100 TB.
# ---------------------------------------------------------------------------


@register(
    "q09_brand_cooccurrence",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_orders
FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY a.p_brand, b.p_brand
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 20
""",
)
def q09_brand_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand pairs co-occurring in one order, top-20.

    Plan: NO self-join. Brands collect per order (collect_set dedups —
    the DISTINCT is free), pairs expand IN-ROW over the sorted array,
    and a hash agg counts them. Two shuffles total (orderkey, then the
    map-combined tiny pair domain) vs the self-join's three, and the
    per-order work is bounded by brands-per-order (≤ lines-per-order,
    ≤7 here) — at 100 TB the self-join would re-shuffle the distinct
    output on orderkey twice and pay a per-key cartesian besides."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    pair_expr = (
        "flatten(transform(bs, (x, i) ->"
        " transform(slice(bs, i + 2, size(bs)),"
        " y -> struct(x AS brand_a, y AS brand_b))))"
    )
    return (
        ob.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .groupBy(
            F.col("pr.brand_a").alias("brand_a"), F.col("pr.brand_b").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# C14/C15/C25: grouped distinct aggregates + derived scoring (reference:
# per-user expertise at src/detailed_analyzer.py:796-852; combination key at
# :587-601). collect_set is rendered order-insensitive by array_sort +
# array_join so it hash-compares.
# ---------------------------------------------------------------------------


@register(
    "q10_customer_profile",
    oracle="""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), '+') AS status_combo,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
       COUNT(*) * 2.0 + CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / 1000.0
         AS expertise_score
FROM orders
GROUP BY o_custkey
""",
)
def q10_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer profile: counts, distincts, combo key, derived score."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), "+").alias("status_combo"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_spend"),
    )
    return g.withColumn(
        "expertise_score", F.col("n_orders") * F.lit(2.0) + F.col("total_spend") / F.lit(1000.0)
    )


# ---------------------------------------------------------------------------
# C28 + C16: date parse/truncate + monthly trend (reference:
# pd.to_datetime + to_period('M') at src/detailed_analyzer.py:320-340).
# Months emitted as 'yyyy-MM' strings → engine-neutral comparison.
# ---------------------------------------------------------------------------


@register(
    "q11_monthly_order_trend",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate IS NOT NULL
GROUP BY 1, 2
""",
)
def q11_monthly_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order volume and spend by status."""
    o = T(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Running/cumulative window (reference analogue: cumulative counts per month
# in trend charts, src/visualization_creator.py). DECIMAL running sum →
# exact at every row on both engines.
# ---------------------------------------------------------------------------


@register(
    "q12_running_customer_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
         AS running_spend
FROM orders
""",
)
def q12_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer in order-date order."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Sessionization over the events stream table (streaming-equivalent batch
# form — SURVEY.md §2.E; pyspark_guide "Sessionization" pattern): lag + gap
# flag + running sum. The shuffle is on user_id; skewed users are bounded by
# the 30-min gap rule.
# ---------------------------------------------------------------------------


@register(
    "q13_sessionize_events",
    oracle="""
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
  FROM t
)
SELECT user_id,
       CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM s GROUP BY user_id
""",
)
def q13_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counts per user with a 30-minute inactivity gap."""
    e = T(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | F.expr("ts - prev_ts > INTERVAL 30 MINUTES"),
            1,
        ).otherwise(0),
    )
    s = t.withColumn("sess_id", F.sum("new_sess").over(w))
    return s.groupBy("user_id").agg(
        F.max("sess_id").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Tumbling event-time window, batch form (SURVEY.md §2.E: the reference's
# only time window is the calendar month; here we also cover hour windows for
# the events stream). date_trunc is partition-prunable on a ts-partitioned
# lake layout.
# ---------------------------------------------------------------------------


@register(
    "q14_hourly_event_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q14_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts per event type."""
    e = T(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# C13: multi-stat aggregate with exact median + deterministic stddev
# (reference: price stats at src/detailed_analyzer.py:737-744, sentiment
# stats at src/sentiment_analyzer.py:186-191). stddev is computed from exact
# DECIMAL sums with an identical formula on both engines (order-independent),
# median rounded to 4dp to absorb interpolation ulp differences.
# ---------------------------------------------------------------------------


@register(
    "q15_brand_price_stats",
    oracle="""
WITH g AS (
  SELECT p_brand,
         COUNT(*) AS n,
         MIN(p_retailprice) AS min_price,
         MAX(p_retailprice) AS max_price,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(p_retailprice * p_retailprice AS DECIMAL(28,8))) AS DOUBLE) AS s2,
         ROUND(CAST(quantile_cont(p_retailprice, 0.5) AS DOUBLE), 4) AS median_price
  FROM part GROUP BY p_brand
)
SELECT p_brand, n, min_price, max_price, median_price,
       s1 / n AS avg_price,
       CASE WHEN n > 1 THEN sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) END AS std_price
FROM g
""",
)
def q15_brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price statistics: count/min/max/median/avg/std."""
    p = T(spark, sf_dir, "part")
    g = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.sum(F.col("p_retailprice").cast("decimal(18,4)")).cast("double").alias("s1"),
        F.sum(F.expr("CAST(p_retailprice * p_retailprice AS DECIMAL(28,8))")).cast("double").alias("s2"),
        F.round(F.expr("percentile(p_retailprice, 0.5)"), 4).alias("median_price"),
    )
    return g.select(
        "p_brand",
        "n",
        "min_price",
        "max_price",
        "median_price",
        (F.col("s1") / F.col("n")).alias("avg_price"),
        F.when(
            F.col("n") > 1,
            F.sqrt(F.greatest((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1), F.lit(0.0))),
        ).alias("std_price"),
    )


# ---------------------------------------------------------------------------
# C22/C23/C26/C29: coalesce precedence, one-hot indicators, boolean-pair
# grouping (reference: src/data_analyzer.py:331, src/reply_analyzer.py:423-425,
# src/detailed_analyzer.py:444-445).
# ---------------------------------------------------------------------------


@register(
    "q16_customer_flags",
    oracle="""
SELECT o_custkey,
       MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS has_finished,
       MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS has_open,
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS has_urgent,
       COALESCE(NULLIF(MIN(o_orderpriority), ''), 'UNKNOWN') AS first_priority
FROM orders
GROUP BY o_custkey
""",
)
def q16_customer_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot status/priority indicators per customer + coalesce precedence."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("has_finished"),
        F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("has_open"),
        F.max(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("has_urgent"),
        F.coalesce(F.nullif(F.min("o_orderpriority"), F.lit("")), F.lit("UNKNOWN")).alias("first_priority"),
    )


# ---------------------------------------------------------------------------
# C31/C35: weighted graph edges + degree metrics (reference: reply→OP edges
# at src/network_analyzer.py:74-118). Edge build = fact join; degrees =
# groupBy sums. GraphFrames-free: degrees are plain aggregations.
# ---------------------------------------------------------------------------


@register(
    "q17_graph_degrees",
    oracle="""
WITH edges AS (
  SELECT o_custkey AS src, l_suppkey AS dst, COUNT(*) AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
), outd AS (
  SELECT src AS node, SUM(weight) AS out_degree, COUNT(*) AS out_edges
  FROM edges GROUP BY src
), ind AS (
  SELECT dst AS node, SUM(weight) AS in_degree, COUNT(*) AS in_edges
  FROM edges GROUP BY dst
)
SELECT COALESCE(o.node, i.node) AS node,
       CAST(COALESCE(out_degree, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree,
       CAST(COALESCE(out_edges, 0) AS BIGINT) AS out_edges,
       CAST(COALESCE(in_edges, 0) AS BIGINT) AS in_edges
FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
""",
)
def q17_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer→supplier interaction graph: weighted in/out degrees."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("out_degree"), F.count(F.lit(1)).alias("out_edges")
    )
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.sum("weight").alias("in_degree"), F.count(F.lit(1)).alias("in_edges")
    )
    return (
        outd.join(ind, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_edges", F.lit(0)).alias("out_edges"),
            F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
        )
    )


# ---------------------------------------------------------------------------
# C7: min-group-size filter / HAVING (reference: skip ranges with <10 rows at
# src/detailed_analyzer.py:921-922).
# ---------------------------------------------------------------------------


@register(
    "q18_popular_parts",
    oracle="""
SELECT l_partkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) >= 5
""",
)
def q18_popular_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts appearing in ≥5 lineitems (HAVING / min-group-size)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"),
        )
        .where(F.col("n_lines") >= 5)
    )


# ---------------------------------------------------------------------------
# As-of join — the canonical "operator Spark lacks" from the task
# brief, implemented as a composition of existing DataFrame ops (no
# UDF, no range explosion): for each left row, the LATEST right row
# with right.t <= left.t on the same key.
#
# Scale shape: tag both sides, union, and take a running
# last-non-null over a (key)-partitioned window ordered by (t, side)
# — right rows sort before left rows at equal t, so t == right.t
# matches (>= semantics). ONE shuffle on key, O(1) window state per
# row. The naive alternative (join on key + t-range, then argmax)
# materializes |left_k| × |right_k| rows per key before pruning —
# quadratic in per-key density; this never does.
# ---------------------------------------------------------------------------


def asof_join(left: DataFrame, right: DataFrame, key: str, t: str) -> DataFrame:
    """Distributed as-of join. `right` MUST be unique on (key, t) —
    dedup it first (q50 keeps max orderkey per day) or the carried
    struct is ambiguous. Returns every `left` column plus `_asof`, a
    struct of the matched right row's columns (its `t` as `_rt`);
    `_asof` is NULL when no right row precedes the left row."""
    payload = [c for c in right.columns if c != key]
    rtag = right.select(
        F.col(key),
        F.col(t),
        F.lit(0).alias("_side"),
        F.struct(F.col(t).alias("_rt"), *[F.col(c) for c in payload if c != t]).alias(
            "_asof"
        ),
    )
    ltag = left.withColumn("_side", F.lit(1))
    u = rtag.unionByName(ltag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(t, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_asof", F.last("_asof", ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).drop("_side")


@register(
    "q50_asof_last_order",
    oracle="""
WITH od AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
           ) AS r
    FROM orders
  ) WHERE r = 1
)
SELECT e.event_id,
       e.user_id,
       od.o_orderkey AS last_orderkey,
       od.o_totalprice AS last_totalprice,
       CAST(date_diff('day', CAST(od.o_orderdate AS DATE), CAST(e.ts AS DATE)) AS BIGINT)
         AS days_since_order
FROM events e ASOF LEFT JOIN od
  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
""",
)
def q50_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event enriched with the user's most recent order at or
    before the event time (as-of join; oracle uses DuckDB's native
    ASOF JOIN — an independent implementation of the semantics)."""
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = T(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    od = (
        orders.withColumn("_r", F.row_number().over(wd))
        .where(F.col("_r") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    joined = asof_join(ev, od, key="user_id", t="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.col("_asof.o_orderkey").alias("last_orderkey"),
        F.col("_asof.o_totalprice").alias("last_totalprice"),
        F.datediff(F.col("ts"), F.col("_asof._rt")).cast("bigint").alias(
            "days_since_order"
        ),
    )


# ---------------------------------------------------------------------------
# Triangle counting (compact-forward / degree orientation). The naive
# E⋈E⋈E triple self-join blows up on high-degree nodes (a hub of
# degree d contributes d² wedges); orienting every edge from its
# LOWER-(degree, id) endpoint to the higher one bounds out-degree by
# O(√m), so the wedge join is O(m^1.5) worst case — the standard
# distributed triangle algorithm. The orientation is a deterministic
# function of (degree, node id), so DuckDB reproduces it exactly.
# Edges = part pairs co-occurring in >= 2 distinct orders (the weight
# floor keeps the graph sparse; co-purchase "strong ties").
# ---------------------------------------------------------------------------


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Strong part-co-purchase edges: canonical (u < v) part pairs
    sharing >= 2 distinct orders. Pairs are generated IN-ROW from each
    order's sorted part set (no self-join): per-order fan-out is
    bounded by the line count per order, and the only shuffles are the
    two groupBys."""
    pair_expr = (
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
        .select("u", "v")
    )


# shared by q55/q56 oracles: the same edge set in DuckDB SQL
_EDGES_CTE = """
ob AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)"""


@register(
    "q55_triangle_count",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
),
directed AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
  FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
tri AS (
  SELECT COUNT(*) AS n
  FROM (
    SELECT w1.dst AS b, w2.dst AS c FROM directed w1
    JOIN directed w2 ON w1.src = w2.src AND w1.dst < w2.dst
  ) w
  JOIN (
    SELECT src AS b, dst AS c FROM directed
    UNION ALL
    SELECT dst AS b, src AS c FROM directed
  ) cl ON w.b = cl.b AND w.c = cl.c
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT n FROM tri) AS n_triangles
""",
)
def q55_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the strong part-co-purchase graph (edge = pair of
    parts sharing >= 2 orders), counted with degree orientation.

    Wedge subtlety: the wedge pair (b, c) is ordered by RAW id (any
    total order over the center's out-neighbors works — each
    unordered wedge must be generated exactly once), but the CLOSING
    edge b—c is stored under the (degree, id) orientation, which may
    point either way relative to raw-id order — so the probe joins
    against both directions of the directed edge list. Each closed
    wedge matches exactly once (directed has one row per edge)."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li).persist()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    forward = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    directed = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(forward, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(forward, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .persist()
    )
    w1 = directed.select(F.col("src"), F.col("dst").alias("b"))
    w2 = directed.select(F.col("src"), F.col("dst").alias("c"))
    wedges = w1.join(w2, "src").where(F.col("b") < F.col("c"))
    # both orientations of every edge (unionByName — a positional
    # unionAll would silently NOT reverse the second branch)
    closing = directed.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    ).unionByName(directed.select(F.col("dst").alias("b"), F.col("src").alias("c")))
    tri = wedges.join(closing, ["b", "c"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = deg.agg(F.count(F.lit(1)).alias("n_nodes")).crossJoin(
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
    )
    out = counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")
    return out


# ---------------------------------------------------------------------------
# Multi-granularity rollup (GROUPING SETS family). ONE pass computes
# every granularity level — Spark expands the rollup in the same
# aggregate (partial+final hash agg per grouping id), so at 100 TB
# this costs one shuffle, not one per level.
# ---------------------------------------------------------------------------


@register(
    "q51_order_rollup",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def q51_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts/revenue at (priority, status), (priority), and
    grand-total granularities in one ROLLUP aggregate."""
    o = T(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias(
            "total_price"
        ),
    )


# ---------------------------------------------------------------------------
# Event-time RANGE window frame: a trailing fixed-duration window per
# key, distinct from q12's ROWS frame (rows count positions, RANGE
# bounds by the ORDER BY value — peers at equal ts share a frame).
# Scale: one shuffle on user_id; the frame is evaluated with a sliding
# two-pointer over each partition's sort order, O(n) per key.
# ---------------------------------------------------------------------------


@register(
    "q52_trailing_hour_window",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def q52_trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour activity (count + exact decimal sum)
    for the same user — an event-time RANGE frame."""
    ev = T(spark, sf_dir, "events")
    frame = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return ev.selectExpr(
        "event_id",
        "user_id",
        f"count(*) {frame} AS n_trailing_1h",
        f"CAST(sum(CAST(value AS DECIMAL(18,6))) {frame} AS DOUBLE)"
        " AS value_trailing_1h",
    )


# ---------------------------------------------------------------------------
# Range join (the brief's other named custom operator): pairs of rows
# related by a time-interval predicate. Naive form is a key join with
# an inequality — Spark executes that as a per-key cartesian before
# filtering. The scale path BINS event time so candidates equi-join on
# (key, bin): an error in bin b can only match clicks in bins {b-1, b}
# (bin width == the 5-minute range bound), so the join is hash-based,
# candidate fan-out is bounded by per-bin density, and the exact
# interval predicate prunes the residue. The oracle states the same
# semantics as the plain inequality join.
# ---------------------------------------------------------------------------

_RANGE_JOIN_SECS = 300  # 5-minute window; also the bin width


@register(
    "q53_clicks_before_error",
    oracle=f"""
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clk AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id,
       COUNT(c.ts) AS n_clicks_5m
FROM err e LEFT JOIN clk c
  ON e.user_id = c.user_id
 AND c.ts < e.ts
 AND c.ts >= e.ts - INTERVAL {_RANGE_JOIN_SECS} SECOND
GROUP BY e.event_id, e.user_id
""",
)
def q53_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many clicks the same user made in
    the strictly-preceding 5 minutes (binned range join)."""
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    to_bin = F.floor(F.col("ts").cast("timestamp").cast("long") / _RANGE_JOIN_SECS)
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("ets"), to_bin.alias("_ebin")
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuid"), F.col("ts").alias("cts"), to_bin.alias("_bin")
    )
    # each error probes its own bin and the previous one (bin width ==
    # range bound, so no other bin can contain a match)
    probes = err.select(
        "event_id",
        "user_id",
        "ets",
        F.explode(F.array(F.col("_ebin") - 1, F.col("_ebin"))).alias("_bin"),
    )
    matched = (
        probes.join(
            clk,
            (probes["user_id"] == clk["cuid"]) & (probes["_bin"] == clk["_bin"]),
        )
        .where(
            (F.col("cts") < F.col("ets"))
            & (F.col("cts") >= F.expr(f"ets - INTERVAL {_RANGE_JOIN_SECS} SECOND"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_5m"))
    )
    return (
        err.select("event_id", "user_id")
        .join(matched, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n_clicks_5m"), F.lit(0)).alias("n_clicks_5m"),
        )
    )


# ---------------------------------------------------------------------------
# Connected components over the co-purchase graph. Spark side: the
# alternating large-star/small-star contraction in
# graph.connected_components — O(log² n) rounds independent of
# component diameter, each round two groupBy+join passes on the same
# key. Oracle side: DuckDB computes the same components by recursive-
# CTE reachability closure (fine at sf0.01; the closure is the very
# quadratic blow-up the star algorithm exists to avoid at scale).
# ---------------------------------------------------------------------------


@register(
    "q56_connected_components",
    oracle=f"""
WITH RECURSIVE {_EDGES_CTE},
sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
nodes AS (SELECT DISTINCT u AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v, reach.r FROM reach JOIN sym e ON e.u = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT CAST(component AS BIGINT) AS component,
       COUNT(*) AS n_nodes
FROM comp GROUP BY component
""",
)
def q56_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component id (min member part id) and size for every connected
    component of the strong co-purchase graph (edge = part pair
    sharing >= 2 orders)."""
    from voz_spark.graph import connected_components

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li)
    cc = connected_components(edges)
    return cc.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))


# ---------------------------------------------------------------------------
# k-core decomposition over the co-purchase graph: iterative peeling
# (graph.k_core). A vanilla recursive CTE cannot express it (the peel
# step needs aggregation), but peeling is MONOTONE and IDEMPOTENT at
# the fixpoint: once no node falls below k, further rounds are no-ops.
# So a STATICALLY UNROLLED peel of R rounds is exact whenever the
# input converges within R — the driver's sf0.01 graph converges in 10
# rounds (measured), unrolled here to 16 for slack. At real scale the
# Spark iterative operator is the implementation; the unrolled SQL is
# the small-scale exactness witness. Parity vs a naive sequential
# peeler is additionally pinned in tests/test_graph_monitor.py.
# ---------------------------------------------------------------------------


def _kcore_unrolled_oracle(k: int, rounds: int) -> str:
    # AS MATERIALIZED is load-bearing: each peel{i} is referenced
    # twice, so inlined CTEs would expand the scan 2^rounds times.
    ctes = [f"WITH {_EDGES_CTE},", "peel0 AS MATERIALIZED (SELECT u, v FROM edges)"]
    for i in range(rounds):
        ctes.append(
            f""",
keep{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT u AS node FROM peel{i} UNION ALL SELECT v FROM peel{i}
  ) GROUP BY node HAVING COUNT(*) >= {k}
),
peel{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM peel{i} e
  JOIN keep{i} a ON e.u = a.node
  JOIN keep{i} b ON e.v = b.node
)"""
        )
    ctes.append(
        f"""
SELECT node, COUNT(*) AS core_degree FROM (
  SELECT u AS node FROM peel{rounds} UNION ALL SELECT v FROM peel{rounds}
) GROUP BY node
ORDER BY node"""
    )
    return "".join(ctes)


_Q57_ORACLE_ROUNDS = 16  # the oracle's static unroll depth


@register("q57_k_core", oracle=_kcore_unrolled_oracle(k=3, rounds=_Q57_ORACLE_ROUNDS))
def q57_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes of the 3-core of the strong co-purchase graph with their
    within-core degree (the maximal subgraph where every part keeps
    >= 3 strong co-purchase ties).

    Convergence guard: the unrolled oracle is exact only while the
    peel reaches its fixpoint within _Q57_ORACLE_ROUNDS rounds
    (measured: 10 at sf0.01). max_iters is pinned to ROUNDS+1 — one
    slot for the final empty-low-set check — so a future fixture that
    needs a 17th peel makes k_core raise RuntimeError LOUDLY instead
    of this query silently diverging from the 16-round oracle."""
    from voz_spark.graph import k_core

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return k_core(_copurchase_edges(li), k=3, max_iters=_Q57_ORACLE_ROUNDS + 1)


# ---------------------------------------------------------------------------
# q118: histogram quantiles — the 100 TB complement of q15's exact
# median: an exact per-group median needs a per-group sort of the
# whole column, but a FIXED-WIDTH histogram gets p50/p95 at bin
# resolution with one hash aggregate over a BOUNDED key domain (the
# approx_percentile idea, made deterministic and engine-exact). The
# quantile rule is integer: the p-th quantile bin is the smallest bin
# whose running count satisfies cum·100 >= n·p.
#
# Scale shape: one aggregate on (flag, bin) — bounded by |flags| ×
# |bins|, NOT by row count — then a window over that tiny bin table
# and a conditional-min rollup. The corpus shuffles only bin counts.
# Binning is floor(price / 100): one IEEE double division + floor,
# bit-identical cross-engine on identical inputs.
# ---------------------------------------------------------------------------

_Q118_ORACLE = """
WITH b AS (
  SELECT l_returnflag, CAST(FLOOR(l_extendedprice / 100.0) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
w AS (
  SELECT *, SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            SUM(c) OVER (PARTITION BY l_returnflag) AS n
  FROM b
)
SELECT l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN bin END) AS BIGINT) AS p50_bin,
       CAST(MIN(CASE WHEN cum * 100 >= n * 95 THEN bin END) AS BIGINT) AS p95_bin,
       COUNT(*) AS n_bins
FROM w
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q118_histogram_quantiles", oracle=_Q118_ORACLE)
def q118_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 price bins per return flag from a fixed-width
    histogram: one bounded-domain aggregate + a window over the bin
    table (never the rows)."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / F.lit(100.0)).cast("long").alias("bin"),
    )
    b = li.groupBy("l_returnflag", "bin").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("l_returnflag").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("l_returnflag")
    w = b.withColumn("cum", F.sum("c").over(wcum)).withColumn("n", F.sum("c").over(wall))
    return (
        w.groupBy("l_returnflag")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.min(F.when(F.col("cum") * 100 >= F.col("n") * 50, F.col("bin")))
            .cast("long")
            .alias("p50_bin"),
            F.min(F.when(F.col("cum") * 100 >= F.col("n") * 95, F.col("bin")))
            .cast("long")
            .alias("p95_bin"),
            F.count(F.lit(1)).alias("n_bins"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q119: join-key skew diagnostics — the measurement an operator runs
# BEFORE choosing a salting/AQE strategy: per key column, how
# concentrated is the distribution? Reports max key frequency, the
# share held by the top 1% of keys (integer millis), and a skew flag
# (max >= 20× the mean frequency, in cross-multiplied integer form).
#
# Scale shape: the frequency table is one uniform hash aggregate; the
# top-1% share does NOT rank the whole key table — K = ceil(n_keys /
# 100) comes from an O(1) scalar collect (bounded-domain precedent)
# and the top-K survivors come from TakeOrdered, so no global window
# ever touches the key table.
# ---------------------------------------------------------------------------


def _skew_profile(df: DataFrame, entity: str, key: str) -> DataFrame:
    freq = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("f"))
    tot = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("f").cast("long").alias("n_rows"),
        F.max("f").cast("long").alias("max_freq"),
    )
    n_keys = int(tot.collect()[0].n_keys)  # O(1): one scalar row
    k_top = (n_keys + 99) // 100
    top = freq.orderBy(F.desc("f"), "k").limit(k_top).agg(
        F.sum("f").cast("long").alias("top_rows")
    )
    return tot.crossJoin(F.broadcast(top)).select(
        F.lit(entity).alias("entity"),
        "n_rows",
        "n_keys",
        "max_freq",
        F.lit(k_top).cast("long").alias("top1pct_keys"),
        F.expr("top_rows * 1000 div n_rows").alias("top1pct_share_milli"),
        F.expr("max_freq * n_keys >= 20 * n_rows").alias("skewed"),
    )


_Q119_ORACLE = """
WITH p AS (
  SELECT 'events.user_id' AS entity, CAST(user_id AS VARCHAR) AS k FROM events
  UNION ALL
  SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR) FROM lineitem
),
freq AS (SELECT entity, k, COUNT(*) AS f FROM p GROUP BY 1, 2),
tot AS (
  SELECT entity, COUNT(*) AS n_keys, CAST(SUM(f) AS BIGINT) AS n_rows,
         CAST(MAX(f) AS BIGINT) AS max_freq
  FROM freq GROUP BY entity
),
r AS (
  SELECT f.*, ROW_NUMBER() OVER (PARTITION BY f.entity ORDER BY f.f DESC, f.k) AS rn,
         t.n_keys
  FROM freq f JOIN tot t ON f.entity = t.entity
),
top AS (
  SELECT entity, CAST(SUM(f) AS BIGINT) AS top_rows
  FROM r WHERE rn <= (n_keys + 99) // 100 GROUP BY entity
)
SELECT t.entity, t.n_rows, t.n_keys, t.max_freq,
       (t.n_keys + 99) // 100 AS top1pct_keys,
       top.top_rows * 1000 // t.n_rows AS top1pct_share_milli,
       (t.max_freq * t.n_keys >= 20 * t.n_rows) AS skewed
FROM tot t JOIN top ON t.entity = top.entity
ORDER BY t.entity
"""


@register("q119_key_skew_profile", oracle=_Q119_ORACLE)
def q119_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution concentration report for two join keys:
    top-1%-of-keys share in integer millis + a cross-multiplied skew
    flag; TakeOrdered top-K, never a global key-table window."""
    ev = T(spark, sf_dir, "events").select(F.col("user_id").cast("string").alias("k"))
    li = T(spark, sf_dir, "lineitem").select(F.col("l_orderkey").cast("string").alias("k"))
    return (
        _skew_profile(ev, "events.user_id", "k")
        .unionByName(_skew_profile(li, "lineitem.l_orderkey", "k"))
        .orderBy("entity")
    )


# ---------------------------------------------------------------------------
# q121: burst detection — hourly event-rate anomalies against the
# trailing 24 observed hours (the crawl-ops alarm: a host suddenly
# serving 3× its normal rate is a trap, a mirror storm, or a bug in
# the scheduler). The burst rule is cross-multiplied integers
# (c · n_prev · 10 >= trail_sum · 25, i.e. current >= 2.5× the
# trailing mean, with >= 12 observed hours of history) — no float
# thresholds, engine-exact.
#
# Scale shape: the row-sized work is ONE aggregate on (event_type,
# hour) — a bounded domain; the trailing window runs over that tiny
# hourly table, partitioned by event_type. Same bounded-domain
# pattern as q118.
# ---------------------------------------------------------------------------

_Q121_ORACLE = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT *,
         SUM(c) OVER (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
         COUNT(c) OVER (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS n_prev
  FROM h
)
SELECT event_type, hour, c AS n_events,
       CAST(trail_sum AS BIGINT) AS trail_sum,
       CAST(n_prev AS BIGINT) AS n_prev
FROM w
WHERE n_prev >= 12 AND c * n_prev * 10 >= trail_sum * 25
ORDER BY event_type, hour
"""


@register("q121_event_bursts", oracle=_Q121_ORACLE)
def q121_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours where an event type ran >= 2.5x its trailing-24-observed-
    hours mean (integer cross-multiplied rule, >= 12 hours history)."""
    h = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    b = h.withColumn("trail_sum", F.sum("c").over(w)).withColumn(
        "n_prev", F.count("c").over(w)
    )
    return (
        b.where(
            (F.col("n_prev") >= 12)
            & (F.col("c") * F.col("n_prev") * 10 >= F.col("trail_sum") * 25)
        )
        .select(
            "event_type",
            "hour",
            F.col("c").alias("n_events"),
            F.col("trail_sum").cast("long").alias("trail_sum"),
            F.col("n_prev").cast("long").alias("n_prev"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# q195: dimension cube — one scan answering every marginal at once:
# CUBE(returnflag, linestatus) emits the full lattice (cell, row
# margin, column margin, grand total) with a GROUPING id telling the
# reader which level a row belongs to. The reference computes each
# margin as its own pandas groupby pass (src/data_analyzer.py); the
# cube is the one-scan replacement and Spark/DuckDB agree bit-exactly
# because every aggregate is a count or DECIMAL-exact sum.
#
# Scale shape: CUBE over two low-cardinality dims multiplies the
# aggregate key domain by 4, not the data — partials combine map-side
# per lattice level and the corpus shuffles once. Never CUBE a
# high-cardinality dim (the lattice doubles per dim) — that rule is
# the comment the next reader needs.
# ---------------------------------------------------------------------------

_Q195_ORACLE = """
SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       COALESCE(l_linestatus, '(all)') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
"""


@register("q195_dimension_cube", oracle=_Q195_ORACLE)
def q195_dimension_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE lattice over (returnflag, linestatus) with GROUPING
    ids — every margin from one scan, one shuffle."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "gid",
            "n_rows",
            "sum_qty",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# q196: set algebra — INTERSECT and EXCEPT as first-class operators:
# which parts sold BOTH through high-priority and low-priority orders
# (intersect), and which sold ONLY high (except). The reference does
# this with Python set() on collected lists; here both run as
# deduplicating joins the planner picks (SMJ or shuffled hash) and the
# two results union into one labeled table.
#
# Scale shape: INTERSECT/EXCEPT compile to distinct + semi/anti joins
# on the part key — uniform, partial-combining; the corpus shuffles
# on l_partkey once per side. The final label union is free.
# ---------------------------------------------------------------------------

_Q196_ORACLE = """
WITH hi AS (
  SELECT DISTINCT l.l_partkey FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
),
lo AS (
  SELECT DISTINCT l.l_partkey FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '5-LOW'
),
both_ AS (SELECT l_partkey FROM hi INTERSECT SELECT l_partkey FROM lo),
only_hi AS (SELECT l_partkey FROM hi EXCEPT SELECT l_partkey FROM lo)
SELECT 'both' AS relation, CAST(l_partkey AS BIGINT) AS partkey FROM both_
UNION ALL
SELECT 'only_high', CAST(l_partkey AS BIGINT) FROM only_hi
ORDER BY relation, partkey
"""


@register("q196_set_algebra", oracle=_Q196_ORACLE)
def q196_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts selling through both high- and low-priority orders
    (INTERSECT) vs only-high (EXCEPT), labeled in one table."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    hi = (
        j.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("l_partkey")
        .distinct()
    )
    lo = j.where(F.col("o_orderpriority") == "5-LOW").select("l_partkey").distinct()
    both = hi.intersect(lo).select(
        F.lit("both").alias("relation"), F.col("l_partkey").cast("long").alias("partkey")
    )
    only_hi = hi.exceptAll(lo).distinct().select(
        F.lit("only_high").alias("relation"),
        F.col("l_partkey").cast("long").alias("partkey"),
    )
    return both.unionByName(only_hi).orderBy("relation", "partkey")


# ---------------------------------------------------------------------------
# q197: bucketed range join — "which events fall inside which session
# interval" is a point-in-interval join, and the naive plan is a
# BroadcastNestedLoop over every (event, interval) pair: O(n·m). The
# scalable shape buckets BOTH sides by a coarse time grain (the
# interval's span bounds how many buckets it touches), equi-joins on
# the bucket, then applies the exact range predicate — turning the
# cross product into a keyed join plus an in-row filter. Intervals
# here are maintenance windows derived from `orders` dates (one
# window per clerk per month, planted deterministic lengths); points
# are order dates. Both engines bucket identically (epoch-day // 16).
#
# Scale shape: explode each interval into the <= 3 buckets it spans
# (span <= 2 grains by construction), equi-join on (clerk-group,
# bucket), exact predicate in-row, distinct to kill double matches on
# bucket boundaries. The join key is (group, bucket) — uniform; no
# nested loop anywhere at any scale.
# ---------------------------------------------------------------------------

_Q197_ORACLE = """
WITH w AS (
  SELECT o_custkey % 19 AS grp,
         MIN(date_diff('day', DATE '1970-01-01', o_orderdate)) + (o_custkey % 19) AS start_d,
         MIN(date_diff('day', DATE '1970-01-01', o_orderdate)) + (o_custkey % 19) + 8 + o_custkey % 19 % 7 AS end_d
  FROM orders GROUP BY 1
),
p AS (
  SELECT o_custkey % 19 AS grp, date_diff('day', DATE '1970-01-01', o_orderdate) AS d, o_orderkey
  FROM orders
),
j AS (
  SELECT p.grp, p.o_orderkey
  FROM p JOIN w ON w.grp = p.grp AND p.d BETWEEN w.start_d AND w.end_d
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_in_window,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_order,
       CAST(MAX(o_orderkey) AS BIGINT) AS last_order
FROM j GROUP BY grp ORDER BY grp
"""


@register("q197_bucketed_range_join", oracle=_Q197_ORACLE)
def q197_bucketed_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join executed as bucket-equi-join + in-row
    range predicate (never a nested loop): intervals explode into the
    <= 3 coarse buckets they span; matches dedup on the pair."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("clerk"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("d"),
        "o_orderkey",
    )
    w = (
        o.groupBy((F.col("clerk") % 19).alias("grp"))
        .agg(F.min("d").alias("base"))
        .select(
            "grp",
            (F.col("base") + F.col("grp")).alias("start_d"),
            (F.col("base") + F.col("grp") + 8 + F.col("grp") % 7).alias("end_d"),
        )
    )
    grain = 16
    wb = w.select(
        "grp",
        "start_d",
        "end_d",
        F.explode(
            F.sequence(
                F.expr(f"start_d div {grain}"), F.expr(f"end_d div {grain}")
            )
        ).alias("bucket"),
    )
    p = o.select(
        (F.col("clerk") % 19).alias("grp"),
        "d",
        "o_orderkey",
        F.expr(f"d div {grain}").alias("bucket"),
    )
    j = (
        p.join(wb, ["grp", "bucket"])
        .where(F.col("d").between(F.col("start_d"), F.col("end_d")))
        .select("grp", "o_orderkey")
        .distinct()
    )
    return (
        j.groupBy(F.col("grp").cast("long").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_in_window"),
            F.min("o_orderkey").cast("long").alias("first_order"),
            F.max("o_orderkey").cast("long").alias("last_order"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# q198: full-outer reconciliation — two independently-produced daily
# rollups (order intake by date vs lineitem ship volume by date) never
# line up exactly: some dates only intake, some only ship. FULL OUTER
# join is the reconciliation operator that keeps BOTH unmatched sides
# visible, with a status column naming the gap — the audit shape every
# two-pipeline system needs (the reference reconciles nothing; its
# CSVs drift silently, docs/crawling_ocr_result.md:37 vs :74).
#
# Scale shape: two partial-combining date rollups (bounded key
# domain), then a full-outer join on the date — tiny by then. The
# corpus shuffles once per side.
# ---------------------------------------------------------------------------

_Q198_ORACLE = """
WITH a AS (
  SELECT o_orderdate AS d, COUNT(*) AS n_orders FROM orders GROUP BY 1
),
b AS (
  SELECT l_shipdate AS d, COUNT(*) AS n_ship FROM lineitem GROUP BY 1
)
SELECT COALESCE(a.d, b.d) AS d,
       CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(b.n_ship, 0) AS BIGINT) AS n_ship,
       CASE WHEN a.d IS NULL THEN 'ship_only'
            WHEN b.d IS NULL THEN 'intake_only'
            ELSE 'both' END AS status
FROM a FULL OUTER JOIN b ON a.d = b.d
ORDER BY d
"""


@register("q198_fullouter_reconcile", oracle=_Q198_ORACLE)
def q198_fullouter_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily intake vs ship volumes reconciled by FULL OUTER join with
    both unmatched sides kept and named."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    a = o.groupBy(F.col("o_orderdate").alias("da")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    b = li.groupBy(F.col("l_shipdate").alias("db")).agg(
        F.count(F.lit(1)).alias("n_ship")
    )
    j = a.join(b, a["da"] == b["db"], "full_outer")
    return (
        j.select(
            F.coalesce("da", "db").alias("d"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("n_ship", F.lit(0)).cast("long").alias("n_ship"),
            F.when(F.col("da").isNull(), F.lit("ship_only"))
            .when(F.col("db").isNull(), F.lit("intake_only"))
            .otherwise(F.lit("both"))
            .alias("status"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# q200: skew-salted join — the north-star names "skew salting on the
# host key" explicitly. A crawl fact table (one row per fetched item)
# joined to the per-host metadata dim (politeness delay, tier) hash-
# partitions on host — and the web is Zipf: one host can own most of
# the rows (60% planted here), so one reducer gets 60% of the data
# and the stage runs at straggler speed. The salted shape replicates
# the DIM row R ways (salt 0..R-1), gives each FACT row a uniform
# deterministic salt, and joins on (host, salt): the hot host's rows
# spread over R partitions, worst-partition load drops R-fold, and
# the join stays an ordinary shuffled equi-join (the dim is 10^8
# hosts in production — NOT broadcastable; AQE skew-join is the
# adaptive alternative, salting is the deterministic portable one).
#
# Scale shape: dim replication is |dim|×R rows (bounded, R=16); the
# fact side computes its salt in-row (md5 of the line identity — no
# extra shuffle); the post-join rollup re-keys by host alone, where
# partial combine on (host,salt)-partitioned input shrinks the hot
# key to R rows before the final exchange. Plan-asserted: the fact
# exchange partitions on (host, salt), not host alone.
#
# Oracle: the dim attributes are pure functions of the host name, so
# the unsalted SQL computes them directly in the host rollup — same
# semantics, no salt anywhere, which is exactly the point: salting
# must not change the answer.
# ---------------------------------------------------------------------------

_Q200_ORACLE = """
WITH f AS (
  SELECT CASE WHEN l_orderkey % 10 < 6 THEN 'megahost.example'
              ELSE 'h' || CAST(l_orderkey % 50 AS VARCHAR) || '.example' END AS host,
         l_quantity
  FROM lineitem
)
SELECT host,
       CAST(length(host) % 3 AS BIGINT) AS tier,
       CAST((CAST('0x' || substr(md5(host), 1, 15) AS BIGINT) % 20 + 1) * 100
            AS BIGINT) AS crawl_delay_ms,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM f GROUP BY host ORDER BY n_items DESC, host
"""


@register("q200_skew_salted_join", oracle=_Q200_ORACLE)
def q200_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-host-dim join with a planted 60%-hot host, executed as
    a salt-replicated equi-join on (host, salt) so no partition owns
    the hot key; rollup re-keys by host with partial combine."""
    r_salt = 16
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 6, F.lit("megahost.example"))
        .otherwise(
            F.concat(
                F.lit("h"), (F.col("l_orderkey") % 50).cast("string"), F.lit(".example")
            )
        )
        .alias("host"),
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
            % r_salt
        ).alias("salt"),
        "l_quantity",
    )
    dim = (
        fact.select("host")
        .distinct()
        .select(
            "host",
            (F.length("host") % 3).cast("long").alias("tier"),
            (
                (
                    F.conv(F.substring(F.md5(F.col("host")), 1, 15), 16, 10).cast(
                        "long"
                    )
                    % 20
                    + 1
                )
                * 100
            ).alias("crawl_delay_ms"),
        )
    )
    dim_r = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(r_salt - 1)))
    )
    # disable broadcast for this join so the salted shuffle shape is the
    # one actually exercised (the production dim is 10^8 hosts)
    j = fact.hint("shuffle_hash").join(dim_r, ["host", "salt"])
    return (
        j.groupBy("host")
        .agg(
            F.first("tier").alias("tier"),
            F.first("crawl_delay_ms").alias("crawl_delay_ms"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy(F.col("n_items").desc(), "host")
    )


# ---------------------------------------------------------------------------
# q209: join-cardinality estimation from MCV statistics — the number
# a planner needs BEFORE running a join (broadcast vs shuffle, veto a
# runaway). Exact |A join B| = sum_k dA(k)*dB(k) costs a per-key pass;
# estimators run on O(1) statistics:
#   est_basic — the textbook n_A*n_B / max(ndv_A, ndv_B) (uniform
#               degrees + containment), most engines' default;
#   est_mcv   — Postgres-style most-common-values: the top-10 keys
#               per side (a design constant) join EXACTLY, the
#               residual mass falls back to the uniform formula.
# The fixture key is planted Zipf (5 hot keys own a third of the
# rows), where the uniform assumption under-prices the join ~20x and
# MCV stats recover it — the error columns are the audit, pinned in
# tests. All arithmetic is integer (div), mirrored in the oracle.
#
# Scale shape: per-key degree aggregates (one shuffle each); the
# exact join runs on the DEGREE tables (one row per key, never raw
# fan-out — the audit half); MCV extraction is a top-10 window on
# the degree table; the estimator math is crossJoins of broadcast
# 1-row/10-row aggregates.
# ---------------------------------------------------------------------------

_Q209_KEY = "CASE WHEN event_id % 3 = 0 THEN event_id % 5 ELSE 1000 + (event_id % 797) END"

_Q209_ORACLE = f"""
WITH f AS (SELECT {_Q209_KEY} AS k, event_type FROM events),
a AS (SELECT k, COUNT(*) AS d FROM f GROUP BY 1),
b AS (
  SELECT k, COUNT(*) AS d FROM f
  WHERE event_type IN ('click', 'view') GROUP BY 1
),
ex AS (SELECT SUM(a.d * b.d) AS exact_n FROM a JOIN b USING (k)),
sa AS (SELECT SUM(d) AS n_a, COUNT(*) AS ndv_a FROM a),
sb AS (SELECT SUM(d) AS n_b, COUNT(*) AS ndv_b FROM b),
ma AS (
  SELECT k, d FROM (
    SELECT k, d, ROW_NUMBER() OVER (ORDER BY d DESC, k) AS rn FROM a
  ) WHERE rn <= 10
),
mb AS (
  SELECT k, d FROM (
    SELECT k, d, ROW_NUMBER() OVER (ORDER BY d DESC, k) AS rn FROM b
  ) WHERE rn <= 10
),
com AS (SELECT ma.k, ma.d AS da, mb.d AS db FROM ma JOIN mb USING (k)),
cs AS (
  SELECT COALESCE(SUM(da * db), 0) AS mcv_n,
         COALESCE(SUM(da), 0) AS sa_m,
         COALESCE(SUM(db), 0) AS sb_m,
         COUNT(*) AS n_com
  FROM com
),
mcv AS (
  SELECT mcv_n + (n_a - sa_m) * (n_b - sb_m)
                 // GREATEST(ndv_a - n_com, ndv_b - n_com) AS est_mcv
  FROM cs CROSS JOIN sa CROSS JOIN sb
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(ndv_a AS BIGINT) AS ndv_a,
       CAST(ndv_b AS BIGINT) AS ndv_b,
       CAST(exact_n AS BIGINT) AS exact_n,
       CAST(n_a * n_b // GREATEST(ndv_a, ndv_b) AS BIGINT) AS est_basic,
       CAST(est_mcv AS BIGINT) AS est_mcv,
       CAST(1000 * abs(n_a * n_b // GREATEST(ndv_a, ndv_b) - exact_n)
            // GREATEST(exact_n, 1) AS BIGINT) AS err_basic_milli,
       CAST(1000 * abs(est_mcv - exact_n) // GREATEST(exact_n, 1) AS BIGINT)
         AS err_mcv_milli
FROM sa CROSS JOIN sb CROSS JOIN ex CROSS JOIN mcv
"""


@register("q209_join_cardinality_estimate", oracle=_Q209_ORACLE)
def q209_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join size vs textbook ndv estimate vs MCV estimate on a
    planted-Zipf key, with integer-milli errors."""
    ev = T(spark, sf_dir, "events").select(
        F.expr(_Q209_KEY).alias("k"), "event_type"
    )
    a = ev.groupBy("k").agg(F.count(F.lit(1)).alias("d"))
    b = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ex = (
        a.join(b.select("k", F.col("d").alias("db")), "k")
        .groupBy()
        .agg(F.sum(F.col("d") * F.col("db")).alias("exact_n"))
    )
    sa = a.groupBy().agg(F.sum("d").alias("n_a"), F.count(F.lit(1)).alias("ndv_a"))
    sb = b.groupBy().agg(F.sum("d").alias("n_b"), F.count(F.lit(1)).alias("ndv_b"))

    def _mcv(side: DataFrame) -> DataFrame:
        # TakeOrderedAndProject: per-partition top-10 + driver merge —
        # scale-safe even at 10^8 distinct keys (never a global window)
        return side.orderBy(F.col("d").desc(), "k").limit(10).select("k", "d")

    com = _mcv(a).join(
        _mcv(b).select("k", F.col("d").alias("db2")), "k"
    )
    cs = com.groupBy().agg(
        F.coalesce(F.sum(F.col("d") * F.col("db2")), F.lit(0)).alias("mcv_n"),
        F.coalesce(F.sum("d"), F.lit(0)).alias("sa_m"),
        F.coalesce(F.sum("db2"), F.lit(0)).alias("sb_m"),
        F.count(F.lit(1)).alias("n_com"),
    )
    mcv = (
        F.broadcast(cs)
        .crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            F.expr(
                "mcv_n + (n_a - sa_m) * (n_b - sb_m)"
                " div GREATEST(ndv_a - n_com, ndv_b - n_com)"
            ).alias("est_mcv")
        )
    )
    return (
        F.broadcast(sa)
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(mcv))
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("ndv_a").cast("long").alias("ndv_a"),
            F.col("ndv_b").cast("long").alias("ndv_b"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.expr("n_a * n_b div GREATEST(ndv_a, ndv_b)")
            .cast("long")
            .alias("est_basic"),
            F.col("est_mcv").cast("long").alias("est_mcv"),
            F.expr(
                "1000 * abs(n_a * n_b div GREATEST(ndv_a, ndv_b) - exact_n)"
                " div GREATEST(exact_n, 1)"
            )
            .cast("long")
            .alias("err_basic_milli"),
            F.expr("1000 * abs(est_mcv - exact_n) div GREATEST(exact_n, 1)")
            .cast("long")
            .alias("err_mcv_milli"),
        )
    )


# ---------------------------------------------------------------------------
# q232: deterministic random-walk sampling (the DeepWalk / node2vec
# positive-pair generator, made reproducible for a distributed
# pipeline): from a fixed start set, take K=3 walk steps where the
# "random" neighbor choice at step k is argmin over the neighbors of
# md5(walker:k:neighbor) — a pure function of (walker, step,
# neighbor), so every engine, retry, and re-partitioning produces THE
# SAME walks (the q58 no-RNG discipline applied to graph sampling).
# Graph = q55's strong co-purchase edges, both directions.
#
# Scale shape: each step is ONE equi-join of the current frontier
# (|walkers| rows) against the adjacency list, and the choice is a
# per-walker argmin window bounded by the current node's degree —
# O(K) joins total, no driver-side walk state, walks embarrassingly
# parallel across walkers.
# ---------------------------------------------------------------------------

_Q232_STARTS = 20
_Q232_STEPS = 3


def _q232_step_sql(k: int) -> str:
    return f"""
s{k} AS (
  SELECT walker, dst AS node FROM (
    SELECT c.walker, a.dst,
           ROW_NUMBER() OVER (
             PARTITION BY c.walker
             ORDER BY md5(CAST(c.walker AS VARCHAR) || ':{k}:' || CAST(a.dst AS VARCHAR)), a.dst
           ) AS rn
    FROM s{k - 1} c JOIN adj a ON a.src = c.node
  ) WHERE rn = 1
)"""


@register(
    "q232_deterministic_walks",
    oracle=f"""
WITH {_EDGES_CTE},
adj AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
),
s0 AS (
  SELECT src AS walker, src AS node FROM (SELECT DISTINCT src FROM adj)
  ORDER BY src LIMIT {_Q232_STARTS}
),{",".join(_q232_step_sql(k) for k in range(1, _Q232_STEPS + 1))}
SELECT CAST(walker AS BIGINT) AS walker, CAST(step AS INT) AS step,
       CAST(node AS BIGINT) AS node
FROM (
  SELECT walker, 0 AS step, node FROM s0
  {" ".join(f"UNION ALL SELECT walker, {k} AS step, node FROM s{k}" for k in range(1, _Q232_STEPS + 1))}
)
ORDER BY walker, step
""",
)
def q232_deterministic_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=3 hash-deterministic walk steps from the 20 smallest nodes of
    the co-purchase graph; each step one frontier-adjacency equi-join
    + a degree-bounded per-walker argmin."""
    from pyspark.sql.window import Window

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li)
    adj = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .persist()
    )
    cur = (
        adj.select("src")
        .distinct()
        .orderBy("src")
        .limit(_Q232_STARTS)
        .select(F.col("src").alias("walker"), F.col("src").alias("node"))
    )
    levels = [cur.withColumn("step", F.lit(0))]
    for k in range(1, _Q232_STEPS + 1):
        w = Window.partitionBy("walker").orderBy(
            F.md5(
                F.concat(
                    F.col("walker").cast("string"),
                    F.lit(f":{k}:"),
                    F.col("dst").cast("string"),
                )
            ),
            "dst",
        )
        cur = (
            cur.join(adj, cur["node"] == adj["src"])
            .select("walker", "dst")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("walker", F.col("dst").alias("node"))
        )
        levels.append(cur.withColumn("step", F.lit(k)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        F.col("walker").cast("long").alias("walker"),
        F.col("step").cast("int").alias("step"),
        F.col("node").cast("long").alias("node"),
    ).orderBy("walker", "step")


# ---------------------------------------------------------------------------
# q233: grid-bucketed epsilon-neighbor self-join — the spatial join
# pattern (points within distance eps) that a naive approach writes
# as an O(n^2) cross join and Spark cannot optimize on its own: snap
# every point to an eps-sized grid cell, probe each point's 3x3 cell
# neighborhood (an in-row 9-way explode), equi-join probe cells
# against point cells, and verify the exact INTEGER squared distance.
# Each unordered pair is generated exactly once (a's probe hits the
# single cell b sits in; id_a < id_b), so no distinct pass is needed.
#
# Coordinates are md5-derived integers (the q58 no-RNG discipline) in
# a 1000x1000 space; eps = 25 = the cell size, so the 3x3 probe
# provably covers every candidate (any pair within eps differs by
# < 1 cell in each axis).
#
# Scale shape: one in-row x9 explode + ONE equi-join on the cell key
# + in-row integer arithmetic; the cell key is uniform by md5
# construction (no hot cell), and the output is a bounded histogram.
# ---------------------------------------------------------------------------

_Q233_EPS = 25
_Q233_SPACE = 1000

_Q233_PTS_DUCK = f"""
  SELECT event_id AS id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':x'), 1, 15))::BIGINT
           % {_Q233_SPACE} AS x,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':y'), 1, 15))::BIGINT
           % {_Q233_SPACE} AS y
  FROM events WHERE event_id % 5 = 0
"""


@register(
    "q233_grid_neighbor_join",
    oracle=f"""
WITH pts AS ({_Q233_PTS_DUCK}),
cells AS (
  SELECT id, x, y, x // {_Q233_EPS} AS cx, y // {_Q233_EPS} AS cy FROM pts
),
probe AS (
  SELECT id, x, y, cx + dx.d AS pcx, cy + dy.d AS pcy
  FROM cells,
       (SELECT unnest([-1, 0, 1]) AS d) dx,
       (SELECT unnest([-1, 0, 1]) AS d) dy
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM probe a JOIN cells b ON a.pcx = b.cx AND a.pcy = b.cy AND a.id < b.id
),
nbr AS (SELECT * FROM pairs WHERE d2 <= {_Q233_EPS * _Q233_EPS})
SELECT CAST(FLOOR(SQRT(CAST(d2 AS DOUBLE))) AS BIGINT) // 5 AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(d2) AS BIGINT) AS sum_d2
FROM nbr
GROUP BY band
ORDER BY band
""",
)
def q233_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points within eps=25 via 3x3 grid-cell probing: distance-band
    histogram of the exact integer-squared-distance neighbor pairs."""
    ev = T(spark, sf_dir, "events").where(F.col("event_id") % 5 == 0)
    hx = F.conv(
        F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":x"))), 1, 15),
        16, 10,
    ).cast("long") % _Q233_SPACE
    hy = F.conv(
        F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":y"))), 1, 15),
        16, 10,
    ).cast("long") % _Q233_SPACE
    cells = ev.select(
        F.col("event_id").alias("id"),
        hx.alias("x"),
        hy.alias("y"),
    ).select(
        "id", "x", "y",
        F.expr(f"x div {_Q233_EPS}").alias("cx"),
        F.expr(f"y div {_Q233_EPS}").alias("cy"),
    )
    probe = cells.select(
        "id", "x", "y",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1),"
                " dx -> transform(sequence(-1, 1),"
                " dy -> struct(cx + dx AS pcx, cy + dy AS pcy))))"
            )
        ).alias("p"),
    ).select("id", "x", "y", F.col("p.pcx").alias("pcx"), F.col("p.pcy").alias("pcy"))
    b = cells.select(
        F.col("id").alias("id_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), F.col("cx").alias("cx"), F.col("cy").alias("cy"),
    )
    pairs = probe.join(
        b,
        (probe["pcx"] == b["cx"]) & (probe["pcy"] == b["cy"]) & (probe["id"] < b["id_b"]),
    ).select(
        (
            (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
            + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb"))
        ).alias("d2")
    )
    nbr = pairs.where(F.col("d2") <= _Q233_EPS * _Q233_EPS)
    return (
        nbr.select(
            F.expr("CAST(FLOOR(SQRT(CAST(d2 AS DOUBLE))) div 5 AS BIGINT)").alias("band"),
            "d2",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("d2").cast("long").alias("sum_d2"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# q234: ordered funnel conversion (view -> click -> purchase) — the
# event-SEQUENCE funnel every product-analytics stack ships (distinct
# from q73's gate-attrition funnel, which has no ordering): a user
# reaches stage k only with an event of stage k's type strictly AFTER
# their stage-(k-1) arrival time. Computed as K-1 chained
# min-aggregate + join steps (funnel depth is a design constant) —
# no per-user sequence materialization, no window over raw events.
#
# Scale shape: each stage is one user-keyed aggregate over ONLY that
# stage's event type (filter pushed to the scan) plus a user-keyed
# join against the (already tiny) reached-users table; output is 3
# rows of integer counts and DIV-exact milli conversion rates.
# ---------------------------------------------------------------------------

_Q234_STAGES = ["view", "click", "purchase"]


@register(
    "q234_ordered_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
),
c AS (
  SELECT (SELECT COUNT(*) FROM s1) AS n1,
         (SELECT COUNT(*) FROM s2) AS n2,
         (SELECT COUNT(*) FROM s3) AS n3
)
SELECT stage, label, n_users, conv_from_prev_milli, conv_from_first_milli
FROM (
  SELECT 1 AS stage, 'view' AS label, CAST(n1 AS BIGINT) AS n_users,
         CAST(1000 AS BIGINT) AS conv_from_prev_milli,
         CAST(1000 AS BIGINT) AS conv_from_first_milli FROM c
  UNION ALL
  SELECT 2, 'click', CAST(n2 AS BIGINT),
         CAST(1000 * n2 // GREATEST(n1, 1) AS BIGINT),
         CAST(1000 * n2 // GREATEST(n1, 1) AS BIGINT) FROM c
  UNION ALL
  SELECT 3, 'purchase', CAST(n3 AS BIGINT),
         CAST(1000 * n3 // GREATEST(n2, 1) AS BIGINT),
         CAST(1000 * n3 // GREATEST(n1, 1) AS BIGINT) FROM c
)
ORDER BY stage
""",
)
def q234_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view->click->purchase funnel: users reaching
    each stage and milli conversion vs previous stage and stage 1."""
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c = (
        s1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n3")))
    )
    rows = c.selectExpr(
        "stack(3,"
        " 1, 'view', CAST(n1 AS BIGINT), CAST(1000 AS BIGINT), CAST(1000 AS BIGINT),"
        " 2, 'click', CAST(n2 AS BIGINT),"
        "   CAST(1000 * n2 div GREATEST(n1, 1) AS BIGINT),"
        "   CAST(1000 * n2 div GREATEST(n1, 1) AS BIGINT),"
        " 3, 'purchase', CAST(n3 AS BIGINT),"
        "   CAST(1000 * n3 div GREATEST(n2, 1) AS BIGINT),"
        "   CAST(1000 * n3 div GREATEST(n1, 1) AS BIGINT)"
        ") AS (stage, label, n_users, conv_from_prev_milli, conv_from_first_milli)"
    )
    return rows.select(
        F.col("stage").cast("int").alias("stage"),
        "label",
        "n_users",
        "conv_from_prev_milli",
        "conv_from_first_milli",
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# q235: retention cohort matrix — users cohorted by FIRST active day,
# each later active day credited to (cohort_day, day_offset); the
# classic warehouse triangle that shows decay per acquisition cohort.
# Retention is integer milli (1000 * active DIV cohort size).
#
# Scale shape: distinct (user, day) first (one partial-combining
# aggregate), cohort day via a per-user min re-joined (user-keyed,
# mergeable — no window over raw events), then ONE bounded rollup on
# (cohort_day, offset) — at most days^2 / 2 cells regardless of user
# count.
# ---------------------------------------------------------------------------


@register(
    "q235_retention_cohorts",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
c0 AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY user_id),
sz AS (SELECT d0, COUNT(*) AS cohort_size FROM c0 GROUP BY d0),
cell AS (
  SELECT c0.d0, date_diff('day', c0.d0, ud.day) AS day_offset,
         COUNT(*) AS n_active
  FROM ud JOIN c0 ON c0.user_id = ud.user_id
  GROUP BY 1, 2
)
SELECT strftime(c.d0, '%Y-%m-%d') AS cohort_day,
       CAST(c.day_offset AS INT) AS day_offset,
       CAST(c.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(1000 * c.n_active // s.cohort_size AS BIGINT) AS retention_milli
FROM cell c JOIN sz s ON s.d0 = c.d0
ORDER BY cohort_day, day_offset
""",
)
def q235_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort first-day x day-offset) active-user matrix with milli
    retention; day_offset 0 always equals the cohort size."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    ud = ev.distinct()
    c0 = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    sz = c0.groupBy("d0").agg(F.count(F.lit(1)).alias("cohort_size"))
    cell = (
        ud.join(c0, "user_id")
        .groupBy("d0", F.datediff("day", "d0").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        cell.join(sz, "d0")
        .select(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("int").alias("day_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr("CAST(1000 * n_active div cohort_size AS BIGINT)").alias(
                "retention_milli"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# q236: skip-gram training-pair extraction — the word2vec/DeepWalk
# consumer of q232's deterministic walks: within each walk, every
# ordered (center, context) pair at step distance 1..2 becomes a
# positive training example, counted with multiplicity across walks.
# Together q232+q236 are the full reproducible graph-embedding
# sampling pipeline (walk -> window -> pair table).
#
# Scale shape: the walk table is tiny relative to the graph
# (|walkers| x (K+1) rows); the windowing is a walk-keyed self-join
# with the |step difference| predicate inside the join condition —
# fan-out bounded by the design-constant window, then ONE
# partial-combining pair rollup.
# ---------------------------------------------------------------------------

_Q236_WINDOW = 2

_Q236_WALKS_CTE = f"""
adj AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
),
s0 AS (
  SELECT src AS walker, src AS node FROM (SELECT DISTINCT src FROM adj)
  ORDER BY src LIMIT {_Q232_STARTS}
),{",".join(_q232_step_sql(k) for k in range(1, _Q232_STEPS + 1))},
walks AS (
  SELECT walker, 0 AS step, node FROM s0
  {" ".join(f"UNION ALL SELECT walker, {k} AS step, node FROM s{k}" for k in range(1, _Q232_STEPS + 1))}
)"""


@register(
    "q236_skipgram_pairs",
    oracle=f"""
WITH {_EDGES_CTE},
{_Q236_WALKS_CTE}
SELECT CAST(a.node AS BIGINT) AS center, CAST(b.node AS BIGINT) AS context,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM walks a JOIN walks b
  ON a.walker = b.walker AND a.step <> b.step
 AND ABS(a.step - b.step) <= {_Q236_WINDOW}
GROUP BY a.node, b.node
ORDER BY center, context
""",
)
def q236_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered (center, context) skip-gram pairs at step distance
    <= 2 within each q232 walk, counted with multiplicity."""
    walks = q232_deterministic_walks(spark, sf_dir).persist()
    a = walks.select(
        F.col("walker").alias("wa"), F.col("step").alias("sa"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("walker").alias("wb"), F.col("step").alias("sb"), F.col("node").alias("context")
    )
    return (
        a.join(
            b,
            (F.col("wa") == F.col("wb"))
            & (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= _Q236_WINDOW),
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            F.col("center").cast("long").alias("center"),
            F.col("context").cast("long").alias("context"),
            "n_pairs",
        )
        .orderBy("center", "context")
    )


# ---------------------------------------------------------------------------
# q237: data-profile report — the per-column quality summary every
# warehouse/dbt deployment runs before trusting a table: row count,
# null count, exact NDV, and min/max (rendered engine-stably: DECIMAL
# strings for floats, strftime for timestamps) for a fixed column set
# across three tables.
#
# Scale shape: ONE aggregate pass per table computes every column's
# stats together (the multi-countDistinct EXPAND is a deliberate
# single-scan trade; at 100 TB swap exact NDV for the q59 KMV sketch
# per column — same report schema); the per-column rows come from an
# in-row stack() unpivot of that single aggregate row, so the whole
# report is three scans + three 1-row aggregates.
# ---------------------------------------------------------------------------

_Q237_COLS = [
    ("orders", "o_orderkey", "int"),
    ("orders", "o_totalprice", "double"),
    ("orders", "o_orderpriority", "str"),
    ("events", "user_id", "int"),
    ("events", "value", "double"),
    ("events", "event_type", "str"),
    ("events", "ts", "ts"),
    ("documents", "lang", "str"),
    ("documents", "n_chars", "int"),
    ("documents", "source", "str"),
]


def _q237_minmax_sql(col: str, kind: str, agg: str, engine: str) -> str:
    if kind == "double":
        return (
            f"CAST(CAST(ROUND({agg}({col}), 3) AS DECIMAL(18,3)) AS VARCHAR)"
            if engine == "duckdb"
            else f"CAST(CAST(ROUND({agg}({col}), 3) AS DECIMAL(18,3)) AS STRING)"
        )
    if kind == "ts":
        return (
            f"strftime({agg}({col}), '%Y-%m-%d %H:%M:%S')"
            if engine == "duckdb"
            else f"date_format({agg}({col}), 'yyyy-MM-dd HH:mm:ss')"
        )
    if kind == "int":
        return (
            f"CAST({agg}({col}) AS VARCHAR)"
            if engine == "duckdb"
            else f"CAST({agg}({col}) AS STRING)"
        )
    return f"{agg}({col})"


def _q237_table_sql(table: str, engine: str) -> str:
    cols = [(c, k) for t, c, k in _Q237_COLS if t == table]
    rows = []
    for c, k in cols:
        rows.append(
            f"SELECT '{table}' AS table_name, '{c}' AS column_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,"
            f" {_q237_minmax_sql(c, k, 'MIN', engine)} AS min_str,"
            f" {_q237_minmax_sql(c, k, 'MAX', engine)} AS max_str"
            f" FROM {table}"
        )
    return "\nUNION ALL\n".join(rows)


@register(
    "q237_data_profile",
    oracle=(
        _q237_table_sql("orders", "duckdb")
        + "\nUNION ALL\n"
        + _q237_table_sql("events", "duckdb")
        + "\nUNION ALL\n"
        + _q237_table_sql("documents", "duckdb")
        + "\nORDER BY table_name, column_name"
    ),
)
def q237_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (rows, nulls, exact NDV, engine-stable
    min/max strings) over orders/events/documents — one aggregate
    pass per table, stacked to rows in-row."""
    outs = []
    for table in ("orders", "events", "documents"):
        cols = [(c, k) for t, c, k in _Q237_COLS if t == table]
        aggs = []
        stack_args = []
        for c, k in cols:
            aggs.append(f"CAST(COUNT(*) AS BIGINT) AS nr_{c}")
            aggs.append(f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nn_{c}")
            aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}")
            aggs.append(f"{_q237_minmax_sql(c, k, 'MIN', 'spark')} AS mn_{c}")
            aggs.append(f"{_q237_minmax_sql(c, k, 'MAX', 'spark')} AS mx_{c}")
            stack_args.append(f"'{c}', nr_{c}, nn_{c}, nd_{c}, mn_{c}, mx_{c}")
        one = T(spark, sf_dir, table).selectExpr(*aggs)
        outs.append(
            one.selectExpr(
                f"'{table}' AS table_name",
                f"stack({len(cols)}, {', '.join(stack_args)})"
                " AS (column_name, n_rows, n_nulls, ndv, min_str, max_str)",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------------------------------
# q243: interval-interval OVERLAP join — q197 joins points into
# intervals; this joins two interval SETS (the genomics/temporal
# staple: reservations vs maintenance windows, ad flights vs
# sessions). The naive form is an O(n*m) range cross join Spark
# cannot equi-plan. Bucketed form: each interval explodes to the
# coarse W=128 buckets it spans (<=2 here since len < W), the join is
# an EQUI-join on bucket, and each overlapping pair is emitted
# EXACTLY ONCE — no distinct pass — by crediting it to the first
# bucket both intervals inhabit: bucket == greatest(a_first, b_first)
# (both intervals exist there iff they overlap at all in bucket
# space, and it is unique).
#
# Fixture (q222 in-query synthesis, md5 lengths): side A from
# event_id % 3 == 0, side B from % 3 == 1, starts scattered on a
# 10,000-wide axis. Output: overlap-length histogram (bounded), exact
# integers end to end.
# ---------------------------------------------------------------------------

_Q243_W = 128

_Q243_IV_DUCK = """
  SELECT event_id AS iid,
         (event_id * 37) % 10000 AS s,
         (event_id * 37) % 10000
           + 1 + ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':len'), 1, 15))::BIGINT % 50
           AS e
  FROM events WHERE event_id % 3 = {m}
"""


@register(
    "q243_interval_overlap_join",
    oracle=f"""
WITH ia AS ({_Q243_IV_DUCK.format(m=0)}),
ib AS ({_Q243_IV_DUCK.format(m=1)}),
ea AS (
  SELECT iid, s, e, s // {_Q243_W} AS b0, unnest(range(s // {_Q243_W}, e // {_Q243_W} + 1)) AS bkt
  FROM ia
),
eb AS (
  SELECT iid, s, e, s // {_Q243_W} AS b0, unnest(range(s // {_Q243_W}, e // {_Q243_W} + 1)) AS bkt
  FROM ib
),
pairs AS (
  SELECT a.iid AS id_a, b.iid AS id_b,
         LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS ov
  FROM ea a JOIN eb b
    ON a.bkt = b.bkt
   AND a.bkt = GREATEST(a.b0, b.b0)
   AND a.s <= b.e AND b.s <= a.e
)
SELECT CAST(ov // 10 AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ov) AS BIGINT) AS sum_overlap
FROM pairs
GROUP BY band
ORDER BY band
""",
)
def q243_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (A, B) interval pairs via bucket equi-join with
    first-shared-bucket crediting (each pair exactly once, no
    distinct); overlap-length histogram out."""
    ev = T(spark, sf_dir, "events").select("event_id")
    ln = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":len"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 50
    )

    def side(m: int) -> DataFrame:
        return ev.where(F.col("event_id") % 3 == m).select(
            F.col("event_id").alias("iid"),
            ((F.col("event_id") * 37) % 10000).alias("s"),
            ((F.col("event_id") * 37) % 10000 + 1 + ln).alias("e"),
        )

    def expand(df: DataFrame) -> DataFrame:
        return df.select(
            "iid",
            "s",
            "e",
            F.expr(f"s div {_Q243_W}").alias("b0"),
            F.explode(
                F.expr(f"sequence(s div {_Q243_W}, e div {_Q243_W})")
            ).alias("bkt"),
        )

    a = expand(side(0)).select(
        F.col("iid").alias("id_a"), F.col("s").alias("sa"), F.col("e").alias("ea"),
        F.col("b0").alias("b0a"), F.col("bkt").alias("bkt"),
    )
    b = expand(side(1)).select(
        F.col("iid").alias("id_b"), F.col("s").alias("sb"), F.col("e").alias("eb"),
        F.col("b0").alias("b0b"), F.col("bkt").alias("bkt_b"),
    )
    pairs = a.join(
        b,
        (a["bkt"] == b["bkt_b"])
        & (a["bkt"] == F.greatest(F.col("b0a"), F.col("b0b")))
        & (F.col("sa") <= F.col("eb"))
        & (F.col("sb") <= F.col("ea")),
    ).select(
        (
            F.least(F.col("ea"), F.col("eb"))
            - F.greatest(F.col("sa"), F.col("sb"))
            + 1
        ).alias("ov")
    )
    return (
        pairs.select(F.expr(f"ov div 10").alias("band"), "ov")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("ov").cast("long").alias("sum_overlap"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# q246: session transition matrix — the Markov clickstream model
# product analytics builds on q13's sessions: within each (user,
# session), consecutive events form (from_type -> to_type)
# transitions; counts roll up to the bounded K^2 type-pair domain
# with DIV-exact milli transition probabilities per from-state. q84
# models WORD bigrams; this is the EVENT-sequence analogue (next-
# action prediction, funnel leak localization).
#
# Scale shape: exactly q13's one user-keyed window pass (lag gives
# both the session flag and the transition source in the same pass —
# the session id needs a second cumsum window over the same
# partitioning, ONE exchange total), then a partial-combining rollup
# on the bounded (from, to) domain.
# ---------------------------------------------------------------------------


@register(
    "q246_session_transitions",
    oracle="""
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(ts) OVER w AS prev_ts,
         LAG(event_type) OVER w AS prev_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tr AS (
  SELECT prev_type AS from_type, event_type AS to_type
  FROM t WHERE new_sess = 0
),
cnt AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM tr GROUP BY 1, 2
),
tot AS (SELECT from_type, SUM(n) AS ft FROM cnt GROUP BY from_type)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n_trans,
       CAST(1000 * c.n // t.ft AS BIGINT) AS prob_milli
FROM cnt c JOIN tot t ON t.from_type = c.from_type
ORDER BY c.from_type, c.to_type
""",
)
def q246_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session (from_type -> to_type) transition counts and
    milli probabilities — q13's session window reused for the Markov
    matrix."""
    e = T(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | F.expr("ts - prev_ts > INTERVAL 30 MINUTES"),
                1,
            ).otherwise(0),
        )
    )
    cnt = (
        t.where(F.col("new_sess") == 0)
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("ft"))
    return (
        cnt.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n_trans"),
            F.expr("CAST(1000 * n div ft AS BIGINT)").alias("prob_milli"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# q247: position-based (U-shaped) session attribution — marketing
# analytics' standard credit split, run on q13's sessions: each
# session carries EXACTLY 1000 milli of credit; first and last events
# take 400 each, the middle 200 splits over the n-2 middle events by
# integer largest-remainder (q218's conservation discipline — the
# earliest middles take the remainder); n=1 -> 1000, n=2 -> 500/500.
# Per-session conservation is exact by construction and pinned in the
# test; the rollup reports per event type its positional counts and
# total credit.
#
# Scale shape: q13's user-keyed session windows plus one per-(user,
# session) count/rank window — all bounded partitions — then ONE
# rollup on the bounded type domain.
# ---------------------------------------------------------------------------

_Q247_CREDIT = """CASE WHEN n = 1 THEN 1000
     WHEN n = 2 THEN 500
     WHEN pos = 1 OR pos = n THEN 400
     ELSE 200 // (n - 2) + CASE WHEN pos - 1 <= 200 % (n - 2) THEN 1 ELSE 0 END
END"""


@register(
    "q247_position_attribution",
    oracle=f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
  FROM t
),
p AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sess_id ORDER BY ts, event_id) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, sess_id) AS n
  FROM s
),
c AS (
  SELECT event_type, pos, n, {_Q247_CREDIT} AS credit FROM p
)
SELECT event_type,
       CAST(SUM(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       CAST(SUM(CASE WHEN pos = n AND n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
       CAST(SUM(CASE WHEN pos > 1 AND pos < n THEN 1 ELSE 0 END) AS BIGINT) AS n_middle,
       CAST(SUM(credit) AS BIGINT) AS credit_milli
FROM c
GROUP BY event_type
ORDER BY event_type
""",
)
def q247_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped attribution over q13 sessions: 400/200/400 with
    integer largest-remainder middles — every session's credit sums
    to exactly 1000 milli."""
    e = T(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | F.expr("ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
                     " > INTERVAL 30 MINUTES"),
            1,
        ).otherwise(0),
    )
    s = t.withColumn("sess_id", F.sum("new_sess").over(w))
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id", "sess_id")
    p = s.select(
        "event_type",
        F.row_number().over(ws).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    c = p.withColumn(
        "credit",
        F.expr(_Q247_CREDIT.replace("//", "div")),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("pos") == 1, 1).otherwise(0)).cast("long").alias("n_first"),
            F.sum(F.when((F.col("pos") == F.col("n")) & (F.col("n") > 1), 1).otherwise(0))
            .cast("long")
            .alias("n_last"),
            F.sum(
                F.when((F.col("pos") > 1) & (F.col("pos") < F.col("n")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_middle"),
            F.sum("credit").cast("long").alias("credit_milli"),
        )
        .orderBy("event_type")
    )
