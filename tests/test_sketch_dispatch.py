"""q155 HyperLogLog + q156 dispatch planner semantics.

q155: the Spark register computation must match a pure-Python HLL
bit-for-bit (same md5-based hash split), registers must MERGE by
element-wise max, and the estimate must actually estimate.

q156: the closed-form window formulation must equal the sequential
token-bucket recurrence d_i = max(a_i, d_{i-1} + gap) row-for-row on
a DENSE arrival fixture (the sf0.01 events table is politeness-sparse
— every wait is 0 there — so the recurrence's waiting branch is only
exercised here).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------- q155


def _py_hll_registers(values):
    """Pure-Python mirror of the q155 register rule: 60-bit md5 hash,
    j = h % 64, rank = 55 - bitlength(h // 64) (55 for zero payload)."""
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j = h % 64
        w = h >> 6
        rank = 55 if w == 0 else 55 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rank)
    return regs


def _spark_hll_registers(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "user_id long")
    h = df.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    r = h.select(
        F.pmod(F.col("h"), F.lit(64)).alias("register"),
        F.when(F.shiftright(F.col("h"), 6) == 0, F.lit(55))
        .otherwise(
            F.lit(55)
            - F.length(F.conv(F.shiftright(F.col("h"), 6).cast("string"), 10, 2))
        )
        .cast("int")
        .alias("m"),
    )
    rows = r.groupBy("register").agg(F.max("m").alias("m")).collect()
    return {int(row["register"]): int(row["m"]) for row in rows}


def test_hll_registers_match_pure_python(spark):
    values = list(range(1, 2001))
    assert _spark_hll_registers(spark, values) == _py_hll_registers(values)


def test_hll_registers_merge_by_max(spark):
    a = _py_hll_registers(range(1, 1001))
    b = _py_hll_registers(range(500, 1500))
    union = _py_hll_registers(range(1, 1500))
    merged = {j: max(a.get(j, 0), b.get(j, 0)) for j in set(a) | set(b)}
    assert merged == union


def test_hll_estimate_accuracy(spark, sf_dir):
    from voz_spark.dataprep import q155_hll_distinct

    import math

    rows = q155_hll_distinct(spark, sf_dir).collect()
    assert rows
    for row in rows:
        n, est, empty = row["n_exact"], row["hll_estimate"], row["n_empty"]
        assert 0 <= empty <= 64
        # the engine ships the raw estimate + n_empty; the consumer
        # applies Flajolet's linear-counting correction in the small
        # range (raw <= 2.5m with empty registers) — done here, since
        # ln is deliberately kept out of the engine for bit-portability
        if est <= 2.5 * 64 and empty > 0:
            est = 64 * math.log(64 / empty)
        # m=64 -> standard error 1.04/sqrt(64) = 13%; allow 4 sigma
        assert abs(est - n) <= max(0.52 * n, 8), (n, est)


# ---------------------------------------------------------------- q156


def _sequential_dispatch(rows):
    """Naive per-host token-bucket: d_i = max(a_i, d_prev + gap)."""
    out = {}
    last = {}
    for host, event_id, arr, gap in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        d = arr if host not in last else max(arr, last[host] + gap)
        last[host] = d
        out[(host, event_id)] = d
    return out


def test_dispatch_plan_equals_sequential_recurrence(spark):
    # dense fixture: 3 hosts, arrivals bunched well inside the gap so
    # the waiting branch dominates; includes exact ties on arrival
    rows = []
    eid = 0
    for host, gap in ((0, 1_000_000), (1, 2_000_000), (2, 500_000)):
        for k in range(40):
            eid += 1
            arr = 1_000_000_000 + (k // 3) * 300_000  # 3 arrivals per burst
            rows.append((host, eid, arr, gap))
    df = spark.createDataFrame(
        rows, "host long, event_id long, arr_us long, gap_us long"
    )
    w = Window.partitionBy("host").orderBy("arr_us", "event_id")
    r = df.withColumn("i", (F.row_number().over(w) - 1).cast("long"))
    runmax = F.max(F.col("arr_us") - F.col("gap_us") * F.col("i")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (row["host"], row["event_id"]): row["d"]
        for row in r.withColumn(
            "d", (F.col("gap_us") * F.col("i") + runmax).cast("long")
        ).collect()
    }
    want = _sequential_dispatch(rows)
    assert got == want
    # and the waiting branch really fired
    waits = [
        want[(h, e)] - a for h, e, a, _ in rows if want[(h, e)] > a
    ]
    assert len(waits) > 50


def test_dispatch_plan_invariants(spark, sf_dir):
    from voz_spark.crawlops import q156_dispatch_plan

    df = q156_dispatch_plan(spark, sf_dir)
    assert df.where(F.col("dispatch_us") < F.col("arr_us")).count() == 0
    w = Window.partitionBy("host").orderBy("dispatch_us", "event_id")
    gaps = (
        df.withColumn("prev", F.lag("dispatch_us").over(w))
        .where(F.col("prev").isNotNull())
        .withColumn("gap", F.col("dispatch_us") - F.col("prev"))
        .withColumn("req", (F.col("host") % 5 + 1) * 1_000_000)
    )
    assert gaps.where(F.col("gap") < F.col("req")).count() == 0
