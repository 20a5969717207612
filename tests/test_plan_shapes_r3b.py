"""Plan-shape regression tests for the sketch/index/advisor waves
(q202-q214): the PLANS.md scale claims pinned against the actual
optimized plans."""

import re


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_parquet_scans(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_q202_sketch_join_is_broadcast(spark, sf_dir):
    """The candidate-estimate join streams candidates against the
    BROADCAST 1,024-row sketch — the sketch side must never shuffle."""
    from voz_spark.crawlops import q202_countmin_heavy_hitters

    plan = _formatted_plan(q202_countmin_heavy_hitters(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the build relation fed to broadcast is the (depth, cell) sketch
    assert re.search(r"BroadcastExchange", plan)


def test_q203_single_digit_scans(spark, sf_dir):
    """Strategy and role fan-outs are in-row explodes, not unions:
    the whole audit reads the events parquet at most twice (loads
    pass + incidence pass), never 4x."""
    from voz_spark.crawlops import q203_edge_partition_audit

    plan = _formatted_plan(q203_edge_partition_audit(spark, sf_dir))
    assert _n_parquet_scans(plan) <= 2, plan


def test_q204_scan_prunes_to_two_columns(spark, sf_dir):
    """The posting build reads ONLY (doc_id, text) — a scan that
    drags the full documents schema through the explode is wrong."""
    from voz_spark.corpus_ops import q204_inverted_index_search

    plan = _formatted_plan(q204_inverted_index_search(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, cols


def test_q206_single_scan(spark, sf_dir):
    """The 4 (layout, col) branches are one in-row explode over ONE
    lineitem scan — a 4-way union re-reading the table 4x is the
    regression this pins."""
    from voz_spark.storage import q206_encoding_advisor

    plan = _formatted_plan(q206_encoding_advisor(spark, sf_dir))
    assert _n_parquet_scans(plan) == 1, plan


def test_q209_mcv_uses_take_ordered_not_global_window(spark, sf_dir):
    """MCV top-10 extraction compiles to TakeOrderedAndProject
    (per-partition top-k + merge) — a global row_number window over
    10^8 distinct keys is the shape this pins out."""
    from voz_spark.relational import q209_join_cardinality_estimate

    plan = _formatted_plan(q209_join_cardinality_estimate(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan, plan


def test_q211_built_filter_is_persisted(spark, sf_dir):
    """The set-bits table feeds both the membership join and the fill
    count; it must come from one InMemoryRelation, not two rebuilds
    of the distinct (the q25/q81 lesson)."""
    from voz_spark.crawlops import q211_bloom_sizing_sweep

    plan = _formatted_plan(q211_bloom_sizing_sweep(spark, sf_dir))
    assert "InMemoryTableScan" in plan
