"""Plan-shape regression tests for the round-3 selection/analytics
waves: the COVERAGE.md scale claims for q225/q227/q233 pinned against
the actual optimized plans (the q25 persist lesson made structural)."""

import re


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q227_boilerplate_is_zero_exchange(spark, sf_dir):
    """The in-row line classifier's plan is Scan -> Project (+ sort
    for display): no hash exchange anywhere."""
    from voz_spark.corpus_ops import q227_boilerplate_strip

    spark.catalog.clearCache()
    plan = _formatted_plan(q227_boilerplate_strip(spark, sf_dir))
    assert re.findall(r"Arguments: hashpartitioning", plan) == [], plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_q225_scoring_joins_are_broadcast(spark, sf_dir):
    """The 256-bucket distribution dims must broadcast onto the bigram
    stream: two BroadcastHashJoins, and no SortMergeJoin anywhere."""
    from voz_spark.corpus_ops import q225_target_affinity_selection

    spark.catalog.clearCache()
    plan = _formatted_plan(q225_target_affinity_selection(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2, plan
    assert re.findall(r"\(\d+\) SortMergeJoin", plan) == [], plan


def test_q233_grid_join_is_single_pass(spark, sf_dir):
    """The epsilon-neighbor join reads the events scan twice (probe +
    build sides) at most and its only hash exchanges are the cell-key
    join and the band rollup — no pair-table re-shuffle."""
    from voz_spark.relational import q233_grid_neighbor_join

    spark.catalog.clearCache()
    plan = _formatted_plan(q233_grid_neighbor_join(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2, plan
    # every hash exchange is either the cell key (pcx/cx, pcy/cy) or
    # the bounded band rollup — nothing shuffles raw pairs. Match the
    # exact column tokens (name#id) so an unrelated column merely
    # CONTAINING "cx"/"band" can't satisfy the check.
    cell_or_band = re.compile(r"\b(?:p?c[xy]|band)#\d+")
    for ex in re.findall(r"Arguments: hashpartitioning\([^)]*\)", plan):
        assert cell_or_band.search(ex), (ex, plan)
