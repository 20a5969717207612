"""Plan-shape pins for the round-5 wave: q261's train corpus must
reach the benchmark-trigram check through a BROADCAST left-semi join
(the 100 TB side never shuffles into the join), and q262's top-V
slice must be a distributed TakeOrderedAndProject — never a global
Sort of the vocabulary."""

from __future__ import annotations

import re


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q261_train_side_joins_broadcast_semi(spark, sf_dir):
    from voz_spark.extras_r5 import q261_benchmark_decontamination

    plan = _formatted_plan(q261_benchmark_decontamination(spark, sf_dir))
    semis = re.findall(r"BroadcastHashJoin LeftSemi", plan)
    assert semis, plan
    # the train side must never be the build (shuffled/broadcast) side
    # of the semi join: no SortMergeJoin or ShuffledHashJoin LeftSemi
    assert "SortMergeJoin LeftSemi" not in plan, plan
    assert "ShuffledHashJoin LeftSemi" not in plan, plan


def test_q262_top_slice_is_takeordered_not_global_sort(spark, sf_dir):
    from voz_spark.extras_r5 import q262_vocab_coverage_curve

    plan = _formatted_plan(q262_vocab_coverage_curve(spark, sf_dir))
    # the top-V slice is TakeOrderedAndProject ordered by the token
    # count — the distributed top-k, not a global vocab sort
    take = re.search(r"TakeOrderedAndProject[^\n]*\n[^\n]*cnt", plan)
    assert "TakeOrderedAndProject" in plan, plan
    assert take or re.search(r"\(\d+\) TakeOrderedAndProject", plan), plan
    # no range-partitioned Exchange may sort the FULL vocabulary by
    # count (the global-sort signature TakeOrdered replaces); the
    # final 4-row orderBy(vocab_size) is the only range exchange
    for ex in re.findall(r"Arguments: rangepartitioning\([^)]*\)", plan):
        assert "cnt" not in ex, (ex, plan)
