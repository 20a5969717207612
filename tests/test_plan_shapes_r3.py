"""Plan-shape regression tests for the round-3 crawl-ops wave: the
PLANS.md scale claims pinned against the actual optimized plans, so a
refactor that silently reintroduces a shuffle (the round-1 q25 lesson)
fails loudly."""

import re


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _hash_exchanges(plan: str) -> list[str]:
    return re.findall(r"Arguments: hashpartitioning\([^)]*\)", plan)


def _exchange_inputs(plan: str) -> list[str]:
    """The Input column list of every Exchange node in the formatted
    plan's detail section."""
    out = []
    for m in re.finditer(r"\(\d+\) Exchange\n(?:Input \[\d+\]: (\[[^\]]*\]))", plan):
        out.append(m.group(1))
    return out


def test_q169_frontier_shuffles_exactly_once(spark, sf_dir):
    """The spill-tier plan's ONLY hash exchange over frontier-sized
    data is the priority histogram; the events scan is not re-read."""
    from voz_spark.crawlops import q169_frontier_spill_tiers

    # hermetic plan: an earlier test may have left the bin table
    # cached, which folds the asserted exchange into a pre-existing
    # InMemoryRelation's inner final plan and breaks the counts
    spark.catalog.clearCache()
    plan = _formatted_plan(q169_frontier_spill_tiers(spark, sf_dir))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    frontier_exchanges = re.findall(r"hashpartitioning\(p#", plan)
    assert len(frontier_exchanges) == 1, plan
    # both the cutoff branch and the tier rollup read the cached bins
    assert len(re.findall(r"\(\d+\) InMemoryTableScan", plan)) == 2, plan


def test_q171_gate_is_shuffle_free_before_the_sort(spark, sf_dir):
    """The mojibake gate must stay in-row: no hash exchange anywhere —
    the only exchange is the display sort's range partitioning."""
    from voz_spark.crawlops import q171_mojibake_gate

    plan = _formatted_plan(q171_mojibake_gate(spark, sf_dir))
    assert _hash_exchanges(plan) == [], plan
    assert len(re.findall(r"Arguments: rangepartitioning", plan)) == 1, plan


def test_q167_html_never_shuffles(spark, sf_dir):
    """Alt-text mining may shuffle tag-derived columns only: no
    Exchange in the plan carries the html column."""
    from voz_spark.crawlops import q167_alt_text_mining

    plan = _formatted_plan(q167_alt_text_mining(spark, sf_dir))
    inputs = _exchange_inputs(plan)
    assert inputs, plan  # the vote aggregate must exist
    for cols in inputs:
        assert "html" not in cols, plan


def test_q168_host_fold_partials_combine(spark, sf_dir):
    """The DNS plan folds the frontier with a map-side partial (two
    HashAggregates around one exchange) and rolls up on the bounded
    (shard, state) key — exactly two hash exchanges, one scan."""
    from voz_spark.crawlops import q168_dns_prefetch_plan

    plan = _formatted_plan(q168_dns_prefetch_plan(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(_hash_exchanges(plan)) == 2, plan
    # partial + final pairs: at least 4 HashAggregate nodes
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4, plan
