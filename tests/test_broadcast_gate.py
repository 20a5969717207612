"""q82/q84 frequency-table broadcasts are SIZE-GATED (VERDICT r2 #1).

The hint must come from the MEASURED row count of the derived
frequency table — never hard-coded — mirroring the bloom
broadcast/cogroup dispatch (frontier.py:230-273): below the gate the
score join broadcasts; above it the join is left unhinted and runs as
a shuffle join. Both physical strategies must return identical rows
(the DuckDB oracle pins the values either way).
"""

from __future__ import annotations

import pytest

from voz_spark.corpus_ops import (
    _FREQ_BROADCAST_MAX_ROWS_CONF,
    q82_unigram_rarity,
    q84_bigram_fluency,
)
from voz_spark.oracle_compare import compare
from voz_spark.registry import REGISTRY, all_queries


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class _confs:
    """Set/restore session confs around a block."""

    def __init__(self, spark, **kv):
        self.spark = spark
        self.kv = {k.replace("__", "."): v for k, v in kv.items()}

    def __enter__(self):
        self.prev = {}
        for k, v in self.kv.items():
            try:
                self.prev[k] = self.spark.conf.get(k)
            except Exception:
                self.prev[k] = None
            self.spark.conf.set(k, v)

    def __exit__(self, *a):
        for k, v in self.prev.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


@pytest.mark.parametrize("qfn", [q82_unigram_rarity, q84_bigram_fluency])
def test_freq_join_strategy_flips_with_gate(spark, sf_dir, qfn):
    # auto-broadcast off so the ONLY possible BroadcastHashJoin is the
    # explicitly hinted one — isolates the gate's decision
    with _confs(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        below = _formatted_plan(qfn(spark, sf_dir))
        assert "BroadcastHashJoin" in below, below

        with _confs(spark, **{_FREQ_BROADCAST_MAX_ROWS_CONF: "0"}):
            above = _formatted_plan(qfn(spark, sf_dir))
        assert "BroadcastHashJoin" not in above, above
        assert "SortMergeJoin" in above, above


@pytest.mark.parametrize("name", ["q82_unigram_rarity", "q84_bigram_fluency"])
def test_shuffle_path_matches_oracle(spark, sf_dir, name):
    """Past the gate the physical strategy changes but the rows must
    not: run the UNHINTED (shuffle-join) path against the same DuckDB
    oracle that pins the broadcast path."""
    all_queries()
    q = REGISTRY[name]
    with _confs(spark, **{_FREQ_BROADCAST_MAX_ROWS_CONF: "0"}):
        df = q.fn(spark, sf_dir)
        ok, msg = compare(df, q.oracle, sf_dir)
    assert ok, f"{name} (shuffle path): {msg}"


def test_max_retries_must_fit_attempt_pack():
    """The in-batch dedup packs attempt into ATTEMPT_BITS of its
    hash-aggregable key; a config whose retry budget overflows that
    field must fail loudly at construction."""
    from voz_spark.config import ATTEMPT_BITS, CrawlConfig

    CrawlConfig(max_retries=1 << ATTEMPT_BITS)  # boundary ok
    with pytest.raises(ValueError, match="ATTEMPT_BITS"):
        CrawlConfig(max_retries=(1 << ATTEMPT_BITS) + 1)
