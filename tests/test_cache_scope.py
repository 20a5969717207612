"""Cache-scope contract (VERDICT r3 item 4): after a harness
materializes a query's result and calls registry.release_caches, NO
cached blocks remain — a long-lived session running all 247 queries
stays flat in storage memory instead of leaning on LRU eviction."""

from __future__ import annotations

from voz_spark.registry import all_queries, release_caches

# the three persist-heaviest families: LSH candidate pairs (q25),
# the prefix-filter exact join (q223, three persists), and the
# six-gate image funnel (q182, persisted first-fail table)
_PERSIST_HEAVY = [
    "q25_lsh_candidate_pairs",
    "q223_prefix_filter_join",
    "q182_image_corpus_build",
]


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_release_caches_empties_the_store(spark, sf_dir):
    qs = all_queries()
    for name in _PERSIST_HEAVY:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # materialize
        assert _n_cached(spark) > 0, f"{name}: expected query-local persists"
        release_caches(spark)
        assert _n_cached(spark) == 0, f"{name}: cached blocks leaked"


def test_release_caches_idempotent_on_empty_store(spark):
    release_caches(spark)
    assert release_caches(spark) == 0
