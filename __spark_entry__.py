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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
