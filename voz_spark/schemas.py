"""Fixed, declared schemas for every engine-owned table (FIXTURES.md §4).

The reference uses implicit dict/JSON schemas (src/thread_crawler.py:
336-348, pandas read_csv inference at src/detailed_analyzer.py:100);
the rebuild declares every schema once here.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


IMAGES = _s(
    ("image_id", StringType(), False),
    ("bytes", BinaryType(), True),
    ("w", IntegerType(), True),
    ("h", IntegerType(), True),
    ("fmt", StringType(), True),
    ("caption", StringType(), True),
    ("phash", LongType(), True),
)

SEEDS = _s(
    ("seed_rank", IntegerType(), False),
    ("thread_id", StringType(), False),
    ("title", StringType(), True),
    ("url", StringType(), False),
    ("author", StringType(), True),
    ("created_date", StringType(), True),
    ("reply_count", IntegerType(), True),
    ("view_count", IntegerType(), True),
    ("is_sticky", BooleanType(), True),
)

FRONTIER = _s(
    ("url", StringType(), False),
    ("base_url", StringType(), True),
    ("seed_rank", IntegerType(), False),
    ("page_no", IntegerType(), False),
    ("post_no", IntegerType(), False),
    ("attempt", IntegerType(), False),
)

SEEN = _s(
    ("url_hash", LongType(), False),
    ("canon_url", StringType(), False),
    ("first_round", IntegerType(), False),
)

SEEN_BLOOM = _s(
    ("shard_id", IntegerType(), False),
    ("nbits", LongType(), False),
    ("k", IntegerType(), False),
    ("bits", BinaryType(), False),
)

RESULTS = _s(
    ("round_id", IntegerType(), False),
    ("canon_url", StringType(), False),
    ("host", StringType(), True),
    ("seed_rank", IntegerType(), False),
    ("page_no", IntegerType(), False),
    ("post_no", IntegerType(), False),
    ("kind", StringType(), False),  # thread | page | image
    ("image_id", StringType(), True),
    ("status", StringType(), False),  # ok|gated|missing|robots|decode_error|psnr_fail|caption_mismatch
    ("psnr_db", DoubleType(), True),
    ("caption_ok", BooleanType(), True),
    ("n_children", IntegerType(), True),
)

LINEAGE = _s(
    ("round_id", IntegerType(), False),
    ("partition_id", IntegerType(), False),
    ("host", StringType(), True),
    ("n_candidates", LongType(), False),
    ("n_bloom_new", LongType(), False),
    ("n_deduped", LongType(), False),
    ("n_robots_blocked", LongType(), False),
    ("n_scheduled", LongType(), False),
    ("n_fetched", LongType(), False),
    ("n_failed", LongType(), False),
)

CHECKPOINTS = _s(
    ("round_id", IntegerType(), False),
    ("committed_at", StringType(), False),
    ("n_frontier", LongType(), False),
    ("n_seen_total", LongType(), False),
)

FETCH_FAILURES = _s(
    ("round_id", IntegerType(), False),
    ("canon_url", StringType(), False),
    ("status", StringType(), False),
    ("attempt", IntegerType(), False),
)

ROBOTS = _s(
    ("host", StringType(), False),
    ("path_prefix", StringType(), False),
    ("allowed", BooleanType(), False),
)

HOSTS = _s(
    ("host", StringType(), False),
    ("max_fetches_per_round", IntegerType(), False),
)
