"""Distributed cuckoo seen-index: the deletion-capable seen filter.

Companion to the bloom shards (voz_spark/bloom.py + the state plumbing
in rounds.py): same ``pmod(url_hash, n_shards)`` shard routing, same
one-blob-row-per-shard persistence shape, same membership contract
(``maybe_seen`` with no false negatives, exact anti-join backstop).
What it adds over bloom is O(1) *removal*: recrawling a stale host or
expiring URLs shrinks the seen set, and a bloom can only follow by
rebuilding every touched shard from the authoritative ``seen`` table,
while the cuckoo filter deletes fingerprints in place.

Reference analogue: the reference invalidates cache entries by deleting
cache files (``src/thread_crawler.py:46-59`` checks file existence per
thread; removing the file makes the thread crawlable again). This
module is that semantics at 10^10 scale.

Scale shape (mirrors bloom exactly):
- build/update/delete: shard-aligned ``applyInPandas``/cogroup — one
  shuffle on shard_id, each task touches exactly one shard's table;
- membership: broadcast scalar pandas UDF below the broadcast ceiling,
  shard-aligned cogroup beyond it;
- capacity: tables are sized per shard at build time
  (``n_buckets_for``); incremental adds track occupancy (``n_keys``
  persisted per blob row) and a shard crossing its load limit is
  rebuilt at the next power of two FROM ITS OWN seen-partition rows,
  which the update cogroup already has — no driver collect, no global
  rebuild.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from voz_spark import cuckoo as C

SEEN_CUCKOO = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("n_buckets", IntegerType(), False),
        StructField("n_keys", LongType(), False),
        StructField("table", BinaryType(), False),
    ]
)

# rebuild a shard when occupancy would cross this fraction of slots
MAX_LOAD = 0.84


def _to_table(blob: bytes) -> np.ndarray:
    a = np.frombuffer(blob, dtype=np.uint16).copy()
    return a.reshape(len(a) // C.SLOTS, C.SLOTS)


def build_from_seen(seen: DataFrame, n_shards: int) -> DataFrame:
    """Distributed build: one perfectly-sized cuckoo table per shard."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        h = pdf["url_hash"].to_numpy().astype(np.uint64)
        t = C.empty_table(C.n_buckets_for(len(h), MAX_LOAD))
        C.add_hashes(t, h)
        return pd.DataFrame(
            [
                {
                    "shard_id": sid,
                    "n_buckets": t.shape[0],
                    "n_keys": len(h),
                    "table": t.tobytes(),
                }
            ]
        )

    return (
        seen.select(
            F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard_id"),
            "url_hash",
        )
        .groupBy("shard_id")
        .applyInPandas(build, SEEN_CUCKOO)
    )


def updated(seen_plus_new: DataFrame, new_seen: DataFrame, state: DataFrame,
            n_shards: int) -> DataFrame:
    """Incremental add with targeted capacity rebuilds, no driver collect.

    ``new_seen``'s hashes cogroup with the state per shard: a shard with
    headroom gets an in-place vectorized insert; a shard that would
    cross MAX_LOAD is rebuilt at the required size from
    ``seen_plus_new`` (its FULL post-round key set for that shard),
    which joins in through the same cogroup — the rebuild reads only
    the overflowing shards' rows (shard-aligned semi-join), so the cost
    is proportional to what actually overflowed.
    """
    shard = lambda df: df.select(  # noqa: E731
        F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard_id"),
        "url_hash",
    )

    def add(new_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(new_pdf) == 0:
            return blob_pdf[["shard_id", "n_buckets", "n_keys", "table"]]
        sid = int(new_pdf["shard_id"].iloc[0])
        h = new_pdf["url_hash"].to_numpy().astype(np.uint64)
        if len(blob_pdf):
            n_keys = int(blob_pdf["n_keys"].iloc[0]) + len(h)
            t = _to_table(blob_pdf["table"].iloc[0])
        else:
            n_keys = len(h)
            t = C.empty_table(C.n_buckets_for(n_keys, MAX_LOAD))
        if n_keys > t.shape[0] * C.SLOTS * MAX_LOAD:
            # over capacity: emit an empty-table marker (n_buckets=0);
            # the rebuild pass below replaces it from the full key set
            return pd.DataFrame(
                [{"shard_id": sid, "n_buckets": 0, "n_keys": n_keys, "table": b""}]
            )
        C.add_hashes(t, h)
        return pd.DataFrame(
            [
                {
                    "shard_id": sid,
                    "n_buckets": t.shape[0],
                    "n_keys": n_keys,
                    "table": t.tobytes(),
                }
            ]
        )

    added = (
        shard(new_seen)
        .groupBy("shard_id")
        .cogroup(state.groupBy("shard_id"))
        .applyInPandas(add, SEEN_CUCKOO)
    )
    ok = added.where(F.col("n_buckets") > 0)
    overflow = added.where(F.col("n_buckets") == 0).select("shard_id")
    rebuilt = build_from_seen(
        shard(seen_plus_new)
        .join(overflow.hint("broadcast"), "shard_id", "left_semi")
        .select("url_hash"),
        n_shards,
    )
    return ok.unionByName(rebuilt)


def deleted(removed: DataFrame, state: DataFrame, n_shards: int) -> DataFrame:
    """O(1)-per-key removal — the operation blooms cannot do."""

    def rm(rm_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(rm_pdf) == 0 or len(blob_pdf) == 0:
            return blob_pdf[["shard_id", "n_buckets", "n_keys", "table"]]
        t = _to_table(blob_pdf["table"].iloc[0])
        h = rm_pdf["url_hash"].to_numpy().astype(np.uint64)
        found = C.delete_hashes(t, h)
        return pd.DataFrame(
            [
                {
                    "shard_id": int(blob_pdf["shard_id"].iloc[0]),
                    "n_buckets": t.shape[0],
                    "n_keys": int(blob_pdf["n_keys"].iloc[0]) - int(found.sum()),
                    "table": t.tobytes(),
                }
            ]
        )

    return (
        removed.select(
            F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard_id"),
            "url_hash",
        )
        .groupBy("shard_id")
        .cogroup(state.groupBy("shard_id"))
        .applyInPandas(rm, SEEN_CUCKOO)
    )


def blobs_from(state: DataFrame) -> dict[int, bytes]:
    return {int(r.shard_id): bytes(r.table) for r in state.collect()}


def split_broadcast(
    spark: SparkSession, df: DataFrame, shard_blobs: dict[int, bytes], n_shards: int
) -> DataFrame:
    """maybe_seen via broadcast tables — small-state fast path."""
    if not shard_blobs:
        return df.withColumn("maybe_seen", F.lit(False))
    bc = spark.sparkContext.broadcast(shard_blobs)

    @pandas_udf("boolean")
    def cuckoo_udf(hashes: pd.Series) -> pd.Series:
        h = hashes.to_numpy().astype(np.uint64)
        shards = (h.astype(np.int64) % n_shards + n_shards) % n_shards
        out = np.zeros(len(h), dtype=bool)
        blobs = bc.value
        for sid in np.unique(shards):
            blob = blobs.get(int(sid))
            if blob is None:
                continue
            mask = shards == sid
            out[mask] = C.maybe_contains(_to_table(blob), h[mask])
        return pd.Series(out)

    return df.withColumn("maybe_seen", cuckoo_udf("url_hash"))


def split_cogroup(df: DataFrame, state: DataFrame, n_shards: int) -> DataFrame:
    """maybe_seen via shard-aligned cogroup — the beyond-broadcast path."""
    cand = df.withColumn("_shard", F.pmod("url_hash", F.lit(n_shards)).cast("int"))
    out_schema = StructType(
        list(df.schema.fields) + [StructField("maybe_seen", BooleanType(), False)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def test(cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf[in_cols].copy()
        if len(blob_pdf) == 0:
            out["maybe_seen"] = False
            return out
        t = _to_table(blob_pdf["table"].iloc[0])
        out["maybe_seen"] = C.maybe_contains(
            t, cand_pdf["url_hash"].to_numpy().astype(np.uint64)
        )
        return out

    return (
        cand.groupBy("_shard")
        .cogroup(state.groupBy("shard_id"))
        .applyInPandas(test, out_schema)
    )
