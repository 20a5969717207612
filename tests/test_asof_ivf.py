"""As-of join (relational.asof_join / q50) and IVF ANN (dataprep q49).

The registry-wide oracle-parity test already pins both against DuckDB
(q50 against DuckDB's native ASOF JOIN — an independent implementation
of the semantics). This file pins what the oracle sweep can't show:
the exact boundary/no-match/latest-wins rules of the as-of operator on
hand-built frames, and the ANN quality of the IVF index (recall
against the exact brute-force top-k).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from voz_spark.relational import asof_join


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def test_asof_boundary_no_match_latest_wins(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t(5)),   # after both orders -> latest (day 3) wins
            (2, 10, _t(2)),   # between -> day 1
            (3, 10, _t(1)),   # EXACTLY at the day-1 order -> matches it (>=)
            (4, 20, _t(9)),   # key with no right rows -> null
            (5, 30, _t(1)),   # before this key's only order (day 2) -> null
        ],
        "event_id long, key long, t timestamp",
    )
    right = spark.createDataFrame(
        [(10, _t(1), 100), (10, _t(3), 101), (30, _t(2), 300)],
        "key long, t timestamp, ref long",
    )
    out = {
        r.event_id: (r["_asof"]["ref"] if r["_asof"] is not None else None)
        for r in asof_join(left, right, key="key", t="t").collect()
    }
    assert out == {1: 101, 2: 100, 3: 100, 4: None, 5: None}


def test_asof_carries_right_timestamp(spark):
    """The matched right row's own t rides along as _asof._rt (q50
    derives days_since_order from it)."""
    left = spark.createDataFrame([(1, 7, _t(9))], "event_id long, key long, t timestamp")
    right = spark.createDataFrame([(7, _t(4), 1)], "key long, t timestamp, ref long")
    row = asof_join(left, right, key="key", t="t").collect()[0]
    assert row["_asof"]["_rt"] == _t(4)
    assert row["t"] == _t(9)  # the left timestamp is untouched


def test_triangle_count_matches_naive_triple_join(spark):
    """q55's degree-oriented count vs an INDEPENDENT naive a<b<c
    triple self-join in DuckDB (a third implementation, different from
    both the Spark plan and the oracle's oriented SQL)."""
    import duckdb

    from voz_spark.relational import q55_triangle_count

    sf = "/root/testdata/sf0.001"
    row = q55_triangle_count(spark, sf).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    naive = con.execute(
        """
WITH ob AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v FROM ob a JOIN ob b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT COUNT(*) FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""
    ).fetchone()[0]
    assert row.n_triangles == naive


def test_ivf_recall_vs_brute_force(spark):
    """IVF at NPROBE=4 of K=16 lists must recover ≥85% of the exact
    brute-force top-5 neighbor set (measured 0.94 at sf0.001 — the
    deterministic synthetic embeddings are label-clustered, the case
    IVF is built for)."""
    from voz_spark.dataprep import q29_embedding_topk, q49_ann_ivf

    sf = "/root/testdata/sf0.001"
    exact = {(r.qid, r.nid) for r in q29_embedding_topk(spark, sf).collect()}
    ivf = {(r.qid, r.nid) for r in q49_ann_ivf(spark, sf).collect()}
    assert exact  # non-degenerate
    assert len(exact & ivf) / len(exact) >= 0.85


def test_ivf_probes_subset_of_corpus(spark):
    """The IVF search must only score candidates from the probed
    lists: every returned neighbor's assigned centroid is one of its
    query's NPROBE probe lists (the plan never touches other lists)."""
    from voz_spark.dataprep import _IVF_K, _IVF_NPROBE, _cos
    from voz_spark.session import load_table as T

    sf = "/root/testdata/sf0.001"
    from pyspark.sql.window import Window

    from voz_spark.dataprep import q49_ann_ivf

    emb = T(spark, sf, "embeddings")
    cent = emb.where(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    e = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"))
    aw = Window.partitionBy("nid").orderBy(F.desc(F.expr(_cos("ne", "ce"))), "cid")
    assigned = {
        r.nid: r.cid
        for r in e.crossJoin(F.broadcast(cent))
        .withColumn("arnk", F.row_number().over(aw))
        .where(F.col("arnk") == 1)
        .select("nid", "cid")
        .collect()
    }
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pw = Window.partitionBy("qid").orderBy(F.desc(F.expr(_cos("qe", "ce"))), "cid")
    probes: dict[int, set[int]] = {}
    for r in (
        q.crossJoin(F.broadcast(cent))
        .withColumn("prnk", F.row_number().over(pw))
        .where(F.col("prnk") <= _IVF_NPROBE)
        .select("qid", "cid")
        .collect()
    ):
        probes.setdefault(r.qid, set()).add(r.cid)
    for r in q49_ann_ivf(spark, sf).collect():
        assert assigned[r.nid] in probes[r.qid]


def test_q130_pq_selfcoding_and_recall(spark, sf_dir):
    """PQ invariants: (1) each codebook-source vector encodes to its
    own codeword in every block (its block distance to itself is 0);
    (2) ADC top-10 keeps a sane overlap with the exact dot-product
    top-10 — untrained 4-bit-per-block codes on isotropic synthetic
    vectors are the hardest case, so the floor is modest (real
    deployments train the codebook; the dataflow shape is identical)."""
    import numpy as np

    from voz_spark.dataprep import (
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _PQ_NQ,
        q130_pq_adc_search,
    )
    from voz_spark.relational import T
    from pyspark.sql import functions as F

    emb = T(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    V = np.array([np.array(r.embedding, dtype=np.float64) for r in rows])
    got = q130_pq_adc_search(spark, sf_dir).collect()

    # (1) self-coding: re-derive codes the same way and check the
    # codebook rows' codes are the identity
    cb = V[:_PQ_K].reshape(_PQ_K, _PQ_M, _PQ_D)
    for k in range(_PQ_K):
        for j in range(_PQ_M):
            d = (
                ((cb[k, j][None, :] - cb[:, j, :]) ** 2).sum(-1).round(6)
            )
            assert d.argmin() == k

    # (2) recall floor vs exact dot product
    recalls = []
    by_q: dict[int, list[int]] = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r.nid)
    assert set(by_q) == set(range(_PQ_NQ))
    for q in range(_PQ_NQ):
        dots = V @ V[q]
        order = [i for i in np.argsort(-dots, kind="stable") if i != q][:10]
        recalls.append(len(set(order) & set(by_q[q])) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.2, recalls
