"""End-to-end semantics of the posts-world analytics pipeline
(SURVEY §2.C over the synthetic corpus)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from voz_spark import analytics as A
from voz_spark.graph import build_edges, communities, degrees, graph_stats, label_propagation, pagerank
from voz_spark.sentiment import component_sentiment, context_word_counts, reception_sentiment
from voz_spark.synth_posts import gen_posts_df, gen_threads_df

N = 20


@pytest.fixture(scope="module")
def world(spark):
    posts = A.preprocess(gen_posts_df(spark, N)).cache()
    seeds = gen_threads_df(spark, N)
    threads = A.thread_analysis(posts, seeds).cache()
    sugg = A.component_suggestions(posts).cache()
    return posts, seeds, threads, sugg


def test_op_reply_split(world):
    posts, *_ = world
    split = A.op_reply_split(posts)
    ops = split.where(F.col("is_op"))
    assert ops.count() == N  # exactly one OP per thread
    assert ops.where((F.col("page_no") == 1) & (F.col("post_no") == 0)).count() == N


def test_thread_budget_title_priority(world):
    """C23: title budget must win over content budget when both exist."""
    _, seeds, threads, _ = world
    rows = threads.collect()
    assert len(rows) == N
    with_budget = [r for r in rows if r.budget is not None]
    assert len(with_budget) > N // 2
    # every title contains "ngân sách X triệu" → title budget always
    # extractable → budget equals the title's number
    from voz_spark.synth import seed_rows

    titles = {s["thread_id"]: s["title"] for s in seed_rows(N)}
    import re

    for r in with_budget:
        m = re.search(r"ngân sách (\d+) triệu", titles[r.thread_id])
        if m:
            assert r.budget == float(m.group(1)), r.thread_id


def test_budget_bins_half_open(spark):
    """C18: pd.cut(right=False) semantics — edge values land in the
    upper bucket."""
    df = spark.createDataFrame(
        [(1, 4.999), (2, 5.0), (3, 9.999), (4, 10.0), (5, 100.0), (6, 0.5)],
        "id int, b double",
    )
    got = {r.id: r.bin for r in df.select("id", A.budget_bin(F.col("b")).alias("bin")).collect()}
    assert got == {1: "0-5tr", 2: "5-10tr", 3: "5-10tr", 4: "10-15tr", 5: None, 6: "0-5tr"}


def test_budget_component_pivot_pct(world):
    *_, threads, sugg = world
    piv = A.budget_component_pivot(sugg, threads)
    pct_cols = [c for c in piv.columns if c.endswith("_pct")]
    for row in piv.collect():
        total = sum(row[c] for c in pct_cols)
        assert total == pytest.approx(100.0, abs=1e-6)


def test_top_keywords_per_group(world):
    *_, threads, sugg = world
    topk = A.top_keywords_per_group(sugg, threads)
    assert topk.where(F.col("rnk") > 3).count() == 0
    g = topk.groupBy("budget_range", "component_type").agg(F.count(F.lit(1)).alias("n"))
    assert g.where(F.col("n") > 3).count() == 0


def test_cooccurrence_ordered_pairs(world):
    *_, sugg = world
    co = A.component_cooccurrence(sugg)
    assert co.where(F.col("type_a") >= F.col("type_b")).count() == 0


def test_user_expertise_scores(world):
    *_, sugg = world
    ue = A.user_expertise(sugg)
    row = ue.orderBy(F.desc("expertise_score")).first()
    expected = (
        row.n_suggestions * 1.0
        + row.n_threads * 2.0
        + row.n_component_types * 3.0
        + row.total_likes * 0.5
        + row.total_thanks * 1.0
    )
    assert row.expertise_score == pytest.approx(expected)


def test_recommendation_matrix_nested_json(world):
    *_, threads, sugg = world
    rm = A.recommendation_matrix(sugg, threads)
    row = rm.first()
    parsed = json.loads(row.recommendations_json)
    assert isinstance(parsed, dict) and len(parsed) > 0
    inner = json.loads(next(iter(parsed.values())))
    assert {"keyword", "n", "rnk"} <= set(inner[0].keys())


def test_monthly_trend_months_sorted(world):
    *_, sugg = world
    trend = A.monthly_component_trend(sugg)
    months = [r.month for r in trend.collect()]
    assert months == sorted(months) and len(months) >= 3


def test_graph_degrees_and_pagerank(world):
    posts, *_ = world
    edges = build_edges(posts).cache()
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    d = degrees(edges)
    total_out = d.agg(F.sum("out_degree")).first()[0]
    total_in = d.agg(F.sum("in_degree")).first()[0]
    assert total_out == pytest.approx(total_in)
    pr = pagerank(edges, iterations=5)
    assert pr.agg(F.sum("rank")).first()[0] == pytest.approx(1.0, abs=1e-6)
    stats = graph_stats(edges)
    assert stats["n_nodes"] > 0 and "n_scc" in stats


def test_communities_and_label_propagation(world):
    posts, *_ = world
    edges = build_edges(posts)
    comms = communities(edges)
    assert comms.select("node").distinct().count() == comms.count()  # one community per node
    lp = label_propagation(edges, iterations=3)
    assert lp.count() > 0


def test_sentiment_surfaces(world):
    *_, sugg = world
    cs = component_sentiment(sugg)
    assert "mean_subjectivity" in cs.columns  # both TextBlob outputs surfaced
    for r in cs.collect():
        assert -1.0 <= r.mean_polarity <= 1.0
        assert 0.0 <= r.mean_subjectivity <= 1.0
    rs = reception_sentiment(sugg)
    assert rs.count() <= 4  # boolean pair grid
    wc = context_word_counts(sugg, k=10)
    assert wc.count() <= 10


def test_price_suggestions_in_range(world):
    posts, *_ = world
    prices = A.price_suggestions(posts)
    bad = prices.where((F.col("price") < 0.1) | (F.col("price") > 50)).count()
    assert bad == 0 and prices.count() > 0


# ---------------------------------------------------------------- q195/q196


def test_q195_cube_margins_consistent(spark, sf_dir):
    """The lattice must be self-consistent: cell rows sum to their row
    margin, row margins sum to the grand total, and gid encodes the
    level."""
    from voz_spark.relational import q195_dimension_cube

    rows = q195_dimension_cube(spark, sf_dir).collect()
    cells = [r for r in rows if r["gid"] == 0]
    flag_m = {r["returnflag"]: r for r in rows if r["gid"] == 1}
    status_m = {r["linestatus"]: r for r in rows if r["gid"] == 2}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert sum(c["n_rows"] for c in cells) == grand[0]["n_rows"]
    for f, m in flag_m.items():
        assert m["linestatus"] == "(all)"
        assert sum(c["n_rows"] for c in cells if c["returnflag"] == f) == m["n_rows"]
    for s, m in status_m.items():
        assert m["returnflag"] == "(all)"
        assert sum(c["n_rows"] for c in cells if c["linestatus"] == s) == m["n_rows"]


def test_q196_set_identities(spark, sf_dir):
    """INTERSECT and EXCEPT must satisfy the set identities against an
    independent Python-set replay: both ∪ only_high == hi,
    both ∩ only_high == ∅."""
    from voz_spark.relational import q196_set_algebra
    from voz_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    o = {
        r["o_orderkey"]: r["o_orderpriority"]
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    hi = {r["l_partkey"] for r in li if o[r["l_orderkey"]] in ("1-URGENT", "2-HIGH")}
    lo = {r["l_partkey"] for r in li if o[r["l_orderkey"]] == "5-LOW"}
    rows = q196_set_algebra(spark, sf_dir).collect()
    both = {r["partkey"] for r in rows if r["relation"] == "both"}
    only = {r["partkey"] for r in rows if r["relation"] == "only_high"}
    assert both == hi & lo
    assert only == hi - lo
    assert both | only == hi and not (both & only)


# ---------------------------------------------------------------- q197/q198


def test_q197_bucketed_equals_bruteforce_range_join(spark, sf_dir):
    """The bucket-equi-join + in-row predicate must produce exactly
    the brute-force point-in-interval matches, including intervals
    that straddle bucket boundaries."""
    from voz_spark.relational import q197_bucketed_range_join
    from voz_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect()
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    base: dict[int, int] = {}
    pts: dict[int, list] = {}
    for r in orders:
        g = r["o_custkey"] % 19
        od_ = r["o_orderdate"]
        if isinstance(od_, dt.datetime):
            od_ = od_.date()
        d = (od_ - epoch).days
        base[g] = min(base.get(g, 10**9), d)
        pts.setdefault(g, []).append((d, r["o_orderkey"]))
    want = {}
    for g, items in pts.items():
        lo = base[g] + g
        hi = lo + 8 + g % 7
        hits = [k for d, k in items if lo <= d <= hi]
        if hits:
            want[g] = (len(hits), min(hits), max(hits))
    rows = {r["grp"]: (r["n_in_window"], r["first_order"], r["last_order"])
            for r in q197_bucketed_range_join(spark, sf_dir).collect()}
    assert rows == want


def test_q198_reconciliation_covers_both_sides(spark, sf_dir):
    """Every order date and every ship date appears exactly once; the
    status column names unmatched sides correctly and counts match
    direct per-date counts."""
    from voz_spark.relational import q198_fullouter_reconcile
    from voz_spark.session import load_table

    od: dict = {}
    for r in load_table(spark, sf_dir, "orders").select("o_orderdate").collect():
        od[r[0]] = od.get(r[0], 0) + 1
    sd: dict = {}
    for r in load_table(spark, sf_dir, "lineitem").select("l_shipdate").collect():
        sd[r[0]] = sd.get(r[0], 0) + 1
    rows = {r["d"]: r for r in q198_fullouter_reconcile(spark, sf_dir).collect()}
    assert set(rows) == set(od) | set(sd)
    for d, r in rows.items():
        assert r["n_orders"] == od.get(d, 0)
        assert r["n_ship"] == sd.get(d, 0)
        want = "both" if d in od and d in sd else ("intake_only" if d in od else "ship_only")
        assert r["status"] == want
    assert {r["status"] for r in rows.values()} >= {"both", "ship_only"}
