"""Semantic invariants for the corpus-governance ops (q77–q83) beyond
their bit-exact oracle parity (tests/test_oracle_parity.py covers
that): these pin the properties a user relies on — pseudonym
stability, score monotonicity, exactly-one-canonical-per-cluster —
which a value-hash alone doesn't explain when it breaks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_CORRECT
from voz_spark.registry import all_queries

# sf0.01 by default (large enough for non-vacuous assertions), but
# honor the same override every other test module goes through
SF = os.environ.get("VOZ_TEST_SF_DIR", SF_CORRECT)


def test_pseudonyms_are_stable_and_distinct(spark):
    qs = all_queries()
    df = qs["q77_pii_pseudonymize"](spark, SF).cache()
    n = df.count()
    # one row per customer, pseudonyms collision-free at this scale,
    # and no raw c_name column survives into the output schema
    assert df.select("c_custkey").distinct().count() == n
    assert df.select("pseudonym").distinct().count() == n
    assert "c_name" not in df.columns
    # deterministic: a second run produces the identical mapping
    again = qs["q77_pii_pseudonymize"](spark, SF)
    assert df.select("c_custkey", "pseudonym").exceptAll(
        again.select("c_custkey", "pseudonym")
    ).count() == 0
    df.unpersist()


def test_mixture_weights_normalize_and_flatten(spark):
    qs = all_queries()
    rows = qs["q79_mixture_weights"](spark, SF).collect()
    raw = sum(r.raw_share for r in rows)
    alpha = sum(r.alpha_weight for r in rows)
    assert abs(raw - 1.0) < 1e-3 and abs(alpha - 1.0) < 1e-3
    # temperature sampling flattens the mix: the largest stratum's
    # share shrinks, the smallest stratum's share grows
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.alpha_weight < big.raw_share
    assert small.alpha_weight > small.raw_share


def test_semantic_dedup_one_canonical_per_bucket(spark):
    qs = all_queries()
    df = qs["q80_semantic_dedup"](spark, SF).cache()
    per_bucket = df.groupBy("bucket").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.count(F.lit(1)).alias("n_rows"),
        F.first("n_bucket").alias("n_bucket"),
    )
    bad = per_bucket.where(
        (F.col("n_canon") != 1) | (F.col("n_rows") != F.col("n_bucket"))
    ).count()
    assert bad == 0
    # the canonical member has the minimum centroid distance in its bucket
    w = df.groupBy("bucket").agg(F.min("dist2").alias("min_d"))
    mism = (
        df.where("is_canonical")
        .join(w, "bucket")
        .where(F.col("dist2") != F.col("min_d"))
        .count()
    )
    assert mism == 0
    df.unpersist()


def test_dup_span_fraction_bounds_and_symmetry(spark):
    qs = all_queries()
    rows = qs["q81_dup_span_fraction"](spark, SF).collect()
    assert rows, "synthetic corpus contains shared spans"
    for r in rows:
        assert 0 < r.n_dup_spans <= r.n_spans
        assert 0.0 < r.dup_frac <= 1.0
    # a duplicated span involves >=2 docs, so flagged docs come in groups
    assert len(rows) >= 2


def test_crossmodal_audit_matches_neardup_pairs(spark):
    qs = all_queries()
    pairs = qs["q28_simhash_neardup_pairs"](spark, SF)
    audit = qs["q83_crossmodal_audit"](spark, SF)
    n_pairs = pairs.count()
    assert n_pairs > 0, "near-dup pair table must be non-empty for a meaningful audit"
    assert audit.count() == n_pairs
    # cosine in [-1, 1]
    assert audit.where((F.col("cosine") < -1.0) | (F.col("cosine") > 1.0)).count() == 0


def test_corpus_build_composes_gate_dedup_sample(spark, sf_dir):
    """q87's manifest must be consistent with its component operators:
    every shipped doc passed the q73 gates (n_tokens >= 20), carries a
    valid split, appears once, and its (doc_id, lang, split) row is
    exactly q58's decision for that doc."""
    from voz_spark.corpus_ops import q87_corpus_build
    from voz_spark.dataprep import q58_hash_split_sample

    built = q87_corpus_build(spark, sf_dir).collect()
    assert built, "corpus build shipped nothing"
    ids = [r["doc_id"] for r in built]
    assert len(ids) == len(set(ids))
    q58 = {
        r["doc_id"]: (r["lang"], r["split"])
        for r in q58_hash_split_sample(spark, sf_dir).collect()
    }
    for r in built:
        assert r["n_tokens"] >= 20  # g_short would have dropped it
        assert r["split"] in ("train", "val", "test")
        assert q58[r["doc_id"]] == (r["lang"], r["split"])


def test_q90_rank_formulation_matches_window_reference(spark, sf_dir):
    """q90 computes first-relevant rank WITHOUT a corpus window (best
    relevant + count-strictly-ahead). Pin it against the independent
    window formulation (row_number over the same total order) computed
    here in Spark, plus hand checks on the aggregates."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from voz_spark.corpus_ops import _Q90_PROBES, q90_retrieval_eval
    from voz_spark.dataprep import _DOT_SPARK
    from voz_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _Q90_PROBES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    e = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.col("label").alias("nlabel"),
    )
    scored = (
        q.crossJoin(e)
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "qlabel",
            "nid",
            "nlabel",
            F.round(
                F.expr(_DOT_SPARK.format(a="qe", b="ne"))
                / F.sqrt(
                    F.expr(_DOT_SPARK.format(a="qe", b="qe"))
                    * F.expr(_DOT_SPARK.format(a="ne", b="ne"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    ref = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("nlabel") == F.col("qlabel"))
        .groupBy("qid", "qlabel")
        .agg(F.min("rnk").alias("first_rank"))
        .collect()
    )
    # aggregate the window reference per label and compare with q90
    agg: dict[int, list[int]] = {}
    for r in ref:
        agg.setdefault(r.qlabel, []).append(r.first_rank)
    out = {r.label: r for r in q90_retrieval_eval(spark, sf_dir).collect()}
    assert set(out) == set(agg)
    for label, ranks in agg.items():
        r = out[label]
        assert r.n_queries == len(ranks)
        assert r.hits_at_1 == sum(1 for k in ranks if k == 1)
        assert r.hits_at_5 == sum(1 for k in ranks if k <= 5)
        assert abs(r.mrr - sum(round(1.0 / k, 9) for k in ranks) / len(ranks)) < 1e-12


def test_cdc_chunks_resynchronize_after_edit(spark):
    """The property content-defined chunking exists for (and fixed
    windows lack): prepending one character to a document shifts every
    fixed-offset window, but CDC boundaries re-synchronize at the
    first content-determined cut — so all chunks after it hash
    identically. Chunk both variants with the production boundary rule
    and require most chunk content to survive the edit."""
    import pandas as pd

    from pyspark.sql import functions as F

    from voz_spark.dataprep import _CDC_BOUND, _CDC_W

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest looking for "
            "more interesting things to chase all day long") * 3

    def chunks(text: str) -> list[str]:
        df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
        row = df.select(
            F.expr(
                f"filter(sequence({_CDC_W}, length(text)), "
                f"i -> substr(md5(substr(text, i - {_CDC_W - 1}, {_CDC_W})), 1, 2) <= '{_CDC_BOUND}')"
            ).alias("bounds"),
            "text",
        ).collect()[0]
        bounds, t = list(row.bounds), row.text
        starts = [1] + [b + 1 for b in bounds]
        ends = bounds + [len(t)]
        return [t[s - 1 : e] for s, e in zip(starts, ends) if e >= s]

    a = chunks(base)
    b = chunks("X" + base)
    assert "".join(a) == base and "".join(b) == "X" + base  # lossless split
    assert len(a) > 5  # the rule actually cuts
    # every chunk after the first re-synchronized boundary is
    # byte-identical: only the head chunk (which absorbed the edit)
    # may differ between the two variants
    assert a[1:] == b[1:]
    assert len(set(a) & set(b)) >= len(set(a)) - 1


def test_q106_boilerplate_removed_body_preserved(spark, sf_dir):
    """Paragraph dedup must remove exactly the planted boilerplate
    (df ~ 75-100 docs each) and rebuild the body in original order."""
    import hashlib

    from voz_spark.corpus_ops import _Q106_BOILER, _paradoc_rows, q106_paragraph_dedup

    src = {int(r["doc_id"]): r["text"] for r in _paradoc_rows().to_dict("records")}
    rows = {r.doc_id: r for r in q106_paragraph_dedup(spark, sf_dir).collect()}
    assert set(rows) == set(src)
    boiler = set(_Q106_BOILER)
    for d, text in src.items():
        paras = text.split("\n\n")
        kept = [p for p in paras if p not in boiler]
        r = rows[d]
        assert r.n_paras == len(paras)
        assert r.n_kept == len(kept)
        assert r.n_removed == len(paras) - len(kept)
        assert r.n_removed in (2, 3)  # header+footer (+mid banner every 3rd doc)
        want = hashlib.md5("\n\n".join(kept).encode()).hexdigest()
        assert r.clean_md5 == want, d


def test_q114_redaction_counts_and_text(spark, sf_dir):
    import hashlib
    import re

    from voz_spark.corpus_ops import (
        _PII_CARD,
        _PII_EMAIL,
        _PII_PHONE,
        _pii_rows,
        q114_pii_redaction,
    )

    src = {int(r["doc_id"]): r["text"] for r in _pii_rows().to_dict("records")}
    rows = {r.doc_id: r for r in q114_pii_redaction(spark, sf_dir).collect()}
    assert set(rows) == set(src)
    for d, text in src.items():
        t1 = re.sub(_PII_EMAIL, "<EMAIL>", text)
        t2 = re.sub(_PII_CARD, "<CARD>", t1)
        clean = re.sub(_PII_PHONE, "<PHONE>", t2)
        r = rows[d]
        assert r.n_emails == len(re.findall(_PII_EMAIL, text))
        assert r.n_cards == len(re.findall(_PII_CARD, t1))
        assert r.n_phones == len(re.findall(_PII_PHONE, t2))
        assert r.clean_md5 == hashlib.md5(clean.encode()).hexdigest()
        # nothing PII-shaped survives redaction
        assert not re.search(_PII_EMAIL, clean)
        assert not re.search(_PII_CARD, clean)
        assert not re.search(_PII_PHONE, clean)
    assert any(r.n_redacted >= 2 for r in rows.values())


def test_q115_shuffle_is_deterministic_uniform_permutation(spark, sf_dir):
    import hashlib

    from voz_spark.corpus_ops import _Q115_SEED, q115_training_shuffle

    a = [(r.doc_id, r.shard, r.pos_in_shard) for r in q115_training_shuffle(spark, sf_dir).collect()]
    b = [(r.doc_id, r.shard, r.pos_in_shard) for r in q115_training_shuffle(spark, sf_dir).collect()]
    assert a == b  # reproducible across runs
    ids = [x[0] for x in a]
    assert len(ids) == len(set(ids))  # a permutation, nothing lost
    # the (shard, pos) order IS the md5 global order
    keys = [hashlib.md5(f"{_Q115_SEED}{i}".encode()).hexdigest() for i in ids]
    assert keys == sorted(keys)
    # and it's a real shuffle: not the natural doc_id order
    assert ids != sorted(ids)
    # per-shard positions are dense from 1
    seen = {}
    for _, shard, pos in a:
        seen.setdefault(shard, []).append(pos)
    assert all(ps == list(range(1, len(ps) + 1)) for ps in seen.values())


def test_q118_histogram_quantile_brackets_exact_quantile(spark, sf_dir):
    """The p-quantile BIN must contain the exact p-quantile value:
    bin*100 <= exact quantile < (bin+1)*100 for the lower-rank rule."""
    import duckdb

    from voz_spark.relational import q118_histogram_quantiles

    rows = {r.l_returnflag: r for r in q118_histogram_quantiles(spark, sf_dir).collect()}
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.5) AS p50,
                   quantile_disc(l_extendedprice, 0.95) AS p95,
                   COUNT(*) AS n
            FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    assert {f for f, *_ in exact} == set(rows)
    for flag, p50, p95, n in exact:
        r = rows[flag]
        assert r.n == n
        assert r.p50_bin * 100 <= p50 < (r.p50_bin + 1) * 100
        assert r.p95_bin * 100 <= p95 < (r.p95_bin + 1) * 100
        assert r.p50_bin <= r.p95_bin


def test_q119_skew_profile_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    import duckdb

    from voz_spark.relational import q119_key_skew_profile

    rows = {r.entity: r for r in q119_key_skew_profile(spark, sf_dir).collect()}
    con = duckdb.connect()
    for entity, table, col in [
        ("events.user_id", "events", "user_id"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ]:
        vals = [str(v) for (v,) in con.execute(
            f"SELECT {col} FROM read_parquet('{sf_dir}/{table}.parquet')"
        ).fetchall()]
        freq = Counter(vals)
        r = rows[entity]
        assert r.n_rows == len(vals) and r.n_keys == len(freq)
        assert r.max_freq == max(freq.values())
        k = (len(freq) + 99) // 100
        top = sum(f for _, f in sorted(freq.items(), key=lambda t: (-t[1], t[0]))[:k])
        assert r.top1pct_keys == k
        assert r.top1pct_share_milli == top * 1000 // len(vals)
        assert r.skewed == (r.max_freq * r.n_keys >= 20 * r.n_rows)
    con.close()


def test_q120_delta_hits_only_and_verified(spark, sf_dir):
    """Every reported pair crosses the delta/base split and truly has
    >= 6 equal minhashes; no base-base or delta-delta pair leaks."""
    from voz_spark.dataprep import q24_minhash_signatures, q120_incremental_lsh_dedup

    sigs = {r.doc_id: [r[f"mh{j}"] for j in range(8)]
            for r in q24_minhash_signatures(spark, sf_dir).collect()}
    rows = q120_incremental_lsh_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.delta_doc % 10 == 0 and r.base_doc % 10 != 0
        n = sum(1 for x, y in zip(sigs[r.delta_doc], sigs[r.base_doc]) if x == y)
        assert n == r.n_mh_match >= 6


def test_q121_burst_rule_recomputed(spark, sf_dir):
    from collections import defaultdict

    import duckdb

    from voz_spark.relational import q121_event_bursts

    con = duckdb.connect()
    hourly = con.execute(
        f"""SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)
            FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for et, hr, c in hourly:
        series[et].append((hr, c))
    want = set()
    for et, pts in series.items():
        for i, (hr, c) in enumerate(pts):
            prev = pts[max(0, i - 24):i]
            np_, ts_ = len(prev), sum(x for _, x in prev)
            if np_ >= 12 and c * np_ * 10 >= ts_ * 25:
                want.add((et, hr, c, ts_, np_))
    got = {(r.event_type, r.hour, r.n_events, r.trail_sum, r.n_prev)
           for r in q121_event_bursts(spark, sf_dir).collect()}
    assert got == want and got


def test_q122_exact_quotas_and_minwise_order(spark, sf_dir):
    import hashlib

    import duckdb

    from voz_spark.corpus_ops import _Q122_K, q122_eval_sample

    rows = q122_eval_sample(spark, sf_dir).collect()
    con = duckdb.connect()
    strata = dict(con.execute(
        f"""SELECT lang || '|' || source, COUNT(*)
            FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY 1"""
    ).fetchall())
    con.close()
    by = {}
    for r in rows:
        by.setdefault(f"{r.lang}|{r.source}", []).append(r)
    assert set(by) == set(strata)
    for key, rs in by.items():
        assert len(rs) == min(_Q122_K, strata[key])  # exact quota
        rs.sort(key=lambda r: r.rank_in_stratum)
        keys = [r.sample_key for r in rs]
        assert keys == sorted(keys)  # min-wise order
        for r in rs:
            assert r.sample_key == hashlib.md5(str(r.doc_id).encode()).hexdigest()


def test_q123_card_matches_bruteforce(spark, sf_dir):
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from voz_spark.corpus_ops import q123_dataset_card

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: {"n": 0, "tok": 0, "short": 0, "md5": Counter()})
    for src, text in docs:
        a = agg[src]
        a["n"] += 1
        a["tok"] += len(text.strip().split(" "))
        a["short"] += len(text) < 120
        a["md5"][hashlib.md5(text.encode()).hexdigest()] += 1
    rows = {r.source: r for r in q123_dataset_card(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for src, a in agg.items():
        r = rows[src]
        dups = sum(c - 1 for c in a["md5"].values())
        assert (r.n_docs, r.n_tokens, r.n_dup_docs) == (a["n"], a["tok"], dups)
        assert r.tokens_per_doc == a["tok"] // a["n"]
        assert r.dup_rate_milli == dups * 1000 // a["n"]
        assert r.short_rate_milli == a["short"] * 1000 // a["n"]


def test_q124_deciles_are_balanced_and_ordered(spark, sf_dir):
    from voz_spark.corpus_ops import q124_quality_deciles

    rows = q124_quality_deciles(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.decile)
        assert [r.decile for r in rs] == list(range(1, len(rs) + 1))
        n = sum(r.n_docs for r in rs)
        # SQL NTILE rule: earlier buckets get the extras, sizes differ by <= 1
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        # deciles partition the score axis monotonically
        for a, b in zip(rs, rs[1:]):
            assert a.max_score <= b.min_score
        assert sum(r.n_docs for r in rs if r.keep) <= n * 3 // 10 + 3
        assert all(r.keep == (r.decile >= 8) for r in rs)


def test_q126_packing_is_lossless_and_bounded(spark, sf_dir):
    import duckdb

    from voz_spark.corpus_ops import _Q126_TARGET, q126_output_shard_plan

    rows = q126_output_shard_plan(spark, sf_dir).collect()
    con = duckdb.connect()
    n_docs, total = con.execute(
        f"SELECT COUNT(*), SUM(n_chars) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    con.close()
    assert sum(r.n_docs for r in rows) == n_docs  # lossless
    assert sum(r.file_bytes for r in rows) == total
    by_task = {}
    for r in rows:
        by_task.setdefault(r.task, []).append(r)
    assert len(by_task) == 16  # one writer task per md5 hex prefix
    for task, rs in by_task.items():
        rs.sort(key=lambda r: r.file_no)
        assert [r.file_no for r in rs] == list(range(len(rs)))  # dense
        # greedy rule: every file except the last crosses the target
        # once its final doc lands (a file closes only by overflow)
        for r in rs[:-1]:
            assert r.file_bytes >= 1  # non-empty
        # and no file except via a single giant doc exceeds
        # target + max-doc-size; docs here are small so bound tightly
        assert all(r.file_bytes < 2 * _Q126_TARGET for r in rs)
        assert len(rs) >= 2  # targets produce multiple files per task


def test_q133_round_robin_head_properties(spark, sf_dir):
    """The curriculum head is a contiguous rank-major round-robin:
    positions 1..|S| are every qualifying source's rank-1 doc in
    source order, each source contributes exactly R docs, and the
    arithmetic global_pos is a permutation of 1..|S|*R."""
    from voz_spark.corpus_ops import _Q133_R, q133_curriculum_interleave

    rows = q133_curriculum_interleave(spark, sf_dir).collect()
    srcs = sorted({r.source for r in rows})
    n = len(srcs)
    assert n > 0
    assert sorted(r.global_pos for r in rows) == list(
        range(1, n * _Q133_R + 1)
    )
    by_pos = {r.global_pos: r for r in rows}
    for i, s in enumerate(srcs):
        first = by_pos[i + 1]
        assert first.source == s and first.rk == 1
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.rk)
        # rank-major: global position strictly increases with rank
        assert by_pos[r.global_pos].rk == (r.global_pos - 1) // n + 1
    for s, rks in per_src.items():
        assert sorted(rks) == list(range(1, _Q133_R + 1)), s


def test_q165_split_leakage_matches_independent_recompute(spark, sf_dir):
    """Straddling clusters recomputed independently in Python (hashlib
    md5 split rule + repost augmentation) equal the Spark result."""
    import hashlib

    import duckdb

    from voz_spark.dataprep import q165_split_leakage_audit

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()

    def split(doc_id: int) -> str:
        hs = hashlib.md5(str(doc_id).encode()).hexdigest()[4:8]
        return "train" if hs < "cccc" else ("val" if hs < "e666" else "test")

    clusters: dict[str, list[int]] = {}
    for doc_id, text in docs:
        th = hashlib.md5(text.encode()).hexdigest()
        clusters.setdefault(th, []).append(doc_id)
        if doc_id % 13 == 0:
            clusters.setdefault(th, []).append(doc_id + 1_000_000)
    want = {}
    for th, ids in clusters.items():
        n_train = sum(1 for i in ids if split(i) == "train")
        n_eval = len(ids) - n_train
        if n_train > 0 and n_eval > 0:
            want[th] = (len(ids), n_train, n_eval, min(i for i in ids if split(i) != "train"))
    got = {
        r["text_hash"]: (r["n_docs"], r["n_train"], r["n_eval"], r["first_leaked_eval_doc"])
        for r in q165_split_leakage_audit(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------- q173


def test_q173_containment_classes_on_planted_corpus(spark):
    """A verbatim copy must score near-identical, a contiguous excerpt
    must score contained (high containment, LOW jaccard — the case
    q26's symmetric score misses), and a partial overlap must stay
    overlap. Scores are exact integer milli."""
    from voz_spark.dataprep import containment_pairs

    w = [f"w{i}x" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w[:20])),          # base: 18 shingles
            (2, " ".join(w[:20])),          # verbatim copy
            (3, " ".join(w[:10])),          # contiguous excerpt: 8 shingles, all in base
            (4, " ".join(w[12:32])),        # shifted window: partial overlap
        ],
        "doc_id long, text string",
    )
    rows = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(docs).collect()}
    dup = rows[(1, 2)]
    assert (dup["containment_milli"], dup["jaccard_milli"], dup["relation"]) == (
        1000, 1000, "near-identical",
    )
    exc = rows[(1, 3)]
    assert exc["n_inter"] == 8 and exc["n_a"] == 18 and exc["n_b"] == 8
    assert exc["containment_milli"] == 1000
    assert exc["jaccard_milli"] == 1000 * 8 // 18  # 444 — jaccard misses it
    assert exc["relation"] == "contained"
    ov = rows[(1, 4)]
    # docs 1 and 4 share shingles w12..w17-start: 6 shingles
    assert ov["n_inter"] == 6 and ov["relation"] == "overlap"
    assert ov["containment_milli"] == 1000 * 6 // 18


# ---------------------------------------------------------------- q192


def test_q192_fertility_recount(spark, sf_dir):
    """Cell totals must match an independent regex recount, and the
    fertility arithmetic must be exact integer milli."""
    import re

    from voz_spark.dataprep import q192_tokenizer_fertility
    from voz_spark.session import load_table

    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "text", "n_chars"
    ).collect()
    want: dict[tuple, list] = {}
    for r in docs:
        a = want.setdefault((r["lang"], r["source"]), [0, 0, 0])
        a[0] += 1
        a[1] += len(pat.findall(r["text"]))
        a[2] += r["n_chars"]
    rows = {(r["lang"], r["source"]): r for r in q192_tokenizer_fertility(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for k, (nd, nt, nc) in want.items():
        r = rows[k]
        assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (nd, nt, nc)
        assert r["fertility_milli"] == 1000 * nt // nc


# ---------------------------------------------------------------- q194


def test_q194_epoch_plan_arithmetic(spark, sf_dir):
    """Targets must apportion the budget by weight (floor division),
    epochs_milli must be exact, and the mode must follow the 1000
    boundary; weights replay from the md5 rule."""
    import hashlib

    from voz_spark.dataprep import q194_epoch_plan

    rows = q194_epoch_plan(spark, sf_dir).collect()
    wsum = sum(r["w"] for r in rows)
    budget = sum(r["n_tokens"] for r in rows)
    for r in rows:
        w = 1 + int(hashlib.md5(r["source"].encode()).hexdigest()[:15], 16) % 5
        assert r["w"] == w
        target = budget * w // wsum
        assert r["target_tokens"] == target
        assert r["epochs_milli"] == 1000 * target // r["n_tokens"]
        assert r["mode"] == ("upsample" if r["epochs_milli"] > 1000 else "subsample")
    assert {r["mode"] for r in rows} == {"upsample", "subsample"} or len(rows) < 3
