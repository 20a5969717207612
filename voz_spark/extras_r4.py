"""Round-4 operator wave: weighted sampling, positional phrase search,
degree-ordered triangle counting, exact distributed moments, URL
template mining, Simpson diversity, ANN recall evaluation, exact
rank-based quantiles.

Each operator follows the repo's exactness discipline (SURVEY.md §5.2):
integer arithmetic end-to-end (md5-derived 60-bit hashes, FLOOR-to-
BIGINT quantization before any division), one final double division +
ROUND(.., 6) where a rate is reported, identical aliases both engines,
and a unique tie-break under every top-k.

Reference analogues: sampling/diversity mirror the reference's
dataset-summary statistics (src/detailed_analyzer.py), phrase search
its keyword scan (src/content_analyzer.py:210-260), the URL template
mining its thread/page URL bucketing (src/thread_crawler.py:88-120);
the rest are the LLM-pipeline extensions the brief names as
first-class (similarity-search evaluation, corpus moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from voz_spark.registry import register
from voz_spark.session import load_table as T

# ---------------------------------------------------------------------------
# q248: importance-weighted deterministic sample (Efraimidis–Spirtakis
# A-Res shape with integer keys): priority = hash(doc) DIV weight, keep
# the K smallest per source — longer documents (weight = n_chars) get
# proportionally smaller priorities, so the sample tilts toward them
# while staying deterministic and engine-exact (no ln(), no floats).
# Complements q122 (uniform min-wise stratified sample).
#
# Scale shape: one scan, per-source top-K window; at 10^10 docs the
# same threshold trick as the frontier scheduler (phase A/B) bounds
# the sort. K is a design constant.
# ---------------------------------------------------------------------------

_Q248_K = 10

_H_SPARK = "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
_H_DUCK = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "q248_weighted_sample",
    oracle=f"""
WITH pri AS (
  SELECT source, doc_id, n_chars,
         {_H_DUCK} // GREATEST(n_chars, 1) AS pri
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars, pri,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rk
  FROM pri
)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(pri AS BIGINT) AS pri, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_Q248_K}
ORDER BY source, rk
""",
)
def q248_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample: K docs per source by
    integer priority hash(doc_id) DIV n_chars."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(f"{_H_SPARK} div GREATEST(n_chars, 1)").alias("pri"),
    )
    w = Window.partitionBy("source").orderBy("pri", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _Q248_K)
        .select(
            "source",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("pri").cast("long").alias("pri"),
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# q249: positional phrase search — the inverted-index query shape for
# multi-word phrases: per-word postings lists with in-document
# positions; a phrase (w1, w2) matches where w1's posting at position
# p meets w2's posting at p+1 in the same document.
#
# Scale shape: postings are filtered to the QUERIED words before any
# join (the broadcast phrase dim is the pushdown — only the needed
# postings lists move, the property that makes inverted-index search
# sublinear in corpus size); the adjacency join is keyed on
# (doc_id, pos), never a text rescan.
# ---------------------------------------------------------------------------

_Q249_PHRASES = [
    ("table scan", "table", "scan"),
    ("hash join", "hash", "join"),
    ("sort merge", "sort", "merge"),
]

_Q249_VALUES = ", ".join(f"('{p}', '{a}', '{b}')" for p, a, b in _Q249_PHRASES)


@register(
    "q249_phrase_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS word,
         generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
  FROM documents
),
ph AS (SELECT * FROM (VALUES {_Q249_VALUES}) AS t(phrase, w1, w2)),
hits AS (
  SELECT p.phrase, a.doc_id, COUNT(*) AS n_hits
  FROM ph p
  JOIN toks a ON a.word = p.w1
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.word = p.w2
  GROUP BY p.phrase, a.doc_id
)
SELECT phrase, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_hits AS BIGINT) AS n_hits
FROM hits
ORDER BY phrase, doc_id
""",
)
def q249_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase hits per document via positional postings: only the
    queried words' postings join, on (doc_id, adjacent positions)."""
    toks = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word"),
    )
    ph = spark.createDataFrame(_Q249_PHRASES, "phrase string, w1 string, w2 string")
    # postings pushdown: filter to queried words BEFORE the adjacency join
    a = toks.join(
        F.broadcast(ph.select("phrase", F.col("w1").alias("word"))), "word"
    ).select("phrase", "doc_id", "pos")
    b = toks.join(
        F.broadcast(ph.select("phrase", F.col("w2").alias("word"))), "word"
    ).select("phrase", F.col("doc_id").alias("doc_b"), (F.col("pos") - 1).alias("pos_a"))
    return (
        a.join(
            b,
            (a["phrase"] == b["phrase"])
            & (a["doc_id"] == b["doc_b"])
            & (a["pos"] == b["pos_a"]),
        )
        .groupBy(a["phrase"].alias("phrase"), "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            "phrase",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_hits").cast("long").alias("n_hits"),
        )
        .orderBy("phrase", "doc_id")
    )


# ---------------------------------------------------------------------------
# q250: exact triangle counting with degree-ordered orientation
# (Cohen 2009 / the MapReduce triangle-listing classic). The graph:
# parts co-ordered in one order (q09's in-row pair expansion — never a
# per-order self-join). Every edge is oriented from its lower-(degree,
# id) endpoint to the higher one; each triangle then has exactly ONE
# node with two out-edges, so the wedge join + closure lookup counts
# each triangle once, and per-node out-degree is bounded by O(sqrt(E))
# — total wedge work O(E^1.5) REGARDLESS of hub skew (a hub of degree
# 10^6 generates no wedges because all its edges point INTO it).
# The DuckDB oracle uses the naive a<b<c triple join — correct but not
# the scale shape; equality of the two is the test.
# ---------------------------------------------------------------------------

_Q250_TOPK = 20


@register(
    "q250_triangle_count",
    oracle=f"""
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
edges AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
node_t AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT CAST(node AS BIGINT) AS node, CAST(n_triangles AS BIGINT) AS n_triangles
FROM node_t
ORDER BY n_triangles DESC, node
LIMIT {_Q250_TOPK}
""",
)
def q250_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} nodes by exact triangle participation in the co-order
    part graph, via degree-ordered wedge closure."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    pair_expr = (
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps)),"
        " y -> struct(x AS u, y AS v))))"
    )
    edges = (
        li.distinct()
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("ps"))
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .select(F.col("pr.u").alias("u"), F.col("pr.v").alias("v"))
        .distinct()
        .persist()  # degrees + both orientation sides read it
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low (degree, id) -> high: src emits, hubs only absorb
    ed = edges.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        ed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("ds"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dd"),
        )
        .persist()  # wedge join reads it twice, closure once
    )
    o1 = oriented.select("src", F.col("dst").alias("w1"), F.col("dd").alias("k1"))
    o2 = oriented.select("src", F.col("dst").alias("w2"), F.col("dd").alias("k2"))
    # the two wedge legs, ordered by the same (degree, id) total order
    # so each unordered wedge appears once
    wedges = o1.join(o2, "src").where(
        (F.col("k1") < F.col("k2"))
        | ((F.col("k1") == F.col("k2")) & (F.col("w1") < F.col("w2")))
    )
    closure = oriented.select(
        F.col("src").alias("w1"), F.col("dst").alias("w2")
    )
    tri = wedges.join(closure, ["w1", "w2"]).select(
        F.col("src").alias("a"), F.col("w1").alias("b"), F.col("w2").alias("c")
    )
    node_t = (
        tri.selectExpr("stack(3, a, b, c) AS (node)")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        node_t.select(
            F.col("node").cast("long").alias("node"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
        .orderBy(F.desc("n_triangles"), "node")
        .limit(_Q250_TOPK)
    )


# ---------------------------------------------------------------------------
# q251: exact distributed moment matrix over the embedding table — the
# mean vector + covariance entries a whitening/PCA step consumes.
# Cross-row float sums are NOT order-stable, so every product is
# FLOOR-quantized to an integer (x*y*1e12 — the repo's established
# cast-FLOOR-to-BIGINT-before-dividing rule) and summed as BIGINT;
# the covariance double division happens ONCE at the end. The output
# is the quantized-moment covariance — deterministic on every engine
# and partition order, which is the property that matters for a
# reproducible training pipeline.
#
# Scale shape: one embeddings scan fanned out in-row over the D*(D+1)/2
# pair dim (broadcast by construction); the aggregate lands on the
# bounded pair domain with map-side combine. D is a design constant.
# ---------------------------------------------------------------------------

_Q251_D = 8  # leading dims (sandbox; production runs the full vector)
_Q251_PAIRS = [(i, j) for i in range(_Q251_D) for j in range(i, _Q251_D)]
_Q251_VALUES = ", ".join(f"({i}, {j})" for i, j in _Q251_PAIRS)


@register(
    "q251_embedding_moments",
    oracle=f"""
WITH p AS (SELECT * FROM (VALUES {_Q251_VALUES}) AS t(i, j)),
terms AS (
  SELECT p.i, p.j,
         CAST(FLOOR(CAST(e.embedding[p.i + 1] AS DOUBLE)
                    * CAST(e.embedding[p.j + 1] AS DOUBLE) * 1000000000000) AS BIGINT) AS xy_e12,
         CAST(FLOOR(CAST(e.embedding[p.i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS x_e6,
         CAST(FLOOR(CAST(e.embedding[p.j + 1] AS DOUBLE) * 1000000) AS BIGINT) AS y_e6
  FROM embeddings e, p
),
agg AS (
  SELECT i, j, COUNT(*) AS n,
         SUM(xy_e12) AS sxy_e12, SUM(x_e6) AS sx_e6, SUM(y_e6) AS sy_e6
  FROM terms GROUP BY i, j
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, CAST(n AS BIGINT) AS n,
       CAST(sxy_e12 AS BIGINT) AS sxy_e12,
       ROUND(CAST(sxy_e12 AS DOUBLE) / 1e12 / n
             - (CAST(sx_e6 AS DOUBLE) / 1e6 / n) * (CAST(sy_e6 AS DOUBLE) / 1e6 / n),
             6) AS cov
FROM agg
ORDER BY i, j
""",
)
def q251_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mean/covariance moments of the leading embedding dims via
    FLOOR-quantized integer sums (order-independent)."""
    e = T(spark, sf_dir, "embeddings").select("embedding")
    p = F.broadcast(spark.createDataFrame(_Q251_PAIRS, "i int, j int"))
    terms = e.crossJoin(p).select(
        "i",
        "j",
        F.expr(
            "CAST(FLOOR(CAST(embedding[i] AS DOUBLE)"
            " * CAST(embedding[j] AS DOUBLE) * 1000000000000) AS BIGINT)"
        ).alias("xy_e12"),
        F.expr("CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)").alias(
            "x_e6"
        ),
        F.expr("CAST(FLOOR(CAST(embedding[j] AS DOUBLE) * 1000000) AS BIGINT)").alias(
            "y_e6"
        ),
    )
    agg = terms.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xy_e12").alias("sxy_e12"),
        F.sum("x_e6").alias("sx_e6"),
        F.sum("y_e6").alias("sy_e6"),
    )
    return agg.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("n").cast("long").alias("n"),
        F.col("sxy_e12").cast("long").alias("sxy_e12"),
        F.round(
            F.col("sxy_e12").cast("double") / F.lit(1e12) / F.col("n")
            - (F.col("sx_e6").cast("double") / F.lit(1e6) / F.col("n"))
            * (F.col("sy_e6").cast("double") / F.lit(1e6) / F.col("n")),
            6,
        ).alias("cov"),
    ).orderBy("i", "j")


# ---------------------------------------------------------------------------
# q252: URL template mining — collapse digit runs in crawl paths to a
# placeholder and rank the templates; the standard first step of trap
# detection / sitemap inference (complements q226, which scores traps
# on a KNOWN pattern set — this DISCOVERS the patterns). Paths are the
# repo's deterministic synthetic URL space over events (the crawlops
# convention).
#
# Scale shape: in-row regexp + one bounded-domain hash aggregate
# (templates are few by construction of any real URL scheme);
# the distinct-path count folds into the same aggregate via the exact
# per-(template, path) pre-aggregate — no second scan.
# ---------------------------------------------------------------------------

_Q252_TOPK = 15
_Q252_PATH_DUCK = (
    "CASE WHEN event_type = 'view' THEN"
    "   '/forum/' || CAST(user_id % 7 AS VARCHAR) || '/thread-'"
    "   || CAST(event_id % 997 AS VARCHAR)"
    "   || CASE WHEN event_id % 3 = 0 THEN '/page-' || CAST(event_id % 13 AS VARCHAR)"
    "      ELSE '' END"
    " WHEN event_type = 'click' THEN"
    "   '/attach/img-' || CAST(event_id % 4999 AS VARCHAR) || '.jpg'"
    " WHEN event_type = 'purchase' THEN"
    "   '/u/' || CAST(user_id AS VARCHAR) || '/orders/' || CAST(event_id % 211 AS VARCHAR)"
    " ELSE '/u/' || CAST(user_id AS VARCHAR) || '/profile' END"
)
_Q252_PATH_SPARK = (
    "CASE WHEN event_type = 'view' THEN"
    "   concat('/forum/', CAST(user_id % 7 AS STRING), '/thread-',"
    "     CAST(event_id % 997 AS STRING),"
    "     CASE WHEN event_id % 3 = 0 THEN concat('/page-', CAST(event_id % 13 AS STRING))"
    "     ELSE '' END)"
    " WHEN event_type = 'click' THEN"
    "   concat('/attach/img-', CAST(event_id % 4999 AS STRING), '.jpg')"
    " WHEN event_type = 'purchase' THEN"
    "   concat('/u/', CAST(user_id AS STRING), '/orders/', CAST(event_id % 211 AS STRING))"
    " ELSE concat('/u/', CAST(user_id AS STRING), '/profile') END"
)


@register(
    "q252_url_template_mining",
    oracle=f"""
WITH paths AS (SELECT {_Q252_PATH_DUCK} AS path FROM events),
tp AS (
  SELECT regexp_replace(path, '[0-9]+', 'N', 'g') AS template, path,
         COUNT(*) AS n
  FROM paths GROUP BY 1, 2
),
agg AS (
  SELECT template, SUM(n) AS n_hits, COUNT(*) AS n_distinct_paths
  FROM tp GROUP BY template
)
SELECT template, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_distinct_paths AS BIGINT) AS n_distinct_paths
FROM agg
ORDER BY n_hits DESC, template
LIMIT {_Q252_TOPK}
""",
)
def q252_url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-masked URL templates ranked by hits, with exact distinct
    path counts per template."""
    paths = T(spark, sf_dir, "events").select(
        F.expr(_Q252_PATH_SPARK).alias("path")
    )
    tp = (
        paths.select(
            F.regexp_replace("path", "[0-9]+", "N").alias("template"), "path"
        )
        .groupBy("template", "path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        tp.groupBy("template")
        .agg(
            F.sum("n").cast("long").alias("n_hits"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_paths"),
        )
        .orderBy(F.desc("n_hits"), "template")
        .limit(_Q252_TOPK)
    )


# ---------------------------------------------------------------------------
# q253: Simpson concentration index per source over hashed token
# buckets — the diversity gauge for corpus mixing (a source whose
# tokens concentrate in few buckets scores high = low diversity).
# Simpson (sum of squared bucket shares) instead of Shannon entropy
# because it is a RATIO OF INTEGER SUMS — exact on every engine,
# while ln() is not bit-stable.
#
# Scale shape: in-row tokenize, one (source, bucket) aggregate on a
# bounded 64-bucket domain, then a per-source rollup of <= 64 rows.
# ---------------------------------------------------------------------------

_Q253_B = 64


@register(
    "q253_simpson_diversity",
    oracle=f"""
WITH toks AS (
  SELECT source,
         ('0x' || substr(md5(unnest(string_split_regex(trim(text), '\\s+'))), 1, 15))::BIGINT
           % {_Q253_B} AS bucket
  FROM documents
),
bc AS (SELECT source, bucket, COUNT(*) AS n FROM toks GROUP BY source, bucket),
agg AS (
  SELECT source, SUM(n) AS n_tokens, COUNT(*) AS n_buckets,
         SUM(n * n) AS s2
  FROM bc GROUP BY source
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(1000000 * s2 // GREATEST(n_tokens * n_tokens, 1) AS BIGINT) AS simpson_micro
FROM agg
ORDER BY source
""",
)
def q253_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson concentration over 64 hashed token buckets
    (integer micro-units; higher = less diverse)."""
    toks = (
        T(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .select(
            "source",
            (
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
                % _Q253_B
            ).alias("bucket"),
        )
    )
    bc = toks.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        bc.groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.col("n") * F.col("n")).alias("s2"),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.expr(
                "CAST(1000000 * s2 div GREATEST(n_tokens * n_tokens, 1) AS BIGINT)"
            ).alias("simpson_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q254: ANN recall evaluation — the IVF scale path (q49's exact index:
# first-K centroids, NPROBE lists) scored against the brute-force
# exact top-5 (q29's shape) per query: the eval every production ANN
# deployment runs before trading recall for speed (the q176 dedup-eval
# discipline applied to similarity search).
#
# Scale shape: both sides are per-query top-5 tables (10 queries x 5
# rows); the overlap join and rollup are bounded by K*topk. The
# expensive inputs reuse q29/q49's own plan shapes (broadcast query
# side; probe joins only NPROBE inverted lists).
# ---------------------------------------------------------------------------

_Q254_TOPK = 5


def _q254_oracle() -> str:
    from voz_spark.dataprep import _IVF_K, _IVF_NPROBE, _cos_duck

    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
exact AS (
  SELECT qid, nid FROM (
    SELECT q.qid, e.vec_id AS nid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY ROUND({_cos_duck("q.qe", "e.embedding")}, 6) DESC, e.vec_id
           ) AS rnk
    FROM q, embeddings e WHERE q.qid <> e.vec_id
  ) WHERE rnk <= {_Q254_TOPK}
),
cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {_IVF_K}),
assigned AS (
  SELECT nid, ne, cid FROM (
    SELECT e.vec_id AS nid, e.embedding AS ne, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_cos_duck("e.embedding", "c.ce")} DESC, c.cid
           ) AS arnk
    FROM embeddings e, cent c
  ) WHERE arnk = 1
),
probe AS (
  SELECT qid, qe, cid FROM (
    SELECT q.qid, q.qe, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY {_cos_duck("q.qe", "c.ce")} DESC, c.cid
           ) AS prnk
    FROM q, cent c
  ) WHERE prnk <= {_IVF_NPROBE}
),
ivf AS (
  SELECT qid, nid FROM (
    SELECT p.qid, a.nid,
           ROW_NUMBER() OVER (
             PARTITION BY p.qid
             ORDER BY ROUND({_cos_duck("p.qe", "a.ne")}, 6) DESC, a.nid
           ) AS rnk
    FROM probe p JOIN assigned a USING (cid)
    WHERE p.qid <> a.nid
  ) WHERE rnk <= {_Q254_TOPK}
),
overlap AS (
  SELECT e.qid, COUNT(*) AS n_overlap
  FROM exact e JOIN ivf i ON i.qid = e.qid AND i.nid = e.nid
  GROUP BY e.qid
)
SELECT CAST(q.qid AS BIGINT) AS qid,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(1000 * COALESCE(o.n_overlap, 0) // {_Q254_TOPK} AS BIGINT) AS recall_milli
FROM (SELECT DISTINCT qid FROM q) q
LEFT JOIN overlap o ON o.qid = q.qid
ORDER BY qid
"""


@register("q254_ann_recall_eval", oracle=_q254_oracle())
def q254_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-NPROBE search against the brute-force exact
    top-5, per query vector."""
    from voz_spark.dataprep import _IVF_K, _IVF_NPROBE, _cos

    emb = T(spark, sf_dir, "embeddings").persist()
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    e = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    exact = (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(F.expr(_cos("qe", "ne")), 6).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _Q254_TOPK)
        .select("qid", "nid")
    )
    cent = emb.where(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    aw = Window.partitionBy("nid").orderBy(F.desc(F.expr(_cos("ne", "ce"))), "cid")
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("arnk", F.row_number().over(aw))
        .where(F.col("arnk") == 1)
        .select("nid", "ne", "cid")
    )
    pw = Window.partitionBy("qid").orderBy(F.desc(F.expr(_cos("qe", "ce"))), "cid")
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("prnk", F.row_number().over(pw))
        .where(F.col("prnk") <= _IVF_NPROBE)
        .select("qid", "qe", "cid")
    )
    ivf = (
        F.broadcast(probe)
        .join(assigned, "cid")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(F.expr(_cos("qe", "ne")), 6).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _Q254_TOPK)
        .select("qid", F.col("nid").alias("inid"))
    )
    overlap = (
        exact.join(ivf, (exact["qid"] == ivf["qid"]) & (exact["nid"] == ivf["inid"]))
        .groupBy(exact["qid"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    qids = q.select("qid").distinct()
    return (
        qids.join(overlap, "qid", "left")
        .select(
            F.col("qid").cast("long").alias("qid"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.expr(
                f"CAST(1000 * COALESCE(n_overlap, 0) div {_Q254_TOPK} AS BIGINT)"
            ).alias("recall_milli"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# q255: exact rank-based quantiles of event inter-arrival gaps — the
# EXACT complement to q118's histogram quantiles: p50 is the integer
# mean of the two middle-rank gaps, p90 the nearest-rank value, both
# from one ranked pass (no approx_percentile — its results are not
# engine-reproducible).
#
# Scale shape: the lag window and the rank window are both keyed by
# event_type (bounded partitions per key at any scale via time
# bucketing in production); the final per-type rollup touches only the
# <= 4 picked ranks per type. No nested windows (two chained CTEs —
# the DuckDB constraint documented in the repo memory).
# ---------------------------------------------------------------------------


@register(
    "q255_exact_gap_quantiles",
    oracle="""
WITH g0 AS (
  SELECT event_type,
         date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us,
         event_id
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
g AS (SELECT event_type, gap_us, event_id FROM g0 WHERE gap_us IS NOT NULL),
r AS (
  SELECT event_type, gap_us,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_us, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g
),
pick AS (
  SELECT event_type, n,
         MAX(CASE WHEN rk = (n + 1) // 2 THEN gap_us END) AS m_lo,
         MAX(CASE WHEN rk = (n + 2) // 2 THEN gap_us END) AS m_hi,
         MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN gap_us END) AS p90,
         MAX(gap_us) AS mx
  FROM r GROUP BY event_type, n
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST((m_lo + m_hi) // 2 AS BIGINT) AS p50_us,
       CAST(p90 AS BIGINT) AS p90_us,
       CAST(mx AS BIGINT) AS max_us
FROM pick
ORDER BY event_type
""",
)
def q255_exact_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/max inter-arrival gap per event type via
    rank-pick (no approx_percentile)."""
    ev = T(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = (
        ev.withColumn("prev_ts", F.lag("ts").over(wlag))
        .withColumn("gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
        .where(F.col("gap_us").isNotNull())
        .select("event_type", "gap_us", "event_id")
    )
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("event_type")
    r = g.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    pick = r.groupBy("event_type", "n").agg(
        F.max(F.when(F.expr("rk = (n + 1) div 2"), F.col("gap_us"))).alias("m_lo"),
        F.max(F.when(F.expr("rk = (n + 2) div 2"), F.col("gap_us"))).alias("m_hi"),
        F.max(F.when(F.expr("rk = (9 * n + 9) div 10"), F.col("gap_us"))).alias("p90"),
        F.max("gap_us").alias("mx"),
    )
    return pick.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.expr("CAST((m_lo + m_hi) div 2 AS BIGINT)").alias("p50_us"),
        F.col("p90").cast("long").alias("p90_us"),
        F.col("mx").cast("long").alias("max_us"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q256: distribution drift between consecutive observed days — the
# training-data drift monitor: per-day histogram of the event payload
# bucket, L1 distance to the PREVIOUS observed day's histogram.
# Integer-exact: |n_dk * N_prev - n_pk * N_cur| summed (cross-
# multiplied so no per-bucket division), ONE double division at the
# end. Consecutive-ness is by DENSE order of observed days (gaps pair
# with the last observed day, the monitoring semantics).
#
# Scale shape: one (day, bucket) aggregate (bounded: days x 100
# buckets), a 1-step self-join on the day rank, and a full-outer
# bucket merge inside each adjacent-day pair — all on the bounded
# histogram domain, never on raw events.
# ---------------------------------------------------------------------------


@register(
    "q256_histogram_drift",
    oracle="""
WITH b AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS bucket
  FROM events WHERE props IS NOT NULL
),
hc AS (SELECT day, bucket, COUNT(*) AS n FROM b GROUP BY day, bucket),
days AS (
  SELECT day, SUM(n) AS total,
         ROW_NUMBER() OVER (ORDER BY day) AS dr
  FROM hc GROUP BY day
),
pairs AS (
  SELECT c.day AS day, p.day AS prev_day, c.total AS nc, p.total AS np
  FROM days c JOIN days p ON p.dr = c.dr - 1
),
merged AS (
  SELECT pr.day, pr.prev_day, pr.nc, pr.np,
         COALESCE(cur.n, 0) AS n_cur, COALESCE(prv.n, 0) AS n_prev
  FROM pairs pr
  JOIN (SELECT DISTINCT bucket FROM hc) k ON TRUE
  LEFT JOIN hc cur ON cur.day = pr.day AND cur.bucket = k.bucket
  LEFT JOIN hc prv ON prv.day = pr.prev_day AND prv.bucket = k.bucket
  WHERE COALESCE(cur.n, 0) + COALESCE(prv.n, 0) > 0
),
dist AS (
  SELECT day, prev_day, nc, np,
         SUM(ABS(n_cur * np - n_prev * nc)) AS cross_l1
  FROM merged GROUP BY day, prev_day, nc, np
)
SELECT CAST(day AS VARCHAR) AS day, CAST(prev_day AS VARCHAR) AS prev_day,
       CAST(nc AS BIGINT) AS n_events,
       ROUND(1000.0 * cross_l1 / (nc * np), 6) AS drift_milli
FROM dist
ORDER BY day
""",
)
def q256_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 drift of the daily payload-bucket histogram vs the previous
    observed day (integer cross-multiplied, one final division)."""
    b = (
        T(spark, sf_dir, "events")
        .where(F.col("props").isNotNull())
        .select(
            F.col("ts").cast("date").alias("day"),
            (F.get_json_object("props", "$.k").cast("bigint") % 20).alias("bucket"),
        )
    )
    hc = b.groupBy("day", "bucket").agg(F.count(F.lit(1)).alias("n")).persist()
    wdr = Window.orderBy("day")  # bounded: one row per observed day
    days = (
        hc.groupBy("day")
        .agg(F.sum("n").alias("total"))
        .withColumn("dr", F.row_number().over(wdr))
    )
    cur = days.select(
        F.col("day").alias("day"), F.col("total").alias("nc"), F.col("dr").alias("dr")
    )
    prev = days.select(
        F.col("day").alias("prev_day"),
        F.col("total").alias("np"),
        (F.col("dr") + 1).alias("dr"),
    )
    pairs = cur.join(prev, "dr").drop("dr")
    k = hc.select("bucket").distinct()
    hcur = hc.select(F.col("day").alias("day"), "bucket", F.col("n").alias("n_cur"))
    hprv = hc.select(
        F.col("day").alias("prev_day"), "bucket", F.col("n").alias("n_prev")
    )
    merged = (
        pairs.crossJoin(F.broadcast(k))  # bounded 20-bucket dim
        .join(hcur, ["day", "bucket"], "left")
        .join(hprv, ["prev_day", "bucket"], "left")
        .na.fill({"n_cur": 0, "n_prev": 0})
        .where(F.col("n_cur") + F.col("n_prev") > 0)
    )
    dist = merged.groupBy("day", "prev_day", "nc", "np").agg(
        F.sum(F.abs(F.col("n_cur") * F.col("np") - F.col("n_prev") * F.col("nc"))).alias(
            "cross_l1"
        )
    )
    return dist.select(
        F.col("day").cast("string").alias("day"),
        F.col("prev_day").cast("string").alias("prev_day"),
        F.col("nc").cast("long").alias("n_events"),
        F.round(F.lit(1000.0) * F.col("cross_l1") / (F.col("nc") * F.col("np")), 6).alias(
            "drift_milli"
        ),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q257: small-file compaction planner — the lakehouse maintenance op
# (Iceberg rewrite_data_files' planning phase): within each partition,
# files in id order are packed into groups by START-OFFSET division
# (group = floor(preceding-bytes / target)) — deterministic, one
# window pass, groups overshoot the target by at most one file (the
# standard streaming bin-packing bound; exact FFD packing is
# inherently sequential and NOT a distributed shape).
#
# Scale shape: the file manifest (one row per data file) is orders of
# magnitude smaller than the data; the cumulative-sum window is keyed
# by partition; the group rollup is bounded by the manifest.
# ---------------------------------------------------------------------------

_Q257_TARGET = 4000  # target group size (synthetic byte units)


@register(
    "q257_compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT o_orderpriority AS part, o_orderkey % 200 AS file_id,
         COUNT(*) * 100 AS bytes
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT part, file_id, bytes,
         COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM files
),
grp AS (
  SELECT part, file_id, bytes, pre // {_Q257_TARGET} AS group_no FROM cum
)
SELECT part, CAST(group_no AS BIGINT) AS group_no,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(file_id) AS BIGINT) AS first_file,
       CAST(MAX(file_id) AS BIGINT) AS last_file
FROM grp
GROUP BY part, group_no
ORDER BY part, group_no
""",
)
def q257_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local compaction groups by start-offset division over
    the file manifest's cumulative bytes."""
    files = (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("part"),
            (F.col("o_orderkey") % 200).alias("file_id"),
        )
        .agg((F.count(F.lit(1)) * 100).alias("bytes"))
    )
    wcum = (
        Window.partitionBy("part")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # two-step: compute pre first (no nested window refs)
    grp = (
        files.withColumn("pre", F.coalesce(F.sum("bytes").over(wcum), F.lit(0)))
        .withColumn("group_no", F.expr(f"pre div {_Q257_TARGET}"))
    )
    return (
        grp.groupBy("part", "group_no")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("file_id").cast("long").alias("first_file"),
            F.max("file_id").cast("long").alias("last_file"),
        )
        .select(
            "part",
            F.col("group_no").cast("long").alias("group_no"),
            "n_files",
            "total_bytes",
            "first_file",
            "last_file",
        )
        .orderBy("part", "group_no")
    )


# ---------------------------------------------------------------------------
# q258: Matryoshka truncation evaluation (Kusupati et al., MRL): the
# dimension-truncation trade every embedding deployment prices — how
# much of the FULL-dim exact top-5 neighborhood survives when cosine
# runs on only the leading 16 dims (the cheap prefilter regime).
# q254's eval discipline applied to the dimension axis instead of the
# index axis.
#
# Scale shape: both sides are bounded per-query top-k tables from
# broadcast-query scans; the truncated side reads the SAME rows with
# a sliced array — one corpus pass each, overlap join bounded by
# queries x k.
# ---------------------------------------------------------------------------

_Q258_TOPK = 5
_Q258_DIMS = 16


def _q258_oracle() -> str:
    from voz_spark.dataprep import _DOT_DUCK

    def cos(a, b):
        return (
            f"{_DOT_DUCK.format(a=a, b=b)} / sqrt({_DOT_DUCK.format(a=a, b=a)}"
            f" * {_DOT_DUCK.format(a=b, b=b)})"
        )

    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe,
         list_slice(embedding, 1, {_Q258_DIMS}) AS qt
  FROM embeddings WHERE vec_id < 10
),
e AS (
  SELECT vec_id AS nid, embedding AS ne,
         list_slice(embedding, 1, {_Q258_DIMS}) AS nt
  FROM embeddings
),
full_top AS (
  SELECT qid, nid FROM (
    SELECT q.qid, e.nid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY ROUND({cos("q.qe", "e.ne")}, 6) DESC, e.nid) AS rnk
    FROM q, e WHERE q.qid <> e.nid
  ) WHERE rnk <= {_Q258_TOPK}
),
trunc_top AS (
  SELECT qid, nid FROM (
    SELECT q.qid, e.nid,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY ROUND({cos("q.qt", "e.nt")}, 6) DESC, e.nid) AS rnk
    FROM q, e WHERE q.qid <> e.nid
  ) WHERE rnk <= {_Q258_TOPK}
),
ov AS (
  SELECT f.qid, COUNT(*) AS n_overlap
  FROM full_top f JOIN trunc_top t ON t.qid = f.qid AND t.nid = f.nid
  GROUP BY f.qid
)
SELECT CAST(q.qid AS BIGINT) AS qid,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(1000 * COALESCE(o.n_overlap, 0) // {_Q258_TOPK} AS BIGINT) AS agreement_milli
FROM (SELECT DISTINCT qid FROM q) q
LEFT JOIN ov o ON o.qid = q.qid
ORDER BY qid
"""


@register("q258_matryoshka_eval", oracle=_q258_oracle())
def q258_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighborhood agreement between full-dim cosine and the
    leading-16-dim (Matryoshka) truncation, per query vector."""
    from voz_spark.dataprep import _DOT_SPARK

    def cos(a, b):
        return (
            f"{_DOT_SPARK.format(a=a, b=b)} / sqrt({_DOT_SPARK.format(a=a, b=a)}"
            f" * {_DOT_SPARK.format(a=b, b=b)})"
        )

    emb = T(spark, sf_dir, "embeddings").persist()
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.expr(f"slice(embedding, 1, {_Q258_DIMS})").alias("qt"),
    )
    e = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("ne"),
        F.expr(f"slice(embedding, 1, {_Q258_DIMS})").alias("nt"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("c"), "nid")

    def topk(csel):
        return (
            F.broadcast(q)
            .crossJoin(e)
            .where(F.col("qid") != F.col("nid"))
            .select("qid", "nid", F.round(F.expr(csel), 6).alias("c"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= _Q258_TOPK)
            .select("qid", "nid")
        )

    full_top = topk(cos("qe", "ne"))
    trunc_top = topk(cos("qt", "nt")).select(
        F.col("qid").alias("tqid"), F.col("nid").alias("tnid")
    )
    ov = (
        full_top.join(
            trunc_top,
            (full_top["qid"] == trunc_top["tqid"])
            & (full_top["nid"] == trunc_top["tnid"]),
        )
        .groupBy(full_top["qid"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        q.select("qid")
        .distinct()
        .join(ov, "qid", "left")
        .select(
            F.col("qid").cast("long").alias("qid"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.expr(
                f"CAST(1000 * COALESCE(n_overlap, 0) div {_Q258_TOPK} AS BIGINT)"
            ).alias("agreement_milli"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# q259: BM25-shaped disjunctive ranking over the inverted index —
# q204 ranks by raw conjunctive tf; this adds the two things BM25
# actually contributes: term-frequency SATURATION and length
# normalization, both made cross-engine exact by clearing the rational
# constants (k1=1.2, b=0.75, avgdl=A/N) into one integer formula:
#
#   contrib = rarity_micro * 22*tf*A DIV (10*A*tf + 3*A + 9*dl*N)
#
# (= rarity * tf(k1+1)/(tf + k1(1-b) + k1*b*dl/avgdl), scaled by
# 10*A). idf's ln() is replaced by the repo's integer rarity weight
# 1e6 DIV df (q82's substitution, documented) — monotone in df, which
# is the ranking property that matters. Per-(doc,term) contributions
# are INTEGERS, so the per-doc sum is order-independent.
#
# Scale shape: postings filtered to the query terms before any join
# (q249's pushdown); doc lengths from one combine-friendly aggregate;
# corpus scalars (A, N) are a 1-row broadcast; top-k under a total
# order.
# ---------------------------------------------------------------------------

_Q259_TERMS = ("spark", "vector", "stream")
_Q259_TOPK = 20
_Q259_TERMS_SQL = ", ".join(f"'{t}'" for t in _Q259_TERMS)


@register(
    "q259_bm25_ranking",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT SUM(dl) AS a, COUNT(*) AS n FROM dl),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({_Q259_TERMS_SQL}) GROUP BY term
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({_Q259_TERMS_SQL}) GROUP BY doc_id, term
),
contrib AS (
  SELECT t.doc_id, t.term,
         (1000000 // f.df) * (22 * t.tf * c.a)
           // (10 * c.a * t.tf + 3 * c.a + 9 * d.dl * c.n) AS c_micro
  FROM tf t
  JOIN df f ON f.term = t.term
  JOIN dl d ON d.doc_id = t.doc_id
  CROSS JOIN corpus c
),
scored AS (
  SELECT doc_id, COUNT(*) AS n_terms, SUM(c_micro) AS score_micro
  FROM contrib GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_terms AS BIGINT) AS n_terms,
       CAST(score_micro AS BIGINT) AS score_micro
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT {_Q259_TOPK}
""",
)
def q259_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive BM25-shaped top-20: integer rarity x integer
    saturated-tf with length normalization."""
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).persist()
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(F.sum("dl").alias("a"), F.count(F.lit(1)).alias("n"))
    hits = tok.where(F.col("term").isin(list(_Q259_TERMS)))
    df_t = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))  # 1-row scalar dim
        .select(
            "doc_id",
            F.expr(
                "(1000000 div df) * (22 * tf * a)"
                " div (10 * a * tf + 3 * a + 9 * dl * n)"
            ).alias("c_micro"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c_micro").alias("score_micro"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("score_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(_Q259_TOPK)
    )


# ---------------------------------------------------------------------------
# q260: session path mining — the top event-type TRIGRAMS inside
# 30-minute sessions (q13's sessionization), i.e. the length-3 common
# journeys product analytics mines where q246's transition matrix
# stops at bigrams. Sessions and steps are fully deterministic
# (ts, event_id total order); counts are exact integers.
#
# Scale shape: one user-keyed window pass for the session flag, one
# cumsum for session ids, two LEADs for the trigram — all the same
# (user)-keyed partitioning, so Spark plans ONE exchange for the
# whole chain; the rollup lands on the bounded K^3 type domain.
# ---------------------------------------------------------------------------

_Q260_TOPK = 15


@register(
    "q260_session_paths",
    oracle=f"""
WITH flags AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM flags
),
tri AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w2 AS t2,
         LEAD(event_type, 2) OVER w2 AS t3
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM tri WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n DESC, t1, t2, t3
LIMIT {_Q260_TOPK}
""",
)
def q260_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigrams within 30-minute sessions."""
    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flags = ev.withColumn("prev_ts", F.lag("ts").over(wu)).withColumn(
        "new_s",
        F.when(
            F.col("prev_ts").isNull()
            | F.expr("ts - prev_ts > INTERVAL 30 MINUTES"),
            1,
        ).otherwise(0),
    )
    sess = flags.withColumn("sid", F.sum("new_s").over(wu))
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    tri = sess.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(_Q260_TOPK)
    )
