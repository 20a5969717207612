"""Corpus-governance operators: privacy (pseudonymization +
k-anonymity audit), per-source characteristic terms (tf-idf family),
training-mix weighting (temperature sampling), and semantic dedup
(cluster-centroid canonicalization over embeddings).

These extend the training-data pipeline family in dataprep.py with the
governance ops a 100 TB corpus needs before it ships: strip direct
identifiers, audit quasi-identifier re-identification risk, pick the
language/source mixture, and collapse semantically-identical items.
(The reference has no analogue — its data never leaves one machine;
the closest surface is the per-user aggregation in
src/network_analyzer.py:86-118, which motivates the quasi-identifier
grouping here.)

Oracle discipline (same as dataprep.py): md5 is the cross-engine hash;
cross-row float sums go through ROUND + DECIMAL so they are
order-independent and bit-identical; divisions happen once, on exact
operands, in IEEE double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from voz_spark.dataprep import _SIGN_BUCKET_DUCK, _SIGN_BUCKET_SPARK
from voz_spark.registry import register
from voz_spark.session import load_table as T

# ---------------------------------------------------------------------------
# q77: PII pseudonymization + k-anonymity audit. Before a corpus with
# user-derived rows ships for training, direct identifiers are
# replaced by stable pseudonyms (md5 — deterministic, so joins across
# table versions still line up) and every quasi-identifier combination
# is audited for re-identification risk: a (nationkey, mktsegment)
# group smaller than k=5 means those rows are re-identifiable from
# public attributes alone.
#
# Scale shape: the quasi-identifier domain is bounded (|nations| x
# |segments| = 125 groups), so the group-size table BROADCASTS back
# onto the scan — one full-table scan, one 125-row aggregate, zero
# large shuffles. The pseudonym is a pure projection.
#
# Security honesty: the pseudonym is md5(salt || name) with a salt
# that is a CODE CONSTANT here so the DuckDB oracle can reproduce it.
# Identifiers like these are low-entropy and enumerable, so in
# production the salt must be a secret (keyed HMAC injected from a
# secret store) or the whole keyspace can be hashed and inverted by
# dictionary; the c_custkey column is likewise retained here only so
# the audit output joins back to the source rows — a shipping corpus
# would drop it. What this op demonstrates is the PLAN shape
# (projection-only pseudonyms + broadcast k-anonymity audit), which is
# identical under a secret key.
# ---------------------------------------------------------------------------

_K_ANON = 5
_PII_SALT = "voz-pii-salt-v1"  # production: secret from a key store, not code


@register(
    "q77_pii_pseudonymize",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS group_n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c.c_custkey,
       substr(md5('{_PII_SALT}' || c.c_name), 1, 16) AS pseudonym,
       c.c_nationkey, c.c_mktsegment, g.group_n,
       (g.group_n >= {_K_ANON}) AS k_anonymous
FROM customer c JOIN g USING (c_nationkey, c_mktsegment)
ORDER BY c.c_custkey
""",
)
def q77_pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace the direct identifier (c_name) with a stable salted-md5
    pseudonym and flag rows whose quasi-identifier group
    (c_nationkey, c_mktsegment) has fewer than k=5 members. The salt
    is a code constant only for oracle reproducibility — see the
    security note above; production needs a secret key."""
    c = T(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_n")
    )
    return (
        c.join(F.broadcast(g), ["c_nationkey", "c_mktsegment"])
        .select(
            "c_custkey",
            F.substring(F.md5(F.concat(F.lit(_PII_SALT), F.col("c_name"))), 1, 16).alias(
                "pseudonym"
            ),
            "c_nationkey",
            "c_mktsegment",
            "group_n",
            (F.col("group_n") >= _K_ANON).alias("k_anonymous"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q78: per-source characteristic terms — the tf-idf family ranking
# used to profile what each corpus source is "about" (and to spot
# boilerplate: a term with huge tf and df ≈ N scores ~tf). The idf
# factor is the LINEAR form N/df rather than ln(N/df): the ranking it
# induces per (tf, df) is the same monotone family, and tf * N / df is
# one exact integer product and one IEEE division — bit-identical on
# both engines with no libm dependency.
#
# Scale shape: both aggregates are vocabulary-bounded (map-side
# partial combine on (source, term) and term), the df table joins on
# term (vocab-sized, broadcastable in practice), and the final top-10
# per source is a bounded window over |vocab| rows per source.
# ---------------------------------------------------------------------------


@register(
    "q78_tfidf_terms",
    oracle="""
WITH w AS (
  SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term FROM documents
),
f AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM w WHERE length(term) > 2 GROUP BY source, term
),
df_t AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term FROM documents
  ) WHERE length(term) > 2 GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
s AS (
  SELECT f.source, f.term, f.tf, df_t.df,
         ROUND(CAST(f.tf AS DOUBLE) * n.n_docs / df_t.df, 6) AS score
  FROM f JOIN df_t USING (term) CROSS JOIN n
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, term) AS rnk
  FROM s
)
SELECT source, term, tf, df, score, rnk FROM r WHERE rnk <= 10
ORDER BY source, rnk
""",
)
def q78_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 characteristic terms per source by tf * N / df (linear
    idf — same ranking family as ln(N/df), exact cross-engine)."""
    d = T(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term")
    ).where(F.length("term") > 2)
    # single corpus explode: ONE aggregation at (source, term) grain
    # computes both tf and the per-source distinct-doc count; since a
    # doc belongs to exactly one source, per-term df = SUM over sources
    # of dfs. The persisted table is vocab×sources rows — bounded, not
    # corpus-sized — so the double reference below never re-runs the
    # corpus explode (Catalyst's per-branch column pruning would
    # otherwise defeat exchange reuse and re-scan the corpus)
    g = (
        words.groupBy("source", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.countDistinct("doc_id").cast("long").alias("dfs"),
        )
        .persist()
    )
    f = g.select("source", "term", "tf")
    df_t = g.groupBy("term").agg(F.sum("dfs").cast("long").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    s = (
        f.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "tf",
            "df",
            F.round(F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "term")
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("source", "term", "tf", "df", "score", "rnk")
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# q79: training-mix weights by temperature sampling — the standard
# multilingual-corpus mixing rule (weight stratum i by its token count
# raised to alpha < 1, renormalized) that upsamples low-resource
# strata relative to raw proportions. alpha = 0.5 so the power is
# sqrt, which IEEE 754 requires to be correctly rounded — bit-exact on
# both engines with no libm pow() dependency.
#
# Scale shape: one scan folding token counts in-row (size of the
# whitespace split — no explode), one partial-combined aggregate to
# |source x lang| rows, and the renormalizing window runs over that
# tiny stratum table. Cross-row sums go through ROUND + DECIMAL so the
# normalization denominators are order-independent.
# ---------------------------------------------------------------------------


@register(
    "q79_mixture_weights",
    oracle="""
WITH s AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
),
w AS (
  SELECT *, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wdec FROM s
)
SELECT source, lang, n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6) AS raw_share,
       ROUND(CAST(wdec AS DOUBLE) / CAST(SUM(wdec) OVER () AS DOUBLE), 6) AS alpha_weight
FROM w ORDER BY source, lang
""",
)
def q79_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) token counts with raw proportional share and
    alpha=0.5 temperature-sampling weight (sqrt-scaled, renormalized)."""
    d = T(spark, sf_dir, "documents")
    s = (
        d.select(
            "source", "lang", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("nt")
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "wdec", F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast("decimal(38,6)")
        )
    )
    every = Window.partitionBy()
    return s.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(every), 6
        ).alias("raw_share"),
        F.round(
            F.col("wdec").cast("double") / F.sum("wdec").over(every).cast("double"), 6
        ).alias("alpha_weight"),
    ).orderBy("source", "lang")


# ---------------------------------------------------------------------------
# q80: semantic dedup (SemDeDup-style) — collapse embedding-space
# duplicate clusters to one canonical item: bucket vectors by sign-LSH
# key, compute each bucket's centroid, keep the vector closest to the
# centroid and mark the rest as semantic duplicates. This is the
# embedding counterpart of q70's text near-dup canonicalization.
#
# Scale shape: the explode is by a FIXED dim (64), so the (bucket,
# pos) centroid aggregate and the (bucket, vec_id) distance aggregate
# are both keyed, partial-combined shuffles whose width is input-
# proportional with uniform keys; the rank window runs per bucket.
# The key width caps bucket COUNT (2^bits), not bucket size — expected
# size is ~N/2^bits, so at scale widen the key so buckets stay
# window-sized, and cap stragglers like q31's _NEARDUP_BUCKET_CAP
# does. Centroid sums and squared-distance sums go
# through ROUND + DECIMAL so both engines accumulate order-free and
# rank identically on the unrounded-but-exact dist2.
# ---------------------------------------------------------------------------


@register(
    "q80_semantic_dedup",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {_SIGN_BUCKET_DUCK} AS bucket FROM embeddings
),
sized AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_bucket FROM b GROUP BY bucket HAVING COUNT(*) >= 2
),
ex AS (
  SELECT vec_id, bucket,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v
  FROM b SEMI JOIN sized USING (bucket)
),
cent AS (
  SELECT bucket, pos,
         CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS c
  FROM ex GROUP BY bucket, pos
),
d2 AS (
  SELECT ex.bucket, ex.vec_id,
         CAST(SUM(CAST(ROUND((CAST(ex.v AS DOUBLE) - cent.c) * (CAST(ex.v AS DOUBLE) - cent.c),
                             12) AS DECIMAL(38,12))) AS DOUBLE) AS dist2
  FROM ex JOIN cent USING (bucket, pos)
  GROUP BY ex.bucket, ex.vec_id
),
rk AS (
  SELECT bucket, vec_id, ROUND(dist2, 6) AS dist2,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY dist2, vec_id) AS rnk
  FROM d2
)
SELECT rk.bucket, s.n_bucket, rk.vec_id, rk.dist2, (rk.rnk = 1) AS is_canonical
FROM rk JOIN sized s USING (bucket)
ORDER BY rk.bucket, rk.dist2, rk.vec_id
""",
)
def q80_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster canonicalization: within each sign-LSH
    bucket (size >= 2), rank vectors by squared distance to the
    bucket centroid; rank 1 is the canonical survivor."""
    emb = T(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", "embedding", F.expr(_SIGN_BUCKET_SPARK).alias("bucket"))
    sized = (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bucket"))
        .where(F.col("n_bucket") >= 2)
    )
    ex = b.join(F.broadcast(sized), "bucket").select(
        "vec_id", "bucket", F.posexplode("embedding").alias("pos", "v")
    )
    cent = ex.groupBy("bucket", "pos").agg(
        (
            F.sum(F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    dd = F.col("v").cast("double") - F.col("c")
    d2 = (
        ex.join(cent, ["bucket", "pos"])
        .groupBy("bucket", "vec_id")
        .agg(F.sum(F.round(dd * dd, 12).cast("decimal(38,12)")).cast("double").alias("dist2"))
    )
    w = Window.partitionBy("bucket").orderBy("dist2", "vec_id")
    return (
        d2.withColumn("rnk", F.row_number().over(w))
        .join(F.broadcast(sized), "bucket")
        .select(
            "bucket",
            "n_bucket",
            "vec_id",
            F.round("dist2", 6).alias("dist2"),
            (F.col("rnk") == 1).alias("is_canonical"),
        )
        .orderBy("bucket", "dist2", "vec_id")
    )

# ---------------------------------------------------------------------------
# q81: exact substring-level dedup — the "duplicated span" measure
# from corpus dedup practice (flag every 8-token window that occurs in
# >= 2 distinct documents, then score each document by the fraction of
# its windows that are duplicated). Catches copy-paste boilerplate and
# near-verbatim syndication that document-level hashing (q20) and
# MinHash (q24-q26) both miss when the shared span is a small part of
# an otherwise-unique page.
#
# Scale shape: windows are built IN-ROW (transform over sequence —
# no per-token explode before hashing), so the explode emits one
# md5(span) per window position. The duplicate-detection aggregate is
# partial-combined on the uniform md5 key (a boilerplate span with
# document-frequency d contributes d rows to ONE group — linear, never
# a pair join, the q26 lesson). The join back is 1:1 per window row on
# the same uniform key. Nothing is quadratic in span frequency.
# ---------------------------------------------------------------------------

_SPAN_TOKENS = 8


@register(
    "q81_dup_span_fraction",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
sp AS (
  SELECT doc_id,
         unnest(generate_series(1, len(toks) - {_SPAN_TOKENS - 1})) AS i,
         toks
  FROM w WHERE len(toks) >= {_SPAN_TOKENS}
),
h AS (
  SELECT doc_id, md5(array_to_string(toks[i:i+{_SPAN_TOKENS - 1}], ' ')) AS span_h FROM sp
),
dup AS (
  SELECT span_h FROM h GROUP BY span_h HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT h.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN d.span_h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
  FROM h LEFT JOIN dup d USING (span_h)
  GROUP BY h.doc_id
)
SELECT doc_id, n_spans, n_dup_spans,
       ROUND(CAST(n_dup_spans AS DOUBLE) / n_spans, 6) AS dup_frac
FROM per_doc WHERE n_dup_spans > 0
ORDER BY dup_frac DESC, doc_id
""",
)
def q81_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of 8-token windows that also occur in at
    least one other document (substring-level exact dedup signal)."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks")).where(
        F.size("toks") >= _SPAN_TOKENS
    )
    # persisted: `spans` feeds BOTH the dup aggregate and the join
    # probe. Both sides shuffle on span_h, so ReuseExchange usually
    # covers the recompute — but that is plan-shape luck, not a
    # contract (the q25 lesson): persist makes the single
    # materialization explicit, so the corpus-wide span explode runs
    # once regardless of how Catalyst shapes either side.
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_SPAN_TOKENS - 1}),"
                f" i -> md5(concat_ws(' ', slice(toks, i, {_SPAN_TOKENS}))))"
            )
        ).alias("span_h"),
    ).persist()
    dup = (
        spans.groupBy("span_h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("span_h", F.lit(1).alias("is_dup"))
    )
    return (
        spans.join(dup, "span_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .where(F.col("n_dup_spans") > 0)
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6).alias(
                "dup_frac"
            ),
        )
        .orderBy(F.desc("dup_frac"), "doc_id")
    )


# Size gate for broadcasting DERIVED frequency tables (q82 unigram,
# q84 bigram): the same dispatch idea as the bloom broadcast/cogroup
# split (frontier.py:230-273) — measure the ACTUAL state size, then
# pick the physical strategy; never hard-code a broadcast of a table
# whose size is corpus-dependent. The table is persisted first (every
# caller re-reads it in the score join, so the count is never wasted
# work), and the gate compares its real row count: at or below the
# gate the hint is applied; above it the join is left UNHINTED, so it
# runs as a shuffle join on the md5-uniform word key (no skew) and AQE
# may still flip it to broadcast from runtime byte stats. At open-web
# scale q82's unigram table is marginal and q84's bigram table is
# vocab²-ish — plainly not broadcastable — which is exactly what the
# measured gate enforces.
_FREQ_BROADCAST_MAX_ROWS_CONF = "spark.voz.freqBroadcastMaxRows"
_FREQ_BROADCAST_MAX_ROWS = 8_000_000  # ≈ a few hundred MB of (word, count) rows


def _freq_broadcast_gate(df: DataFrame, n_rows: int) -> DataFrame:
    limit = int(
        df.sparkSession.conf.get(
            _FREQ_BROADCAST_MAX_ROWS_CONF, str(_FREQ_BROADCAST_MAX_ROWS)
        )
    )
    return F.broadcast(df) if n_rows <= limit else df


# ---------------------------------------------------------------------------
# q82: unigram-rarity quality scoring — the libm-free analogue of the
# n-gram-LM perplexity filters (KenLM-style) corpus pipelines use to
# rank documents: score each document by the mean corpus rarity of its
# tokens, rarity(w) = N_total / freq(w). A doc of common words scores
# ~low; a doc of corpus-rare tokens (mojibake, code soup, other-
# language contamination) scores high. Linear rarity keeps the exact
# cross-engine guarantee that ln()-based surprisal cannot.
#
# Scale shape: the frequency table is vocabulary-bounded but its size
# is corpus-dependent, so the broadcast is SIZE-GATED on the measured
# row count (_freq_broadcast_gate): sandbox vocabularies broadcast;
# past the gate the score join stays an unhinted shuffle join on the
# md5-uniform word key (no skew; AQE may still flip it from runtime
# stats). Per-doc rarity sums go through ROUND + DECIMAL so
# accumulation order never matters; the single corpus-sized exchange
# is the per-doc aggregate.
# ---------------------------------------------------------------------------


@register(
    "q82_unigram_rarity",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word FROM documents
),
wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM w WHERE word <> '' GROUP BY word),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM w WHERE word <> ''),
scored AS (
  SELECT w.doc_id,
         CAST(SUM(CAST(ROUND(CAST(tot.n_total AS DOUBLE) / wf.freq, 6) AS DECIMAL(38,6))) AS DOUBLE) AS rarity_sum,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM w JOIN wf USING (word) CROSS JOIN tot
  WHERE w.word <> ''
  GROUP BY w.doc_id
)
SELECT doc_id, n_words, rarity_sum / n_words AS mean_rarity
FROM scored ORDER BY mean_rarity DESC, doc_id LIMIT 100
""",
)
def q82_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 documents by mean unigram rarity (N_total / freq,
    DECIMAL-exact accumulation) — the perplexity-filter analogue."""
    d = T(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
    ).where(F.col("word") != "")
    # persisted: referenced by BOTH the total derivation and the score
    # join, and its measured count drives the broadcast gate
    wf = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .persist()
    )
    n_vocab = wf.count()
    # N_total == SUM(freq) by construction: derive it from the tiny
    # frequency table instead of a third full corpus explode pass
    tot = wf.agg(F.sum("freq").cast("long").alias("n_total"))
    rarity = F.round(F.col("n_total").cast("double") / F.col("freq"), 6).cast(
        "decimal(38,6)"
    )
    return (
        w.join(_freq_broadcast_gate(wf, n_vocab), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(rarity).cast("double").alias("rarity_sum"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
        .select(
            "doc_id",
            "n_words",
            # no ROUND: both engines divide the same DECIMAL-exact sum by
            # the same count once in IEEE double — bit-identical; a final
            # ROUND would re-introduce tie-breaking divergence at .5 ulps
            (F.col("rarity_sum") / F.col("n_words")).alias("mean_rarity"),
        )
        .orderBy(F.desc("mean_rarity"), "doc_id")
        .limit(100)
    )

# ---------------------------------------------------------------------------
# q83: cross-modal consistency audit — score every text-level near-dup
# pair (q28's banded SimHash pairs) by the cosine of the two docs'
# embeddings. In a healthy multimodal corpus, text near-dups should
# embed near each other; pairs where the modalities disagree expose
# either embedding-pipeline drift (stale/mismatched vectors) or
# templated pages that share words but not meaning. Every pair here is
# flagged inconsistent by construction — the synthetic embeddings are
# independent of the text, which is precisely what the audit detects.
#
# Scale shape: the near-dup pair table is orders of magnitude smaller
# than the corpus (it's the output of banded LSH), so it BROADCASTS
# against the embeddings scan twice (doc_a side, doc_b side); the
# cosine is the same in-row left-fold as q29 — no corpus-sized shuffle
# beyond q28's own banding.
# ---------------------------------------------------------------------------


def _q83_oracle() -> str:
    from voz_spark.dataprep import _DOT_DUCK
    from voz_spark.registry import REGISTRY

    q28 = REGISTRY["q28_simhash_neardup_pairs"].oracle
    cos = (
        f"ROUND({_DOT_DUCK.format(a='va', b='vb')}"
        f" / sqrt({_DOT_DUCK.format(a='va', b='va')} * {_DOT_DUCK.format(a='vb', b='vb')}), 6)"
    )
    return f"""
WITH nd AS ({q28}),
j AS (
  SELECT nd.doc_a, nd.doc_b, nd.hamming, ea.embedding AS va, eb.embedding AS vb
  FROM nd JOIN embeddings ea ON nd.doc_a = ea.vec_id
          JOIN embeddings eb ON nd.doc_b = eb.vec_id
)
SELECT doc_a, doc_b, hamming,
       {cos} AS cosine,
       ({cos} >= 0.5) AS modality_consistent
FROM j ORDER BY cosine, doc_a, doc_b
"""


@register("q83_crossmodal_audit", oracle=_q83_oracle())
def q83_crossmodal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text near-dup pairs (q28) scored by embedding cosine; pairs
    below the 0.5 agreement threshold are modality-inconsistent."""
    from voz_spark.dataprep import _DOT_SPARK, q28_simhash_neardup_pairs

    pairs = q28_simhash_neardup_pairs(spark, sf_dir)
    emb = T(spark, sf_dir, "embeddings")
    # broadcast-safety INVARIANT (why no size gate here, unlike
    # q82/q84): q28's pair table is bounded BY CONSTRUCTION — banded
    # candidates are hamming-filtered then `.limit(100)`-capped, and
    # the cap is mirrored in its oracle — so the build side is ≤100
    # rows at ANY corpus scale, never corpus-dependent
    # the pair-derived side stays broadcast in BOTH joins: the first
    # broadcasts the raw pair table against the doc_a lookup, the
    # second broadcasts that (still pair-sized) intermediate against
    # the doc_b lookup — the embeddings table is always the streamed
    # probe side and is never shuffled or broadcast
    half = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("va")).join(
        F.broadcast(pairs), "doc_a"
    )
    j = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("vb")).join(
        F.broadcast(half), "doc_b"
    )
    cos = F.round(
        F.expr(_DOT_SPARK.format(a="va", b="vb"))
        / F.sqrt(
            F.expr(_DOT_SPARK.format(a="va", b="va"))
            * F.expr(_DOT_SPARK.format(a="vb", b="vb"))
        ),
        6,
    )
    return (
        j.select(
            "doc_a",
            "doc_b",
            "hamming",
            cos.alias("cosine"),
            (cos >= 0.5).alias("modality_consistent"),
        )
        .orderBy("cosine", "doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q84: bigram-LM fluency scoring — the context-CONDITIONAL half of the
# n-gram-LM quality family (q82 is the context-free half): score each
# document by the mean conditional likelihood P(w|prev) =
# c(prev,w) / c(prev,·) of its adjacent token pairs under the corpus's
# own bigram counts. Word-salad / shuffled / boilerplate-stitched text
# has individually common words (q82 passes it) but rare TRANSITIONS —
# exactly what CCNet-style LM perplexity filters catch; linear
# likelihood instead of ln()-surprisal keeps the q82 exactness
# guarantee (no libm divergence across engines).
#
# Scale shape: bigrams are built IN-ROW (transform over the token
# array — no posexplode+window, so the corpus is never shuffled just
# to pair neighbors); the bigram-count table shuffles once on the
# (prev,w) key (md5-uniform words → no skew; at open-web scale it is
# NOT broadcastable, which the measured _freq_broadcast_gate enforces —
# sandbox-size counts broadcast, mirroring q82); the context totals
# c(prev,·) derive from the bigram table itself (vocabulary-bounded
# aggregate, never a second corpus pass). Per-doc sums are
# ROUND+DECIMAL so accumulation order never matters.
# ---------------------------------------------------------------------------


@register(
    "q84_bigram_fluency",
    oracle="""
WITH ws AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS w
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(2, len(w)+1), i -> {'prev': w[i-1], 'wd': w[i]})) AS b
  FROM ws WHERE len(w) >= 2
),
bgf AS (SELECT doc_id, b.prev AS prev, b.wd AS wd FROM bg),
bf AS (SELECT prev, wd, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bgf GROUP BY prev, wd),
cf AS (SELECT prev, CAST(SUM(c_bg) AS BIGINT) AS c_ctx FROM bf GROUP BY prev),
scored AS (
  SELECT g.doc_id,
         CAST(SUM(CAST(ROUND(CAST(b.c_bg AS DOUBLE) / c.c_ctx, 6) AS DECIMAL(38,6))) AS DOUBLE) AS cond_sum,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams
  FROM bgf g JOIN bf b USING (prev, wd) JOIN cf c USING (prev)
  GROUP BY g.doc_id
)
SELECT doc_id, n_bigrams, cond_sum / n_bigrams AS fluency
FROM scored ORDER BY fluency, doc_id LIMIT 100
""",
)
def q84_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-100 documents by mean bigram conditional likelihood
    P(w|prev) under the corpus's own bigram counts (DECIMAL-exact) —
    the context-sensitive LM fluency filter (CCNet-perplexity shape)."""
    d = T(spark, sf_dir, "documents")
    ws = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), '[^a-z]+'), x -> x != '')").alias("w"),
    ).where(F.size("w") >= 2)
    # in-row neighbor pairing: one corpus scan, zero shuffles to form bigrams
    bgf = ws.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(w)), i -> struct(w[i-2] as prev, w[i-1] as wd))"
            )
        ).alias("b"),
    ).select("doc_id", "b.prev", "b.wd")
    # persisted: bf is referenced twice (context totals + the LM join) —
    # without it the corpus-wide bigram explode and its shuffle would run
    # twice; its measured count also drives the broadcast gate
    bf = (
        bgf.groupBy("prev", "wd")
        .agg(F.count(F.lit(1)).cast("long").alias("c_bg"))
        .persist()
    )
    n_bigram_vocab = bf.count()
    # context totals from the bigram table (vocabulary-bounded), not a
    # second corpus pass; attach them to bf so the corpus joins ONCE
    cf = bf.groupBy("prev").agg(F.sum("c_bg").cast("long").alias("c_ctx"))
    # lm has exactly bf's rows (cf joins 1:1 on prev), so bf's count
    # gates it; at web scale a bigram table is vocab²-ish — the gate
    # leaves the score join unhinted there instead of forcing an OOM
    lm = _freq_broadcast_gate(bf.join(cf, "prev"), n_bigram_vocab)
    cond = F.round(F.col("c_bg").cast("double") / F.col("c_ctx"), 6).cast(
        "decimal(38,6)"
    )
    return (
        bgf.join(lm, ["prev", "wd"])
        .groupBy("doc_id")
        .agg(
            F.sum(cond).cast("double").alias("cond_sum"),
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("cond_sum") / F.col("n_bigrams")).alias("fluency"),
        )
        .orderBy("fluency", "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q87: the corpus BUILD — the end-to-end composition a shipping corpus
# actually runs, in ONE lazy DAG: quality gates (q73's integer-exact
# length/repetition/quality predicates) → exact content dedup (md5,
# min-doc_id survivor) → language-stratified deterministic downsample
# + decorrelated train/val/test split (q58's md5-slice rule). Each
# stage exists as its own audited operator; this query proves they
# COMPOSE without materialization barriers — Catalyst plans the whole
# pipeline as one job.
#
# Scale shape: gate signals fold in-row on the scan (no explode
# shuffle); the dedup window is the single corpus-sized Exchange
# (md5-uniform key, no skew); sampling/split are pure projections that
# Catalyst pushes after the dedup filter. One scan, one shuffle, then
# column math — at 100 TB the build is parquet-bandwidth-bound plus
# one exchange of the survivors.
# ---------------------------------------------------------------------------


def _q87_oracle() -> str:
    from voz_spark.dataprep import _LANG_STOPS

    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
),
wc AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
sig AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_word,
         CAST(SUM(CASE WHEN word IN {_LANG_STOPS} THEN c ELSE 0 END) AS BIGINT) AS stop_hits
  FROM wc GROUP BY doc_id
),
kept AS (
  SELECT d.doc_id, d.lang, d.source, d.text, s.n_words
  FROM documents d JOIN sig s USING (doc_id)
  WHERE NOT (
       (s.n_words < 20)
    OR (10 * (s.n_words - s.n_distinct) > 3 * s.n_words OR 5 * s.top_word > s.n_words)
    OR (20 * s.stop_hits < s.n_words
        OR 5 * length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g')) > d.n_chars)
  )
),
dd AS (
  SELECT doc_id, lang, source, n_words,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM kept
),
samp AS (
  SELECT doc_id, lang, source, n_words,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hs,
         substr(md5(CAST(doc_id AS VARCHAR)), 5, 4) AS hsplit
  FROM dd WHERE rn = 1
)
SELECT doc_id, lang, source, CAST(n_words AS BIGINT) AS n_tokens,
       CASE WHEN hsplit < 'cccc' THEN 'train'
            WHEN hsplit < 'e666' THEN 'val'
            ELSE 'test' END AS split
FROM samp
WHERE hs < CASE lang WHEN 'en' THEN '8000' WHEN 'zh' THEN 'c000'
                     WHEN 'es' THEN 'c000' ELSE 'ffff' END
ORDER BY doc_id
"""


@register("q87_corpus_build", oracle=_q87_oracle())
def q87_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build in one DAG: quality gates → exact
    content dedup → stratified sample + train/val/test split. The
    shipped-document manifest (doc_id, lang, source, n_tokens, split)."""
    from pyspark.sql import Window

    from voz_spark.dataprep import _LANG_STOPS, _MAX_RUN, _SPLIT_SLICE

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "text",
        "n_chars",
        F.split(F.trim("text"), r"\s+").alias("ws"),
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).alias("n_punct"),
    )
    s = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        "n_chars",
        "n_punct",
        F.size("ws").cast("long").alias("n_words"),
        F.size(F.array_distinct("ws")).cast("long").alias("n_distinct"),
        F.expr(_MAX_RUN.format(arr="ws")).alias("top_word"),
        F.expr(
            f"aggregate(transform(ws, x -> CASE WHEN x IN {_LANG_STOPS} THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a,b) -> a + b)"
        ).alias("stop_hits"),
    )
    g_short = F.col("n_words") < 20
    g_rep = (10 * (F.col("n_words") - F.col("n_distinct")) > 3 * F.col("n_words")) | (
        5 * F.col("top_word") > F.col("n_words")
    )
    g_qual = (20 * F.col("stop_hits") < F.col("n_words")) | (
        5 * F.col("n_punct") > F.col("n_chars")
    )
    kept = s.where(~(g_short | g_rep | g_qual))
    dd = (
        kept.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .where(F.col("rn") == 1)
    )
    hexes = F.md5(F.col("doc_id").cast("string"))
    hs = F.substring(hexes, 1, 4)
    hsplit = F.substring(hexes, *_SPLIT_SLICE)
    th = (
        F.when(F.col("lang") == "en", "8000")
        .when(F.col("lang").isin("zh", "es"), "c000")
        .otherwise("ffff")
    )
    return (
        dd.where(hs < th)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_words").cast("long").alias("n_tokens"),
            F.when(hsplit < "cccc", "train")
            .when(hsplit < "e666", "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q90: retrieval-quality evaluation (recall@k + MRR) — the eval loop a
# multimodal training pipeline runs after building its embedding index
# (CLIP-style: does nearest-neighbor search return the right items?).
# Queries are a bounded probe set; a neighbor is RELEVANT when it
# shares the query's label; per label we report recall@1, recall@5 and
# the mean reciprocal rank of the first relevant neighbor.
#
# Exactness: cosine is q29's in-row left fold rounded to 6dp; the rank
# of the first relevant neighbor is computed WITHOUT a corpus-sized
# window — it equals 1 + |{neighbors strictly ahead of the best
# relevant one under the total order (cosine DESC, nid ASC)}|, a pure
# hash aggregate. Reciprocal ranks go through ROUND + DECIMAL so the
# per-label sum is order-independent; the final mean is one IEEE
# division of identical exact operands (the q82 discipline). The
# DuckDB oracle uses the window formulation of the same total order —
# provably the same first_rank.
#
# Scale shape: the probe set broadcasts (it is small by construction);
# the corpus is scanned twice (best-relevant pass, count-ahead pass) —
# each pass is broadcast-join + map-side-combined aggregate on ≤|probe|
# keys, so NOTHING corpus-sized ever shuffles. A window formulation
# would sort |corpus| rows per query; this one never does.
# ---------------------------------------------------------------------------

_Q90_PROBES = 50


def _q90_oracle() -> str:
    from voz_spark.dataprep import _DOT_DUCK

    dot = _DOT_DUCK.format(a="qe", b="ne")
    qq = _DOT_DUCK.format(a="qe", b="qe")
    nn = _DOT_DUCK.format(a="ne", b="ne")
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe, label AS qlabel
  FROM embeddings WHERE vec_id < {_Q90_PROBES}
),
e AS (SELECT vec_id AS nid, embedding AS ne, label AS nlabel FROM embeddings),
scored AS (
  SELECT qid, qlabel, nid, nlabel,
         ROUND({dot} / sqrt({qq} * {nn}), 6) AS cosine
  FROM q, e WHERE qid <> nid
),
ranked AS (
  SELECT qid, qlabel, nlabel,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
  FROM scored
),
firstrel AS (
  SELECT qid, qlabel, MIN(rnk) AS first_rank
  FROM ranked WHERE nlabel = qlabel GROUP BY qid, qlabel
)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN first_rank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
       CAST(SUM(CASE WHEN first_rank <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_5,
       CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / first_rank, 9) AS DECIMAL(38,9))) AS DOUBLE)
         / COUNT(*) AS mrr
FROM firstrel GROUP BY qlabel ORDER BY qlabel
"""


@register("q90_retrieval_eval", oracle=_q90_oracle())
def q90_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label recall@1/@5 and MRR of label-relevant nearest-neighbor
    retrieval over the embedding table, probe set = vec_id < 50. The
    first-relevant rank is two broadcast-side hash aggregates (best
    relevant neighbor, then count-strictly-ahead) — no corpus window."""
    from voz_spark.dataprep import _DOT_SPARK

    emb = T(spark, sf_dir, "embeddings")
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
        F.broadcast(q)
        .crossJoin(e)
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
    # best relevant neighbor per probe under (cosine DESC, nid ASC):
    # max of (cosine, -nid) — ≤ |probe| rows, broadcasts back
    best = (
        scored.where(F.col("nlabel") == F.col("qlabel"))
        .groupBy("qid")
        .agg(
            F.max(
                F.struct(F.col("cosine").alias("c"), (-F.col("nid")).alias("m"))
            ).alias("b")
        )
        .select("qid", F.col("b.c").alias("bc"), F.col("b.m").alias("bm"))
    )
    ahead = (F.col("cosine") > F.col("bc")) | (
        (F.col("cosine") == F.col("bc")) & ((-F.col("nid")) > F.col("bm"))
    )
    per_q = (
        scored.join(F.broadcast(best), "qid")
        .groupBy("qid", "qlabel")
        .agg(
            (1 + F.sum(F.when(ahead, 1).otherwise(0))).cast("long").alias("first_rank")
        )
    )
    return (
        per_q.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(F.when(F.col("first_rank") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hits_at_1"),
            F.sum(F.when(F.col("first_rank") <= 5, 1).otherwise(0))
            .cast("long")
            .alias("hits_at_5"),
            F.sum(
                F.round(F.lit(1.0) / F.col("first_rank"), 9).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("rr_sum"),
        )
        .select(
            "label",
            "n_queries",
            "hits_at_1",
            "hits_at_5",
            (F.col("rr_sum") / F.col("n_queries")).alias("mrr"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q106: paragraph-level dedup with document reconstruction — the
# RefinedWeb/CCNet line-dedup stage: cookie banners, navigation
# blocks, and signatures repeat across thousands of pages; whole-doc
# dedup (q20) keeps them and span-level stats (q81) only measure
# them. This op REMOVES paragraphs whose cross-document frequency
# exceeds a threshold and reassembles each document in original
# paragraph order.
#
# Scale shape: the high-df paragraph set is TINY by construction
# (boilerplate is the thing that repeats; the long tail is unique),
# so after one uniform-key df aggregate the removal is a BROADCAST
# anti-join of the corpus against the blocklist — the corpus itself
# is never re-shuffled for membership. Reconstruction is one
# per-doc aggregate: collect (pos, para), array_sort, join — order
# restored without a window. Both engines rebuild the text
# identically (Spark array_sort struct order ≡ DuckDB string_agg
# ORDER BY pos) and compare via md5, the cross-engine hash.
# ---------------------------------------------------------------------------

Q106_PARADOCS_PATH = "/tmp/voz_spark_q106_paradocs"
_Q106_DOCS = 300
_Q106_DF_MAX = 10  # a paragraph in more docs than this is boilerplate

_Q106_BOILER = [
    "subscribe to our newsletter for daily updates",
    "copyright 2024 voz forum all rights reserved",
    "accept cookies to continue browsing this site",
    "download our mobile app for the full experience",
]


def _paradoc_rows():
    import pandas as pd

    rows = []
    for d in range(_Q106_DOCS):
        paras = []
        n_body = 4 + d % 5
        for i in range(n_body):
            paras.append(f"body paragraph {d:03d}-{i} with its own unique words {d * 31 + i}")
        # deterministic boilerplate insertions: header, footer, and for
        # every third doc an extra mid-document banner
        paras.insert(0, _Q106_BOILER[d % 4])
        if d % 3 == 0:
            paras.insert(2, _Q106_BOILER[(d + 1) % 4])
        paras.append(_Q106_BOILER[(d + 2) % 4])
        rows.append({"doc_id": d, "text": "\n\n".join(paras)})
    return pd.DataFrame(rows)


_Q106_SEP = "chr(10) || chr(10)"

_Q106_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, {_Q106_SEP}) AS paras
  FROM read_parquet('{Q106_PARADOCS_PATH}/*.parquet')
),
e AS (
  SELECT doc_id,
         UNNEST(paras) AS para,
         UNNEST(range(1, len(paras) + 1)) AS pos
  FROM d
),
f AS (
  SELECT para FROM e GROUP BY para
  HAVING COUNT(DISTINCT doc_id) > {_Q106_DF_MAX}
),
kept AS (
  SELECT e.* FROM e ANTI JOIN f USING (para)
),
tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM e GROUP BY doc_id),
rebuilt AS (
  SELECT doc_id,
         COUNT(*) AS n_kept,
         md5(string_agg(para, {_Q106_SEP} ORDER BY pos)) AS clean_md5
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, t.n_paras,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       t.n_paras - CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.clean_md5, md5('')) AS clean_md5
FROM tot t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
"""


@register("q106_paragraph_dedup", oracle=_Q106_ORACLE)
def q106_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove paragraphs appearing in more than DF_MAX documents and
    rebuild each document in original paragraph order; returns per-doc
    kept/removed counts and the md5 of the cleaned text."""
    from voz_spark.imagedup import _materialized

    docs = _materialized(
        spark,
        Q106_PARADOCS_PATH,
        f"docs={_Q106_DOCS};v1",
        lambda: spark.createDataFrame(_paradoc_rows()),
    )
    e = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n\n")).alias("pos0", "para")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "para")
    blocklist = (
        e.groupBy("para")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") > _Q106_DF_MAX)
        .select("para")
    )
    kept = e.join(F.broadcast(blocklist), "para", "left_anti")
    tot = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_paras"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                "\n\n",
                F.expr("transform(array_sort(collect_list(struct(pos, para))), x -> x.para)"),
            )
        ).alias("clean_md5"),
    )
    return (
        tot.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_paras") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q114: span-level PII redaction — q77 pseudonymizes STRUCTURED
# identifier columns; free text needs span-level scrubbing before it
# can ship in a corpus: emails, phone numbers, and long card-like
# digit runs are replaced with typed placeholders IN PLACE, keeping
# the surrounding text trainable. The redaction order matters (cards
# before phones before bare digit runs, emails first so their digits
# aren't half-eaten) and is identical in both engines.
#
# Scale shape: three chained regexp_replace calls + three
# regexp_count calls fold into ONE in-row Project on the scan — no
# UDF, no explode, no shuffle except the display sort. Redacted text
# is compared by md5.
# ---------------------------------------------------------------------------

Q114_PII_PATH = "/tmp/voz_spark_q114_pii"

_PII_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]{2,}"
_PII_CARD = "[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}"
_PII_PHONE = "0[0-9]{9}"


def _pii_rows():
    import pandas as pd

    rows = []
    for d in range(240):
        parts = [f"user review {d} says the build runs great"]
        if d % 3 == 0:
            parts.append(f"contact me at user{d}@mail{d % 7}.test for parts")
        if d % 4 == 1:
            parts.append(f"call 09{d % 10}{d % 7}1234{d % 10:02d} after noon")
        if d % 5 == 2:
            parts.append(f"paid with 4000-12{d % 10:02d}-5678-90{d % 10:02d} yesterday")
        rows.append({"doc_id": d, "text": " ".join(parts)})
    return pd.DataFrame(rows)


_Q114_ORACLE = f"""
WITH r AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM read_parquet('{Q114_PII_PATH}/*.parquet')
),
c AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{_PII_CARD}')) AS BIGINT) AS n_cards,
         regexp_replace(t1, '{_PII_CARD}', '<CARD>', 'g') AS t2
  FROM r
),
p AS (
  SELECT doc_id, n_emails, n_cards,
         CAST(len(regexp_extract_all(t2, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
         regexp_replace(t2, '{_PII_PHONE}', '<PHONE>', 'g') AS clean
  FROM c
)
SELECT doc_id, n_emails, n_cards, n_phones,
       n_emails + n_cards + n_phones AS n_redacted,
       md5(clean) AS clean_md5
FROM p
ORDER BY doc_id
"""


@register("q114_pii_redaction", oracle=_Q114_ORACLE)
def q114_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed in-place PII redaction (email → card → phone, in that
    order) with per-doc counts; redacted text compared by md5. One
    in-row regexp Project, no shuffle but the display sort."""
    from voz_spark.imagedup import _materialized

    docs = _materialized(
        spark,
        Q114_PII_PATH,
        "pii=v1",
        lambda: spark.createDataFrame(_pii_rows()),
    )
    t1 = F.regexp_replace("text", _PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, _PII_CARD, "<CARD>")
    clean = F.regexp_replace(t2, _PII_PHONE, "<PHONE>")
    n_emails = F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0)).cast("long")
    n_cards = F.size(F.regexp_extract_all(t1, F.lit(_PII_CARD), 0)).cast("long")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(_PII_PHONE), 0)).cast("long")
    return (
        docs.select(
            "doc_id",
            n_emails.alias("n_emails"),
            n_cards.alias("n_cards"),
            n_phones.alias("n_phones"),
            (n_emails + n_cards + n_phones).alias("n_redacted"),
            F.md5(clean).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q115: deterministic training-order shuffle — reproducible GLOBAL
# permutation of the corpus for a given (epoch, seed): order by
# md5(seed || doc_id). Training-data order must be (a) uniform —
# md5 of a unique key is — and (b) exactly reproducible across reruns
# and engines, which a rand()-based shuffle is not.
#
# Scale shape: the naive formulation is ROW_NUMBER over a global
# order — one partition, dead at scale. The scale formulation splits
# the key: shard = first 2 hex chars (256 uniform shards; a writer
# maps shards to output files), position = rank WITHIN the shard
# (window on the uniform shard key). Global order is recovered as
# (shard, pos) lexicographically — exactly what a sharded dataset
# loader consumes — without any single-partition stage.
# ---------------------------------------------------------------------------

_Q115_SEED = "epoch7"

_Q115_ORACLE = f"""
WITH k AS (
  SELECT doc_id, md5('{_Q115_SEED}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
),
s AS (
  SELECT doc_id, shuffle_key, substr(shuffle_key, 1, 2) AS shard,
         ROW_NUMBER() OVER (PARTITION BY substr(shuffle_key, 1, 2)
                            ORDER BY shuffle_key, doc_id) AS pos_in_shard
  FROM k
)
SELECT doc_id, shuffle_key, shard, CAST(pos_in_shard AS BIGINT) AS pos_in_shard
FROM s
ORDER BY shard, pos_in_shard
"""


@register("q115_training_shuffle", oracle=_Q115_ORACLE)
def q115_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle: key = md5(seed || doc_id),
    shard = first key byte (256 uniform shards), position ranked
    within shard — global order = (shard, pos) with NO global window."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit(_Q115_SEED), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    s = d.withColumn("shard", F.substring("shuffle_key", 1, 2))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        s.withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select("doc_id", "shuffle_key", "shard", "pos_in_shard")
        .orderBy("shard", "pos_in_shard")
    )


# ---------------------------------------------------------------------------
# q122: min-wise stratified eval sampling — carve an eval set with an
# EXACT per-stratum quota (k docs per (lang, source)): rank each doc
# by md5(doc_id) within its stratum and keep the k smallest. Min-wise
# hashing gives a uniform, seedable, engine-exact sample; q58's hash
# split gives proportional rates, this gives exact counts — the shape
# an eval benchmark needs (e.g. exactly 10 per language).
#
# Scale shape: one window over the uniform (lang, source) stratum key
# — the stratum count is bounded, membership is decided by a rank
# within each stratum, and the md5 order makes re-runs (and engines)
# agree byte-for-byte.
# ---------------------------------------------------------------------------

_Q122_K = 10

_Q122_ORACLE = f"""
WITH r AS (
  SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS hs,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT lang, source, doc_id, hs AS sample_key, CAST(rn AS BIGINT) AS rank_in_stratum
FROM r WHERE rn <= {_Q122_K}
ORDER BY lang, source, rank_in_stratum
"""


@register("q122_eval_sample", oracle=_Q122_ORACLE)
def q122_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly K docs per (lang, source) stratum, chosen by min-wise
    md5 rank — uniform, deterministic, engine-exact."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.md5(F.col("doc_id").cast("string")).alias("hs")
    )
    w = Window.partitionBy("lang", "source").orderBy("hs", "doc_id")
    return (
        d.withColumn("rank_in_stratum", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_stratum") <= _Q122_K)
        .select("lang", "source", "doc_id", F.col("hs").alias("sample_key"), "rank_in_stratum")
        .orderBy("lang", "source", "rank_in_stratum")
    )


# ---------------------------------------------------------------------------
# q123: dataset-card rollup — the per-source summary block a corpus
# release ships with (the HuggingFace dataset-card numbers): doc and
# token counts, exact-duplicate rate (q20's md5 rule), and short-doc
# rate, every ratio in integer millis. One scan feeds BOTH aggregates
# (per-doc facts fold in-row; the dup rate needs its own content-md5
# aggregate) and the final join is |sources|-sized.
# ---------------------------------------------------------------------------

_Q123_ORACLE = """
WITH f AS (
  SELECT source, doc_id, md5(text) AS cmd5,
         len(string_split(trim(text), ' ')) AS n_ws,
         (LENGTH(text) < 120) AS short
  FROM documents
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_ws) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN short THEN 1 ELSE 0 END) AS BIGINT) AS n_short
  FROM f GROUP BY source
),
dups AS (
  SELECT source, CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs
  FROM (SELECT source, cmd5, COUNT(*) AS c FROM f GROUP BY 1, 2) g
  GROUP BY source
)
SELECT p.source, p.n_docs, p.n_tokens,
       p.n_tokens // p.n_docs AS tokens_per_doc,
       d.n_dup_docs,
       d.n_dup_docs * 1000 // p.n_docs AS dup_rate_milli,
       p.n_short * 1000 // p.n_docs AS short_rate_milli
FROM per_src p JOIN dups d ON p.source = d.source
ORDER BY p.source
"""


@register("q123_dataset_card", oracle=_Q123_ORACLE)
def q123_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source release-card stats: docs, whitespace tokens,
    tokens/doc (floor), exact-dup rate and short-doc rate in integer
    millis."""
    f = T(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.md5("text").alias("cmd5"),
        F.size(F.split(F.trim("text"), " ")).alias("n_ws"),
        (F.length("text") < 120).alias("short"),
    )
    per_src = f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").cast("long").alias("n_tokens"),
        F.sum(F.col("short").cast("int")).cast("long").alias("n_short"),
    )
    dups = (
        f.groupBy("source", "cmd5")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(F.sum(F.col("c") - 1).cast("long").alias("n_dup_docs"))
    )
    return (
        per_src.join(dups, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("n_tokens div n_docs").alias("tokens_per_doc"),
            "n_dup_docs",
            F.expr("n_dup_docs * 1000 div n_docs").alias("dup_rate_milli"),
            F.expr("n_short * 1000 div n_docs").alias("short_rate_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q124: quality-decile curation tiers — the "keep the top-k deciles
# per source" curation rule (DCLM/FineWeb-style percentile gating,
# where the threshold adapts PER SOURCE instead of one global
# cutoff). Score is an integer milli stopword ratio (q21's signal
# family, integer-exact); NTILE(10) under the (score, doc_id) total
# order is engine-identical by the SQL-standard bucket rule.
#
# Scale shape: one window on the uniform source key assigns deciles,
# then one (source, decile) aggregate — both map-side-combinable
# keys; no global sort.
# ---------------------------------------------------------------------------

_Q124_ORACLE = """
WITH s AS (
  SELECT doc_id, source,
         CAST(len([t FOR t IN string_split(trim(text), ' ')
               IF t IN ('the', 'a', 'of', 'and', 'to')]) AS BIGINT) * 1000
           // CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS score_milli
  FROM documents
  WHERE len(string_split(trim(text), ' ')) > 0
),
d AS (
  SELECT *, NTILE(10) OVER (PARTITION BY source ORDER BY score_milli, doc_id) AS decile
  FROM s
)
SELECT source, CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_docs,
       CAST(MIN(score_milli) AS BIGINT) AS min_score,
       CAST(MAX(score_milli) AS BIGINT) AS max_score,
       (decile >= 8) AS keep
FROM d
GROUP BY source, decile
ORDER BY source, decile
"""


@register("q124_quality_deciles", oracle=_Q124_ORACLE)
def q124_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality deciles (NTILE over the integer-milli
    stopword score under a total order); deciles 8-10 carry the keep
    flag — the adaptive per-source curation threshold."""
    from pyspark.sql import Window

    stops = "('the', 'a', 'of', 'and', 'to')"
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.trim("text"), " ").alias("toks"),
    )
    s = d.where(F.size("toks") > 0).select(
        "doc_id",
        "source",
        F.expr(
            f"aggregate(transform(toks, t -> CASE WHEN t IN {stops} THEN CAST(1 AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a, b) -> a + b) * 1000"
            " div CAST(size(toks) AS BIGINT)"
        ).alias("score_milli"),
    )
    w = Window.partitionBy("source").orderBy("score_milli", "doc_id")
    dec = s.withColumn("decile", F.ntile(10).over(w).cast("long"))
    return (
        dec.groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score_milli").cast("long").alias("min_score"),
            F.max("score_milli").cast("long").alias("max_score"),
        )
        .select("source", "decile", "n_docs", "min_score", "max_score",
                (F.col("decile") >= 8).alias("keep"))
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# q126: size-balanced output-shard planning — the writer-side
# counterpart of q115: a 100 TB corpus ships as ~fixed-size files
# (the small-files problem in reverse), so each writer task packs its
# documents greedily into TARGET-byte files: file_no = (running
# bytes before this doc) div TARGET. Deterministic (md5 order), so
# the file manifest is reproducible across engines and re-runs.
#
# Scale shape: docs are assigned to 16 md5-prefix writer tasks
# (uniform), ONE window per task computes the running byte sum, and
# the file manifest is one (task, file_no) aggregate. No global
# coordination: each task packs independently — exactly how a
# distributed writer works.
# ---------------------------------------------------------------------------

_Q126_TARGET = 2000  # bytes per output file (test-scale analogue of ~1 GB)

_Q126_ORACLE = f"""
WITH k AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS key,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS task
  FROM documents
),
w AS (
  SELECT *, CAST(SUM(n_chars) OVER (PARTITION BY task ORDER BY key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS before_bytes
  FROM k
),
a AS (
  SELECT task, COALESCE(before_bytes, 0) // {_Q126_TARGET} AS file_no, doc_id, n_chars
  FROM w
)
SELECT task, CAST(file_no AS BIGINT) AS file_no, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS file_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM a
GROUP BY task, file_no
ORDER BY task, file_no
"""


@register("q126_output_shard_plan", oracle=_Q126_ORACLE)
def q126_output_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy TARGET-byte file packing per md5-prefix writer task:
    file_no = running-bytes-before div TARGET. One per-task window +
    one manifest aggregate; tasks pack independently."""
    from pyspark.sql import Window

    k = T(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("key"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("task"),
    )
    w = Window.partitionBy("task").orderBy("key", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    a = k.withColumn(
        "before_bytes", F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("long")
    ).withColumn("file_no", F.expr(f"before_bytes div {_Q126_TARGET}"))
    return (
        a.groupBy("task", "file_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("file_bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("task", "file_no")
    )


# ---------------------------------------------------------------------------
# q133: fixed-quota curriculum interleave — the warm-up head of a
# training run wants the best R documents from EVERY qualifying source
# in strict round-robin order (rank-1 docs of all sources first, then
# rank-2, ...), so early steps see the full source mixture at top
# quality instead of whatever one shard happened to hold. This is the
# deterministic ordering complement of q79's mixture WEIGHTS and
# q115's uniform shuffle.
#
# Scale shape: the global training order is a TOTAL order computed
# WITHOUT any global window — per-source rank is one window on the
# uniform source key (output bounded to R rows/source), the source
# index comes from a |sources|-row aggregate joined back broadcast,
# and the global position is pure arithmetic:
#   global_pos = (rk - 1) * |S| + src_idx.
# The fixed quota (only sources with >= R docs qualify) is exactly
# what makes the arithmetic exact — every round-robin round is full.
# The DuckDB oracle computes the SAME positions with an actual global
# ROW_NUMBER, proving the windowless construction equals the window.
# ---------------------------------------------------------------------------

_Q133_R = 10  # per-source quota


def _q133_oracle() -> str:
    return f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS src_n
  FROM documents
),
head AS (
  SELECT doc_id, source, n_chars, rk FROM ranked
  WHERE src_n >= {_Q133_R} AND rk <= {_Q133_R}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rk, source) AS BIGINT) AS global_pos,
       doc_id, source, rk, n_chars
FROM head
ORDER BY global_pos
"""


@register("q133_curriculum_interleave", oracle=_q133_oracle())
def q133_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin curriculum head: top-{R} docs per qualifying source,
    globally ordered rank-major — the global position is computed
    arithmetically (no global window)."""
    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
    )
    # qualifying sources + their rank among qualifiers: a |sources|-row
    # aggregate; the window below runs over that tiny table, then joins
    # back broadcast
    src_counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("src_n"))
    qual = src_counts.where(F.col("src_n") >= _Q133_R).select("source")
    sw = Window.orderBy("source")
    src_idx = qual.withColumn("src_idx", F.row_number().over(sw))
    n_src = src_idx.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_src")
    )
    head = ranked.where(F.col("rk") <= _Q133_R).join(
        F.broadcast(src_idx), "source"
    )
    return (
        head.crossJoin(F.broadcast(n_src))
        .select(
            (
                (F.col("rk") - F.lit(1)) * F.col("n_src")
                + F.col("src_idx")
            ).cast("long").alias("global_pos"),
            "doc_id",
            "source",
            "rk",
            "n_chars",
        )
        .orderBy("global_pos")
    )


# ---------------------------------------------------------------------------
# q204: inverted-index conjunctive search — the corpus tooling query
# "every document containing ALL of these terms, best-first". A
# LIKE-scan over 100 TB of text per lookup is a full corpus read; the
# inverted index turns it into posting-list intersection: postings
# (term, doc_id, tf) are built ONCE by one explode + one
# partial-combining aggregate, and a conjunctive query reads only the
# query terms' lists (in production the posting table is materialized
# bucketed-by-term, so the IN-filter is a bucket prune; here it cuts
# the exploded stream before the aggregate).
#
# The AND is counting, not self-joining: a doc matches iff it carries
# all |Q| query terms, so grouping the filtered postings by doc and
# keeping groups of size |Q| replaces a |Q|-way join — one shuffle,
# no pairwise intermediate. Ranking is sum-tf (bounded: the LIMIT-20
# global sort runs on the already-matched docs only).
# ---------------------------------------------------------------------------

_Q204_TERMS = ("hash", "merge", "window")

_Q204_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
p AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM tok
  WHERE term IN ('{_Q204_TERMS[0]}', '{_Q204_TERMS[1]}', '{_Q204_TERMS[2]}')
  GROUP BY 1, 2
),
m AS (
  SELECT doc_id, COUNT(*) AS n_terms, SUM(tf) AS tf_total
  FROM p GROUP BY 1 HAVING COUNT(*) = {len(_Q204_TERMS)}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_terms AS INT) AS n_terms,
       CAST(tf_total AS BIGINT) AS tf_total
FROM m ORDER BY tf_total DESC, doc_id LIMIT 20
"""


@register("q204_inverted_index_search", oracle=_Q204_ORACLE)
def q204_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list build (explode + one combine-friendly aggregate)
    and conjunctive top-k via group-count intersection."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    p = (
        tok.where(F.col("term").isin(list(_Q204_TERMS)))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    m = (
        p.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("tf_total"))
        .where(F.col("n_terms") == len(_Q204_TERMS))
    )
    return (
        m.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_terms").cast("int").alias("n_terms"),
            F.col("tf_total").cast("long").alias("tf_total"),
        )
        .orderBy(F.col("tf_total").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q205: bitmap segment index — predicate evaluation over membership
# BITMAPS instead of rows (the roaring/zone-map idea in its exact
# small form). Docs are packed 32 to a segment (slot = doc_id % 32);
# each indexed predicate becomes one int64 bitmap per segment via a
# bit_or aggregate. A conjunctive query with a negation then runs
# ENTIRELY on the index: AND = &, AND NOT = & (valid ^ kw); the source predicate is a src1* prefix class so all three bitmaps are non-trivial at every SF — 32 docs
# per machine word, never touching the text again. The audit column
# n_match_direct recomputes each segment's count from the rows; the
# test pins bitmap == direct on every segment.
#
# Scale shape: the index build is one partial-combining bit_or
# aggregate keyed by segment (combiners OR per-task partials — the
# same associativity that makes it mergeable across days); query
# evaluation is in-row arithmetic on the 32x-smaller index table.
# Slots are 32 wide so every bitmap stays in non-negative int64
# range in both engines (1<<63 sign traps avoided by design).
# ---------------------------------------------------------------------------

_Q205_ORACLE = """
WITH d AS (
  SELECT doc_id // 32 AS seg,
         CAST(1 AS BIGINT) << CAST(doc_id % 32 AS INT) AS bit,
         lang = 'en' AS is_en,
         source LIKE 'src1%' AS is_src0,
         position('spark' IN text) > 0 AS has_kw
  FROM documents
),
b AS (
  SELECT seg,
         COUNT(*) AS n_docs,
         bit_or(bit) AS valid_bm,
         bit_or(CASE WHEN is_en THEN bit ELSE 0 END) AS en_bm,
         bit_or(CASE WHEN is_src0 THEN bit ELSE 0 END) AS src_bm,
         bit_or(CASE WHEN has_kw THEN bit ELSE 0 END) AS kw_bm,
         SUM(CASE WHEN is_en AND is_src0 AND NOT has_kw THEN 1 ELSE 0 END)
           AS n_direct
  FROM d GROUP BY 1
)
SELECT CAST(seg AS BIGINT) AS seg,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(valid_bm AS BIGINT) AS valid_bm,
       CAST(bit_count(en_bm & src_bm & xor(valid_bm, kw_bm)) AS INT)
         AS n_match_bitmap,
       CAST(n_direct AS INT) AS n_match_direct
FROM b ORDER BY seg
"""


@register("q205_bitmap_segment_index", oracle=_Q205_ORACLE)
def q205_bitmap_segment_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-docs-per-word membership bitmaps per segment (one bit_or
    aggregate); conjunction-with-negation evaluated on the index."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    d = docs.select(
        F.expr("doc_id div 32").alias("seg"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 32 AS INT))").alias("bit"),
        (F.col("lang") == "en").alias("is_en"),
        F.col("source").startswith("src1").alias("is_src0"),
        (F.instr(F.col("text"), "spark") > 0).alias("has_kw"),
    )
    b = d.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("bit_or(bit)").alias("valid_bm"),
        F.expr("bit_or(CASE WHEN is_en THEN bit ELSE 0 END)").alias("en_bm"),
        F.expr("bit_or(CASE WHEN is_src0 THEN bit ELSE 0 END)").alias("src_bm"),
        F.expr("bit_or(CASE WHEN has_kw THEN bit ELSE 0 END)").alias("kw_bm"),
        F.sum(
            F.when(
                F.col("is_en") & F.col("is_src0") & ~F.col("has_kw"), 1
            ).otherwise(0)
        ).alias("n_direct"),
    )
    return b.select(
        F.col("seg").cast("long").alias("seg"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("valid_bm").cast("long").alias("valid_bm"),
        F.bit_count(
            F.expr("en_bm & src_bm & (valid_bm ^ kw_bm)")
        ).cast("int").alias("n_match_bitmap"),
        F.col("n_direct").cast("int").alias("n_match_direct"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# q215: crawl novelty curve — "how much NEW text does each crawl
# round actually add?" The value of round r is not its row count but
# its share of shingles never seen in rounds < r; when the novelty
# rate flattens, further crawling of that source is paying for
# duplicates (the measurement behind recrawl-budget decay, feeding
# q139's ROI and q100's tiers). Rounds here are doc_id % 6 — the
# deterministic stand-in for crawl-round provenance.
#
# Scale shape: shingling (word trigrams) is in-row (one transform per
# doc, no pair joins); the stream aggregates FIRST to distinct
# (shingle, round) — partial-combining — then per-shingle min(round)
# and the bounded per-round rollup. One shuffle on the shingle key,
# one on the 6-value round key. Shingles stay plain strings so both
# engines agree trivially; production would xxhash64 them (q24's
# idiom) without changing the shape.
# ---------------------------------------------------------------------------

_Q215_ORACLE = """
WITH tok AS (
  SELECT doc_id, doc_id % 6 AS round, string_split(text, ' ') AS tk FROM documents
),
tri AS (
  SELECT doc_id, round,
         UNNEST(list_transform(range(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
           AS g
  FROM tok WHERE len(tk) >= 3
),
pres AS (SELECT DISTINCT round, g FROM tri),
first AS (SELECT g, MIN(round) AS first_round FROM pres GROUP BY 1),
docs AS (SELECT doc_id % 6 AS round, COUNT(*) AS n_docs FROM documents GROUP BY 1)
SELECT CAST(pres.round AS BIGINT) AS round,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN first.first_round = pres.round THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(1000 * SUM(CASE WHEN first.first_round = pres.round THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS novelty_milli
FROM pres JOIN first USING (g) JOIN docs ON docs.round = pres.round
GROUP BY pres.round, n_docs ORDER BY pres.round
"""


@register("q215_novelty_curve", oracle=_Q215_ORACLE)
def q215_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-round distinct shingles and first-seen (novel) share —
    in-row trigram shingling, distinct-then-min, bounded rollup."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 6).alias("round"), F.split("text", " ").alias("tk")
    )
    tri = d.where(F.size("tk") >= 3).select(
        "round",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 3),"
                " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"
            )
        ).alias("g"),
    )
    pres = tri.distinct()
    first = pres.groupBy("g").agg(F.min("round").alias("first_round"))
    docs = (
        T(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % 6).alias("round"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        pres.join(first, "g")
        .groupBy("round")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_round") == F.col("round"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .join(docs, "round")
        .select(
            F.col("round").cast("long").alias("round"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.expr("1000 * n_novel div n_shingles").cast("long").alias("novelty_milli"),
        )
        .orderBy("round")
    )


# ---------------------------------------------------------------------------
# q224: tokenizer training — iterative BPE merge rounds (Sennrich et
# al. 2016; the training loop behind every production BPE/WordPiece
# vocab). q76 computes ONE round of adjacent-pair counts; this runs
# the actual iteration: R rounds of (count adjacent symbol pairs
# weighted by word frequency → pick the global argmax pair → merge
# every greedy-leftmost non-overlapping occurrence inside every word).
#
# Scale shape: the corpus is scanned ONCE into the word-frequency
# table (bounded by |vocab|, persisted); every round after that runs
# on that bounded table — one partial-combining pair aggregate, one
# O(1) argmax scalar to the driver (the global-argmax dependency is
# inherent to BPE; industrial trainers do exactly this), and one
# IN-ROW fold that rewrites each word's symbol array with zero
# shuffle. Nothing per-round touches the corpus again.
#
# Two algorithms, one answer (q208 discipline): Spark merges via a
# left-fold over the symbol array (a just-merged symbol is strictly
# longer than the pair's left element, so the fold is exactly greedy
# leftmost non-overlapping); the oracle merges via the declarative
# gaps-and-islands form (mark matching positions, take odd offsets
# within each run of consecutive marks, drop consumed right halves).
# Their agreement on every word IS the correctness gate.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_round_sql(k: int) -> str:
    """One unrolled BPE round k: argmax pair m{k} from s{k}, merged
    symbol stream s{k+1}."""
    return f"""
p{k} AS (
  SELECT sym AS l, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r, wt
  FROM s{k} QUALIFY r IS NOT NULL
),
m{k} AS (SELECT l, r, SUM(wt) AS c FROM p{k} GROUP BY l, r ORDER BY c DESC, l, r LIMIT 1),
t{k} AS (
  SELECT word, wt, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt,
         CASE WHEN sym = (SELECT l FROM m{k})
               AND lead(sym) OVER (PARTITION BY word ORDER BY pos) = (SELECT r FROM m{k})
              THEN 1 ELSE 0 END AS mk
  FROM s{k}
),
g{k} AS (
  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY word, mk ORDER BY pos) AS isl FROM t{k}
),
k{k} AS (
  SELECT *, CASE WHEN mk = 1
                  AND ROW_NUMBER() OVER (PARTITION BY word, mk, isl ORDER BY pos) % 2 = 1
                 THEN 1 ELSE 0 END AS tk
  FROM g{k}
),
s{k + 1} AS (
  SELECT word, wt, ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN tk = 1 THEN sym || nxt ELSE sym END AS sym
  FROM (SELECT *, lag(tk, 1, 0) OVER (PARTITION BY word ORDER BY pos) AS ptk FROM k{k})
  WHERE ptk = 0
)"""


_Q224_ORACLE = (
    """
WITH words AS (
  SELECT word, COUNT(*) AS wt FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
  ) GROUP BY word
),
s1 AS (
  SELECT word, wt,
         generate_subscripts(string_split(word, ''), 1) AS pos,
         unnest(string_split(word, '')) AS sym
  FROM words
),"""
    + ",".join(_bpe_round_sql(k) for k in range(1, _BPE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS round, l AS left_sym, r AS right_sym,"
        f" CAST(c AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    + "\nORDER BY round"
)


@register("q224_bpe_merge_rounds", oracle=_Q224_ORACLE)
def q224_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three BPE training rounds over the corpus word-frequency table:
    per round the argmax adjacent symbol pair (count-desc, then
    lexicographic) and its weighted count; merges applied greedy-
    leftmost via an in-row fold."""
    d = T(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wt"))
        .persist()  # the one corpus scan; rounds touch only this
    )
    syms = words.select(
        "word", "wt", F.expr("filter(split(word, ''), x -> x <> '')").alias("syms")
    )
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = syms.where(F.size("syms") >= 2).select(
            "wt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i-1] AS l, syms[i] AS r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("wt").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        lft, rgt, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rnd, lft, rgt, cnt))
        lft_sql, rgt_sql = lft.replace("'", "''"), rgt.replace("'", "''")
        # greedy-leftmost merge: fold is exact because a just-merged
        # symbol (len(l)+len(r)) can never equal the pair's left
        # element (len(l)), so no accidental re-merge chains
        syms = syms.withColumn(
            "syms",
            F.expr(
                "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
                f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{lft_sql}'"
                f" AND x = '{rgt_sql}' "
                "THEN concat(slice(acc, 1, size(acc) - 1),"
                " array(concat(element_at(acc, -1), x))) "
                "ELSE concat(acc, array(x)) END)"
            ),
        )
    words.unpersist()
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, pair_count long"
    ).orderBy("round")


# ---------------------------------------------------------------------------
# q225: target-affinity data selection (the DSIR shape — Xie et al.
# 2023 "Data Selection for Language Models via Importance Resampling"):
# given a small CURATED target corpus and a huge raw pool, score every
# pool document by how much its hashed-n-gram feature distribution
# looks like the target rather than the pool at large, and select the
# top slice. Features are word bigrams hashed into B=256 buckets (a
# DESIGN constant like q202's sketch grid — independent of vocab
# size), so both "distributions" are bounded 256-row tables.
#
# Exactness: per-bucket target/pool probabilities are integer
# micro-probabilities (1e6 * n_b DIV total — same integer division
# both engines); a doc's score is the SUM over its bigram instances
# of (target_micro - pool_micro), a pure BIGINT accumulation (order-
# independent), and the length-normalized affinity divides ONCE in
# IEEE double at the end. DSIR's log-likelihood-ratio weights are
# replaced by this linear difference because ln() is not bit-stable
# across engines; the ranking intent (over-represented-in-target
# features pull a doc up, pool-generic features pull it down) is
# preserved and documented.
#
# Scale shape: one corpus scan builds bigram instances in-row; the
# two distribution aggregates land on the 256-key bounded domain; the
# scoring join is (doc bigram stream) x (256-row dim) — broadcast by
# construction; the final top-k is TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------

_Q225_B = 256  # feature buckets — design constant
_Q225_TOPK = 50

_Q225_BIGRAMS_DUCK = """
  SELECT doc_id, word || ' ' || lead(word, 1) OVER w AS bigram
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(text), '\\s+')) AS word,
           generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
    FROM documents
  )
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY bigram IS NOT NULL
"""

_Q225_ORACLE = f"""
WITH bg AS (
  SELECT doc_id, ('0x' || substr(md5(bigram), 1, 15))::BIGINT % {_Q225_B} AS bucket
  FROM ({_Q225_BIGRAMS_DUCK})
),
seedb AS (SELECT bucket FROM bg WHERE doc_id % 20 = 0),
poolb AS (SELECT doc_id, bucket FROM bg WHERE doc_id % 20 <> 0),
tdist AS (
  -- GREATEST guard: an empty seed split must yield the same answer in
  -- both engines (DuckDB raises on //0 while Spark div returns NULL)
  SELECT bucket,
         (1000000 * COUNT(*)) // GREATEST((SELECT COUNT(*) FROM seedb), 1) AS tp
  FROM seedb GROUP BY bucket
),
rdist AS (
  SELECT bucket,
         (1000000 * COUNT(*)) // GREATEST((SELECT COUNT(*) FROM poolb), 1) AS rp
  FROM poolb GROUP BY bucket
),
scored AS (
  SELECT p.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(COALESCE(t.tp, 0) - r.rp) AS score
  FROM poolb p
  LEFT JOIN tdist t ON t.bucket = p.bucket
  JOIN rdist r ON r.bucket = p.bucket
  GROUP BY p.doc_id
)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id, d.source,
       CAST(s.n_bigrams AS BIGINT) AS n_bigrams,
       CAST(s.score AS BIGINT) AS score,
       ROUND(CAST(s.score AS DOUBLE) / s.n_bigrams, 6) AS affinity
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY affinity DESC, doc_id
LIMIT {_Q225_TOPK}
"""


@register("q225_target_affinity_selection", oracle=_Q225_ORACLE)
def q225_target_affinity_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shaped selection: rank raw-pool docs by hashed-bigram
    affinity to a curated seed split (integer micro-probability
    difference summed over the doc's bigram instances)."""
    d = T(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    bg = (
        d.select("doc_id", words.alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> concat_ws(' ', w[i], w[i+1]))"
                )
            ).alias("bigram"),
        )
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("bigram"), 1, 15), 16, 10).cast("long")
                % _Q225_B
            ).alias("bucket"),
        )
        .persist()
    )
    seedb = bg.where(F.col("doc_id") % 20 == 0)
    poolb = bg.where(F.col("doc_id") % 20 != 0)
    # max(.,1) mirrors the oracle's GREATEST guard: degenerate empty
    # splits divide by 1 in both engines instead of erroring in one
    tn = max(seedb.count(), 1)  # O(1) scalars: distribution totals
    rn = max(poolb.count(), 1)
    tdist = seedb.groupBy("bucket").agg(
        F.expr(f"1000000 * count(1) div {tn}").alias("tp")
    )
    rdist = poolb.groupBy("bucket").agg(
        F.expr(f"1000000 * count(1) div {rn}").alias("rp")
    )
    scored = (
        poolb.join(F.broadcast(tdist), "bucket", "left")  # 256-row design dim
        .join(F.broadcast(rdist), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce("tp", F.lit(0)) - F.col("rp")).alias("score"),
        )
    )
    out = (
        scored.join(d.select("doc_id", "source"), "doc_id")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("score").cast("long").alias("score"),
            F.round(
                F.col("score").cast("double") / F.col("n_bigrams"), 6
            ).alias("affinity"),
        )
        .orderBy(F.desc("affinity"), "doc_id")
        .limit(_Q225_TOPK)
    )
    return out


# ---------------------------------------------------------------------------
# q227: line-level boilerplate extraction (the jusText / trafilatura
# shape every HTML->training-text pipeline runs): classify each line
# of a page by LINK DENSITY (share of its words inside <a>...</a>
# anchors) and length, keep content lines, and rebuild the cleaned
# document. q106 removes CROSS-document boilerplate paragraphs; this
# is the WITHIN-page structural gate that runs before it (nav bars,
# footers, ad blocks are link-dense or too short on the page they sit
# in, regardless of corpus-wide frequency).
#
# The page fixture is synthesized in-query (q222 discipline): each
# doc's words are chunked into 8-word content lines wrapped by a
# planted anchor-menu nav line, an ad block after the first chunk, a
# link-spiked footer, with every 3rd content line carrying ONE inline
# anchor (anchors alone must NOT kill a content line).
#
# Scale shape: the whole operator is IN-ROW — lines, per-line word
# and anchor-word counts (non-greedy <a>(.*?)</a> extraction, lazy
# regex is bit-identical across engines on this markup), the keep
# rule (>=4 content words AND link density <= 500 milli), and the
# cleaned-text md5 are all array lambdas inside one projection: the
# plan is Scan -> Project with ZERO exchanges (q68 shape). No
# explode, no window, no shuffle.
# ---------------------------------------------------------------------------

_Q227_NAV = "<a> home </a> <a> about </a> <a> contact </a>"
_Q227_AD = "buy now <a> click here today </a>"
_Q227_FOOT = "<a> privacy </a> <a> terms </a> copyright"


_Q227_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, source,
         ['{_Q227_NAV}']
         || chunks[1:1]
         || ['{_Q227_AD}']
         || chunks[2:len(chunks)]
         || ['{_Q227_FOOT}'] AS lines
  FROM (
    SELECT doc_id, source,
           list_transform(
             range(0, CAST((len(w) + 7) // 8 AS INT)),
             i -> array_to_string(w[i * 8 + 1 : i * 8 + 8], ' ')
           ) AS chunks
    FROM (SELECT doc_id, source,
                 string_split_regex(trim(text), '\\s+') AS w
          FROM documents)
  )
),
feat AS (
  SELECT doc_id, source,
         list_transform(lines, l -> {{
           'line': l,
           'nw': len(list_filter(string_split_regex(l, '\\s+'),
                     x -> x <> '' AND substr(x, 1, 1) <> '<')),
           'nl': COALESCE(list_sum(list_transform(
                     regexp_extract_all(l, '<a>(.*?)</a>', 1),
                     s -> len(list_filter(string_split_regex(trim(s), '\\s+'),
                              x -> x <> '')))), 0)
         }}) AS ls
  FROM pages
),
cls AS (
  SELECT doc_id, source, ls,
         list_filter(ls, s -> s.nw >= 4 AND 1000 * s.nl <= 500 * s.nw) AS kept
  FROM feat
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(ls) - len(kept) AS BIGINT) AS n_dropped,
       CAST(COALESCE(list_sum(list_transform(kept, s -> s.nw)), 0) AS BIGINT)
         AS kept_words,
       CAST(COALESCE(list_sum(list_transform(ls, s -> s.nl)), 0) AS BIGINT)
         AS link_words,
       md5(array_to_string(list_transform(kept, s -> s.line), ' ')) AS clean_md5
FROM cls
ORDER BY doc_id
"""


@register("q227_boilerplate_strip", oracle=_Q227_ORACLE)
def q227_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-density line classifier over synthesized pages: drop
    nav/ad/footer lines (link-dense or short), keep content lines,
    rebuild the clean text — all in-row, zero-shuffle."""
    d = T(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        "source",
        F.expr(
            "transform(sequence(0, int((size(split(trim(text), '\\\\s+')) + 7) div 8) - 1),"
            " i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i * 8 + 1, 8)))"
        ).alias("chunks"),
    ).select(
        "doc_id",
        "source",
        F.expr(
            f"concat(array('{_Q227_NAV}'), slice(chunks, 1, 1),"
            f" array('{_Q227_AD}'),"
            " slice(chunks, 2, greatest(size(chunks) - 1, 0)),"
            f" array('{_Q227_FOOT}'))"
        ).alias("lines"),
    )
    feat = pages.select(
        "doc_id",
        "source",
        F.expr(
            "transform(lines, l -> struct("
            "l AS line,"
            " size(filter(split(l, '\\\\s+'),"
            "   x -> x <> '' AND substr(x, 1, 1) <> '<')) AS nw,"
            " aggregate(regexp_extract_all(l, '<a>(.*?)</a>', 1), 0,"
            "   (a, s) -> a + size(filter(split(trim(s), '\\\\s+'), x -> x <> '')))"
            " AS nl))"
        ).alias("ls"),
    )
    cls = feat.withColumn(
        "kept",
        F.expr("filter(ls, s -> s.nw >= 4 AND 1000 * s.nl <= 500 * s.nw)"),
    )
    return cls.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.size("ls").cast("long").alias("n_lines"),
        F.size("kept").cast("long").alias("n_kept"),
        (F.size("ls") - F.size("kept")).cast("long").alias("n_dropped"),
        F.expr("aggregate(kept, 0L, (a, s) -> a + s.nw)").alias("kept_words"),
        F.expr("aggregate(ls, 0L, (a, s) -> a + s.nl)").alias("link_words"),
        F.md5(F.expr("array_join(transform(kept, s -> s.line), ' ')")).alias(
            "clean_md5"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q229: code-switch language segmentation — the mC4/CCNet shape for
# documents that MIX languages: language-ID per PARAGRAPH (q34's
# stopword-density rule at paragraph granularity), then merge
# consecutive same-prediction paragraphs into segments with the
# gaps-and-islands idiom (q13's sessionize applied to language runs).
# A corpus pipeline splits such documents at segment boundaries
# instead of mislabeling (or dropping) the whole document on its
# majority language.
#
# Scale shape: paragraphs are built IN-ROW (q227's chunking) and
# exploded bounded-per-doc; the lag + running-sum island window
# partitions by doc_id (never global); one per-doc rollup ends it.
# One doc-keyed shuffle total.
# ---------------------------------------------------------------------------

_Q229_PARA = 10  # words per synthesized paragraph

_Q229_ORACLE = f"""
WITH paras AS (
  SELECT doc_id, lang,
         generate_subscripts(ps, 1) AS para_no, unnest(ps) AS para
  FROM (
    SELECT doc_id, lang,
           list_transform(
             range(0, CAST((len(w) + {_Q229_PARA - 1}) // {_Q229_PARA} AS INT)),
             i -> array_to_string(
               w[i * {_Q229_PARA} + 1 : i * {_Q229_PARA} + {_Q229_PARA}], ' ')
           ) AS ps
    FROM (SELECT doc_id, lang,
                 string_split_regex(trim(text), '\\s+') AS w
          FROM documents)
  )
),
pred AS (
  SELECT doc_id, lang, para_no,
         CASE WHEN 20 * len(list_filter(string_split(para, ' '),
                    t -> t IN ({", ".join(f"'{w}'" for w in ["the", "a", "of", "and", "to", "in", "is"])})))
                   >= len(string_split(para, ' '))
              THEN 'en' ELSE 'unk' END AS plang
  FROM paras
),
chg AS (
  SELECT doc_id, lang, para_no, plang,
         CASE WHEN plang = lag(plang) OVER (PARTITION BY doc_id ORDER BY para_no)
              THEN 0 ELSE 1 END AS is_new
  FROM pred
),
seg AS (
  SELECT doc_id, lang, para_no, plang,
         SUM(is_new) OVER (PARTITION BY doc_id ORDER BY para_no
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM chg
),
runs AS (
  SELECT doc_id, lang, seg_id, any_value(plang) AS plang,
         COUNT(*) AS run_len
  FROM seg GROUP BY doc_id, lang, seg_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(SUM(run_len) AS BIGINT) AS n_paras,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN plang = 'en' THEN run_len ELSE 0 END) AS BIGINT)
         AS n_en_paras,
       CAST(MAX(run_len) AS BIGINT) AS max_run
FROM runs
GROUP BY doc_id, lang
ORDER BY doc_id
"""


@register("q229_code_switch_segments", oracle=_Q229_ORACLE)
def q229_code_switch_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level language ID + island merge: per doc the number
    of paragraphs, contiguous same-language segments, en paragraphs,
    and the longest single-language run."""
    from voz_spark.dataprep import _EN_STOP

    d = T(spark, sf_dir, "documents")
    stop_sql = ", ".join(f"'{w}'" for w in _EN_STOP)
    paras = (
        d.select(
            "doc_id",
            "lang",
            F.expr(
                f"transform(sequence(0, int((size(split(trim(text), '\\\\s+')) + {_Q229_PARA - 1})"
                f" div {_Q229_PARA}) - 1),"
                f" i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'),"
                f" i * {_Q229_PARA} + 1, {_Q229_PARA})))"
            ).alias("ps"),
        )
        .select("doc_id", "lang", F.posexplode("ps").alias("p0", "para"))
        .select("doc_id", "lang", (F.col("p0") + 1).alias("para_no"), "para")
    )
    pred = paras.select(
        "doc_id",
        "lang",
        "para_no",
        F.expr(
            f"CASE WHEN 20 * size(filter(split(para, ' '), t -> t IN ({stop_sql})))"
            " >= size(split(para, ' ')) THEN 'en' ELSE 'unk' END"
        ).alias("plang"),
    )
    w = Window.partitionBy("doc_id").orderBy("para_no")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = pred.withColumn(
        "seg_id",
        F.sum(
            F.when(F.col("plang") == F.lag("plang").over(w), 0).otherwise(1)
        ).over(w2),
    )
    runs = seg.groupBy("doc_id", "lang", "seg_id").agg(
        F.first("plang").alias("plang"), F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("doc_id", "lang")
        .agg(
            F.sum("run_len").cast("long").alias("n_paras"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.when(F.col("plang") == "en", F.col("run_len")).otherwise(0))
            .cast("long")
            .alias("n_en_paras"),
            F.max("run_len").cast("long").alias("max_run"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            "n_paras",
            "n_segments",
            "n_en_paras",
            "max_run",
        )
        .orderBy("doc_id")
    )
