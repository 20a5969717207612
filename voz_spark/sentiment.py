"""Sentiment analysis (SURVEY §2.F + C13/C29/C30; reference:
src/sentiment_analyzer.py).

The reference scores with TextBlob (:138-140). TextBlob is not in
this container, so the scorer is environment-gated: if `textblob`
imports, it is used per Arrow batch; otherwise a deterministic
bilingual lexicon scorer with the same output surface
(polarity ∈ [-1, 1]) runs instead. Either way the Spark shape is the
canonical Series→Series vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover - environment-gated
    from textblob import TextBlob  # type: ignore

    _HAVE_TEXTBLOB = True
except ImportError:
    _HAVE_TEXTBLOB = False

POSITIVE = ["tốt", "ngon", "ổn", "mượt", "bền", "good", "great", "đáng", "rẻ"]
NEGATIVE = ["tệ", "kém", "lag", "nóng", "chậm", "bad", "đắt", "lỗi"]

# Vietnamese + English stopwords for C30 word counting (semantics of
# src/sentiment_analyzer.py:426-441)
STOPWORDS = [
    "và", "của", "là", "có", "cho", "với", "này", "thì", "bạn", "nên",
    "the", "and", "for", "you", "this", "that", "with",
]


def polarity(col: Column) -> Column:
    """Polarity score per text (vectorized pandas UDF)."""

    @pandas_udf("double")
    def score(texts: pd.Series) -> pd.Series:
        if _HAVE_TEXTBLOB:
            return texts.map(
                lambda t: float(TextBlob(t).sentiment.polarity) if t else 0.0
            )

        def lex(t: str | None) -> float:
            if not t:
                return 0.0
            words = t.lower().split()
            pos = sum(w in POSITIVE for w in words)
            neg = sum(w in NEGATIVE for w in words)
            return (pos - neg) / max(1, pos + neg)

        return texts.map(lex)

    return score(col)


def subjectivity(col: Column) -> Column:
    """Subjectivity score per text ∈ [0, 1] — the second TextBlob
    output (reference src/sentiment_analyzer.py:138-140 reads
    blob.sentiment.subjectivity alongside polarity). Lexicon fallback:
    the fraction of opinion-bearing words among all words — 0 for a
    purely factual sentence, →1 as every word is sentiment-laden."""

    @pandas_udf("double")
    def score(texts: pd.Series) -> pd.Series:
        if _HAVE_TEXTBLOB:
            return texts.map(
                lambda t: float(TextBlob(t).sentiment.subjectivity) if t else 0.0
            )

        def lex(t: str | None) -> float:
            if not t:
                return 0.0
            words = t.lower().split()
            if not words:
                return 0.0
            opinion = sum(w in POSITIVE or w in NEGATIVE for w in words)
            return min(1.0, opinion / len(words))

        return texts.map(lex)

    return score(col)


def component_sentiment(suggestions: DataFrame) -> DataFrame:
    """C13: per-component sentiment stats over mention contexts
    (reference src/sentiment_analyzer.py:176-349; both TextBlob
    outputs — polarity AND subjectivity — are surfaced)."""
    scored = suggestions.withColumn("polarity", polarity(F.col("context"))).withColumn(
        "subjectivity", subjectivity(F.col("context"))
    )
    return scored.groupBy("component_type").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.avg("polarity").alias("mean_polarity"),
        F.expr("percentile(polarity, 0.5)").alias("median_polarity"),
        F.stddev("polarity").alias("std_polarity"),
        F.min("polarity").alias("min_polarity"),
        F.max("polarity").alias("max_polarity"),
        F.avg("subjectivity").alias("mean_subjectivity"),
    )


def reception_sentiment(suggestions: DataFrame) -> DataFrame:
    """C29: sentiment grouped by (has_likes, has_thanks) boolean pair
    (reference src/detailed_analyzer.py:444-445)."""
    scored = suggestions.withColumn("polarity", polarity(F.col("context")))
    return scored.groupBy(
        (F.col("likes") > 0).alias("has_likes"),
        (F.col("thanks") > 0).alias("has_thanks"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("polarity").alias("mean_polarity"),
    )


def context_word_counts(suggestions: DataFrame, k: int = 50) -> DataFrame:
    """C30: tokenize contexts, drop stopwords + short tokens, top-k
    (reference src/sentiment_analyzer.py:426-473)."""
    spark = suggestions.sparkSession
    stop = F.broadcast(spark.createDataFrame([(w,) for w in STOPWORDS], ["word"]))
    words = suggestions.select(
        F.explode(F.split(F.lower("context"), r"\s+")).alias("word")
    ).where(F.length("word") > 2)
    return (
        words.join(stop, "word", "left_anti")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(k)
    )
