"""The reference's analytics workload re-expressed as composable
DataFrame queries over the posts corpus (SURVEY §2.C; reference:
src/data_analyzer.py, src/op_analyzer.py, src/reply_analyzer.py,
src/detailed_analyzer.py, src/create_datasets.py).

Each function returns a lazy DataFrame; `.cache()` on `preprocess`
replaces the reference's intermediate JSON/CSV materializations
(SURVEY §3.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from voz_spark import textops
from voz_spark.extract import detect_categories, detect_keywords, extract_budget, extract_prices

# reference budget buckets: pd.cut edges [0,5,10,15,20,25,30,40,50,100],
# right=False i.e. [lo, hi) — src/op_analyzer.py:358-361
BUDGET_EDGES = [0, 5, 10, 15, 20, 25, 30, 40, 50, 100]
BUDGET_LABELS = ["0-5tr", "5-10tr", "10-15tr", "15-20tr", "20-25tr", "25-30tr", "30-40tr", "40-50tr", "50-100tr"]


def budget_bin(col: F.Column) -> F.Column:
    """C18: half-open [lo, hi) binning matching pd.cut(right=False)."""
    expr = F.lit(None).cast("string")
    chain = F
    out = None
    for i in range(len(BUDGET_EDGES) - 1):
        cond = (col >= BUDGET_EDGES[i]) & (col < BUDGET_EDGES[i + 1])
        out = F.when(cond, BUDGET_LABELS[i]) if out is None else out.when(cond, BUDGET_LABELS[i])
    return out.otherwise(expr)


def budget_bin_ord(col: F.Column) -> F.Column:
    """C19: ordered-categorical rank for label sorting."""
    out = None
    for i, lab in enumerate(BUDGET_LABELS):
        out = F.when(col == lab, i) if out is None else out.when(col == lab, i)
    return out.otherwise(F.lit(None).cast("int"))


# ---------------------------------------------------------------------------


def preprocess(posts: DataFrame) -> DataFrame:
    """§3.2 stage 1 (DataPreprocessor.run_preprocessing): combine
    content + OCR (D14), clean (D1-D5), normalize price formats (D10)
    and component names (D11) → `text_clean`."""
    combined = textops.combine_text_and_ocr(
        F.col("content_text"), F.col("images.ocr_text")
    )
    c = textops.clean_text(combined)
    c = textops.normalize_price_format(c)
    c = textops.normalize_component_names(c)
    return posts.withColumn("text_clean", c)


def op_reply_split(posts: DataFrame) -> DataFrame:
    """C8: adds `post_rank` (1 = OP) and `is_op` per thread."""
    w = Window.partitionBy("thread_id").orderBy("page_no", "post_no")
    return posts.withColumn("post_rank", F.row_number().over(w)).withColumn(
        "is_op", F.col("post_rank") == 1
    )


def thread_analysis(posts_pre: DataFrame, seeds: DataFrame) -> DataFrame:
    """§3.2 stage 2-3: one row per thread — budget (title takes priority
    over OP content, C23), purposes (title ∪ content, C22), reply/image
    counts. seeds is a broadcast dim."""
    split = op_reply_split(posts_pre)
    ops = split.where(F.col("is_op")).select("thread_id", "post_id", "text_clean", "created_date")

    seeds_sel = seeds.select(
        "thread_id",
        textops.clean_text(F.col("title")).alias("title_clean"),
        "reply_count",
        "view_count",
    )
    ops_b = extract_budget(ops).withColumnRenamed("budget", "content_budget")
    titles = extract_budget(
        seeds_sel.select(F.col("thread_id").alias("post_id"), F.col("title_clean").alias("text_clean")),
        "text_clean",
    ).select(F.col("post_id").alias("thread_id"), F.col("budget").alias("title_budget"))

    ops_p = detect_categories(ops_b, text_col="text_clean", out_col="content_purposes")
    title_p = detect_categories(
        seeds_sel.select("thread_id", F.col("title_clean").alias("text_clean")),
        text_col="text_clean",
        out_col="title_purposes",
    ).select("thread_id", "title_purposes")

    reply_stats = (
        split.where(~F.col("is_op"))
        .groupBy("thread_id")
        .agg(
            F.count(F.lit(1)).alias("n_replies"),
            F.sum(F.size("images")).alias("n_reply_images"),
        )
    )

    return (
        ops_p.select("thread_id", "content_budget", "content_purposes")
        .join(F.broadcast(titles), "thread_id", "left")
        .join(F.broadcast(title_p), "thread_id", "left")
        .join(reply_stats, "thread_id", "left")
        .join(F.broadcast(seeds_sel.select("thread_id", "reply_count", "view_count")), "thread_id", "left")
        .select(
            "thread_id",
            # C23 coalesce precedence: title budget wins
            F.coalesce("title_budget", "content_budget").alias("budget"),
            # C22 distinct union of purpose lists
            F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.coalesce("title_purposes", F.array()),
                        F.coalesce("content_purposes", F.array()),
                    )
                )
            ).alias("purposes"),
            F.coalesce("n_replies", F.lit(0)).alias("n_replies"),
            F.coalesce("n_reply_images", F.lit(0)).alias("n_reply_images"),
            "reply_count",
            "view_count",
        )
        .withColumn("budget_range", budget_bin(F.col("budget")))
    )


def component_suggestions(posts_pre: DataFrame) -> DataFrame:
    """C2/C4: one row per (thread, reply, component_type, keyword,
    mention) — replies only, with context windows (D12)."""
    split = op_reply_split(posts_pre)
    replies = split.where(~F.col("is_op"))
    mentions = detect_keywords(replies)
    meta = replies.select("post_id", "thread_id", "username", "created_date", "reactions")
    return mentions.join(meta, "post_id").select(
        "thread_id",
        "post_id",
        "username",
        "created_date",
        "component_type",
        "keyword",
        "pos",
        textops.truncate_context(F.col("context")).alias("context"),
        F.coalesce(F.col("reactions")["Like"], F.lit(0)).alias("likes"),
        F.coalesce(F.col("reactions")["Thanks"], F.lit(0)).alias("thanks"),
    )


def price_suggestions(posts_pre: DataFrame) -> DataFrame:
    """D8 over replies: all in-range price mentions."""
    split = op_reply_split(posts_pre)
    return extract_prices(split.where(~F.col("is_op")))


def budget_distribution(threads: DataFrame) -> DataFrame:
    """C6+C18+C19: budget histogram in label order."""
    return (
        threads.where(F.col("budget").isNotNull())
        .groupBy("budget_range")
        .agg(F.count(F.lit(1)).alias("n_threads"))
        .withColumn("bin_ord", budget_bin_ord(F.col("budget_range")))
        .orderBy("bin_ord")
    )


def budget_component_pivot(suggestions: DataFrame, threads: DataFrame) -> DataFrame:
    """C9+C16+C17: budget_range × component_type counts with row-pct.
    threads is small → broadcast join (reference pandas.merge,
    src/detailed_analyzer.py:131-135)."""
    comp_types = sorted({r["component_type"] for r in suggestions.select("component_type").distinct().collect()})
    j = suggestions.join(
        F.broadcast(threads.select("thread_id", "budget_range")), "thread_id"
    ).where(F.col("budget_range").isNotNull())
    piv = j.groupBy("budget_range").pivot("component_type", comp_types).count().na.fill(0, comp_types)
    total = sum(F.col(c) for c in comp_types)
    pcts = [(F.col(c) * 100.0 / total).alias(f"{c}_pct") for c in comp_types]
    return piv.select("budget_range", *comp_types, *pcts).withColumn(
        "bin_ord", budget_bin_ord(F.col("budget_range"))
    )


def top_keywords_per_group(suggestions: DataFrame, threads: DataFrame, k: int = 3) -> DataFrame:
    """C21: top-k keywords per (budget_range, component_type) with a
    deterministic sample context (min context as tie-stable sample)."""
    j = suggestions.join(
        F.broadcast(threads.select("thread_id", "budget_range")), "thread_id"
    ).where(F.col("budget_range").isNotNull())
    g = j.groupBy("budget_range", "component_type", "keyword").agg(
        F.count(F.lit(1)).alias("n"), F.min("context").alias("sample_context")
    )
    w = Window.partitionBy("budget_range", "component_type").orderBy(
        F.desc("n"), F.asc("keyword")
    )
    return g.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def component_cooccurrence(suggestions: DataFrame) -> DataFrame:
    """C24: symmetric co-occurrence of component types within one reply."""
    types_per_post = suggestions.select("post_id", "component_type").distinct()
    a, b = types_per_post.alias("a"), types_per_post.alias("b")
    return (
        a.join(
            b,
            (F.col("a.post_id") == F.col("b.post_id"))
            & (F.col("a.component_type") < F.col("b.component_type")),
        )
        .groupBy(
            F.col("a.component_type").alias("type_a"),
            F.col("b.component_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_posts"))
    )


def component_combinations(suggestions: DataFrame, min_count: int = 3) -> DataFrame:
    """C25+C7: sorted '+'-joined combination keys per post, count ≥ k."""
    per_post = suggestions.groupBy("post_id").agg(
        F.array_join(F.array_sort(F.collect_set("component_type")), "+").alias("combo")
    )
    return (
        per_post.groupBy("combo")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "combo")
    )


def user_expertise(suggestions: DataFrame) -> DataFrame:
    """C14+C15: per-user activity profile + weighted expertise score
    (reference src/detailed_analyzer.py:796-852)."""
    g = suggestions.groupBy("username").agg(
        F.count(F.lit(1)).alias("n_suggestions"),
        F.countDistinct("thread_id").alias("n_threads"),
        F.countDistinct("component_type").alias("n_component_types"),
        F.sum("likes").alias("total_likes"),
        F.sum("thanks").alias("total_thanks"),
    )
    return g.withColumn(
        "expertise_score",
        F.col("n_suggestions") * 1.0
        + F.col("n_threads") * 2.0
        + F.col("n_component_types") * 3.0
        + F.col("total_likes") * 0.5
        + F.col("total_thanks") * 1.0,
    ).withColumn(
        "reception_score",
        (F.col("total_likes") + F.col("total_thanks"))
        / F.greatest(F.col("n_suggestions"), F.lit(1)).cast("double"),
    )


def monthly_component_trend(suggestions: DataFrame) -> DataFrame:
    """C28+C16: month × component_type pivot counts."""
    comp_types = sorted({r["component_type"] for r in suggestions.select("component_type").distinct().collect()})
    with_month = suggestions.select(
        F.date_format(
            F.date_trunc("month", textops.iso_timestamp(F.col("created_date"))), "yyyy-MM"
        ).alias("month"),
        "component_type",
    ).where(F.col("month").isNotNull())
    return (
        with_month.groupBy("month").pivot("component_type", comp_types).count().na.fill(0, comp_types).orderBy("month")
    )


def recommendation_matrix(suggestions: DataFrame, threads: DataFrame) -> DataFrame:
    """C36: nested per-budget-range recommendation JSON (reference
    builds a nested dict, src/detailed_analyzer.py:884-975):
    range → [component → top keywords w/ counts + sample context]."""
    topk = top_keywords_per_group(suggestions, threads)
    per_comp = topk.groupBy("budget_range", "component_type").agg(
        F.to_json(
            F.collect_list(F.struct("keyword", "n", "sample_context", "rnk"))
        ).alias("top_keywords_json")
    )
    return (
        per_comp.groupBy("budget_range")
        .agg(
            F.to_json(
                F.map_from_entries(
                    F.collect_list(F.struct("component_type", "top_keywords_json"))
                )
            ).alias("recommendations_json")
        )
        .withColumn("bin_ord", budget_bin_ord(F.col("budget_range")))
        .orderBy("bin_ord")
    )


def run_dataset_build(spark: SparkSession, n_threads: int = 30) -> dict[str, DataFrame]:
    """§3.2 end-to-end: the create_datasets pipeline as one lazy DAG
    over the synthetic corpus. Returns every output table."""
    from voz_spark.synth_posts import gen_posts_df, gen_threads_df

    posts = preprocess(gen_posts_df(spark, n_threads)).cache()
    seeds = gen_threads_df(spark, n_threads)
    threads = thread_analysis(posts, seeds).cache()
    sugg = component_suggestions(posts).cache()
    return {
        "posts": posts,
        "threads": threads,
        "suggestions": sugg,
        "prices": price_suggestions(posts),
        "budget_distribution": budget_distribution(threads),
        "budget_component_pivot": budget_component_pivot(sugg, threads),
        "top_keywords": top_keywords_per_group(sugg, threads),
        "cooccurrence": component_cooccurrence(sugg),
        "combinations": component_combinations(sugg),
        "user_expertise": user_expertise(sugg),
        "monthly_trend": monthly_component_trend(sugg),
        "recommendation_matrix": recommendation_matrix(sugg, threads),
    }
