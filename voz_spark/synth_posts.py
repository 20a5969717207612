"""Deterministic synthetic forum-post corpus (FIXTURES.md §5-6).

Mirrors the reference's flattened post shape (src/thread_crawler.py:
314-326): nested author struct, quotes array, images array with OCR
text, reactions map. Text templates exercise every D-operator
(SURVEY §2.D): budget phrases in all unit variants (tr/triệu/củ/k/
nghìn/đồng, comma decimals), prices in/out of the sanity window,
component keywords with word-boundary edge cases, brand/purpose
keywords, emoji + irregular whitespace, NFC/NFD mixed diacritics,
un-normalized component names ("i5 12400", "rtx3060").
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from voz_spark.synth import splitmix64, thread_id, total_pages

POSTS_PER_PAGE = 4

POSTS_SCHEMA = StructType(
    [
        StructField("thread_id", StringType(), False),
        StructField("page_no", IntegerType(), False),
        StructField("post_no", IntegerType(), False),
        StructField("post_id", StringType(), False),
        StructField("username", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("created_date", StringType(), False),
        StructField("modified_date", StringType(), True),
        StructField("content_text", StringType(), False),
        StructField(
            "quotes",
            ArrayType(
                StructType(
                    [
                        StructField("author", StringType(), True),
                        StructField("content", StringType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField(
            "images",
            ArrayType(
                StructType(
                    [
                        StructField("url", StringType(), True),
                        StructField("ocr_text", StringType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("reactions", MapType(StringType(), IntegerType()), True),
    ]
)

_BUDGET_PHRASES = [
    "ngân sách {v} triệu",
    "budget {v}tr",
    "tầm {v} củ thôi",
    "khoảng {v},5 triệu",  # comma decimal (D9)
    "giá {v}000 nghìn",  # nghìn unit → /1000 (D9)
    "chi được {v} tr",
]

_PURPOSES = [
    "chơi game aaa",
    "làm việc văn phòng",
    "render đồ họa",
    "học tập sinh viên",
]

_COMPONENT_BITS = [
    "cpu i5 12400 ngon",  # un-normalized name (D11)
    "vga rtx3060 chiến tốt",  # rtx3060 → RTX 3060 (D11)
    "ram 16gb là đủ",
    "ssd 500gb cho lẹ",
    "main b660 ổn định",
    "nguồn 650w corsair bền",
    "màn hình 144hz mượt",
    "case lắp thoáng",
]

_PRICES = [
    "giá 5,5 tr",
    "khoảng 12 triệu",
    "chỉ 800 nghìn",  # 0.8tr — in range
    "tầm 3 củ",
    "giá 200 đồng",  # out of range after normalize
    "60 triệu",  # out of price range [0.1,50]
]

_SENTIMENT = ["rất tốt", "ngon bền", "hơi lag", "quá nóng", "good deal", "chậm tệ"]

_EMOJI = ["🔥", "👍", "😀", ""]


def _nfd_sometimes(text: str, s: int) -> str:
    """Mix NFD forms in (~25% of posts) to exercise D1 NFC normalize."""
    if s % 4 == 0:
        return unicodedata.normalize("NFD", text)
    return text


def post_text(tid: int, page: int, post: int) -> str:
    s = splitmix64(tid * 7919 + page * 101 + post)
    if page == 1 and post == 0:  # OP
        v = 5 + s % 40
        parts = [
            _BUDGET_PHRASES[s % len(_BUDGET_PHRASES)].format(v=v),
            "cần máy " + _PURPOSES[s % len(_PURPOSES)],
            _COMPONENT_BITS[s % len(_COMPONENT_BITS)],
            _EMOJI[s % len(_EMOJI)],
        ]
    else:  # reply / suggestion
        parts = [
            "bạn nên lấy " + _COMPONENT_BITS[s % len(_COMPONENT_BITS)],
            _COMPONENT_BITS[(s // 7) % len(_COMPONENT_BITS)] if s % 3 == 0 else "",
            _PRICES[s % len(_PRICES)],
            _SENTIMENT[s % len(_SENTIMENT)],
            _EMOJI[(s // 11) % len(_EMOJI)],
        ]
    txt = "  ".join(p for p in parts if p)  # irregular whitespace (D4)
    return _nfd_sometimes(txt, s)


def post_rows(n_threads: int) -> list[dict]:
    rows = []
    for r in range(n_threads):
        tid = thread_id(r)
        pages = min(total_pages(tid), 4)
        for page in range(1, pages + 1):
            for post in range(POSTS_PER_PAGE):
                s = splitmix64(tid * 31 + page * 7 + post)
                uid = s % 40
                month = 1 + (s % 10)
                quotes = (
                    [{"author": f"user{(s // 3) % 40:03d}", "content": "trích dẫn cũ"}]
                    if post > 0 and s % 5 == 0
                    else []
                )
                images = (
                    [
                        {
                            "url": f"https://img.voz.test/img/{s % 500:010d}.png",
                            "ocr_text": f"cấu hình {5 + s % 30} triệu",
                        }
                    ]
                    if s % 4 == 0
                    else []
                )
                reactions = {}
                if s % 3 == 0:
                    reactions["Like"] = int(s % 20)
                if s % 7 == 0:
                    reactions["Thanks"] = int(s % 5)
                rows.append(
                    {
                        "thread_id": str(tid),
                        "page_no": page,
                        "post_no": post,
                        "post_id": f"p{tid}-{page}-{post}",
                        "username": f"user{uid:03d}",
                        "user_id": str(uid),
                        "created_date": f"2024-{month:02d}-{1 + s % 28:02d}T{s % 24:02d}:00:00Z",
                        "modified_date": f"2024-{month:02d}-{2 + s % 27:02d}T00:00:00Z"
                        if s % 10 == 0
                        else None,
                        "content_text": post_text(tid, page, post),
                        "quotes": quotes,
                        "images": images,
                        "reactions": reactions,
                    }
                )
    return rows


def gen_posts_df(spark: SparkSession, n_threads: int = 30) -> DataFrame:
    return spark.createDataFrame(post_rows(n_threads), POSTS_SCHEMA)


def gen_threads_df(spark: SparkSession, n_threads: int = 30) -> DataFrame:
    from voz_spark import schemas, synth

    return spark.createDataFrame(pd.DataFrame(synth.seed_rows(n_threads)), schemas.SEEDS)
