"""Semantics tests for the D-operator library (SURVEY §2.D): each case
encodes a reference behavior as a test vector."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from voz_spark import textops
from voz_spark.extract import detect_categories, detect_keywords, extract_budget, extract_prices


def _one(spark, col, text: str):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("out")).first().out


# --- D9 money normalization (reference src/data_analyzer.py:169-190) ---


@pytest.mark.parametrize(
    "val,unit,expect",
    [
        ("15", "tr", 15.0),
        ("15", "triệu", 15.0),
        ("3", "củ", 3.0),
        ("2", "m", 2.0),
        ("800", "nghìn", 0.8),
        ("500", "k", 0.5),
        ("15000000", "đồng", 15.0),
        ("7,5", "tr", 7.5),  # comma decimal
        ("12", None, 12.0),  # default unit
    ],
)
def test_normalize_money_value(spark, val, unit, expect):
    df = spark.createDataFrame([(val, unit)], "v string, u string")
    got = df.select(
        textops.normalize_money_value(F.col("v"), F.col("u")).alias("out")
    ).first().out
    assert got == pytest.approx(expect)


# --- D1-D5 clean pipeline ---


def test_clean_text_nfc_emoji_whitespace(spark):
    nfd = unicodedata.normalize("NFD", "ngân sách 15 triệu")
    raw = f"  {nfd}   🔥👍  XYZ!!  "
    got = _one(spark, textops.clean_text(F.col("t")), raw)
    assert got == "ngân sách 15 triệu xyz"


# --- D11 component name normalization ---


@pytest.mark.parametrize(
    "text,expect_sub",
    [
        ("cpu i5 12400 ngon", "intel core i5-12400"),
        ("vga rtx3060 ok", "nvidia rtx 3060"),
        ("gtx 1660 cũ", "nvidia gtx 1660"),
        ("ryzen 5 5600x", "amd ryzen 5 5600x"),
        ("ram 16 gb", "ram 16gb"),
        ("ssd 500 gb", "ssd 500gb"),
        ("main b660 xịn", "mainboard b660"),
    ],
)
def test_normalize_component_names(spark, text, expect_sub):
    got = _one(spark, textops.normalize_component_names(F.col("t")), text)
    assert expect_sub in got


# --- D10 price format rewrite ---


def test_normalize_price_format(spark):
    got = _one(spark, textops.normalize_price_format(F.col("t")), "giá 15.000.000 đồng nhé")
    assert "15 triệu" in got


# --- D16 count parse ---


@pytest.mark.parametrize("text,expect", [("1,234", 1234), ("12K", 12000), ("7", 7)])
def test_parse_count(spark, text, expect):
    assert _one(spark, textops.parse_count(F.col("t")), text) == expect


# --- D17 reaction parse ---


def test_parse_reactions(spark):
    df = spark.createDataFrame([([" Like x 12", "Thanks x 3"],)], ["r"])
    got = df.select(textops.parse_reactions(F.col("r")).alias("m")).first().m
    assert got == {"Like": 12, "Thanks": 3}


# --- D14 combine text + OCR ---


def test_combine_text_and_ocr(spark):
    df = spark.createDataFrame([("body", ["ocr1", "ocr2"]), ("solo", [])], ["c", "o"])
    got = [
        r.out
        for r in df.select(
            textops.combine_text_and_ocr(F.col("c"), F.col("o")).alias("out")
        ).collect()
    ]
    assert got == ["body\n\nocr1\n\nocr2", "solo"]


# --- D7 budget extraction: first pattern, first in-range match wins ---


@pytest.mark.parametrize(
    "text,expect",
    [
        ("ngân sách 15 triệu cho máy", 15.0),
        ("budget 20tr nhé", 20.0),
        ("tầm 3 củ thôi", 3.0),
        # pattern priority: 'ngân sách' (rank 0) beats bare '25 tr' (rank 5)
        ("em có 25 tr, ngân sách 10 triệu", 10.0),
        # out-of-range first match skipped, next in-range wins
        ("ngân sách 500 triệu à không, tầm 12 tr", 12.0),
        # nghìn normalization: 800 nghìn = 0.8tr < 1 → out of budget range
        ("tầm 800 nghìn", None),
        ("không nói gì về tiền", None),
    ],
)
def test_extract_budget_first_wins(spark, text, expect):
    df = spark.createDataFrame([("p1", text)], ["post_id", "text_clean"])
    got = extract_budget(df).first().budget
    if expect is None:
        assert got is None
    else:
        assert got == pytest.approx(expect)


# --- D8 price extraction: all in-range matches ---


def test_extract_prices_all_matches(spark):
    text = "giá 5,5 tr hoặc khoảng 12 triệu, cũ thì chỉ 800 nghìn, xịn 60 triệu"
    df = spark.createDataFrame([("p1", text)], ["post_id", "text_clean"])
    got = sorted(r.price for r in extract_prices(df).collect())
    assert got == pytest.approx([0.8, 5.5, 12.0])  # 60 > 50 excluded


# --- D12 keyword detection with word boundaries + context ---


def test_detect_keywords_word_boundary(spark):
    df = spark.createDataFrame(
        [
            ("p1", "con ram 16gb này ngon"),  # 'ram' bounded → hit
            ("p2", "chương trình khuyến mãi"),  # 'ram' inside 'trình'? no — not a hit
            ("p3", "lấy rtx với cpu nhé"),
        ],
        ["post_id", "text_clean"],
    )
    got = detect_keywords(df)
    rows = {(r.post_id, r.component_type, r.keyword) for r in got.collect()}
    assert ("p1", "ram", "ram") in rows
    assert not any(pid == "p2" for pid, _, _ in rows)
    assert ("p3", "gpu", "rtx") in rows and ("p3", "cpu", "cpu") in rows
    ctx = got.where(F.col("post_id") == "p1").first().context
    assert "ram 16gb" in ctx


def test_detect_categories(spark):
    df = spark.createDataFrame(
        [("p1", "máy chơi game và làm việc văn phòng")], ["post_id", "text_clean"]
    )
    got = detect_categories(df).first().purposes
    assert sorted(got) == ["gaming", "office"]


# --- q75 decontamination / q76 BPE pair semantics -------------------------


def test_decontamination_flags_verbatim_copy(spark):
    """A corpus doc that IS a benchmark doc verbatim must be flagged
    with every one of its shingles hitting (n_hits == n_shingles);
    a doc sharing no 3-gram with the benchmark set must be absent."""
    import pandas as pd

    from voz_spark.dataprep import q75_decontamination

    bench_text = "alpha beta gamma delta epsilon zeta"
    clean_text = "one two three four five six seven"
    rows = pd.DataFrame(
        {
            # 0 and 97 are benchmark slots (doc_id % 97 == 0)
            "doc_id": [0, 1, 2],
            "text": [bench_text, bench_text, clean_text],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(bench_text), len(bench_text), len(clean_text)],
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r.asDict() for r in q75_decontamination(spark, d).collect()}
    assert set(out) == {1}  # doc 2 shares nothing; doc 0 is the benchmark itself
    assert out[1]["n_hits"] == out[1]["n_shingles"] == 4  # 6 words -> 4 shingles


def test_bpe_pairs_counts_adjacent_chars(spark):
    """'abab abab' -> pairs ab,ba,ab per word occurrence: ab=4, ba=2."""
    import tempfile

    import pandas as pd

    from voz_spark.dataprep import q76_bpe_pairs

    rows = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["abab abab"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [9],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        got = {r["pair"]: r["n"] for r in q76_bpe_pairs(spark, d).collect()}
    assert got == {"ab": 4, "ba": 2}
