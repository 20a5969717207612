"""Scalar/string/regex column-expression library (SURVEY §2.D).

Each function re-expresses one reference text operation as JVM-side
column expressions wherever Spark has the primitive; only NFC
normalization needs Python (a vectorized pandas UDF — Spark SQL has
no NFC builtin), exactly as mapped in SURVEY §2.F.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# D3: emoji / symbol ranges (reference: src/data_preprocessor.py:56-69)
EMOJI_RANGES = (
    "[\U0001f600-\U0001f64f"
    "\U0001f300-\U0001f5ff"
    "\U0001f680-\U0001f6ff"
    "\U0001f1e0-\U0001f1ff"
    "✂-➰Ⓜ-\U0001f251]+"
)

# D5: character whitelist — ascii alnum + Vietnamese diacritics + basic
# punctuation (reference: src/data_analyzer.py:161-162)
_VI_CHARS = (
    "a-z0-9"
    "àáạảãâầấậẩẫăằắặẳẵ"
    "èéẹẻẽêềếệểễ"
    "ìíịỉĩ"
    "òóọỏõôồốộổỗơờớợởỡ"
    "ùúụủũưừứựửữ"
    "ỳýỵỷỹ"
    "đ"
)
CHAR_WHITELIST_NEGATED = f"[^{_VI_CHARS} .,:+-]"


def nfc_normalize(col: Column) -> Column:
    """D1: Unicode NFC normalization (pandas UDF — vectorized)."""

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)

    return nfc(col)


def clean_text(col: Column) -> Column:
    """D1-D5 composed: NFC → lower → emoji strip → whitelist filter →
    whitespace collapse + trim (reference clean pipeline,
    src/data_preprocessor.py:47-74)."""
    c = nfc_normalize(col)
    c = F.lower(c)
    c = F.regexp_replace(c, EMOJI_RANGES, "")
    c = F.regexp_replace(c, CHAR_WHITELIST_NEGATED, "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def strip_noise(col: Column) -> Column:
    """D6: remove URLs, digits, punctuation (sentiment pre-clean,
    reference src/sentiment_analyzer.py:79-86)."""
    c = F.regexp_replace(col, r"http\S+", "")
    c = F.regexp_replace(c, r"\d+", "")
    c = F.regexp_replace(c, r"[^\p{L}\s]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_money_value(value: Column, unit: Column) -> Column:
    """D9: (value, unit) → triệu VND. Units: tr/triệu/củ/m → ×1,
    nghìn/k → ÷1000, đồng/vnd → ÷10⁶, default ×1; comma decimals
    (reference normalize_money_value, src/data_analyzer.py:169-190)."""
    v = F.replace(value, F.lit(","), F.lit(".")).cast("double")
    u = F.lower(F.coalesce(unit, F.lit("")))
    return (
        F.when(u.isin("nghìn", "k"), v / 1000.0)
        .when(u.isin("đồng", "vnd", "d"), v / 1_000_000.0)
        .otherwise(v)  # tr / triệu / củ / m / default
    )


def normalize_component_names(col: Column) -> Column:
    """D11: canonicalize component mentions — same *semantics* as the
    reference's 16 rewrite rules (src/data_preprocessor.py:100-142):
    bare CPU models gain vendor+family, GPU shorthands expand, RAM/SSD
    capacities get units normalized. Chained JVM regexp_replace with
    backreferences; no Python."""
    c = col
    c = F.regexp_replace(c, r"\bi([3579])[ -]?(\d{4,5}[a-z]?)\b", r"intel core i$1-$2")
    c = F.regexp_replace(c, r"\brtx[ -]?(\d{4})\b", r"nvidia rtx $1")
    c = F.regexp_replace(c, r"\bgtx[ -]?(\d{3,4})\b", r"nvidia gtx $1")
    c = F.regexp_replace(c, r"\bryzen[ -]?([3579])[ -]?(\d{4}[a-z]?)\b", r"amd ryzen $1 $2")
    c = F.regexp_replace(c, r"\b(\d+)\s*gb\s*ram\b", r"ram $1gb")
    c = F.regexp_replace(c, r"\bram\s*(\d+)\s*(gb|g)\b", r"ram $1gb")
    c = F.regexp_replace(c, r"\bssd\s*(\d+)\s*(gb|g)\b", r"ssd $1gb")
    c = F.regexp_replace(c, r"\bssd\s*(\d+)\s*tb\b", r"ssd $1tb")
    c = F.regexp_replace(c, r"\bmain\s*(b|h|z)(\d{3})\b", r"mainboard $1$2")
    return c


def normalize_price_format(col: Column) -> Column:
    """D10: rewrite verbose price spellings to 'X triệu' form
    (reference normalize_price_format, src/data_preprocessor.py:76-98).
    The arithmetic rewrites (15.000.000 đồng → 15 triệu) use a pandas
    UDF for exactness, mirroring the reference's Python lambdas."""

    @pandas_udf("string")
    def rewrite(s: pd.Series) -> pd.Series:
        import re

        def one(t: str | None) -> str | None:
            if t is None:
                return None
            t = re.sub(
                r"(\d+)\.(\d{3})\.(\d{3})\s*(?:đồng|vnd)",
                lambda m: f"{int(m.group(1))} triệu" if m.group(2) == "000" else f"{m.group(1)}.{m.group(2)} triệu",
                t,
            )
            t = re.sub(r"(\d+)000\s*(?:nghìn|k)\b", r"\1 triệu", t)
            t = re.sub(r"(\d+)\s*nghìn\s*k\b", r"\1 triệu", t)
            return t

        return s.map(one)

    return rewrite(col)


def combine_text_and_ocr(content: Column, ocr_texts: Column) -> Column:
    """D14: content + OCR bodies joined with blank lines (reference
    combine_text_and_ocr, src/data_preprocessor.py:144-164)."""
    joined = F.array_join(ocr_texts, "\n\n")
    return F.when(
        (ocr_texts.isNotNull()) & (F.size(ocr_texts) > 0),
        F.concat_ws("\n\n", content, joined),
    ).otherwise(content)


def truncate_context(col: Column, n: int = 200) -> Column:
    """D15: preview truncation text[:n] + '...' (reference
    src/create_datasets.py:106)."""
    return F.when(
        F.length(col) > n, F.concat(F.substring(col, 1, n), F.lit("..."))
    ).otherwise(col)


def parse_count(col: Column) -> Column:
    """D16: '1,234' → 1234; '12K' → 12000 (reference count parse,
    src/box_crawler.py:138-144)."""
    c = F.replace(col, F.lit(","), F.lit(""))
    num = F.regexp_extract(c, r"^(\d+(?:\.\d+)?)", 1).cast("double")
    is_k = F.upper(c).rlike("K$")
    return F.when(is_k, (num * 1000).cast("int")).otherwise(num.cast("int"))


def parse_reactions(col: Column) -> Column:
    """D17: 'Like x 12' strings → map entries (reference reaction parse,
    src/thread_crawler.py:300-311). Input: array<string>; output
    map<string,int>."""
    entries = F.transform(
        col,
        lambda s: F.struct(
            F.trim(F.split_part(s, F.lit(" x "), F.lit(1))).alias("key"),
            F.trim(F.split_part(s, F.lit(" x "), F.lit(2))).cast("int").alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def iso_timestamp(col: Column) -> Column:
    """D19 + C28: ISO-8601 string → timestamp (reference parses at
    analysis time, src/detailed_analyzer.py:320)."""
    return F.to_timestamp(F.replace(col, F.lit("Z"), F.lit("+00:00")))
