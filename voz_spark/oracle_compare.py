"""DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate: run the Spark query and the
ANSI-SQL oracle on the same parquet tables, sort columns by name,
sort rows, and compare values (exact for ints/strings; bit-exact
expected for doubles because all query sums are DECIMAL-exact).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_sql: str, sf_dir: str, float_rtol: float = 0.0) -> tuple[bool, str]:
    """Return (match, message). float_rtol=0 → exact comparison."""
    got = _normalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    try:
        exp = _normalize(con.execute(oracle_sql).fetchdf())
    finally:
        con.close()
    if list(got.columns) != list(exp.columns):
        return False, f"column mismatch: spark={list(got.columns)} oracle={list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count mismatch: spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        # The driver's value hash distinguishes int from float (49 vs 49.0
        # hash differently) — e.g. DuckDB SUM(BIGINT)→HUGEINT materializes
        # as float64 via fetchdf(). Mirror that strictness here so the
        # mismatch is caught by pytest, not first by the driver.
        if pd.api.types.is_integer_dtype(g) != pd.api.types.is_integer_dtype(e):
            return False, (
                f"dtype mismatch col={c}: spark={g.dtype} oracle={e.dtype} "
                "(driver hashes int and float differently — CAST the oracle)"
            )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            g = g.astype(float)
            e = e.astype(float)
            both_nan = g.isna() & e.isna()
            if float_rtol == 0.0:
                ok = (g == e) | both_nan
            else:
                ok = both_nan | g.combine(e, lambda a, b: _close(a, b, float_rtol))
            if not ok.all():
                i = int((~ok).idxmax())
                return False, f"value mismatch col={c} row={i}: spark={g[i]!r} oracle={e[i]!r}"
        else:
            ga = [None if pd.isna(v) else v for v in g]
            ea = [None if pd.isna(v) else v for v in e]
            neq = [i for i in range(len(ga)) if ga[i] != ea[i]]
            if neq:
                i = neq[0]
                return False, f"value mismatch col={c} row={i}: spark={ga[i]!r} oracle={ea[i]!r}"
    return True, "ok"


def _close(a: float, b: float, rtol: float) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or math.isnan(a)) and (b is None or math.isnan(b))
    return math.isclose(a, b, rel_tol=rtol, abs_tol=rtol)
