"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark plan and its oracle SQL, normalizes both to
column-name-sorted, row-sorted pandas frames, and compares:
row count, column names, and values (exact for non-floats, tiny
relative tolerance for floats so genuinely-equal results pass while
real bugs fail loudly).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify unhashable cells (lists/arrays) for stable sorting
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, rel_tol: float = 1e-9) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    spdf = normalize(spark_df.toPandas())
    orc = normalize(oracle_pdf)
    problems: list[str] = []
    if list(spdf.columns) != list(orc.columns):
        return [f"columns differ: spark={list(spdf.columns)} oracle={list(orc.columns)}"]
    if len(spdf) != len(orc):
        return [f"row count differs: spark={len(spdf)} oracle={len(orc)}"]
    for c in spdf.columns:
        a, b = spdf[c], orc[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float)
            bf = b.astype(float)
            both_nan = af.isna() & bf.isna()
            close = both_nan | af.combine(bf, lambda x, y: _isclose(x, y, rel_tol))
            bad = (~close).to_numpy().nonzero()[0]
            if len(bad):
                i = int(bad[0])
                problems.append(
                    f"col {c}: {len(bad)} float mismatches; first at row {i}: "
                    f"spark={af.iloc[i]!r} oracle={bf.iloc[i]!r}"
                )
        else:
            eq = (a.astype(str).where(~a.isna(), "<NA>") == b.astype(str).where(~b.isna(), "<NA>"))
            bad = (~eq).to_numpy().nonzero()[0]
            if len(bad):
                i = int(bad[0])
                problems.append(
                    f"col {c}: {len(bad)} mismatches; first at row {i}: "
                    f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                )
    return problems


def _isclose(x, y, rel_tol):
    if pd.isna(x) and pd.isna(y):
        return True
    if pd.isna(x) or pd.isna(y):
        return False
    return math.isclose(float(x), float(y), rel_tol=rel_tol, abs_tol=1e-9)
