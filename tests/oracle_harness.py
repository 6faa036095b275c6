"""Local mirror of the driver's DuckDB-oracle comparison.

Canonicalization: sort columns by name, sort rows by every column, compare
values (floats bit-for-bit by default — the catalog's determinism rules make
that achievable; a tolerance knob exists for diagnosis only).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            # normalize Decimal -> float, bytes -> hex for comparison
            if col.map(lambda v: isinstance(v, Decimal)).any():
                out[c] = col.map(lambda v: float(v) if isinstance(v, Decimal) else v)
            elif col.map(lambda v: isinstance(v, (bytes, bytearray))).any():
                out[c] = col.map(
                    lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
                )
            elif col.map(
                lambda v: isinstance(v, (list, tuple, np.ndarray))
            ).any():
                # array columns (Spark toPandas / DuckDB fetchdf both yield
                # numpy arrays): ndarrays are unhashable, which breaks the
                # multi-column row sort — normalize to tuples
                out[c] = col.map(
                    lambda v: tuple(v.tolist())
                    if isinstance(v, np.ndarray)
                    else tuple(v)
                    if isinstance(v, (list, tuple))
                    else v
                )
        if str(col.dtype).startswith("datetime64"):
            out[c] = pd.to_datetime(col).dt.tz_localize(None) if getattr(
                col.dt, "tz", None
            ) else col
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )
    return out


def compare(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_tol: float = 0.0
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        da, db = str(a[c].dtype), str(b[c].dtype)
        # the driver hashes RENDERED values, so int64 19525 vs float64
        # 19525.0 mismatch even when numerically equal (DuckDB SUM(BIGINT)
        # yields HUGEINT -> pandas float64; cast the oracle back to BIGINT).
        # x_corpus_stats was red for three rounds on exactly this.
        if (da.startswith(("int", "uint")) and db.startswith("float")) or (
            da.startswith("float") and db.startswith(("int", "uint"))
        ):
            problems.append(
                f"col {c} dtype differs: spark={da} oracle={db} "
                "(driver renders ints and floats differently before hashing)"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        for i, (x, y) in enumerate(zip(av, bv)):
            if _eq(x, y, float_tol):
                continue
            problems.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
            if len(problems) >= 10:
                return problems
    return problems


def _eq(x, y, tol: float) -> bool:
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
    if pd.isna(x) if not isinstance(x, (list, tuple)) else False:
        return pd.isna(y) if not isinstance(y, (list, tuple)) else False
    if isinstance(x, float) and isinstance(y, (float, int)):
        if math.isnan(x) and isinstance(y, float) and math.isnan(y):
            return True
        if tol > 0:
            return abs(x - float(y)) <= tol * max(1.0, abs(x))
        return x == float(y)
    if isinstance(x, (pd.Timestamp,)) or isinstance(y, (pd.Timestamp,)):
        return pd.Timestamp(x) == pd.Timestamp(y)
    return x == y
