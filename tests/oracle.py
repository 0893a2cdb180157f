"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle SQL on the same parquet tables, canonicalize, compare exactly.

Mirrors the reference's TestBuilder golden-value comparison
(dremio-oss sabot/kernel/src/test/java/com/dremio/TestBuilder.java:49,
DremioTestWrapper.java:77) with DuckDB standing in for baselineValues.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    return con


def _canon_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.floor("ms").to_pydatetime().replace(tzinfo=None)
    if isinstance(v, _dt.datetime):
        return v.replace(microsecond=(v.microsecond // 1000) * 1000, tzinfo=None)
    return v


def canonicalize(df: pd.DataFrame, ordered: bool) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    if not ordered:
        rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return rows


def _col_class(s: pd.Series) -> str:
    """Classify a pandas column the way the driver's hash 'sees' it.

    The driver canonicalizes with pandas sort_values + a dtype-sensitive
    value hash, so int64 vs float64, Decimal objects vs float64, and
    datetime.date objects vs datetime64 all hash-differ even when the
    values are numerically equal.  Classes here must match EXACTLY
    between the Spark result and the DuckDB ``fetchdf()`` result.
    """
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    # object column: inspect the first non-null value
    for v in s:
        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            continue
        if type(v).__name__ == "Decimal":
            return "DECIMAL-OBJECT (cast to double/bigint on both sides)"
        if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
            return "NON-SCALAR (array/map/struct column breaks driver sort)"
        if isinstance(v, pd.Timestamp) or isinstance(v, _dt.datetime):
            return "timestamp"
        if isinstance(v, _dt.date):
            return "DATE-OBJECT (cast to timestamp or string on both sides)"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        return type(v).__name__
    return "all-null"


def dtype_problems(sp: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Driver-strict dtype gate: per-column class must match exactly.

    Any uppercase class is rejected outright (even if both sides agree)
    because the driver's canonicalizer either crashes on it (non-scalar)
    or renders it engine-dependently (Decimal, date objects).
    """
    problems: list[str] = []
    omap = {c.lower(): c for c in oracle_df.columns}
    for c in sp.columns:
        a = _col_class(sp[c])
        b = _col_class(oracle_df[omap[c.lower()]])
        for side, cls in (("spark", a), ("oracle", b)):
            if cls.isupper() or cls.split()[0].isupper():
                problems.append(f"col {c!r} [{side}]: {cls}")
        if a != b and "all-null" not in (a, b):
            problems.append(f"col {c!r}: dtype class spark={a} oracle={b}")
    return problems


def compare(spark_df, oracle_df: pd.DataFrame, ordered: bool = False) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if len(sp) != len(oracle_df):
        problems.append(f"row count: spark={len(sp)} oracle={len(oracle_df)}")
    if sorted(c.lower() for c in sp.columns) != sorted(
        c.lower() for c in oracle_df.columns
    ):
        problems.append(
            f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    problems.extend(dtype_problems(sp, oracle_df))
    if problems:
        return problems
    a = canonicalize(sp, ordered)
    b = canonicalize(oracle_df, ordered)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            problems.append(f"row {i}: spark={ra!r} oracle={rb!r}")
            if len(problems) > 5:
                break
    return problems
