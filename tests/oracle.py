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
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    if hasattr(v, "__float__") and type(v).__name__ == "Decimal":
        return float(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    return v


def canonicalize(df: pd.DataFrame, ordered: bool) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    if not ordered:
        rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return rows


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
    a = canonicalize(sp, ordered)
    b = canonicalize(oracle_df, ordered)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            problems.append(f"row {i}: spark={ra!r} oracle={rb!r}")
            if len(problems) > 5:
                break
    return problems
