"""Single-partition-ish Arrow-backed local DataFrames for driver-held
metadata rows.

`spark.createDataFrame(list_of_rows)` parallelizes the list into
`defaultParallelism` pickled slices: every action on the frame schedules
a Python worker per task, and `.first()` pays Spark's take-escalation
ramp — measured on this host: 4 jobs / ~0.77 s for a ONE-ROW frame
(tasks 1, 4, 20, 7), ~0.38 s for `.count()`.  The pandas→Arrow path
produces Arrow-batch partitions that execute JVM-side with no Python
worker: the same one-row `.first()` is ~0.04 s and a 50-row
`.collect()` ~0.05 s (5–20× per action).  Engine sys-tables and
scenario summary frames are built and consumed hundreds of times per
suite run, so this is a broad fixed-cost cut with no change in rows,
schema, or nullability (the explicit schema is applied verbatim).

This is strictly a construction-path change for DRIVER-HELD,
metadata-sized row lists — never a data path: anything unbounded stays
on the classic/distributed builders.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["meta_df"]


def _is_nan(v) -> bool:
    return isinstance(v, float) and v != v


def meta_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a local DataFrame from metadata-sized `rows` with `schema`
    (DDL string or StructType) via the Arrow fast path; fall back to
    the classic `createDataFrame` on ANY mismatch the fast path cannot
    express — NaN payloads (Arrow's from_pandas folds NaN to null, the
    classic path keeps NaN), duplicate field names, or value shapes
    pandas/Arrow refuse — so results are bit-identical by construction
    or the classic path is taken."""
    st = (StructType.fromDDL(schema) if isinstance(schema, str)
          else schema)
    rows = list(rows)  # the fast path consumes rows; keep the fallback fed
    try:
        if str(spark.conf.get(
                "spark.dremio.localframe.arrow", "true")).lower() != "true":
            raise ValueError("disabled by conf")
        names = [f.name for f in st.fields]
        if len(set(names)) != len(names):
            raise ValueError("duplicate field names")
        import pandas as pd

        # only row shapes whose tuple() view is the row's VALUES may take
        # the fast path: a dict would silently become its keys, and
        # anything else bypasses classic createDataFrame's verifySchema
        if not all(isinstance(r, (tuple, list)) for r in rows):
            raise ValueError("non-sequence row shape")
        data = [tuple(r) for r in rows]
        if any(_is_nan(v) for r in data for v in r):
            raise ValueError("NaN payload")
        cols = (list(zip(*data)) if data
                else [() for _ in st.fields])
        if data and len(cols) != len(st.fields):
            raise ValueError("row width != schema width")
        pdf = pd.DataFrame(
            {f.name: pd.Series(list(c), dtype="object")
             for f, c in zip(st.fields, cols)},
            columns=names)
        return spark.createDataFrame(pdf, st)
    except Exception:  # noqa: BLE001 — classic path is always correct
        return spark.createDataFrame(rows, st)
