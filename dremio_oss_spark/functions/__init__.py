"""Dremio SQL-surface function shims re-expressed Spark-first.

Reference: dremio-oss `sabot/kernel/.../exec/expr/fn/impl/` (~402
@FunctionTemplate scalar functions) — see SURVEY.md §2.7.  Everything here
stays JVM-side (SQL temporary functions / Column expression compositions);
Python appears only for st_geohash (plan-independent, Arrow-batched).
"""

from .datetime_fmt import dremio_to_spark_format
from .shims import (
    convert_from_json,
    dremio_concat,
    kvgen,
    register_all,
    to_char,
    to_date_fmt,
    to_timestamp_fmt,
)

__all__ = [
    "convert_from_json",
    "dremio_concat",
    "dremio_to_spark_format",
    "kvgen",
    "register_all",
    "to_char",
    "to_date_fmt",
    "to_timestamp_fmt",
]
