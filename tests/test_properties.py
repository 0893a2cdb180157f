"""Property-based tests (hypothesis) — an upgrade over the reference's
golden-value-only strategy (SURVEY.md §5: no property testing exists in
dremio-oss).  Driver-side properties run per-example; Spark-backed
properties batch one DataFrame per example to keep wall-clock sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from dremio_oss_spark.functions.datetime_fmt import dremio_to_spark_format
from dremio_oss_spark.operators.dedup import _P_LANE, lane_params


@given(st.integers(min_value=0, max_value=10_000))
def test_lane_params_bounds(i):
    a, b = lane_params(i)
    assert 0 <= a < _P_LANE and 0 <= b < _P_LANE


@given(
    st.text(
        alphabet="YMDHIS-/:. \"aWQbz",
        min_size=0,
        max_size=24,
    )
)
def test_format_translation_never_leaks_raw_letters(fmt):
    """Every alphabetic run in the output must be either a known java.time
    pattern letter or quoted as a literal — unknown letters must never
    reach java.time unquoted (they'd throw or silently misformat)."""
    out = dremio_to_spark_format(fmt)
    # strip quoted literals, then only pattern letters may remain
    unquoted = re.sub(r"'[^']*'", "", out)
    # D = day-of-year, z = zone name: both valid java.time letters the
    # translator emits (Dremio DDD passes through, see datetime_fmt.py)
    assert not re.search(r"[^yMdDHhmsSEQWwxaz\W]", unquoted), (fmt, out)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=12),
        min_size=1,
        max_size=20,
    )
)
def test_exact_dedup_matches_python_reference(spark, texts):
    """exact_dedup grouping == a python dict over the same normalization."""
    from collections import defaultdict
    import hashlib

    from dremio_oss_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["fp"]: (r["canonical_id"], r["n_copies"])
        for r in exact_dedup(df).collect()
    }
    ref = defaultdict(list)
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        ref[hashlib.md5(norm.encode()).hexdigest()].append(i)
    expected = {fp: (min(ids), len(ids)) for fp, ids in ref.items()}
    assert got == expected


def test_oracle_gate_flags_every_dtype_drift_class():
    """The local gate must stay at least as strict as the driver's
    dtype-sensitive hash: int-vs-float, Decimal objects, date objects,
    and non-scalar cells are each rejected (regression guard for the
    round-2 failure mode where a lenient local gate hid 11 driver
    mismatches)."""
    import datetime
    from decimal import Decimal

    import pandas as pd

    from .oracle import dtype_problems

    ok_a = pd.DataFrame({"x": [1, 2], "y": [1.5, 2.5]})
    ok_b = pd.DataFrame({"x": [1, 2], "y": [1.5, 2.5]})
    assert dtype_problems(ok_a, ok_b) == []

    # int64 vs float64
    assert dtype_problems(
        pd.DataFrame({"x": [1, 2]}), pd.DataFrame({"x": [1.0, 2.0]})
    )
    # Decimal object column (either side, even if both agree)
    dec = pd.DataFrame({"x": [Decimal("1.00")]})
    assert dtype_problems(dec, dec)
    # date objects vs datetime64
    assert dtype_problems(
        pd.DataFrame({"d": [datetime.date(2024, 1, 1)]}),
        pd.DataFrame({"d": pd.to_datetime(["2024-01-01"])}),
    )
    # non-scalar cells (breaks the driver's sort_values)
    lst = pd.DataFrame({"a": [[1, 2]]})
    assert dtype_problems(lst, lst)
