"""Property-based tests (hypothesis) — an upgrade over the reference's
golden-value-only strategy (SURVEY.md §5: no property testing exists in
dremio-oss).  Driver-side properties run per-example; Spark-backed
properties batch one DataFrame per example to keep wall-clock sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from dremio_oss_spark.functions.datetime_fmt import dremio_to_spark_format

from .conftest import SF_SMALL
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


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(max_size=40),
            st.one_of(st.none(), st.text(max_size=10)),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                     max_size=6),
            st.dictionaries(st.text(min_size=1, max_size=8),
                            st.text(max_size=8), max_size=4),
        ),
        min_size=0, max_size=20,
    )
)
def test_avro_codec_roundtrip_property(rows):
    """Avro container codec: encode->decode is identity for any record
    mix of 64-bit ints, unicode, optionals, doubles, arrays, maps."""
    import os
    import tempfile

    from dremio_oss_spark.sources.avro_codec import (
        read_avro_file,
        write_avro_file,
    )

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "o", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "a", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ]}
    recs = [
        {"i": i, "s": s, "o": o, "d": d, "a": a, "m": m}
        for i, s, o, d, a, m in rows
    ]
    fd, path = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        write_avro_file(path, schema, recs)
        assert read_avro_file(path) == recs
    finally:
        os.unlink(path)


@settings(max_examples=60, deadline=None)
@given(
    st.floats(min_value=-89.99, max_value=89.99),
    st.floats(min_value=-179.99, max_value=179.99),
)
def test_geohash_closed_form_equals_bisection(lat, lon):
    """The engine's closed-form geohash (also the DuckDB oracle's
    construction) must equal reference-style bisection for arbitrary
    coordinates — this is what licenses the fn_st_geohash oracle.
    Coordinates within ~1e-6 cells of a boundary are excluded: there the
    two formulations legitimately disagree by one ulp of rounding."""
    import pandas as pd
    from hypothesis import assume

    from dremio_oss_spark.functions.shims import _st_geohash

    x = (lon + 180.0) / 360.0 * (1 << 23)
    y = (lat + 90.0) / 180.0 * (1 << 22)
    assume(abs(x - round(x)) > 1e-6 and abs(y - round(y)) > 1e-6)

    engine = _st_geohash(pd.Series([lat]), pd.Series([lon]), pd.Series([9]))[0]

    # independent reference: classic interval bisection (GeoFunctions.java)
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, nbit, even, out = 0, 0, True, []
    while len(out) < 9:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lon_lo = mid
            else:
                bits <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        nbit += 1
        if nbit == 5:
            out.append(b32[bits])
            bits, nbit = 0, 0
    assert engine == "".join(out), (lat, lon)


def test_delta_dml_model_based(spark, tmp_path):
    """Model-based sequence test: a random-but-fixed program of
    INSERT/DELETE/UPDATE/MERGE/OPTIMIZE/ROLLBACK ops applied both to
    the Delta table and to a driver-side dict model; after every op the
    table must equal the model exactly.  (One deterministic program
    rather than per-example Spark sessions — hypothesis-style state
    machine economics don't fit JVM startup costs.)"""
    from dremio_oss_spark.sources.delta import (
        delete_from_delta, merge_into_delta, optimize_delta, read_delta,
        rollback_delta, update_delta, write_delta)

    t = str(tmp_path / "t")
    model: dict[int, tuple[int, float]] = {
        k: (k % 3, float(k)) for k in range(40)}

    def to_df(rows):
        return spark.createDataFrame(
            [(k, p, v) for k, (p, v) in sorted(rows.items())],
            "k long, p long, v double")

    def check():
        got = {r["k"]: (r["p"], r["v"])
               for r in read_delta(spark, t).collect()}
        assert got == model, (len(got), len(model))

    write_delta(spark, to_df(model), t, partition_by=["p"])
    check()

    # program: (op, args) — deterministic, exercises every DML verb
    delete_from_delta(spark, t, "k % 5 = 0")
    model = {k: s for k, s in model.items() if k % 5 != 0}
    check()

    update_delta(spark, t, {"v": "v * 2"}, "p = 1")
    model = {k: (p, v * 2 if p == 1 else v)
             for k, (p, v) in model.items()}
    check()

    src_rows = {3: (0, -3.0), 100: (1, 100.0), 101: (2, 101.0)}
    merge_into_delta(spark, t, to_df(src_rows), on=["k"])
    for k, s in src_rows.items():
        model[k] = s
    check()

    v_before = optimize_delta(spark, t) - 1  # version before OPTIMIZE
    check()  # OPTIMIZE must not change rows

    delete_from_delta(spark, t, "true")
    model_empty: dict[int, tuple[int, float]] = {}
    got = {r["k"] for r in read_delta(spark, t).collect()}
    assert got == set(model_empty)

    rollback_delta(spark, t, v_before)
    check()  # restored to pre-OPTIMIZE state == current model


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**33),      # multi-bitmap range
        st.integers(min_value=65530, max_value=65545),  # container boundary
        st.integers(min_value=0, max_value=70000),      # dense-ish region
    ),
    max_size=300))
def test_roaring_roundtrip(positions):
    """encode→decode is the identity on any 64-bit position set
    (container boundaries, multi-bitmap splits, duplicates)."""
    from dremio_oss_spark.sources.roaring import (decode_rbm_array,
                                                  encode_rbm_array)

    want = sorted(set(positions))
    assert decode_rbm_array(encode_rbm_array(positions)) == want


def test_roaring_bitset_container_roundtrip():
    """>4096 values in one 64K container forces the bitset encoding."""
    from dremio_oss_spark.sources.roaring import (decode_rbm_array,
                                                  encode_rbm_array)

    vals = list(range(0, 65536, 13))  # 5042 values -> bitset container
    assert len(vals) > 4096
    assert decode_rbm_array(encode_rbm_array(vals)) == vals


def test_convert_codec_roundtrips_property(spark):
    """Every typed CONVERT codec round-trips decode(encode(v)) == v for
    adversarial values — two's-complement extremes, IEEE specials (NaN,
    +-inf, +-0.0, denormals), vint length boundaries — in ONE batched
    query per type (hypothesis-style value coverage without per-example
    Spark jobs)."""
    import math

    from dremio_oss_spark.engine import Engine

    eng = Engine(spark, register_functions=True)

    ints = [0, 1, -1, 127, -128, 2**31 - 1, -(2**31)]
    bigs = ints + [2**63 - 1, -(2**63), -112, -113, 255, 2**40]
    dbls = [0.0, -0.0, 1.5, -2.5e-300, 1.79e308, 5e-324,
            float("inf"), float("-inf"), float("nan")]

    def roundtrip(vals, fmt, enc, dec, cast=""):
        sql = " union all ".join(
            f"select {i} as i, {dec}({enc}({v}{cast})) as got, "
            f"{v}{cast} as want"
            for i, v in enumerate(vals)
        )
        for r in eng.sql(sql).collect():
            g, w = r["got"], r["want"]
            if isinstance(w, float) and math.isnan(w):
                assert math.isnan(g), f"{fmt}: NaN lost"
            else:
                assert g == w, f"{fmt}: {w!r} -> {g!r}"

    roundtrip(ints, "int_le", "convert_to_int", "convert_from_int")
    roundtrip(ints, "int_be", "convert_to_int_be", "convert_from_int_be")
    roundtrip(ints, "int_hadoopv", "convert_to_int_hadoopv",
              "convert_from_int_hadoopv")
    roundtrip(bigs, "bigint_le", "convert_to_bigint", "convert_from_bigint")
    roundtrip(bigs, "bigint_be", "convert_to_bigint_be",
              "convert_from_bigint_be")
    roundtrip(bigs, "bigint_hadoopv", "convert_to_bigint_hadoopv",
              "convert_from_bigint_hadoopv")
    roundtrip([repr(d) if not math.isnan(d) and not math.isinf(d)
               else f"cast('{d}' as double)" for d in dbls],
              "double_le", "convert_to_double", "convert_from_double",
              cast="")
    roundtrip([repr(d) if not math.isnan(d) and not math.isinf(d)
               else f"cast('{d}' as double)" for d in dbls],
              "double_be", "convert_to_double_be", "convert_from_double_be")


@settings(max_examples=15, deadline=None)
@given(
    dims=st.lists(
        st.sampled_from(["l_returnflag", "l_linestatus", "l_shipdate"]),
        min_size=1, max_size=3, unique=True),
    measures=st.lists(
        st.sampled_from([("sum", "l_quantity"), ("count", "l_orderkey"),
                         ("min", "l_discount"), ("max", "l_discount")]),
        min_size=1, max_size=3, unique=True),
    flt=st.sampled_from([None, "l_returnflag = 'R'",
                         "l_linestatus = 'F'",
                         "l_shipdate >= '1997-01-01'",
                         "l_returnflag in ('A', 'N')"]),
)
def test_property_substituted_equals_direct(spark, dims, measures, flt):
    """For ANY dims-subset/measures-subset/dim-filter aggregate inside
    the reflection's shape, the transparently substituted answer equals
    the direct computation — the core soundness contract of
    substitution (SubstitutionProvider semantics)."""
    eng = _property_engine(spark)

    sel = list(dims) + [
        f"{k}({c}) as m{i}" for i, (k, c) in enumerate(measures)]
    where = f" where {flt}" if flt else ""
    # filter columns must be dims of the QUERY's fragment checker too —
    # restrict to cases the reflection can cover
    q = (f"select {', '.join(sel)} from lineitem{where} "
         f"group by {', '.join(dims)}")
    df = eng.sql(q)
    direct = spark.sql(q)

    def canon(frame):
        out = set()
        for r in frame.collect():
            key = tuple(r[d] for d in dims)
            vals = []
            for i, (k, _c) in enumerate(measures):
                v = r[f"m{i}"]
                vals.append(round(float(v), 4) if v is not None else None)
            out.add((key, tuple(vals)))
        return out

    assert canon(df) == canon(direct), q
    # and when the filter touches a non-dim column the engine must have
    # fallen back (covers() soundness) — verified implicitly: results
    # match either way; acceleration status is advisory here


def _property_engine(spark):
    """One engine + reflection per session, cached on the session."""
    if not hasattr(spark, "_prop_engine"):
        from dremio_oss_spark.catalog import register_testdata
        from dremio_oss_spark.engine import Engine

        register_testdata(spark, SF_SMALL)
        eng = Engine(spark)
        eng.sql(
            "ALTER TABLE lineitem CREATE AGGREGATE REFLECTION prop_r "
            "USING DIMENSIONS (l_returnflag, l_linestatus, l_shipdate) "
            "MEASURES (l_quantity (SUM), l_orderkey (COUNT), "
            "l_discount (MIN, MAX))")
        spark._prop_engine = eng
    return spark._prop_engine


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.sampled_from(["sum", "min", "max", "count", "avg",
                              "condagg", "mindim", "countdim",
                              "postagg"]),
             min_size=1, max_size=3),
    st.sampled_from([None, "d1 = 'x0'", "m1 > 50", "d1 in ('x0','x1')",
                     "d1 between 'x0' and 'x1'",
                     "not (d1 like 'x1%')"]),
    st.booleans(),
)
def test_substitution_equals_unaccelerated(spark, kinds, flt, left_join):
    """Equivalence property over the transparent substituter: for random
    measure sets (incl. conditional aggregates, dim-grain min/count,
    and post-agg arithmetic over AVG), filters (incl. BETWEEN and NOT
    LIKE), and join types, the accelerated answer must equal the
    unaccelerated plan bit-for-bit (same grouping, same nulls)."""
    from dremio_oss_spark.engine import Engine

    fact = spark.createDataFrame(
        [(i, f"x{i % 3}", i % 11, float(i % 97),
          None if i % 7 == 0 else float(i))
         for i in range(300)],
        "fk long, d1 string, dimk long, m1 double, m2 double")
    dim = spark.createDataFrame(
        [(k, f"g{k % 2}") for k in range(8)], "dk long, grp string")
    fact.createOrReplaceTempView("pb_fact")
    dim.createOrReplaceTempView("pb_dim")

    meas_sql = []
    for j, k in enumerate(sorted(set(kinds))):
        if k == "condagg":  # pivot shape over a dim predicate
            meas_sql.append(
                f"sum(case when d1 = 'x0' then m1 else 0 end) as a{j}")
        elif k == "mindim":  # dim-grain measure, no declared partial
            meas_sql.append(f"min(d1) as a{j}")
        elif k == "countdim":  # dim-grain null-aware count
            meas_sql.append(f"count(dimk) as a{j}")
        elif k == "postagg":  # arithmetic over a reduced AVG
            meas_sql.append(f"avg(m2) * 2 + 1 as a{j}")
        else:
            col = "m2" if k in ("count", "avg") else "m1"  # m2: NULLs
            meas_sql.append(f"{k}({col}) as a{j}")
    ddl_meas = "m1 (SUM, MIN, MAX, COUNT), m2 (SUM, COUNT)"
    join_sql = (" left join pb_dim on dimk = dk" if left_join else "")
    ddl_join = (" JOINS (LEFT pb_dim ON dimk = dk)" if left_join else "")
    group = "d1, grp" if left_join else "d1"

    eng = Engine(spark)
    eng.sql(f"ALTER TABLE pb_fact CREATE AGGREGATE REFLECTION pb_r "
            f"USING DIMENSIONS (d1, dimk{', grp' if left_join else ''}) "
            f"MEASURES ({ddl_meas}){ddl_join}")
    try:
        where = f" where {flt}" if flt and "m1" not in flt else ""
        q = (f"select {group}, {', '.join(meas_sql)} from pb_fact"
             f"{join_sql}{where} group by {group}")
        got = eng.sql(q)
        accel = eng.last_plan_accelerated
        base = spark.sql(q.replace("pb_fact", "pb_fact"))  # same SQL,
        # but force the unaccelerated plan through a bare spark.sql
        def key(t):  # None-safe sort (null-extended group keys)
            return tuple((v is None, v) for v in t)

        g = sorted(map(tuple, got.collect()), key=key)
        b = sorted(map(tuple, base.collect()), key=key)
        assert g == b, (q, accel, g[:3], b[:3])
        assert accel == "pb_r", (q, "expected substitution")
    finally:
        eng.sql("ALTER TABLE pb_fact DROP REFLECTION pb_r")


def test_iceberg_eq_delete_sequence_model_based(spark, tmp_path):
    """Model-based program over Iceberg MOR equality deletes with
    sequence numbers: appends and key-deletes interleave (including
    re-inserting previously deleted keys, deleting re-inserted keys
    again, COW updates, and OPTIMIZE); after every op the table equals
    a driver-side dict model applying the ops in commit order.  The
    model is exactly the spec's semantics — a delete removes the keys
    that exist AT DELETE TIME; later inserts of the same key survive —
    so any sequence-scoping bug (delete leaking forward or failing to
    reach backward) diverges immediately."""
    from dremio_oss_spark.sources.iceberg import (
        delete_from_iceberg, optimize_iceberg, read_iceberg,
        update_iceberg, write_iceberg)

    t = str(tmp_path / "t")
    model: dict[int, float] = {}

    def to_df(rows: dict[int, float]):
        return spark.createDataFrame(
            sorted(rows.items()), "k long, v double")

    def check():
        got = {r["k"]: r["v"] for r in read_iceberg(spark, t).collect()}
        assert got == model, (sorted(got.items())[:5],
                              sorted(model.items())[:5],
                              len(got), len(model))

    import random

    rng = random.Random(42)
    # bootstrap
    first = {k: float(k) for k in range(25)}
    write_iceberg(spark, to_df(first), t)
    model.update(first)
    check()

    next_k = 25
    for step in range(8):
        op = rng.choice(["append", "reinsert", "eq_delete", "update"])
        if op == "append":
            rows = {next_k + i: float(next_k + i) for i in range(4)}
            next_k += 4
            write_iceberg(spark, to_df(rows), t, mode="append")
            model.update(rows)
        elif op == "reinsert":
            # resurrect up to 3 previously deleted keys with new values
            dead = sorted(set(range(next_k)) - set(model))[:3]
            if not dead:
                continue
            rows = {k: float(k) + 0.5 for k in dead}
            write_iceberg(spark, to_df(rows), t, mode="append")
            model.update(rows)
        elif op == "eq_delete":
            ks = rng.sample(sorted(model), min(5, len(model)))
            pred = f"k in ({', '.join(map(str, ks))})"
            delete_from_iceberg(spark, t, pred, mode="merge-on-read",
                                equality_cols=["k"])
            for k in ks:
                model.pop(k, None)
        else:  # COW update over the MOR state
            update_iceberg(spark, t, {"v": "v + 1000"}, "k % 7 = 0")
            model = {k: (v + 1000 if k % 7 == 0 else v)
                     for k, v in model.items()}
        check()

    optimize_iceberg(spark, t)
    check()
    # post-OPTIMIZE the cycle restarts cleanly: delete then re-insert
    if model:
        k0 = sorted(model)[0]
        delete_from_iceberg(spark, t, f"k = {k0}", mode="merge-on-read",
                            equality_cols=["k"])
        model.pop(k0)
        check()
        write_iceberg(spark, to_df({k0: 7.25}), t, mode="append")
        model[k0] = 7.25
        check()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=2**40),  # multi-key span
            st.integers(min_value=0, max_value=70_000),  # container edge
        ),
        min_size=0, max_size=400),
    st.one_of(st.none(), st.tuples(
        st.integers(min_value=0, max_value=100_000),
        st.integers(min_value=1, max_value=8_000))),
)
def test_roaring_roundtrip_property(vals, dense_run):
    """RoaringFormatSpec codec roundtrip: random sparse positions
    (across 32-bit key buckets), container-boundary values, and a
    dense contiguous run (array->bitmap container switch) all decode
    back to the exact input set."""
    from dremio_oss_spark.sources.roaring import (decode_rbm_array,
                                                  encode_rbm_array)

    poss = set(vals)
    if dense_run:
        start, n = dense_run
        poss |= set(range(start, start + n))  # forces bitmap containers
    want = sorted(poss)
    got = decode_rbm_array(encode_rbm_array(want))
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.sampled_from(["date_trunc('day', ts)", "date_trunc('month', ts)",
                     "year(ts)", "month(ts)", "quarter(ts)",
                     "date_trunc('hour', ts)",
                     "date_trunc('minute', ts)", "ts"]),
    st.booleans(),
)
def test_by_day_grain_matching_equals_unaccelerated(spark, expr,
                                                    extra_dim):
    """Grain-matching property for BY DAY dims: for ANY temporal
    grouping expression, the engine's answer equals the unaccelerated
    plan, and the acceleration decision follows the grain rule —
    day-or-coarser expressions substitute, sub-day and raw ones refuse
    (the DATE-cast materialization lost those values)."""
    from dremio_oss_spark.catalog import load
    from dremio_oss_spark.engine import Engine

    if not hasattr(spark, "_grain_engine"):
        load(spark, SF_SMALL, "events").createOrReplaceTempView(
            "pb_events")
        eng = Engine(spark)
        eng.sql("ALTER TABLE pb_events CREATE AGGREGATE REFLECTION "
                "prop_gr USING DIMENSIONS (event_type, ts BY DAY) "
                "MEASURES (value (SUM))")
        spark._grain_engine = eng
    eng = spark._grain_engine
    dims = (["event_type"] if extra_dim else []) + [expr]
    q = (f"select {', '.join(dims)}, "
         f"cast(sum(value) as decimal(28,4)) as s, count(*) as n "
         f"from pb_events group by {', '.join(dims)}")
    got = eng.sql(q)
    day_ok = any(g in expr for g in
                 ("'day'", "'month'", "year", "month", "quarter"))
    assert (eng.last_plan_accelerated == "prop_gr") == day_ok, \
        (expr, eng.last_plan_accelerated)
    base = spark.sql(q)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(got) == canon(base), expr


def test_pred_implies_soundness_exhaustive():
    """Filter-subsumption soundness (plans/reflections.py pred_implies
    decides whether a PARTIAL reflection silently answers a query — the
    one matcher whose bug class is wrong-rows-served): EXHAUSTIVELY over
    the op fragment {>=, >, <=, <, =, in} × a literal set, whenever
    pred_implies(query, reflection) says True, the query predicate's
    satisfying rows must be a SUBSET of the reflection predicate's —
    checked against BOTH a Python real-semantics domain (literals ±
    strict-neighborhood witnesses, so >= vs > strictness bugs can't
    hide between sample points) and DuckDB WHERE evaluation on the
    same domain."""
    import itertools

    import duckdb

    from dremio_oss_spark.plans.reflections import parse_pred, pred_implies

    # numeric: literals {0,1,2}; domain adds ±0.25 neighborhoods so a
    # strictness mistake (x>=1 ⇏ x>1) always has a witness
    lits = [0.0, 1.0, 2.0]
    domain = sorted({x for v in lits for x in
                     (v - 0.25, v, v + 0.25)} | {-5.0, 5.0})
    ops = [">=", ">", "<=", "<", "="]
    preds = [(f"c {op} {v}", ("c", op, (v,)))
             for op in ops for v in lits]
    preds += [(f"c in ({', '.join(str(v) for v in combo)})",
               ("c", "in", combo))
              for n in (1, 2) for combo in
              itertools.combinations(lits, n)]
    # the parser must agree with the hand-built tuples
    for text, tup in preds:
        assert parse_pred(text) == tup, text

    def sat_py(tup):
        col, op, vals = tup
        if op == "in":
            return {x for x in domain if x in vals}
        import operator
        f = {">=": operator.ge, ">": operator.gt, "<=": operator.le,
             "<": operator.lt, "=": operator.eq}[op]
        return {x for x in domain if f(x, vals[0])}

    con = duckdb.connect()
    con.execute("create table t(c double)")
    con.executemany("insert into t values (?)", [(x,) for x in domain])

    def sat_sql(text):
        return {r[0] for r in
                con.execute(f"select c from t where {text}").fetchall()}

    n_true = 0
    for (ta, a), (tb, b) in itertools.product(preds, preds):
        pa, pb = sat_py(a), sat_py(b)
        assert pa == sat_sql(ta), f"python/SQL semantics drift: {ta}"
        if pred_implies(a, b):
            n_true += 1
            assert pa <= pb, (
                f"UNSOUND: {ta} claimed to imply {tb} but "
                f"{sorted(pa - pb)} satisfy the query and not the "
                "reflection — a partial reflection would serve wrong "
                "rows")
    # non-vacuous: the fragment has plenty of true implications
    assert n_true > 100, n_true
    # different column never implies
    assert not pred_implies(("a", "=", (1.0,)), ("b", "=", (1.0,)))
    # string/number mixes refuse
    assert not pred_implies(("c", "=", ("x",)), ("c", ">=", (1.0,)))
    con.close()


def test_pred_implies_soundness_strings_and_parser():
    """Same soundness over STRING literals (ISO dates compare
    lexicographically — the partial-reflection date fragment), plus
    parser refusal cases: anything outside the fragment must parse to
    None (sound: no silent acceleration), and mixed-type IN lists
    refuse."""
    import itertools

    from dremio_oss_spark.plans.reflections import parse_pred, pred_implies

    lits = ["2024-01-01", "2024-06-15", "2024-12-31"]
    domain = sorted(set(lits) | {"2023-12-31", "2024-01-02",
                                 "2024-06-14", "2024-06-16",
                                 "2025-01-01", ""})
    ops = [">=", ">", "<=", "<", "="]
    preds = [(f"c {op} '{v}'", ("c", op, (v,))) for op in ops
             for v in lits]
    preds += [("c in ('2024-01-01', '2024-12-31')",
               ("c", "in", ("2024-01-01", "2024-12-31")))]
    for text, tup in preds:
        assert parse_pred(text) == tup, text

    import operator
    fmap = {">=": operator.ge, ">": operator.gt, "<=": operator.le,
            "<": operator.lt, "=": operator.eq}

    def sat(tup):
        col, op, vals = tup
        if op == "in":
            return {x for x in domain if x in vals}
        return {x for x in domain if fmap[op](x, vals[0])}

    n_true = 0
    for (ta, a), (tb, b) in itertools.product(preds, preds):
        if pred_implies(a, b):
            n_true += 1
            assert sat(a) <= sat(b), f"UNSOUND: {ta} => {tb}"
    assert n_true > 20, n_true

    # parser refusals: outside-fragment shapes must be None
    for bad in ("c <> 5", "c != 5", "c like 'a%'", "c is null",
                "c between 1 and 2", "lower(c) = 'x'",
                "c in (1, 'x')",      # mixed-type IN
                "c in 1",             # malformed IN
                "c = a_column"):      # non-literal rhs
        assert parse_pred(bad) is None, bad


def test_pred_conjunction_subsumption_soundness():
    """The covers() conjunction rule (plans/reflections.py:371-380:
    every REFLECTION predicate implied by SOME query predicate) must be
    row-sound for conjunctive WHERE lists: whenever the rule accepts,
    the query's AND-intersection must be a subset of the reflection's.
    Randomized over predicate lists with a seeded generator."""
    import itertools
    import operator
    import random

    from dremio_oss_spark.plans.reflections import pred_implies

    rng = random.Random(11)
    lits = [0.0, 1.0, 2.0, 3.0]
    domain = sorted({x for v in lits for x in
                     (v - 0.25, v, v + 0.25)} | {-5.0, 7.0})
    ops = [">=", ">", "<=", "<", "="]
    pool = [("c", op, (v,)) for op in ops for v in lits]
    pool += [("c", "in", combo) for combo in
             itertools.combinations(lits, 2)]
    fmap = {">=": operator.ge, ">": operator.gt, "<=": operator.le,
            "<": operator.lt, "=": operator.eq}

    def sat(tup):
        _, op, vals = tup
        if op == "in":
            return {x for x in domain if x in vals}
        return {x for x in domain if fmap[op](x, vals[0])}

    def sat_all(preds):
        rows = set(domain)
        for p in preds:
            rows &= sat(p)
        return rows

    n_accept = 0
    for _ in range(4000):
        q_preds = rng.sample(pool, rng.randint(1, 3))
        r_preds = rng.sample(pool, rng.randint(1, 2))
        accepted = all(
            any(pred_implies(qp, rp) for qp in q_preds)
            for rp in r_preds)
        if accepted:
            n_accept += 1
            assert sat_all(q_preds) <= sat_all(r_preds), (
                f"UNSOUND conjunction: {q_preds} accepted against "
                f"{r_preds}")
    assert n_accept > 200, n_accept  # non-vacuous
