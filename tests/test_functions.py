"""Function-shim queries vs DuckDB oracle + golden-value unit tests."""

from __future__ import annotations

import pytest

from dremio_oss_spark.functions import dremio_to_spark_format
from dremio_oss_spark.queries import functions_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(functions_q.FUNCTION_ORACLE))
def test_function_parity(spark, oracle, name):
    df = functions_q.FUNCTION_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(functions_q.FUNCTION_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_joda_format_translation():
    assert dremio_to_spark_format("YYYY-MM-DD") == "yyyy-MM-dd"
    assert dremio_to_spark_format("HH24:MI:SS.FFF") == "HH:mm:ss.SSS"
    assert dremio_to_spark_format("DY, DD MON YYYY") == "EEE, dd MMM yyyy"
    assert dremio_to_spark_format('YYYY"T"HH24') == "yyyy'T'HH"


def test_st_geohash_golden(spark):
    """Known geohash vectors (public test vectors for geohash encoding)."""
    from dremio_oss_spark.functions.shims import register_all

    register_all(spark)
    rows = spark.sql(
        "select st_geohash(57.64911d, 10.40744d, 11) as a, "
        "st_geohash(48.669d, -4.329d, 5) as b"
    ).collect()
    assert rows[0]["a"] == "u4pruydqqvj"
    assert rows[0]["b"] == "gbsuv"


def test_convert_be_signed_roundtrip(spark):
    """Two's-complement round-trip incl. negatives and extremes
    (ConvertFromImpl int_be/bigint_be semantics)."""
    from dremio_oss_spark.functions.shims import register_all

    register_all(spark)
    vals = [0, 1, -1, 2147483647, -2147483648, 42, -42]
    for v in vals:
        row = spark.sql(
            f"select convert_from_int_be(convert_to_int_be({v})) as i"
        ).collect()[0]
        assert row["i"] == v, f"int_be roundtrip failed for {v}: {row['i']}"
    bvals = [0, 1, -1, 9223372036854775807, -9223372036854775808, -4294967296]
    for v in bvals:
        row = spark.sql(
            f"select convert_from_bigint_be(convert_to_bigint_be({v}L)) as i"
        ).collect()[0]
        assert row["i"] == v, f"bigint_be roundtrip failed for {v}: {row['i']}"


def test_dremio_concat_null_semantics(spark):
    from dremio_oss_spark.functions import dremio_concat
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    out = df.select(dremio_concat("x", "y", "z").alias("r")).collect()
    assert out[0]["r"] == "ac"


def test_soundex_golden(spark):
    """Soundex (StringFunctions.java soundex; DuckDB lacks it — golden)."""
    rows = spark.sql(
        "select soundex('Robert') as a, soundex('Rupert') as b, "
        "soundex('Tymczak') as c"
    ).collect()[0]
    assert rows["a"] == "R163" and rows["b"] == "R163"
    assert rows["c"] == "T522"


def test_single_value_errors_on_multirow_group(spark):
    """SINGLE_VALUE must raise when a group has >1 row
    (SingleValueAggregateFunctions.java error contract)."""
    from pyspark.sql import functions as F

    from dremio_oss_spark.functions.shims import single_value

    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    ok = (
        df.where("k = 2")
        .groupBy("k")
        .agg(single_value(F.col("v")).alias("v"))
        .collect()
    )
    assert ok == [(2, "c")] or (ok[0]["k"], ok[0]["v"]) == (2, "c")
    with pytest.raises(Exception, match="SINGLE_VALUE"):
        df.groupBy("k").agg(single_value(F.col("v")).alias("v")).collect()


def test_hll_merge_partials_match_whole(spark):
    """Merging per-partition sketches must estimate like one whole-table
    sketch (HyperLogLog.java HLL_MERGE/HLL_DECODE semantics)."""
    from pyspark.sql import functions as F

    from dremio_oss_spark.functions.shims import hll, hll_decode, hll_merge

    df = spark.range(0, 20_000).select(
        (F.col("id") % 7).alias("part"), F.col("id").alias("v")
    )
    merged = (
        df.groupBy("part")
        .agg(hll("v").alias("sk"))
        .groupBy()
        .agg(hll_decode(hll_merge("sk")).alias("est"))
        .collect()[0]["est"]
    )
    whole = df.groupBy().agg(hll_decode(hll("v")).alias("est")).collect()[0]["est"]
    assert merged == whole  # same sketch algorithm, same buckets
    assert abs(merged - 20_000) <= 0.05 * 20_000


def test_convert_from_be_length_guard(spark):
    """convert_from_int_be/bigint_be reject wrong-length buffers like the
    reference's checkBufferLength (IntBEConvertFrom/BigIntBEConvertFrom)."""
    from dremio_oss_spark.functions.shims import register_all

    register_all(spark)
    row = spark.sql(
        "select convert_from_int_be(unhex('0000002A')) as i, "
        "convert_from_bigint_be(unhex('000000000000002A')) as l"
    ).collect()[0]
    assert (row["i"], row["l"]) == (42, 42)
    with pytest.raises(Exception, match="4 bytes"):
        spark.sql("select convert_from_int_be(unhex('002A'))").collect()
    with pytest.raises(Exception, match="8 bytes"):
        spark.sql(
            "select convert_from_bigint_be(unhex('0000002A'))"
        ).collect()


def test_datetime_fmt_and_yearweek_review_fixes(spark):
    """Review r6: an unrecognized literal letter must not swallow the
    following tokens (DDTHH24 keeps its hour token), and YEARWEEK pairs
    the ISO week with the ISO week-YEAR at year boundaries."""
    from dremio_oss_spark.functions.datetime_fmt import (
        dremio_to_spark_format)
    from dremio_oss_spark.functions.shims import register_all

    assert dremio_to_spark_format("YYYY-MM-DDTHH24:MI:SS") == \
        "yyyy-MM-dd'T'HH:mm:ss"
    register_all(spark, names=["yearweek"])
    got = spark.sql(
        "select yearweek(date'2021-01-01') as a, "
        "yearweek(date'2019-12-30') as b, "
        "yearweek(date'2021-06-15') as c").collect()[0]
    assert (got.a, got.b, got.c) == (202053, 202001, 202124)
