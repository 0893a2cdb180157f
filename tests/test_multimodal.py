"""Multimodal plumbing vs DuckDB oracle + feature golden values + stub gate."""

from __future__ import annotations

import numpy as np
import pytest

from dremio_oss_spark.operators import multimodal as M
from dremio_oss_spark.queries import multimodal_q

from .conftest import SF_SMALL
from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(multimodal_q.MULTIMODAL_ORACLE))
def test_multimodal_parity(spark, oracle, name):
    df = multimodal_q.MULTIMODAL_QUERIES[name](spark, SF_SMALL)
    expected = oracle.execute(multimodal_q.MULTIMODAL_ORACLE[name]).fetchdf()
    problems = compare(df, expected, ordered=False)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_feature_values_match_numpy(spark):
    """Distributed stub-decode must equal the same math done locally."""
    df = spark.createDataFrame([(1, "hello world"), (2, "aaaa")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in M.decode_and_featurize(M.attach_fake_media(df)).collect()
    }
    for doc_id, text in [(1, "hello world"), (2, "aaaa")]:
        a = np.frombuffer(text.encode(), dtype=np.uint8)
        assert out[doc_id]["n_bytes"] == a.size
        assert out[doc_id]["byte_mean"] == round(float(a.mean()), 6)
        hist = np.bincount(a % 8, minlength=8).astype(float)
        assert out[doc_id]["feature"] == pytest.approx(list(hist / hist.sum()))


def test_real_decode_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = M.attach_fake_media(df)
    with pytest.raises(Exception) as ei:
        M.decode_and_featurize(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_updates_meta_only(spark):
    df = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    media = M.attach_fake_media(df)
    resized = M.resize_stub(media, 224, 224).collect()[0]
    assert resized["meta"]["width"] == 224
    assert resized["meta"]["height"] == 224
    assert bytes(resized["media"]) == b"some text"
