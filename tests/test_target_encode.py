"""Smoothed target encoding
(operators/relational.py::target_encode) — promoted round 6: the oracle moved verbatim onto the r72_custkey_encoding registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (order totals
encoded by customer key — high-cardinality, exactly where shrinkage
matters), plus closed-form shrinkage and NULL-handling hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import target_encode
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_target_encode_shrinkage_closed_form(spark):
    """Category 'a' (2 obs, mean 10) vs global mean 40 with m=2:
    encoded = (2·10 + 2·40)/4 = 25 — halfway, since n == m. A
    100-obs category at the same mean would barely move."""
    rows = [("a", 10.0), ("a", 10.0), ("b", 70.0), ("b", 70.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    got = {
        r["c"]: (r["n_obs"], r["raw_mean"], r["encoded"])
        for r in target_encode(df, ["c"], "y", smoothing=2.0).collect()
    }
    assert got["a"] == (2, 10.0, 25.0)
    assert got["b"] == (2, 70.0, 55.0)


def test_target_encode_zero_smoothing_is_raw_mean(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0)], "c string, y double"
    )
    got = target_encode(df, ["c"], "y", smoothing=0.0).collect()[0]
    assert got["encoded"] == got["raw_mean"] == 15.0


def test_target_encode_null_targets_and_null_category(spark):
    rows = [("a", 10.0), ("a", None), (None, 30.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    got = {
        r["c"]: (r["n_obs"], r["raw_mean"])
        for r in target_encode(df, ["c"], "y", smoothing=1.0).collect()
    }
    # the NULL target row informed nothing; the NULL category is a
    # category like any other
    assert got["a"] == (1, 10.0)
    assert got[None] == (1, 30.0)


def test_target_encode_rejects_negative_smoothing(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "c string, y double")
    with pytest.raises(ValueError):
        target_encode(df, ["c"], "y", smoothing=-1.0)
