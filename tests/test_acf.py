"""Per-series lag-k autocorrelation
(operators/timeseries.py::autocorrelation) — promoted round 6: the oracle moved verbatim onto the r66_volume_acf registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (lag-1..7
ACF of daily event volumes per type — the seasonality probe), plus a
numpy reference on raw values and the flat/short-series pins."""

import numpy as np
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import autocorrelation
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_acf_matches_numpy_reference(spark):
    """Lag-1..3 ACF of a fixed series equals numpy's pairwise Pearson
    corr of (x[k:], x[:-k]) to the operator's 4dp round."""
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)],
        "k string, t int, x double",
    )
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, ["k"], "t", "x", 3).collect()
    }
    arr = np.array(xs)
    for k in (1, 2, 3):
        n_pairs, acf = got[k]
        assert n_pairs == len(xs) - k
        want = np.corrcoef(arr[k:], arr[:-k])[0, 1]
        assert abs(acf - round(float(want), 4)) <= 1e-9, (k, acf, want)


def test_acf_flat_series_is_null(spark):
    df = spark.createDataFrame(
        [("s", i, 7.0) for i in range(5)], "k string, t int, x double"
    )
    rows = autocorrelation(df, ["k"], "t", "x", 2).collect()
    assert all(r["acf"] is None for r in rows)
    assert {r["lag"]: r["n_pairs"] for r in rows} == {1: 4, 2: 3}


def test_acf_lag_beyond_series_length(spark):
    """max_lag longer than the series: zero pairs, NULL acf — never
    a crash or a dropped lag row."""
    df = spark.createDataFrame(
        [("s", 0, 1.0), ("s", 1, 2.0)], "k string, t int, x double"
    )
    rows = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, ["k"], "t", "x", 4).collect()
    }
    assert rows[1] == (1, None)  # one pair: sample corr undefined
    assert rows[2] == (0, None)
    assert rows[3] == (0, None)
    assert rows[4] == (0, None)


def test_acf_rejects_bad_max_lag(spark):
    import pytest

    df = spark.createDataFrame([("s", 0, 1.0)], "k string, t int, x double")
    with pytest.raises(ValueError):
        autocorrelation(df, ["k"], "t", "x", 0)
