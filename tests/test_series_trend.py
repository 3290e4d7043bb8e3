"""Per-series OLS trend (operators/timeseries.py::series_trend) —
promoted round 6: the oracle moved verbatim onto the r57_daily_revenue_trend registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps an exact-line hand check and the degenerate-variance
NULL pins (Spark corr yields NaN at zero variance where DuckDB yields
NULL — the operator normalizes; see the r44 flat-series stance)."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import series_trend
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_series_trend_exact_line(spark):
    """Points on y = 3x + 7 fit exactly: slope 3, intercept 7,
    r2 = 1."""
    df = spark.createDataFrame(
        [("a", float(t), 3.0 * t + 7.0) for t in range(5)],
        "k string, t double, x double",
    )
    got = series_trend(df, ["k"], "t", "x").collect()[0]
    assert got["n_obs"] == 5
    assert math.isclose(got["slope"], 3.0)
    assert math.isclose(got["intercept"], 7.0)
    assert math.isclose(got["r2"], 1.0)


def test_series_trend_degenerate_nulls(spark):
    """Zero t-variance (single point, or all obs at one t) → NULL
    slope/intercept/r2, never ±inf or NaN; constant x over varying t
    is a REAL fit: slope 0, intercept x, r2 NULL (corr undefined at
    zero x-variance)."""
    df = spark.createDataFrame(
        [("one", 5.0, 2.0),
         ("same_t", 3.0, 1.0), ("same_t", 3.0, 9.0),
         ("flat", 0.0, 4.0), ("flat", 1.0, 4.0), ("flat", 2.0, 4.0)],
        "k string, t double, x double",
    )
    got = {
        r["k"]: (r["slope"], r["intercept"], r["r2"])
        for r in series_trend(df, ["k"], "t", "x").collect()
    }
    assert got["one"] == (None, None, None)
    assert got["same_t"] == (None, None, None)
    assert got["flat"][0] == 0.0 and got["flat"][1] == 4.0
    assert got["flat"][2] is None
