"""Holt's linear (double exponential) smoothing
(operators/timeseries.py::holt_linear) —
PROMOTED round 7 as r82_holt_revenue: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import holt_linear
from miningfrequentpattern_spark.sources.io import load_table


def test_holt_hand_computed_recurrence(spark):
    """α = β = 0.5 on x = [10, 20, 40]: l1 = 10, b1 = 10;
    l2 = 0.5·20 + 0.5·(10+10) = 20, b2 = 0.5·(20−10) + 0.5·10 = 10;
    l3 = 0.5·40 + 0.5·(20+10) = 35, b3 = 0.5·(35−20) + 0.5·10 = 12.5."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0)],
        "k string, t int, x double",
    )
    got = {
        r["t"]: (r["level"], r["trend"])
        for r in holt_linear(df, ["k"], "t", "x", 0.5, 0.5).collect()
    }
    assert got[1] == (10.0, 10.0)
    assert got[2] == (20.0, 10.0)
    assert got[3] == (35.0, 12.5)


def test_holt_exact_line_has_constant_trend(spark):
    """On y = 3t + 7 the recurrence is exact at ANY α/β: level tracks
    the line and trend pins at 3 — the one-step forecast
    level + trend equals the next true value."""
    df = spark.createDataFrame(
        [("s", t, 3.0 * t + 7.0) for t in range(1, 20)],
        "k string, t int, x double",
    )
    rows = sorted(
        holt_linear(df, ["k"], "t", "x", 0.2, 0.3).collect(),
        key=lambda r: r["t"],
    )
    for r in rows:
        assert math.isclose(r["trend"], 3.0, abs_tol=1e-9)
        assert math.isclose(r["level"], 3.0 * r["t"] + 7.0, abs_tol=1e-9)


def test_holt_single_observation_null_trend(spark):
    df = spark.createDataFrame([("solo", 5, 42.0)], "k string, t int, x double")
    got = holt_linear(df, ["k"], "t", "x").collect()[0]
    assert got["level"] == 42.0 and got["trend"] is None


def test_holt_input_order_independent(spark):
    rows = [("s", t, float((t * 37) % 11)) for t in range(1, 40)]
    fwd = spark.createDataFrame(rows, "k string, t int, x double")
    rev = spark.createDataFrame(rows[::-1], "k string, t int, x double")
    a = sorted(map(tuple, holt_linear(fwd, ["k"], "t", "x").collect()))
    b = sorted(map(tuple, holt_linear(rev, ["k"], "t", "x").collect()))
    assert a == b and len(a) == 39


def test_holt_rejects_bad_params_and_ties(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0)], "k string, t int, x double"
    )
    with pytest.raises(ValueError, match="alpha"):
        holt_linear(df, ["k"], "t", "x", alpha=0.0)
    with pytest.raises(ValueError, match="beta"):
        holt_linear(df, ["k"], "t", "x", beta=1.5)
    with pytest.raises(Exception, match="order-ambiguous|duplicate"):
        holt_linear(df, ["k"], "t", "x").collect()


def test_holt_null_values_excluded_not_poisoning(spark):
    """r10 sweep: one NULL value arrived as NaN and poisoned level AND
    trend for the entire rest of the series. NULLs now ride the
    documented-drop leg (the cusum stance): the remaining rows fit
    exactly the NULL-free series."""
    from miningfrequentpattern_spark.operators.timeseries import (
        holt_linear,
    )

    clean = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("a", 4.0, 4.0)],
        "k string, t double, v double",
    )
    dirty = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, None), ("a", 3.0, 3.0),
         ("a", 4.0, 4.0)],
        "k string, t double, v double",
    )
    want = sorted(map(tuple, holt_linear(clean, ["k"], "t", "v").collect()))
    got = sorted(map(tuple, holt_linear(dirty, ["k"], "t", "v").collect()))
    assert got == want
    assert all(r[-1] == r[-1] and r[-2] == r[-2] for r in got)  # no NaN


def test_holt_tiebreak_may_be_key_or_order(spark):
    """r10 sweep: the ewma r8 guard widened to keys/order — a
    tiebreak that IS a key previously selected the column twice and
    crashed in the pandas worker with a non-unique-label error."""
    from miningfrequentpattern_spark.operators.timeseries import (
        holt_linear,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 2.0)], "k string, t double, v double"
    )
    assert holt_linear(df, ["k"], "t", "v", tiebreak_col="k").count() == 2
    assert holt_linear(df, ["k"], "t", "v", tiebreak_col="t").count() == 2
