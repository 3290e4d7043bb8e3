"""Additive Holt–Winters (triple exponential) smoothing
(operators/timeseries.py::holt_winters_additive) — PROMOTED round 8 as r90_holt_winters: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the hand-computed recurrence check,
the pure-seasonal-signal pin, and the short-series / tie raises stay here."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    holt_winters_additive,
)
def test_holt_winters_hand_recurrence(spark):
    """period 2, α=β=γ=0.5, x = [10, 20, 40, 20]: l0 = 15,
    b0 = ((40+20)/2 − 15)/2 = 7.5, buf = [−5, 5].
    t=3 (x=40): s_tm=−5, fitted = 15+7.5−5 = 17.5;
    l = .5(40−(−5)) + .5(22.5) = 33.75; b = .5(33.75−15)+.5(7.5) =
    13.125; s = .5(40−15−7.5)+.5(−5) = 6.25.
    t=4 (x=20): s_tm=5, fitted = 33.75+13.125+5 = 51.875;
    l = .5(20−5)+.5(46.875) = 30.9375; b = .5(30.9375−33.75)+.5(13.125)
    = 5.15625; s = .5(20−33.75−13.125)+.5(5) = −10.9375."""
    df = spark.createDataFrame(
        [("s", 1, 10.0), ("s", 2, 20.0), ("s", 3, 40.0), ("s", 4, 20.0)],
        "k string, t int, x double",
    )
    got = {
        r["t"]: (r["level"], r["trend"], r["seasonal"], r["fitted"])
        for r in holt_winters_additive(
            df, ["k"], "t", "x", 0.5, 0.5, 0.5, period=2
        ).collect()
    }
    assert got[1] == (None, None, None, None)
    assert got[2] == (15.0, 7.5, 5.0, None)
    assert got[3] == (33.75, 13.125, 6.25, 17.5)
    assert got[4] == (30.9375, 5.15625, -10.9375, 51.875)


def test_holt_winters_exact_weekly_signal(spark):
    """On x_t = 100 + season[t mod 7] (zero trend, exact weekly
    pattern) the warmed model's one-step forecast equals the actual:
    fitted == x for every t past the first season after init."""
    season = [5.0, -3.0, 8.0, 0.0, -6.0, 2.0, -6.0]
    rows = [
        ("s", t, 100.0 + season[t % 7]) for t in range(28)
    ]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    out = sorted(
        holt_winters_additive(
            df, ["k"], "t", "x", 0.2, 0.1, 0.3, period=7
        ).collect(),
        key=lambda r: r["t"],
    )
    for r in out[14:]:
        assert math.isclose(r["fitted"], r["x"], abs_tol=1e-9), r


def test_holt_winters_raises_on_short_series_and_bad_params(spark):
    import pytest

    df = spark.createDataFrame(
        [("s", t, float(t)) for t in range(10)], "k string, t int, x double"
    )
    with pytest.raises(Exception, match="two full seasons"):
        holt_winters_additive(df, ["k"], "t", "x", period=7).collect()
    with pytest.raises(ValueError, match="period"):
        holt_winters_additive(df, ["k"], "t", "x", period=1)
    with pytest.raises(ValueError, match="alpha"):
        holt_winters_additive(df, ["k"], "t", "x", alpha=0.0)


def test_holt_winters_null_values_excluded_and_counted_out(spark):
    """r10 sweep: a NULL inside the first two seasons NaN-poisoned
    l0/b0 and the whole seasonal buffer (an all-NULL model), and NULL
    rows counted toward the 2*period init check. NULLs now drop
    before both; a series with 2m rows of which one is NULL RAISES
    the too-short error instead of silently emitting nothing."""
    import pytest

    from miningfrequentpattern_spark.operators.timeseries import (
        holt_winters_additive,
    )

    m = 2
    rows = [("a", float(i), float(i % m) + i * 0.1) for i in range(1, 7)]
    clean = spark.createDataFrame(rows, "k string, t double, v double")
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("a", 0.5, None)], "k string, t double, v double"
        )
    )
    want = sorted(
        map(tuple, holt_winters_additive(
            clean, ["k"], "t", "v", period=m).collect())
    )
    got = sorted(
        map(tuple, holt_winters_additive(
            dirty, ["k"], "t", "v", period=m).collect())
    )
    assert got == want
    short = spark.createDataFrame(
        rows[: 2 * m - 1] + [("a", 9.0, None)],
        "k string, t double, v double",
    )
    with pytest.raises(Exception, match="two full seasons"):
        holt_winters_additive(short, ["k"], "t", "v", period=m).collect()
