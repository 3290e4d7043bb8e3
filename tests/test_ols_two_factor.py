"""Two-factor OLS (operators/timeseries.py::ols_two_factor) — PROMOTED round 8 as r91_trend_weekend_ols: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the exact-plane recovery pin, the
collinear NULL guard, and the controlled-trend contrast stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    ols_two_factor,
    series_trend,
)
def test_ols_two_factor_recovers_exact_plane(spark):
    """y = 2 + 3·x1 − 5·x2 exactly: coefficients recovered to 4dp and
    r² = 1 (x2 alternates so the regressors are independent)."""
    rows = [
        ("g", float(t), float(t % 2), 2.0 + 3.0 * t - 5.0 * (t % 2))
        for t in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = ols_two_factor(df, ["g"], "y", "x1", "x2").collect()[0]
    assert r["beta1"] == 3.0 and r["beta2"] == -5.0
    assert r["intercept"] == 2.0 and r["r2"] == 1.0


def test_ols_two_factor_collinear_yields_null(spark):
    """x2 = 2·x1 (perfect collinearity): the 2×2 system is singular —
    NULL betas/intercept/r2, never a garbage solve."""
    rows = [("g", float(t), 2.0 * t, float(3 * t + 1)) for t in range(12)]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = ols_two_factor(df, ["g"], "y", "x1", "x2").collect()[0]
    assert r["beta1"] is None and r["beta2"] is None
    assert r["intercept"] is None and r["r2"] is None
    assert r["n_obs"] == 12


def test_ols_two_factor_controls_for_weekend(spark):
    """A flat series with a pure weekend dip: the single-regressor
    trend fit wobbles with the phase of the week, the two-factor fit
    attributes the dip to beta2 and reports beta1 = 0 exactly."""
    rows = []
    for t in range(28):
        wk = 1.0 if t % 7 in (5, 6) else 0.0
        rows.append(("s", float(t), wk, 100.0 - 30.0 * wk))
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = ols_two_factor(df, ["g"], "y", "x1", "x2").collect()[0]
    assert r["beta1"] == 0.0 and r["beta2"] == -30.0 and r["r2"] == 1.0
    # contrast: the single-regressor fit on the same series has to
    # absorb the dip into noise (r2 far from 1)
    st = series_trend(
        df.select("g", F.col("x1").alias("t"), F.col("y").alias("x")),
        ["g"], "t", "x",
    ).collect()[0]
    assert st["r2"] < 0.2


def test_constant_regressor_nulls_even_when_mean_not_4dp(spark):
    """r10 sweep: a CONSTANT regressor whose group mean does NOT
    round-trip at 4dp left a nonzero eps^2 in S22 through the
    rounded-pivot centering, so the det test passed and beta2 came
    back as pure rounding noise. The true-variance floor
    (S22 - sc2^2/n) must NULL the model either way."""
    from miningfrequentpattern_spark.operators.timeseries import (
        ols_two_factor,
    )

    rows_noisy = [
        ("g", float(i), float(i), 0.00003) for i in range(1, 9)
    ]
    rows_exact = [("g", float(i), float(i), 5.0) for i in range(1, 9)]
    schema = "g string, y double, x1 double, x2 double"
    for rows in (rows_noisy, rows_exact):
        got = ols_two_factor(
            spark.createDataFrame(rows, schema), ["g"], "y", "x1", "x2"
        ).collect()[0]
        assert got["beta1"] is None and got["beta2"] is None, got
        assert got["intercept"] is None and got["r2"] is None, got
    # a genuinely two-factor system still fits
    rows_ok = [
        ("g", float(i) + (2.0 if i % 2 else 0.0), float(i),
         1.0 if i % 2 else 0.0)
        for i in range(1, 9)
    ]
    fit = ols_two_factor(
        spark.createDataFrame(rows_ok, schema), ["g"], "y", "x1", "x2"
    ).collect()[0]
    assert abs(fit["beta1"] - 1.0) < 1e-6 and abs(fit["beta2"] - 2.0) < 1e-6
