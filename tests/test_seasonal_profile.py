"""Day-of-week seasonal decomposition
(operators/timeseries.py::seasonal_profile) — promoted round 6: the oracle moved verbatim onto the r69_weekly_seasonality registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
(dow profile + residuals of daily event volumes per type — the
deseasonalization leg in front of r44/r57/r58), plus the ISO-dow
convention pin and NULL pass-through hand checks."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import seasonal_profile
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_seasonal_profile_iso_dow_and_means(spark):
    """2024-01-01 was a Monday (ISO dow 1). Two Mondays at 10/20 and
    one Sunday at 7: Monday mean 15 with residuals ∓5 and ratios
    10/15, 20/15; the Sunday is its own stratum (mean = itself)."""
    rows = [
        ("a", "2024-01-01", 10.0),  # Mon
        ("a", "2024-01-08", 20.0),  # Mon
        ("a", "2024-01-07", 7.0),   # Sun
    ]
    df = spark.createDataFrame(rows, "k string, day string, n double").select(
        "k", F.to_timestamp("day").alias("day"), "n"
    )
    got = {
        (r["day"].isoformat()[:10]): (
            r["dow"],
            r["dow_mean"],
            r["residual"],
            r["ratio"],
        )
        for r in seasonal_profile(df, ["k"], "day", "n").collect()
    }
    assert got["2024-01-01"] == (1, 15.0, -5.0, round(10 / 15, 4))
    assert got["2024-01-08"] == (1, 15.0, 5.0, round(20 / 15, 4))
    assert got["2024-01-07"] == (7, 7.0, 0.0, 1.0)


def test_seasonal_profile_zero_mean_ratio_is_null(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01", 0.0), ("a", "2024-01-08", 0.0)],
        "k string, day string, n double",
    ).select("k", F.to_timestamp("day").alias("day"), "n")
    rows = seasonal_profile(df, ["k"], "day", "n").collect()
    assert all(r["ratio"] is None for r in rows)
    assert all(r["residual"] == 0.0 for r in rows)


def test_seasonal_profile_null_rows_pass_through(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01", 10.0),
            ("a", None, 3.0),
            ("a", "2024-01-08", None),
        ],
        "k string, day string, n double",
    ).select("k", F.to_timestamp("day").alias("day"), "n")
    rows = seasonal_profile(df, ["k"], "day", "n").collect()
    assert len(rows) == 3
    by_n = {r["n"]: r for r in rows}
    assert by_n[3.0]["dow"] is None and by_n[3.0]["dow_mean"] is None
    assert by_n[None]["dow_mean"] is None and by_n[None]["residual"] is None
    # and the NULL rows did NOT pollute the valid Monday's mean
    assert by_n[10.0]["dow_mean"] == 10.0
