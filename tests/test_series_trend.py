"""Per-series OLS trend (operators/timeseries.py::series_trend) —
round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future r57_daily_revenue_trend registration
will carry, plus an exact-line hand check and the degenerate-variance
NULL pins (Spark corr yields NaN at zero variance where DuckDB yields
NULL — the operator normalizes; see the r44 flat-series stance)."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import series_trend
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r57 oracle, verbatim. Dialect pins: t is date_diff days from
# a fixed epoch cast ::DOUBLE (Spark side uses datediff — identical
# integer day counts); slope/intercept/r2 via covar_pop/var_pop/corr
# on BOTH sides (single-pass co-moment algorithms agree to relative
# 1e-12, far inside the 4dp rounding); ^ is DuckDB power.
R57_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
t AS (
  SELECT priority,
         date_diff('day', DATE '1970-01-01', day)::DOUBLE AS tt,
         rev
  FROM daily)
SELECT priority, count(*) AS n_obs,
       round(CASE WHEN var_pop(tt) > 0
                  THEN covar_pop(tt, rev) / var_pop(tt) END, 4)
         AS slope,
       round(avg(rev) - CASE WHEN var_pop(tt) > 0
                             THEN covar_pop(tt, rev) / var_pop(tt) END
                        * avg(tt), 4) AS intercept,
       round(corr(tt, rev) ^ 2, 4) AS r2
FROM t GROUP BY priority
"""


def _r57(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .withColumn("t", F.datediff("day", F.lit("1970-01-01")))
    )
    return series_trend(daily, ["priority"], "t", "rev")


def test_series_trend_matches_duckdb_oracle(spark, duck):
    compare(_r57(spark, SF_ORACLE), duck, R57_ORACLE)


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
