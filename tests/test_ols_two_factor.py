"""Two-factor OLS (operators/timeseries.py::ols_two_factor) —
round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future r91_trend_weekend_ols registration
will carry (daily revenue ~ trend + weekend dummy per priority — the
controlled-trend question series_trend alone cannot answer), plus the
exact-plane recovery pin, the collinear NULL guard, and the
"controlling for the weekend changes the trend" contrast."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    ols_two_factor,
    series_trend,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r91 oracle, verbatim — both engines center every variable on
# its 4dp-ROUNDED group mean (bitwise-stable pivots; centering shifts
# only the intercept), solve the reduced 2×2 system, and recover the
# intercept from the rounded pivots plus residual means. Signed
# outputs carry the paired sign-of-zero pin.
R91_ORACLE = """
WITH daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
b AS (
  SELECT priority,
         date_diff('day', DATE '1970-01-01', day)::DOUBLE AS x1,
         CASE WHEN isodow(day) >= 6 THEN 1.0 ELSE 0.0 END AS x2,
         rev AS y
  FROM daily),
m AS (SELECT priority, round(avg(y), 4) AS my, round(avg(x1), 4) AS m1,
             round(avg(x2), 4) AS m2
      FROM b GROUP BY 1),
c AS (SELECT b.priority, b.y - m.my AS yc, b.x1 - m.m1 AS c1,
             b.x2 - m.m2 AS c2, m.my, m.m1, m.m2
      FROM b JOIN m USING (priority)),
a AS (SELECT priority, count(*) AS n_obs,
             first(my) AS my, first(m1) AS m1, first(m2) AS m2,
             sum(c1 * c1) AS s11, sum(c2 * c2) AS s22,
             sum(c1 * c2) AS s12, sum(c1 * yc) AS s1y,
             sum(c2 * yc) AS s2y, sum(yc * yc) AS syy,
             sum(yc) AS sy, sum(c1) AS sc1, sum(c2) AS sc2
      FROM c GROUP BY 1)
SELECT priority, CAST(n_obs AS BIGINT) AS n_obs,
       round(CASE WHEN s11 * s22 - s12 * s12 > 1e-12 * s11 * s22
             THEN (my + sy / n_obs)
                  - ((s1y * s22 - s12 * s2y)
                     / (s11 * s22 - s12 * s12)) * (m1 + sc1 / n_obs)
                  - ((s11 * s2y - s1y * s12)
                     / (s11 * s22 - s12 * s12)) * (m2 + sc2 / n_obs)
             END, 4) + 0.0 AS intercept,
       round(CASE WHEN s11 * s22 - s12 * s12 > 1e-12 * s11 * s22
             THEN (s1y * s22 - s12 * s2y) / (s11 * s22 - s12 * s12)
             END, 4) + 0.0 AS beta1,
       round(CASE WHEN s11 * s22 - s12 * s12 > 1e-12 * s11 * s22
             THEN (s11 * s2y - s1y * s12) / (s11 * s22 - s12 * s12)
             END, 4) + 0.0 AS beta2,
       round(CASE WHEN syy > 0
                   AND s11 * s22 - s12 * s12 > 1e-12 * s11 * s22
             THEN 1.0 - (syy
                  - ((s1y * s22 - s12 * s2y)
                     / (s11 * s22 - s12 * s12)) * s1y
                  - ((s11 * s2y - s1y * s12)
                     / (s11 * s22 - s12 * s12)) * s2y) / syy
             END, 4) + 0.0 AS r2
FROM a
"""


def _r91(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .select(
            "priority",
            F.datediff("day", F.lit("1970-01-01"))
            .cast("double")
            .alias("x1"),
            F.when(
                ((F.dayofweek("day") + 5) % 7 + 1) >= 6, F.lit(1.0)
            ).otherwise(F.lit(0.0)).alias("x2"),
            F.col("rev").alias("y"),
        )
    )
    return ols_two_factor(daily, ["priority"], "y", "x1", "x2")


def test_ols_two_factor_matches_duckdb_oracle(spark, duck):
    compare(_r91(spark, SF_ORACLE), duck, R91_ORACLE)


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
