"""Additive Holt–Winters (triple exponential) smoothing
(operators/timeseries.py::holt_winters_additive) — round-8 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future r90_holt_winters registration will carry (the
r82 recursive-CTE stance with the seasonal buffer carried as a LIST
whose head is s_{t−m} and whose tail append is s_t), plus a
hand-computed recurrence check, the pure-seasonal-signal pin (on an
exact weekly pattern the model's one-step forecast is exact once
warmed), and the short-series / tie raises."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    holt_winters_additive,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r90 oracle, verbatim. Parity pins: every smoothing literal
# ::DOUBLE (complements 0.8/0.9/0.7 round-trip exactly — the r82
# note); the init means reduce the ORDERED first/second-season lists
# left-to-right (list_sum), matching the operator's sequential sum();
# the b-row recomputes the l-expression verbatim (bitwise the
# operator's two-step order); signed outputs carry the paired
# sign-of-zero pin.
R90_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
seed AS (
  SELECT priority,
         list_sum((list(rev ORDER BY rn))[1:7]) / 7.0::DOUBLE AS l0,
         (list_sum((list(rev ORDER BY rn))[8:14]) / 7.0::DOUBLE
          - list_sum((list(rev ORDER BY rn))[1:7]) / 7.0::DOUBLE)
           / 7.0::DOUBLE AS b0,
         (list(rev ORDER BY rn))[1:7] AS first7
  FROM idx GROUP BY priority),
h AS (
  SELECT i.priority, i.day, i.rn, i.rev,
         s.l0 AS l, s.b0 AS b,
         list_transform(s.first7, v -> v - s.l0) AS buf,
         CAST(NULL AS DOUBLE) AS fitted,
         s.first7[7] - s.l0 AS seasonal
  FROM idx i JOIN seed s USING (priority) WHERE i.rn = 7
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.2::DOUBLE * (i.rev - h.buf[1])
           + 0.8::DOUBLE * (h.l + h.b),
         0.1::DOUBLE * ((0.2::DOUBLE * (i.rev - h.buf[1])
                         + 0.8::DOUBLE * (h.l + h.b)) - h.l)
           + 0.9::DOUBLE * h.b,
         h.buf[2:] || [0.3::DOUBLE * (i.rev - h.l - h.b)
                       + 0.7::DOUBLE * h.buf[1]],
         h.l + h.b + h.buf[1],
         0.3::DOUBLE * (i.rev - h.l - h.b) + 0.7::DOUBLE * h.buf[1]
  FROM idx i JOIN h ON i.priority = h.priority AND i.rn = h.rn + 1)
SELECT i.priority, CAST(i.day AS TIMESTAMP) AS day,
       round(i.rev, 4) AS revenue,
       round(h.l, 4) + 0.0 AS level,
       round(h.b, 4) + 0.0 AS trend,
       round(h.seasonal, 4) + 0.0 AS seasonal,
       round(h.fitted, 4) + 0.0 AS fitted
FROM idx i LEFT JOIN h ON h.priority = i.priority AND h.rn = i.rn
"""


def _r90(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    hw = holt_winters_additive(
        daily, ["priority"], "day", "rev",
        alpha=0.2, beta=0.1, gamma=0.3, period=7,
    )
    from miningfrequentpattern_spark.functions.rounding import round4

    return hw.select(
        "priority",
        F.col("day").cast("timestamp").alias("day"),
        F.round("rev", 4).alias("revenue"),
        round4("level").alias("level"),
        round4("trend").alias("trend"),
        round4("seasonal").alias("seasonal"),
        round4("fitted").alias("fitted"),
    )


def test_holt_winters_matches_duckdb_recursive_oracle(spark, duck):
    compare(_r90(spark, SF_ORACLE), duck, R90_ORACLE)


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
