"""Holt's linear (double exponential) smoothing
(operators/timeseries.py::holt_linear) — round-7 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL the
future r82_holt_revenue registration will carry (the r52 recursive-CTE
recurrence trick with a second state variable; α/β complements
round-trip exactly in float64, so both engines stream bitwise-equal
doubles), plus a hand-computed recurrence check, the single-series
NULL-trend pin, input-order independence, and a one-step-forecast
sanity check on an exact line."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import holt_linear
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r82 oracle, verbatim. Dialect pins: every smoothing literal
# is ::DOUBLE; the b-row recomputes the new level EXPRESSION rather
# than referencing a lateral alias, which is bitwise the operator's
# two-step order (l_new first, then b from l_new); day re-emitted as
# midnight TIMESTAMP per the r43/r52 dialect note; a 1-row series
# never recurses and keeps its LEFT-JOIN NULL trend.
R82_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
h AS (
  SELECT i1.priority, i1.day, i1.rn, i1.rev,
         i1.rev AS l, i2.rev - i1.rev AS b
  FROM idx i1 LEFT JOIN idx i2
    ON i2.priority = i1.priority AND i2.rn = 2
  WHERE i1.rn = 1
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b),
         0.3::DOUBLE * ((0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b))
                        - h.l)
           + 0.7::DOUBLE * h.b
  FROM idx i JOIN h ON i.priority = h.priority AND i.rn = h.rn + 1
)
SELECT priority, CAST(day AS TIMESTAMP) AS day,
       round(rev, 4) AS revenue,
       round(l, 4) AS level,
       round(b, 4) AS trend
FROM h
"""


def _r82(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return holt_linear(
        daily, ["priority"], "day", "rev", alpha=0.2, beta=0.3
    ).select(
        "priority",
        F.col("day").cast("timestamp").alias("day"),
        F.round("rev", 4).alias("revenue"),
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
    )


def test_holt_matches_duckdb_recursive_oracle(spark, duck):
    compare(_r82(spark, SF_ORACLE), duck, R82_ORACLE)


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
