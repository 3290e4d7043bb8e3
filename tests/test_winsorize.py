"""Winsorized robust stats
(operators/relational.py::winsorized_stats) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future r60_winsorized_price registration will carry,
plus a hand-computed clamp check and the percentile-definition pin
(Spark `percentile` ≡ SQL `quantile_cont`, both (n−1)·p linear
interpolation — the reason the bounds hash-match cross-engine)."""

import math

import pytest

from miningfrequentpattern_spark.operators.relational import (
    winsorized_stats,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r60 oracle, verbatim. Dialect pins: quantile_cont matches
# Spark's exact `percentile` interpolation; the bounds join back via
# USING so the clamp sees per-group lo/hi; any_value is safe because
# lo/hi are constant within a group.
R60_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS returnflag, l_extendedprice AS v
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
b AS (
  SELECT returnflag,
         quantile_cont(v, 0.05) AS lo,
         quantile_cont(v, 0.95) AS hi
  FROM base GROUP BY returnflag)
SELECT base.returnflag, count(*) AS n_obs,
       round(any_value(lo), 4) AS lo_val,
       round(any_value(hi), 4) AS hi_val,
       round(avg(least(greatest(v, lo), hi)), 4) AS win_mean
FROM base JOIN b USING (returnflag)
GROUP BY base.returnflag
"""


def _r60(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return winsorized_stats(
        li.withColumnRenamed("l_returnflag", "returnflag"),
        ["returnflag"],
        "l_extendedprice",
        0.05,
        0.95,
    )


def test_winsorize_matches_duckdb_oracle(spark, duck):
    compare(_r60(spark, SF_ORACLE), duck, R60_ORACLE)


def test_winsorize_hand_computed(spark):
    """Values 0..10 with p_lo=0.1, p_hi=0.9: bounds are exactly 1 and
    9 ((n−1)·p lands on integer indices), so the clamped mean is
    (1 + 1+2+…+9 + 9)/11 = 55/11 = 5.0 and n_obs counts every row."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(11)], "g string, v double"
    )
    got = winsorized_stats(df, ["g"], "v", 0.1, 0.9).collect()[0]
    assert got["n_obs"] == 11
    assert got["lo_val"] == 1.0 and got["hi_val"] == 9.0
    assert math.isclose(got["win_mean"], 5.0)


def test_winsorize_nulls_excluded_and_bad_bounds_raise(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    got = winsorized_stats(df, ["g"], "v", 0.0, 1.0).collect()[0]
    assert got["n_obs"] == 2 and math.isclose(got["win_mean"], 2.0)
    for lo, hi in ((0.5, 0.5), (-0.1, 0.9), (0.2, 1.1)):
        with pytest.raises(ValueError):
            winsorized_stats(df, ["g"], "v", lo, hi)


def test_winsorize_null_group_counts(spark):
    """A NULL group value is a group like any other — the null-safe
    bounds join must keep it (review r5: the plain equi-join dropped
    the whole NULL partition)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 7.0)],
        "g string, v double",
    )
    got = {
        r["g"]: (r["n_obs"], r["win_mean"])
        for r in winsorized_stats(df, ["g"], "v", 0.0, 1.0).collect()
    }
    assert got["a"] == (2, 1.5)
    assert got[None] == (2, 6.0)
