"""Winsorized robust stats
(operators/relational.py::winsorized_stats) — promoted round 6: the oracle moved verbatim onto the r60_winsorized_price registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps,
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


def test_winsorize_nan_excluded_and_collision_guard(spark):
    """Hardening (d)/(h), r10: NaN values are excluded like NULLs —
    one NaN would drag hi_val to NaN through Spark's NaN-greatest
    sort and poison win_mean via the clamp — and an input column
    colliding with the internal working names raises actionably."""
    clean = spark.createDataFrame(
        [("a", float(i)) for i in range(11)], "g string, v double"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("a", float("nan")), ("a", None)], "g string, v double"
        )
    )
    want = winsorized_stats(clean, ["g"], "v", 0.1, 0.9).collect()
    got = winsorized_stats(dirty, ["g"], "v", 0.1, 0.9).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # guard is scoped to the GROUP columns (everything else is
    # projected away before any working name exists — r10 review), so
    # a value column literally named _v is legal...
    legal = clean.withColumnRenamed("v", "_v")
    assert winsorized_stats(legal, ["g"], "_v", 0.1, 0.9).count() == 1
    # ...but a GROUP column on a working name is rejected, and the
    # check is case-insensitive like Spark's default resolver
    clash = clean.withColumnRenamed("g", "LO_VAL")
    with pytest.raises(ValueError, match="collide"):
        winsorized_stats(clash, ["LO_VAL"], "v", 0.1, 0.9)
