"""Time-weighted average (operators/timeseries.py::time_weighted_avg)
— promoted round 6: the oracle moved verbatim onto the r56_time_weighted_value registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps hand-computed step-interpolation cases and the
tied-timestamp determinism pin."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    time_weighted_avg,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_twa_hand_computed_steps(spark):
    """Values 10 (held 1 s), 30 (held 3 s), 50 (no duration):
    twa = (10·1 + 30·3)/4 = 25. A single-observation series has zero
    covered duration → NULL, not NaN."""
    df = spark.createDataFrame(
        [("a", 0.0, 10.0), ("a", 1.0, 30.0), ("a", 4.0, 50.0),
         ("b", 7.0, 99.0)],
        "k string, t double, x double",
    )
    got = {
        r["k"]: (r["twa"], r["n_obs"])
        for r in time_weighted_avg(df, ["k"], "t", "x").collect()
    }
    assert math.isclose(got["a"][0], 25.0) and got["a"][1] == 3
    assert got["b"][0] is None and got["b"][1] == 1


def test_twa_tied_timestamps_deterministic(spark):
    """Two observations at the same instant: the (t, x) ordering pins
    the LARGER value as the segment holder — input order must not
    matter."""
    rows = [("a", 0.0, 5.0), ("a", 0.0, 15.0), ("a", 2.0, 1.0)]
    fwd = spark.createDataFrame(rows, "k string, t double, x double")
    rev = spark.createDataFrame(rows[::-1], "k string, t double, x double")
    for df in (fwd, rev):
        got = time_weighted_avg(df, ["k"], "t", "x").collect()[0]
        # 15 holds [0, 2): twa = 15; the tied 5 contributes dt = 0.
        assert math.isclose(got["twa"], 15.0) and got["n_obs"] == 3
