"""One-sided CUSUM drift (operators/timeseries.py::cusum_drift) —
promoted round 6: the oracle moved verbatim onto the r58_value_drift registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps a hand-computed recurrence check proving the
cumsum−running-min closed form equals the textbook max(0, ·)
recursion."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import cusum_drift
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_cusum_hand_computed_recurrence(spark):
    """target 1, x = [1, 1, 5, 5, 1, 0] → d = [0, 0, 4, 4, 0, −1],
    S = [0, 0, 4, 8, 8, 7]; and a negative prefix is clipped at 0
    (x = [0, 5]: S = [0, 4], NOT [−1, 3] — the closed form's
    least(0, runmin) term doing the recurrence's max(0, ·))."""
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([1.0, 1.0, 5.0, 5.0, 1.0, 0.0])]
        + [("b", 0, 0.0), ("b", 1, 5.0)],
        "k string, t int, x double",
    )
    out = cusum_drift(df, ["k"], "t", "x", target=1.0, threshold=6.0)
    got = {(r["k"], r["t"]): (r["cusum"], r["drifted"]) for r in out.collect()}
    want_a = [0.0, 0.0, 4.0, 8.0, 8.0, 7.0]
    for t, s in enumerate(want_a):
        assert math.isclose(got[("a", t)][0], s), (t, got[("a", t)])
        assert got[("a", t)][1] is (s > 6.0)
    assert got[("b", 0)][0] == 0.0 and math.isclose(got[("b", 1)][0], 4.0)


def test_cusum_empty_and_null(spark):
    empty = spark.createDataFrame([], "k string, t int, x double")
    assert cusum_drift(empty, ["k"], "t", "x", target=0.0).count() == 0
    nulls = spark.createDataFrame(
        [("a", None, 1.0), ("a", 1, None), ("a", 2, 3.0)],
        "k string, t int, x double",
    )
    out = cusum_drift(nulls, ["k"], "t", "x", target=1.0).collect()
    assert len(out) == 1 and math.isclose(out[0]["cusum"], 2.0)


def test_cusum_rejects_output_name_collisions(spark):
    """r10 sweep (the 73e18de class): a carry column named 'drifted'
    was silently overwritten by the alarm boolean; 'cusum'/'_x'
    collide the same way."""
    import pytest

    from miningfrequentpattern_spark.operators.timeseries import (
        cusum_drift,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 2.0, True)],
        "k string, t double, v double, drifted boolean",
    )
    with pytest.raises(ValueError, match="drifted"):
        cusum_drift(df, ["k"], "t", "v", target=0.0, threshold=1.0,
                    carry=("drifted",))
