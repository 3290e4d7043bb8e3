"""Robust median/MAD outlier flags
(operators/relational.py::mad_outliers) — promoted round 6: the oracle moved verbatim onto the r67_value_outliers registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (robust z on event
values per type), plus the MAD=0, all-NULL-group, and
known-outlier hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import mad_outliers
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_mad_outliers_flags_known_outlier(spark):
    """Values 1..9 plus 1000: median 5.5, MAD 2.5 — the 1000 flags
    (robust_z ≈ 268), nothing else does. The same series through a
    mean/stddev z-score flags NOTHING at |z| > 3.5 (σ is inflated by
    the outlier itself) — the whole point of the robust rule."""
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "g string, i int, v double",
    )
    got = {
        r["i"]: (r["robust_z"], r["is_outlier"])
        for r in mad_outliers(df, ["g"], "v", carry=["i"]).collect()
    }
    assert got[9][1] is True and got[9][0] > 100
    assert all(not got[i][1] for i in range(9))
    import statistics

    mu, sigma = statistics.mean(vals), statistics.stdev(vals)
    assert all(abs((v - mu) / sigma) < 3.5 for v in vals)  # naive z misses


def test_mad_outliers_zero_mad_is_null_not_storm(spark):
    """≥ half the group at the median ⇒ MAD 0 ⇒ NULL robust_z and
    false for EVERY row — not an everything-flags storm."""
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([5.0, 5.0, 5.0, 9.0])],
        "g string, i int, v double",
    )
    rows = mad_outliers(df, ["g"], "v", carry=["i"]).collect()
    assert all(r["robust_z"] is None and r["is_outlier"] is False for r in rows)
    assert len(rows) == 4


def test_mad_outliers_all_null_group_passes_through(spark):
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, None), ("b", 2, 1.0), ("b", 3, 2.0)],
        "g string, i int, v double",
    )
    rows = {
        r["i"]: (r["v"], r["robust_z"], r["is_outlier"])
        for r in mad_outliers(df, ["g"], "v", carry=["i"]).collect()
    }
    assert len(rows) == 4
    assert rows[0] == (None, None, False)
    assert rows[1] == (None, None, False)


def test_mad_outliers_nan_rides_null_leg(spark):
    """NaN passes isNotNull but would shift the group's median/MAD
    (Spark sorts NaN above all reals) and `NaN > threshold` is true,
    so an unguarded NaN row skews every real robust_z AND flags
    itself (ADVICE r5). Fixed: NaN rows get NULL robust_z / false
    like NULLs, and the real rows' stats are NaN-free — median of
    (1, 2, 3) stays 2, not 2.5."""
    import math

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
         ("a", 3, float("nan"))],
        "g string, i int, v double",
    )
    rows = {
        r["i"]: r for r in mad_outliers(df, ["g"], "v", carry=["i"]).collect()
    }
    assert math.isnan(rows[3]["v"])
    assert rows[3]["robust_z"] is None and rows[3]["is_outlier"] is False
    # median 2, MAD 1: robust_z = 0.6745 * (x - 2) / 1
    assert rows[0]["robust_z"] == round(0.6745 * -1, 4)
    assert rows[1]["robust_z"] == 0.0
    assert rows[2]["robust_z"] == round(0.6745 * 1, 4)
    assert not any(rows[i]["is_outlier"] for i in rows)
