"""First-significant-digit Benford audit
(operators/relational.py::benford_audit) — promoted round 6: the oracle moved verbatim onto the r70_price_benford registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (order totals per
priority class), plus closed-form digit extraction, chi-square, and
exclusion hand pins."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import benford_audit
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_benford_digit_extraction_closed_form(spark):
    """Digits across magnitudes: 1.5→1, 19→1, 0.12→1, 950→9,
    0.07→7, 1000→1 (exact power of 10), -230→2 (sign ignored)."""
    vals = [1.5, 19.0, 0.12, 950.0, 0.07, 1000.0, -230.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    got = {
        r["digit"]: r["n_obs"]
        for r in benford_audit(df, ["g"], "v").collect()
    }
    assert got == {1: 4, 9: 1, 7: 1, 2: 1}


def test_benford_chi2_closed_form(spark):
    """Four 1xx values and one 9xx: shares 0.8/0.2; chi-square parts
    n·(share−p)²/p with n=5."""
    df = spark.createDataFrame(
        [("g", v) for v in [10.0, 11.0, 12.0, 13.0, 90.0]],
        "g string, v double",
    )
    rows = {
        r["digit"]: r for r in benford_audit(df, ["g"], "v").collect()
    }
    p1 = math.log10(2.0)
    p9 = math.log10(1 + 1 / 9)
    assert rows[1]["obs_share"] == 0.8
    assert rows[1]["benford_p"] == round(p1, 4)
    assert rows[1]["chi2_part"] == round(5 * (0.8 - p1) ** 2 / p1, 4)
    assert rows[9]["chi2_part"] == round(5 * (0.2 - p9) ** 2 / p9, 4)
    # absent digits have no row (callers join the 1..9 spine)
    assert set(rows) == {1, 9}


def test_benford_excludes_zero_and_null(spark):
    df = spark.createDataFrame(
        [("g", 0.0), ("g", None), ("g", 5.0)], "g string, v double"
    )
    rows = benford_audit(df, ["g"], "v").collect()
    assert len(rows) == 1
    assert rows[0]["digit"] == 5 and rows[0]["n_obs"] == 1
    assert rows[0]["obs_share"] == 1.0


def test_benford_excludes_nan(spark):
    """NaN passes `x > 0` (Spark sorts NaN above all numbers) and
    floor(NaN) casts to digit 0 — without the isnan exclusion it
    minted a phantom digit-0 row (NULL benford_p, ANSI
    divide-by-zero on 1/digit) and deflated every real digit's
    share (ADVICE r5)."""
    df = spark.createDataFrame(
        [("g", float("nan")), ("g", 5.0), ("g", 5.0)],
        "g string, v double",
    )
    rows = benford_audit(df, ["g"], "v").collect()
    assert len(rows) == 1
    assert rows[0]["digit"] == 5 and rows[0]["n_obs"] == 2
    assert rows[0]["obs_share"] == 1.0
