"""Population Stability Index drift
(operators/relational.py::psi_drift) — promoted round 6: the oracle moved verbatim onto the r74_value_psi registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (event values, first
half of the year as reference vs second half as current), plus
identical-distribution, shifted-distribution, and empty-bin hand
pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import psi_drift
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_psi_identical_distribution_is_zero(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "v double"
    )
    rows = psi_drift(df, df, "v", n_bins=5).collect()
    assert len(rows) == 5
    total = sum(r["psi_part"] for r in rows)
    assert abs(total) < 1e-9
    assert all(r["ref_share"] == r["cur_share"] == 0.2 for r in rows)


def test_psi_shift_concentrates_in_edge_bins(spark):
    """Current sample shifted entirely above the reference range:
    everything lands in the TOP reference bin, the rest go empty —
    the floor clamp keeps every psi_part finite and the statistic
    large."""
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    cur = spark.createDataFrame(
        [(float(1000 + i),) for i in range(100)], "v double"
    )
    rows = {r["bin"]: r for r in psi_drift(ref, cur, "v", n_bins=5).collect()}
    assert rows[4]["cur_share"] == 1.0
    assert all(rows[b]["n_cur"] == 0 for b in range(4))
    total = sum(r["psi_part"] for r in rows.values())
    assert total > 1.0  # far beyond the 0.25 "investigate" rule
    assert all(r["psi_part"] is not None for r in rows.values())


def test_psi_rejects_bad_bins(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", n_bins=1)
