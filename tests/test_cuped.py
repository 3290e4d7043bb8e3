"""CUPED variance reduction (operators/relational.py::cuped_adjust)
— promoted round 6: the oracle moved verbatim onto the r79_cuped_user_value registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (per-user H2 metric adjusted by the H1 covariate), plus
unbiasedness / variance-reduction / no-signal hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import cuped_adjust
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_cuped_reduces_variance_keeps_mean(spark):
    """Correlated (pre, post) pairs: the adjusted metric keeps the
    mean (unbiased by construction) while its variance drops by
    roughly the squared correlation."""
    import statistics

    rows = []
    for i in range(40):
        pre = float((i * 7) % 23)
        noise = float((i * 13) % 5) - 2.0
        rows.append((i, pre, 2.0 * pre + 10.0 + noise))
    df = spark.createDataFrame(rows, "u long, pre double, post double")
    got = cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    raw = [r["post"] for r in got]
    adj = [r["adjusted"] for r in got]
    # adjusted is 4dp-rounded per row, so the mean identity holds to
    # the rounding grain, not machine epsilon
    assert abs(statistics.mean(adj) - statistics.mean(raw)) < 1e-4
    assert statistics.pvariance(adj) < 0.1 * statistics.pvariance(raw)


def test_cuped_no_covariate_signal_is_identity(spark):
    """Constant covariate: zero variance, NULL theta, adjusted == y
    — never an IEEE blow-up, never a silent drop."""
    df = spark.createDataFrame(
        [(1, 5.0, 10.0), (2, 5.0, 20.0)], "u long, pre double, post double"
    )
    got = cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    assert all(r["theta"] is None for r in got)
    assert {r["adjusted"] for r in got} == {10.0, 20.0}


def test_cuped_null_covariate_rows_pass_through(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, 2.0, 20.0), (3, None, 30.0), (4, 1.0, None)],
        "u long, pre double, post double",
    )
    got = {
        r["u"]: (r["adjusted"], r["theta"])
        for r in cuped_adjust(df, "post", "pre", carry=["u"]).collect()
    }
    assert got[3][0] == 30.0  # no pre-period: unadjusted, not dropped
    assert got[4][0] is None  # no metric: NULL adjusted, row kept
    assert len(got) == 4
