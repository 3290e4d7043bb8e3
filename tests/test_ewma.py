"""Per-series EWMA (operators/timeseries.py::ewma) — promoted round 6: the oracle moved verbatim onto the r52_ewma_daily_revenue registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
(recursive-CTE recurrence, the same chained-iteration oracle trick as
m13/l02e), plus a hand-computed recurrence check and an
input-order-independence property the sf0.01 fixture can't isolate."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import ewma
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_ewma_hand_computed_recurrence(spark):
    """y_0 = x_0, y_t = 0.5·x_t + 0.5·y_{t−1} on [10, 20, 40]:
    10, 15, 27.5 — and a second series in the same frame stays
    independent."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0), ("b", 1, 100.0)],
        "k string, t int, x double",
    )
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, ["k"], "t", "x", alpha=0.5).collect()
    }
    assert got[("a", 1)] == 10.0
    assert got[("a", 2)] == 15.0
    assert math.isclose(got[("a", 3)], 27.5)
    assert got[("b", 1)] == 100.0


def test_ewma_input_order_independent(spark):
    """The recurrence must be driven by order_col, not arrival order:
    a reversed/shuffled input yields identical results (the UDF sorts
    within each series; shuffle order is never meaningful input
    order)."""
    rows = [("s", t, float((t * 37) % 11)) for t in range(1, 50)]
    fwd = spark.createDataFrame(rows, "k string, t int, x double")
    rev = spark.createDataFrame(rows[::-1], "k string, t int, x double")
    a = sorted(map(tuple, ewma(fwd, ["k"], "t", "x", 0.3).collect()))
    b = sorted(map(tuple, ewma(rev, ["k"], "t", "x", 0.3).collect()))
    assert a == b and len(a) == 49


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t int, x double")
    for bad in (0.0, -0.1, 1.5):
        try:
            ewma(df, ["k"], "t", "x", alpha=bad)
            raise AssertionError(f"alpha={bad} accepted")
        except ValueError:
            pass


def test_duplicate_order_values_raise_without_tiebreak(spark):
    """Tied order values make the recurrence order-ambiguous (tied
    rows would sequence by shuffle arrival — run-to-run
    nondeterminism, review r5): without a tiebreak the operator must
    raise, and with one the result is deterministic."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1, 1, 10.0), ("a", 1, 2, 30.0), ("a", 2, 3, 20.0)],
        "k string, t int, seq int, x double",
    )
    with pytest.raises(Exception, match="order-ambiguous|duplicate"):
        ewma(df, ["k"], "t", "x", 0.5).collect()
    got = {
        r["seq"]: r["ewma"]
        for r in ewma(
            df, ["k"], "t", "x", 0.5, tiebreak_col="seq"
        ).collect()
    }
    # Deterministic sequence 10, 30, 20 under alpha=0.5:
    assert got[1] == 10.0 and got[2] == 20.0 and got[3] == 20.0


def test_tiebreak_equal_to_selected_columns_is_safe(spark):
    """tiebreak_col equal to the ORDER column, a KEY, or the VALUE
    column must not double-select the name (AMBIGUOUS_REFERENCE —
    ADVICE r8 widened the original value_col-only guard). Semantics:
    tiebreak==order_col cannot resolve real ties, so the tied-series
    raise still fires; on a tie-free series it's a no-op."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0)],
        "k string, t int, x double",
    )
    for tb in ("t", "k", "x"):
        got = {
            r["t"]: r["ewma"]
            for r in ewma(df, ["k"], "t", "x", 0.5, tiebreak_col=tb).collect()
        }
        assert got == {1: 10.0, 2: 20.0, 3: 20.0}, tb
    # tiebreak==order_col leaves real ties unresolved -> still raises
    tied = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 1, 30.0)], "k string, t int, x double"
    )
    with pytest.raises(Exception, match="order-ambiguous|duplicate"):
        ewma(tied, ["k"], "t", "x", 0.5, tiebreak_col="t").collect()
