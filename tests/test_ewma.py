"""Per-series EWMA (operators/timeseries.py::ewma) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future r52_ewma_daily_revenue registration will carry
(recursive-CTE recurrence, the same chained-iteration oracle trick as
m13/l02e), plus a hand-computed recurrence check and an
input-order-independence property the sf0.01 fixture can't isolate."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import ewma
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r52 oracle, verbatim. Dialect pins: alpha literals are cast
# ::DOUBLE (a bare 0.2 is DECIMAL in DuckDB and would run the
# recurrence in decimal arithmetic, not the float64 the pandas side
# uses); 0.8·y + 0.2·x per step is bitwise the pandas
# ewm(adjust=False) update, so the 4dp rounding is comparing
# identical float64 streams, not merely close ones; day re-emitted as
# midnight TIMESTAMP per the r43 dialect note.
R52_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
ew AS (
  SELECT priority, day, rn, rev, rev AS y FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.8::DOUBLE * e.y + 0.2::DOUBLE * i.rev
  FROM idx i JOIN ew e ON i.priority = e.priority AND i.rn = e.rn + 1
)
SELECT priority, CAST(day AS TIMESTAMP) AS day,
       round(rev, 4) AS revenue,
       round(y, 4) AS ewma_revenue
FROM ew
"""


def _r52(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return ewma(daily, ["priority"], "day", "rev", alpha=0.2).select(
        "priority",
        F.col("day").cast("timestamp").alias("day"),
        F.round("rev", 4).alias("revenue"),
        F.round("ewma", 4).alias("ewma_revenue"),
    )


def test_ewma_matches_duckdb_recursive_oracle(spark, duck):
    compare(_r52(spark, SF_ORACLE), duck, R52_ORACLE)


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
