"""Per-series recurrence operators over grouped time series.

Linear recurrences (EWMA / exponential smoothing) are the one common
time-series shape Spark's native surface cannot express at linear
cost: a RANGE/ROWS window sees only frame aggregates (the EWMA weight
depends on the row's distance from every earlier row, so the
"windowed convolution" form is O(len²) per series via
collect_list+aggregate), and the rescaled-prefix-sum algebraic trick
(y_t = (1-a)^t · Σ x_i/(1-a)^i) overflows float64 after a few
thousand steps (1/0.8 ** 2400 = inf). The right seam is the U2
grouped-map one: shuffle once on the series key, run the recurrence
vectorized per series inside an Arrow-batched applyInPandas — the
textbook "per-partition imperative logic" case the PySpark guide
reserves pandas UDFs for.

Scale posture: ONE shuffle (the groupBy on the series keys); per-task
memory is bounded by series LENGTH, not corpus size — a daily-grain
series is thousands of rows regardless of SF, so millions of series
parallelize across executors while each recurrence stays in one
Arrow batch. Skewed series lengths are bounded by the time grain
itself (the same argument as basketize's per-order bound).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per series:

        y_0 = x_0;  y_t = alpha·x_t + (1 − alpha)·y_{t−1}

    (pandas `ewm(adjust=False)` semantics — the recursive/online form
    used for smoothing dashboards and simple forecasting baselines).
    Returns the input's (keys, order_col, value_col) columns plus
    `out_col` (double), one row per input row.

    The value column is cast to double BEFORE the grouped map so the
    Arrow transfer hands pandas a float64 block (a decimal column
    would arrive as object dtype and fall off the vectorized path).
    Rows within a series are ordered by `order_col` inside the UDF —
    shuffle order is not meaningful input order. DUPLICATE order
    values within a series make the recurrence ambiguous (tied rows
    would be sequenced by shuffle arrival — run-to-run
    nondeterminism, review r5): pass `tiebreak_col` to resolve ties
    deterministically, or leave it None and the operator RAISES on
    the first tied series. float64 parity with
    a SQL engine's literal recurrence holds bitwise when alpha and
    1−alpha round-trip exactly (pandas applies old·(1−a) + new·a per
    step, the same two multiplies and one add as the SQL form; see
    tests/test_ewma.py's recursive-CTE oracle).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    extra = [tiebreak_col] if tiebreak_col else []
    base = df.select(
        *keys,
        order_col,
        *extra,
        F.col(value_col).cast("double").alias(value_col),
    )
    schema = ST.StructType(
        list(base.schema.fields) + [ST.StructField(out_col, ST.DoubleType())]
    )
    sort_cols = [order_col, *extra]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # kind="mergesort" = stable; with a tiebreak the order is
        # fully determined, without one any tie is ambiguous → raise.
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        if pdf.duplicated(sort_cols).any():
            raise ValueError(
                f"duplicate {sort_cols} within a series: the EWMA "
                "recurrence is order-ambiguous; pass tiebreak_col or "
                "pre-aggregate to a unique grain"
            )
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return base.groupBy(*keys).applyInPandas(fn, schema)
