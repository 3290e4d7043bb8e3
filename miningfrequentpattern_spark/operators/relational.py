"""Relational operators Spark lacks as single built-ins (SURVEY.md
§2.3 R8, R15). Everything else in the relational pack is a direct
DataFrame expression and lives in queries/relational_pack.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_expr: Column | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """R8: as-of join — for each left row, the single nearest right row
    at or before (backward) / at or after (forward) its timestamp,
    within the same `on` key.

    Spark SQL has no native ASOF JOIN; the idiomatic composition is a
    range join + per-left-row rank-1 window. The range join shuffles
    both sides by `on` (plus AQE skew splitting); the window reuses the
    same partitioning, so the whole operator costs ONE shuffle of each
    input. At 100 TB add a coarse time-bucket equi-key to the join
    condition to bound the range-join fan-out.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    if direction == "backward":
        cond = rt <= lt
        delta = lt.cast("double") - rt.cast("double")
    elif direction == "forward":
        cond = rt >= lt
        delta = rt.cast("double") - lt.cast("double")
    else:
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if tolerance_expr is not None:
        cond = cond & (delta <= tolerance_expr)

    out_cols = list(left.columns)
    l = left.withColumn("_lid", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    keep = right_cols or [c for c in right.columns if c != on]
    joined = l.join(r, (F.col(f"l.{on}") == F.col(f"r.{on}")) & cond, "left")
    # Tiebreak beyond delta: right rows can share a timestamp (equal
    # delta), so order further by the kept right columns — without this
    # the rank-1 pick is nondeterministic on ties.
    w = Window.partitionBy(F.col("l._lid")).orderBy(
        delta.asc_nulls_last(), *[F.col(f"r.{c}") for c in keep]
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *[F.col(f"l.{c}") for c in out_cols],
            *[F.col(f"r.{c}").alias(f"asof_{c}") for c in keep],
        )
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
) -> DataFrame:
    """R15: deterministic top-k per group. Callers must include a
    unique tiebreak column in `order_by` for oracle-stable output.
    Single shuffle on the group cols; rank prune happens map-side
    post-shuffle (WindowExec), no second pass."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
