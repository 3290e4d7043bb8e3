"""A/B evidence for the r11 batch-4 per-series seam change: ewma /
holt_linear / holt_winters_additive moved from per-key
`groupBy().applyInPandas` to ONE `mapInPandas` over key-sorted
partitions (`_per_group_map_over_sorted_partitions`). The OLD
formulations are inlined verbatim below; both forms are compared
with exceptAll BOTH directions (zero diff required) and timed
interleaved — at sf0.1 grain (5 series, where the seam cost is
invisible) and at the 200k-series regime the change targets.

Run: python scripts/recurrence_seam_ab.py
Recorded result (2026-08-17, quiet box): sf0.1 holt old 0.31 s /
new 0.28 s (neutral); 200k-series ewma old 17.06 s / new 10.12 s
(1.69x); value identity everywhere."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as ST


def old_ewma(base, keys, order_col, value_col, alpha):
    base = base.select(
        *keys, order_col, F.col(value_col).cast("double").alias(value_col)
    )
    schema = ST.StructType(
        list(base.schema.fields) + [ST.StructField("ewma", ST.DoubleType())]
    )

    def fn(pdf):
        pdf = pdf.sort_values([order_col], kind="mergesort")
        if pdf.duplicated([order_col]).any():
            raise ValueError("duplicate order")
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return base.groupBy(*keys).applyInPandas(fn, schema)


def old_holt(base, keys, order_col, value_col, alpha, beta):
    base = base.filter(F.col(value_col).isNotNull()).select(
        *keys, order_col, F.col(value_col).cast("double").alias(value_col)
    )
    schema = ST.StructType(
        list(base.schema.fields)
        + [
            ST.StructField("level", ST.DoubleType()),
            ST.StructField("trend", ST.DoubleType()),
        ]
    )
    one_m_a, one_m_b = 1.0 - alpha, 1.0 - beta

    def fn(pdf):
        pdf = pdf.sort_values([order_col], kind="mergesort")
        if pdf.duplicated([order_col]).any():
            raise ValueError("duplicate order")
        x = pdf[value_col].to_numpy(dtype="float64")
        n = len(x)
        lv = np.empty(n)
        tr = np.empty(n)
        lv[0] = x[0]
        if n == 1:
            pdf["level"] = lv
            pdf["trend"] = pd.array([pd.NA], dtype="Float64")
            return pdf
        level, trend = x[0], x[1] - x[0]
        tr[0] = trend
        for t in range(1, n):
            nl = alpha * x[t] + one_m_a * (level + trend)
            trend = beta * (nl - level) + one_m_b * trend
            level = nl
            lv[t] = level
            tr[t] = trend
        pdf["level"] = lv
        pdf["trend"] = tr
        return pdf

    return base.groupBy(*keys).applyInPandas(fn, schema)


def _noop_time(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


if __name__ == "__main__":
    from miningfrequentpattern_spark.operators.timeseries import (
        ewma,
        holt_linear,
    )
    from miningfrequentpattern_spark.session import get_session
    from miningfrequentpattern_spark.sources.io import load_table

    spark = get_session("recurrence-seam-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # --- sf0.1 grain: identity + neutrality ---
    daily = (
        load_table(spark, "/root/testdata/sf0.1", "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    ).localCheckpoint()
    mko = lambda: old_holt(daily, ["priority"], "day", "rev", 0.2, 0.3)
    mkn = lambda: holt_linear(
        daily, ["priority"], "day", "rev", alpha=0.2, beta=0.3
    )
    a, b = mkn(), mko()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    _noop_time(mko())
    _noop_time(mkn())
    olds = [_noop_time(mko()) for _ in range(3)]
    news = [_noop_time(mkn()) for _ in range(3)]
    print(f"holt sf0.1: old min {min(olds)} new min {min(news)}")

    # --- 200k-series regime: identity + the targeted win ---
    n_keys, n_rows = 200_000, 12
    big = (
        spark.range(n_keys * n_rows)
        .select(
            (F.col("id") % n_keys).alias("k"),
            (F.col("id") / n_keys).cast("int").alias("t"),
            (F.pmod(F.col("id") * 2654435761, 1000) / 10.0).alias("x"),
        )
        .localCheckpoint()
    )
    a = ewma(big, ["k"], "t", "x", 0.3)
    b = old_ewma(big, ["k"], "t", "x", 0.3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("value identity at 200k series: OK")
    _noop_time(old_ewma(big, ["k"], "t", "x", 0.3))
    _noop_time(ewma(big, ["k"], "t", "x", 0.3))
    olds, news = [], []
    for _ in range(3):
        olds.append(_noop_time(old_ewma(big, ["k"], "t", "x", 0.3)))
        news.append(_noop_time(ewma(big, ["k"], "t", "x", 0.3)))
    print(f"ewma 200k series: old {olds} min {min(olds)}")
    print(f"ewma 200k series: new {news} min {min(news)}")
