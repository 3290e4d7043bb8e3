"""Rolling-origin forecast backtest — round-8 window candidate
(future r89_forecast_backtest), locally certified NOW: the DuckDB
oracle below is the exact SQL the future registration will carry.
Composition (the r65/r73/l50 certified-composition stance): daily
revenue per priority → one-step-ahead forecasts from three models —
naive (yesterday), seasonal-naive (same weekday last week), and Holt
(previous row's level + trend, the r82 recurrence) — → per-series
MAE over the FAIR evaluation set (days where all three forecasts
exist), with the winner named deterministically. The question every
forecasting deployment must answer first: does the fancy model beat
persistence AT ALL on this series?"""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import holt_linear
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r89 oracle, verbatim — r82's recursive-CTE Holt chain with
# lag() forecasts and the shared fair-set MAE aggregate. MAEs are
# non-negative (no sign pin); the winner breaks ties on method name.
R89_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT priority, day, rev,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS rn
  FROM daily),
h AS (
  SELECT i1.priority, i1.day, i1.rn, i1.rev,
         i1.rev AS l, i2.rev - i1.rev AS b
  FROM idx i1 LEFT JOIN idx i2
    ON i2.priority = i1.priority AND i2.rn = 2
  WHERE i1.rn = 1
  UNION ALL
  SELECT i.priority, i.day, i.rn, i.rev,
         0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b),
         0.3::DOUBLE * ((0.2::DOUBLE * i.rev + 0.8::DOUBLE * (h.l + h.b))
                        - h.l)
           + 0.7::DOUBLE * h.b
  FROM idx i JOIN h ON i.priority = h.priority AND i.rn = h.rn + 1
),
f AS (
  SELECT priority, day, rev,
         lag(rev, 1) OVER w AS f_naive,
         lag(rev, 7) OVER w AS f_snaive,
         lag(l + b, 1) OVER w AS f_holt
  FROM h
  WINDOW w AS (PARTITION BY priority ORDER BY rn)),
m AS (
  SELECT priority,
         CAST(count(*) AS BIGINT) AS n_eval,
         round(avg(abs(rev - f_naive)), 4) AS mae_naive,
         round(avg(abs(rev - f_snaive)), 4) AS mae_snaive,
         round(avg(abs(rev - f_holt)), 4) AS mae_holt
  FROM f
  WHERE f_naive IS NOT NULL AND f_snaive IS NOT NULL
    AND f_holt IS NOT NULL
  GROUP BY 1)
SELECT priority, n_eval, mae_naive, mae_snaive, mae_holt,
       CASE WHEN mae_holt <= mae_naive AND mae_holt <= mae_snaive
            THEN 'holt'
            WHEN mae_naive <= mae_snaive THEN 'naive'
            ELSE 'snaive' END AS best_method
FROM m
"""


def _r89(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    hl = holt_linear(daily, ["priority"], "day", "rev", alpha=0.2, beta=0.3)
    w = Window.partitionBy("priority").orderBy("day")
    f = hl.select(
        "priority",
        "day",
        "rev",
        F.lag("rev", 1).over(w).alias("f_naive"),
        F.lag("rev", 7).over(w).alias("f_snaive"),
        F.lag(F.col("level") + F.col("trend"), 1).over(w).alias("f_holt"),
    ).filter(
        F.col("f_naive").isNotNull()
        & F.col("f_snaive").isNotNull()
        & F.col("f_holt").isNotNull()
    )
    m = f.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(F.avg(F.abs(F.col("rev") - F.col("f_naive"))), 4).alias(
            "mae_naive"
        ),
        F.round(F.avg(F.abs(F.col("rev") - F.col("f_snaive"))), 4).alias(
            "mae_snaive"
        ),
        F.round(F.avg(F.abs(F.col("rev") - F.col("f_holt"))), 4).alias(
            "mae_holt"
        ),
    )
    best = (
        F.when(
            (F.col("mae_holt") <= F.col("mae_naive"))
            & (F.col("mae_holt") <= F.col("mae_snaive")),
            F.lit("holt"),
        )
        .when(F.col("mae_naive") <= F.col("mae_snaive"), F.lit("naive"))
        .otherwise(F.lit("snaive"))
    )
    return m.withColumn("best_method", best)


def test_forecast_backtest_matches_duckdb_oracle(spark, duck):
    compare(_r89(spark, SF_ORACLE), duck, R89_ORACLE)


def test_forecast_backtest_exact_line_holt_wins(spark):
    """On y = 3t + 7 Holt's one-step forecast is EXACT (trend pins at
    3), so mae_holt = 0 while naive is off by 3 and weekly snaive by
    21 — holt must win."""
    rows = [("s", f"2024-01-{d:02d}", 3.0 * d + 7.0) for d in range(1, 21)]
    df = spark.createDataFrame(rows, "priority string, d string, rev double").select(
        "priority", F.to_date("d").alias("day"), "rev"
    )
    hl = holt_linear(df, ["priority"], "day", "rev", alpha=0.2, beta=0.3)
    w = Window.partitionBy("priority").orderBy("day")
    f = hl.select(
        "priority", "rev",
        F.lag("rev", 1).over(w).alias("f_naive"),
        F.lag("rev", 7).over(w).alias("f_snaive"),
        F.lag(F.col("level") + F.col("trend"), 1).over(w).alias("f_holt"),
    ).filter("f_naive IS NOT NULL AND f_snaive IS NOT NULL AND f_holt IS NOT NULL")
    got = f.agg(
        F.max(F.abs(F.col("rev") - F.col("f_holt"))).alias("holt_err"),
        F.min(F.abs(F.col("rev") - F.col("f_naive"))).alias("naive_err"),
        F.min(F.abs(F.col("rev") - F.col("f_snaive"))).alias("snaive_err"),
    ).collect()[0]
    assert math.isclose(got["holt_err"], 0.0, abs_tol=1e-9)
    assert math.isclose(got["naive_err"], 3.0, abs_tol=1e-9)
    assert math.isclose(got["snaive_err"], 21.0, abs_tol=1e-9)


def test_forecast_backtest_fair_set_and_winner_total_order(spark, duck):
    """The evaluation set requires ALL THREE forecasts (so every MAE
    averages the same days), and the winner rule is a total order:
    exactly one best_method per series on the real fixture."""
    out = _r89(spark, SF_ORACLE).collect()
    assert out
    for r in out:
        assert r["n_eval"] >= 1
        assert r["best_method"] in ("holt", "naive", "snaive")
        best_mae = {
            "holt": r["mae_holt"],
            "naive": r["mae_naive"],
            "snaive": r["mae_snaive"],
        }[r["best_method"]]
        assert best_mae <= min(r["mae_holt"], r["mae_naive"], r["mae_snaive"]) + 1e-9
