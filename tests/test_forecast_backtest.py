"""Rolling-origin forecast backtest — PROMOTED round 8 as r89_forecast_backtest: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the exact-line Holt-wins pin and
the fair-set / winner-total-order invariants stay here."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import holt_linear
from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _r89(spark, sf_dir):
    return QUERIES["r89_forecast_backtest"](spark, sf_dir)



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
