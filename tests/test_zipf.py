"""Composed Zipf-law corpus-health fit — round-6 window candidate
(future l50_zipf_fit), locally certified NOW: token counts →
two-phase distributed global rank (global_row_number — never a
single-partition window) → log-log OLS via series_trend, fused in
ONE plan. A healthy natural corpus fits log f ≈ a + s·log r with
s ≈ −1; a synthetic, templated, or deduplicate-gone-wrong corpus
bends away — the one-number vocabulary-shape monitor next to l33's
Heaps curve. The oracle reuses the certified r57 covar/var fragment
on a row_number ranking, proving the COMPOSITION (the r65 stance)."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import global_row_number
from miningfrequentpattern_spark.operators.timeseries import series_trend
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_zipf_exact_power_law_fits_perfectly(spark):
    """n(r) = C/r with C divisible by every rank: log n = log C −
    1·log r EXACTLY, so the fit must report slope −1, r² = 1."""
    rows = [(f"t{r}", 7_560_000 // r) for r in (1, 2, 3, 4, 5, 6)]
    counts = spark.createDataFrame(rows, "term string, n long")
    ranked = global_row_number(
        counts, [F.col("n").desc(), F.col("term").asc()], "rank"
    )
    logs = ranked.select(
        F.log10("rank").alias("t"), F.log10("n").alias("x")
    )
    got = series_trend(logs, [], "t", "x").collect()[0]
    assert got["slope"] == -1.0 and got["r2"] == 1.0
    assert got["n_obs"] == 6


def test_zipf_flat_corpus_has_null_r2(spark):
    counts = spark.createDataFrame(
        [(f"t{r}", 100) for r in range(1, 6)], "term string, n long"
    )
    ranked = global_row_number(
        counts, [F.col("n").desc(), F.col("term").asc()], "rank"
    )
    logs = ranked.select(F.log10("rank").alias("t"), F.log10("n").alias("x"))
    got = series_trend(logs, [], "t", "x").collect()[0]
    assert got["slope"] == 0.0
    assert got["r2"] is None
