"""Smoothed target encoding
(operators/relational.py::target_encode) — round-6 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL a
future r72_custkey_encoding registration will carry (order totals
encoded by customer key — high-cardinality, exactly where shrinkage
matters), plus closed-form shrinkage and NULL-handling hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import target_encode
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r72 oracle, verbatim. The global mean is a scalar subquery
# (≡ the operator's 1-row crossJoin); NULL targets are excluded from
# n, raw_mean, and the prior alike — the shrinkage weight counts
# only rows that informed the mean. The target enters in integer
# CENTS: means of 2-decimal money land EXACTLY on x.xxxx5 at 4dp
# (Σcents/100n), where which engine's last-ulp summation error wins
# the round is a coin flip (observed live, both directions, ~1000
# categories) — integer cents make every sum exact in float64, so
# both engines divide identical numbers and the boundary has one
# deterministic side.
R72_ORACLE = """
WITH base AS (
  SELECT o_custkey AS ck,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
  FROM orders WHERE o_totalprice IS NOT NULL),
g AS (SELECT round(avg(y), 4) AS gmean FROM base)
SELECT ck, count(*) AS n_obs,
       round(avg(y), 4) AS raw_mean,
       round((count(*) * round(avg(y), 4) + 20.0 * g.gmean)
             / (count(*) + 20.0), 4) AS encoded
FROM base CROSS JOIN g
GROUP BY ck, g.gmean
"""


def _r72(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    return target_encode(orders, ["ck"], "cents", smoothing=20.0)


def test_target_encode_matches_duckdb_oracle(spark, duck):
    compare(_r72(spark, SF_ORACLE), duck, R72_ORACLE)


def test_target_encode_shrinkage_closed_form(spark):
    """Category 'a' (2 obs, mean 10) vs global mean 40 with m=2:
    encoded = (2·10 + 2·40)/4 = 25 — halfway, since n == m. A
    100-obs category at the same mean would barely move."""
    rows = [("a", 10.0), ("a", 10.0), ("b", 70.0), ("b", 70.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    got = {
        r["c"]: (r["n_obs"], r["raw_mean"], r["encoded"])
        for r in target_encode(df, ["c"], "y", smoothing=2.0).collect()
    }
    assert got["a"] == (2, 10.0, 25.0)
    assert got["b"] == (2, 70.0, 55.0)


def test_target_encode_zero_smoothing_is_raw_mean(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0)], "c string, y double"
    )
    got = target_encode(df, ["c"], "y", smoothing=0.0).collect()[0]
    assert got["encoded"] == got["raw_mean"] == 15.0


def test_target_encode_null_targets_and_null_category(spark):
    rows = [("a", 10.0), ("a", None), (None, 30.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    got = {
        r["c"]: (r["n_obs"], r["raw_mean"])
        for r in target_encode(df, ["c"], "y", smoothing=1.0).collect()
    }
    # the NULL target row informed nothing; the NULL category is a
    # category like any other
    assert got["a"] == (1, 10.0)
    assert got[None] == (1, 30.0)


def test_target_encode_rejects_negative_smoothing(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "c string, y double")
    with pytest.raises(ValueError):
        target_encode(df, ["c"], "y", smoothing=-1.0)
