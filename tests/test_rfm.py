"""RFM customer segmentation
(operators/relational.py::rfm_scores) — round-6 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL a
future r75_customer_rfm registration will carry (orders by customer,
quintile scores), plus closed-form quintile-edge and tie-collapse
hand pins. No global ntile()/percent_rank() window anywhere — scores
come from broadcast quantile edges, the shape that survives 100 M
customers."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import rfm_scores
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r75 oracle, verbatim. Dialect pins: recency compares in the
# exact epoch-seconds double domain (epoch_us/1e6 ≡ Spark's
# timestamp→double cast — the r71 pin); edges are 4dp-rounded
# (exact here: date-grain epochs and k/5 interpolation fractions
# give ≤3-decimal true edges); values AT an edge take the higher
# score (>=); quantile ties COLLAPSE into one score by construction.
R75_ORACLE = """
WITH pc AS (
  SELECT o_custkey AS cust, max(o_orderdate) AS last_ts,
         count(*) AS frequency,
         round(coalesce(sum(o_totalprice), 0), 4) AS monetary
  FROM orders GROUP BY 1),
e AS (SELECT
  list_transform(quantile_cont(epoch_us(last_ts) / 1000000.0,
                 [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS er,
  list_transform(quantile_cont(frequency * 1.0,
                 [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS ef,
  list_transform(quantile_cont(monetary,
                 [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS em
  FROM pc),
s AS (SELECT pc.cust, pc.last_ts, pc.frequency, pc.monetary,
  CAST(len(list_filter(e.er,
       x -> epoch_us(pc.last_ts) / 1000000.0 >= x)) + 1 AS INT) AS r_score,
  CAST(len(list_filter(e.ef,
       x -> pc.frequency * 1.0 >= x)) + 1 AS INT) AS f_score,
  CAST(len(list_filter(e.em,
       x -> pc.monetary >= x)) + 1 AS INT) AS m_score
  FROM pc CROSS JOIN e)
SELECT cust, last_ts, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
FROM s
"""


def _r75(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), "o_orderdate", "o_totalprice"
    )
    return rfm_scores(orders, "cust", "o_orderdate", "o_totalprice")


def test_rfm_matches_duckdb_oracle(spark, duck):
    compare(_r75(spark, SF_ORACLE), duck, R75_ORACLE)


def test_rfm_closed_form_quintiles(spark):
    """10 customers, one order each, monetary 10..100: quintile
    edges at 28/46/64/82, so monetary scores step 1..5 in pairs;
    frequency all 1 → every quantile edge equals 1 and the >= rule
    lands every customer in the TOP bin — the tie pin: a constant
    measure collapses to ONE score (5), it never splits customers
    arbitrarily."""
    import datetime as dt

    rows = [
        (c, dt.datetime(2024, 1, 1 + c), float((c + 1) * 10))
        for c in range(10)
    ]
    df = spark.createDataFrame(rows, "cust long, ts timestamp, amt double")
    got = {
        r["cust"]: (r["f_score"], r["m_score"], r["r_score"])
        for r in rfm_scores(df, "cust", "ts", "amt").collect()
    }
    assert all(f == 5 for f, _, _ in got.values())
    m_scores = [got[c][1] for c in range(10)]
    assert m_scores == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    r_scores = [got[c][2] for c in range(10)]
    assert r_scores == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]


def test_rfm_null_amounts_count_as_orders(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), None),
        (1, dt.datetime(2024, 1, 2), 50.0),
        (2, dt.datetime(2024, 1, 3), 10.0),
    ]
    df = spark.createDataFrame(rows, "cust long, ts timestamp, amt double")
    got = {
        r["cust"]: (r["frequency"], r["monetary"])
        for r in rfm_scores(df, "cust", "ts", "amt").collect()
    }
    assert got[1] == (2, 50.0)  # NULL amount: order counted, 0 spend
    assert got[2] == (1, 10.0)


def test_rfm_rejects_bad_tiles(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, None, 1.0)], "cust long, ts timestamp, amt double"
    )
    with pytest.raises(ValueError):
        rfm_scores(df, "cust", "ts", "amt", n_tiles=1)
