"""RFM customer segmentation
(operators/relational.py::rfm_scores) — promoted round 6: the oracle moved verbatim onto the r75_customer_rfm registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (orders by customer,
quintile scores), plus closed-form quintile-edge and tie-collapse
hand pins. No global ntile()/percent_rank() window anywhere — scores
come from broadcast quantile edges, the shape that survives 100 M
customers."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import rfm_scores
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


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


def test_rfm_nan_amount_rides_the_null_leg(spark):
    """Hardening (d), r10: a NaN amount must behave exactly like a
    NULL amount (counts toward frequency, contributes 0 to monetary)
    — without the pin, sum() propagates NaN into the customer's
    monetary and then into every quantile edge, collapsing all
    m_scores."""
    from miningfrequentpattern_spark.operators.relational import (
        rfm_scores,
    )

    rows_null = [
        (c, float(d), amt)
        for c, d, amt in [
            (1, 1, 10.0), (1, 2, None), (2, 3, 50.0), (2, 4, 5.0),
            (3, 5, 30.0), (4, 6, 80.0), (5, 7, 1.0),
        ]
    ]
    rows_nan = [
        (c, d, float("nan") if a is None else a) for c, d, a in rows_null
    ]
    schema = "cust long, ts double, amt double"
    want = sorted(
        map(
            tuple,
            rfm_scores(
                spark.createDataFrame(rows_null, schema), "cust", "ts", "amt"
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            rfm_scores(
                spark.createDataFrame(rows_nan, schema), "cust", "ts", "amt"
            ).collect(),
        )
    )
    assert got == want
    assert all(not (m != m) for r in got for m in [r[3]])  # no NaN monetary
