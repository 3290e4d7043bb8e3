"""Declarative data-contract audit
(operators/relational.py::contract_audit) — promoted round 6: the oracle moved verbatim onto the r81_orders_contract registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (five contracts
over orders, including one that genuinely fails on the fixture so the
audit's failure path is hash-certified, not just the all-green path),
plus three-valued-logic and empty-input hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import contract_audit
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _r81(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return contract_audit(
        orders,
        [
            ("price_positive", F.col("o_totalprice") > 0),
            ("custkey_present", F.col("o_custkey").isNotNull()),
            (
                "date_sane",
                F.col("o_orderdate")
                >= F.lit("1990-01-01").cast("timestamp"),
            ),
            # deliberately too strict on the fixture (it also has
            # 'P' rows): the FAILURE path must be certified too
            ("status_known", F.col("o_orderstatus").isin("O", "F")),
            ("priority_present", F.col("o_orderpriority").isNotNull()),
        ],
    )


def test_contract_audit_fixture_has_a_failing_rule(spark):
    """The staged query is only a real certification if at least one
    rule fails on the fixture — assert it does (and that the clean
    rules pass)."""
    got = {r["rule"]: r["passed"] for r in _r81(spark, SF_ORACLE).collect()}
    assert got["price_positive"] and got["custkey_present"]
    assert not got["status_known"]


def test_contract_audit_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "v double"
    )
    got = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in contract_audit(
            df, [("v_positive", F.col("v") > 0)]
        ).collect()
    }
    # NULL > 0 is NULL → violation, alongside the genuine -2
    assert got["v_positive"] == (2, False)


def test_contract_audit_empty_input_is_vacuously_green(spark):
    df = spark.createDataFrame([], "v double")
    rows = contract_audit(
        df,
        [("v_positive", F.col("v") > 0), ("nonempty", F.lit(True))],
    ).collect()
    assert all(r["passed"] and r["n_rows"] == 0 for r in rows)
    assert all(r["violation_rate"] is None for r in rows)


def test_contract_audit_rejects_bad_rules(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        contract_audit(df, [])
    with pytest.raises(ValueError):
        contract_audit(
            df, [("a", F.lit(True)), ("a", F.lit(False))]
        )
    with pytest.raises(ValueError):
        contract_audit(df, [("bad name; drop", F.lit(True))])
