"""Declarative data-contract audit
(operators/relational.py::contract_audit) — round-6 window candidate,
locally certified NOW: the DuckDB oracle below is the exact SQL a
future r81_orders_contract registration will carry (five contracts
over orders, including one that genuinely fails on the fixture so the
audit's failure path is hash-certified, not just the all-green path),
plus three-valued-logic and empty-input hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import contract_audit
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r81 oracle, verbatim. Pins: a violation is FALSE **or
# NULL** (the three-valued-logic pin — `col > 0` on NULL counts
# against the contract); totals come from one corpus pass on both
# sides; the deliberately-failing rule (status in a too-small set)
# certifies the failure path.
R81_ORACLE = """
WITH w AS (
  SELECT count(*) AS n,
         sum(CASE WHEN NOT coalesce(o_totalprice > 0, false)
                  THEN 1 ELSE 0 END) AS v_price_positive,
         sum(CASE WHEN NOT coalesce(o_custkey IS NOT NULL, false)
                  THEN 1 ELSE 0 END) AS v_custkey_present,
         sum(CASE WHEN NOT coalesce(
                    o_orderdate >= TIMESTAMP '1990-01-01', false)
                  THEN 1 ELSE 0 END) AS v_date_sane,
         sum(CASE WHEN NOT coalesce(
                    o_orderstatus IN ('O', 'F'), false)
                  THEN 1 ELSE 0 END) AS v_status_known,
         sum(CASE WHEN NOT coalesce(
                    o_orderpriority IS NOT NULL, false)
                  THEN 1 ELSE 0 END) AS v_priority_present
  FROM orders),
t AS (
  SELECT 'price_positive' AS rule, n, v_price_positive AS nv FROM w
  UNION ALL SELECT 'custkey_present', n, v_custkey_present FROM w
  UNION ALL SELECT 'date_sane', n, v_date_sane FROM w
  UNION ALL SELECT 'status_known', n, v_status_known FROM w
  UNION ALL SELECT 'priority_present', n, v_priority_present FROM w)
SELECT rule, CAST(n AS BIGINT) AS n_rows,
       CAST(nv AS BIGINT) AS n_violations,
       round(CASE WHEN n > 0 THEN nv / (n * 1.0) END, 4)
         AS violation_rate,
       nv = 0 AS passed
FROM t
"""


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


def test_contract_audit_matches_duckdb_oracle(spark, duck):
    compare(_r81(spark, SF_ORACLE), duck, R81_ORACLE)


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
