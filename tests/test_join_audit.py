"""Pre-flight join-cardinality audit
(operators/relational.py::join_cardinality_audit) — promoted round 6: the oracle moved verbatim onto the r68_join_fanout_audit registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps
(orders-per-customer against the customer dimension), plus m:n and
NULL-key hand pins and the exact-cardinality invariant."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    join_cardinality_audit,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_join_audit_sum_is_exact_inner_cardinality(spark):
    """SUM(out_rows) over the audit == count(*) of the actual inner
    join — the invariant that makes the audit a pre-flight
    measurement rather than an estimate."""
    orders = load_table(spark, SF_ORACLE, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    cust = load_table(spark, SF_ORACLE, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    audited = (
        join_cardinality_audit(orders, cust, ["custkey"])
        .agg(F.sum("out_rows"))
        .collect()[0][0]
    )
    actual = orders.join(cust, "custkey").count()
    assert audited == actual


def test_join_audit_mtm_and_null_keys(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k int"
    )
    right = spark.createDataFrame([(1,), (1,), (3,), (None,)], "k int")
    got = {
        r["k"]: (r["n_left"], r["n_right"], r["out_rows"], r["is_mtm"])
        for r in join_cardinality_audit(left, right, ["k"]).collect()
    }
    assert got[1] == (2, 2, 4, True)  # the m:n blow-up key
    assert got[2] == (1, 0, 0, False)
    assert got[3] == (0, 1, 0, False)
    # NULL keys never match across sides: each side's NULL group is
    # its own unmatched line item (2 left-NULLs, 1 right-NULL).
    null_rows = [
        (r["n_left"], r["n_right"], r["out_rows"])
        for r in join_cardinality_audit(left, right, ["k"]).collect()
        if r["k"] is None
    ]
    assert sorted(null_rows) == [(0, 1, 0), (2, 0, 0)]
