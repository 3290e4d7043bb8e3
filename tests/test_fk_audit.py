"""Referential-integrity audit
(operators/relational.py::referential_orphan_audit) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future r59_fk_audit registration will carry (the fixture
graph is fully intact, so the hash proves the zero-orphan state;
orphan/NULL-key semantics are proven on a hand-built relation)."""

from miningfrequentpattern_spark.operators.relational import (
    referential_orphan_audit,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r59 oracle, verbatim. Dialect pins: DuckDB sum() is HUGEINT
# → CAST to BIGINT to match Spark's long; rate via * 1.0 for float
# division; parent keys DISTINCT + NOT NULL exactly as the operator
# de-duplicates them.
R59_ORACLE = """
SELECT 'lineitem->orders' AS relationship, count(*) AS n_child,
       CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS orphan_rate
FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS _pk FROM orders
                           WHERE o_orderkey IS NOT NULL) p
  ON c.l_orderkey = p._pk
UNION ALL
SELECT 'lineitem->part', count(*),
       CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4)
FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS _pk FROM part
                           WHERE p_partkey IS NOT NULL) p
  ON c.l_partkey = p._pk
UNION ALL
SELECT 'orders->customer', count(*),
       CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4)
FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer
                         WHERE c_custkey IS NOT NULL) p
  ON c.o_custkey = p._pk
UNION ALL
SELECT 'events->customer', count(*),
       CAST(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       round(sum(CASE WHEN p._pk IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4)
FROM events c LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer
                         WHERE c_custkey IS NOT NULL) p
  ON c.user_id = p._pk
"""


def _r59(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    pa = load_table(spark, sf_dir, "part")
    ev = load_table(spark, sf_dir, "events")
    return referential_orphan_audit(
        [
            ("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
            ("lineitem->part", li, "l_partkey", pa, "p_partkey"),
            ("orders->customer", o, "o_custkey", cu, "c_custkey"),
            ("events->customer", ev, "user_id", cu, "c_custkey"),
        ]
    )


def test_fk_audit_matches_duckdb_oracle(spark, duck):
    compare(_r59(spark, SF_ORACLE), duck, R59_ORACLE)


def test_fk_audit_orphans_and_null_keys(spark):
    """Injected break: child keys {1, 2, 9, NULL} against parents
    {1, 2, 2} → 2 orphans of 4 (the NULL key is an orphan — a row
    that cannot join its parent is broken regardless of why), and
    the duplicated parent key must NOT multiply the matched rows."""
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    got = referential_orphan_audit(
        [("c->p", child, "k", parent, "k")]
    ).collect()[0]
    assert tuple(got) == ("c->p", 4, 2, 0.5)


def test_fk_audit_empty_child(spark):
    """Empty child: 0 orphans (not NULL — sum-over-nothing guarded)
    and a NULL rate (no 0/0)."""
    child = spark.createDataFrame([], "k long")
    parent = spark.createDataFrame([(1,)], "k long")
    got = referential_orphan_audit(
        [("c->p", child, "k", parent, "k")]
    ).collect()[0]
    assert tuple(got) == ("c->p", 0, 0, None)


def test_fk_audit_empty_specs_raise(spark):
    import pytest

    with pytest.raises(ValueError, match="empty specs"):
        referential_orphan_audit([])
