"""Referential-integrity audit
(operators/relational.py::referential_orphan_audit) — promoted round 6: the oracle moved verbatim onto the r59_fk_audit registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (the fixture
graph is fully intact, so the hash proves the zero-orphan state;
orphan/NULL-key semantics are proven on a hand-built relation)."""

from miningfrequentpattern_spark.operators.relational import (
    referential_orphan_audit,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


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
