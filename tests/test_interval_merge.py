"""Interval consolidation (operators/timeseries.py::interval_merge) —
promoted round 6: the oracle moved verbatim onto the r55_activity_spans registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (gaps-and-islands with a running-max end), plus hand-computed
merge cases covering touching, nested, and disjoint intervals."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import interval_merge
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_interval_merge_hand_cases(spark):
    """Touching ([1,3]+[3,5]) merges; nested ([10,20]+[12,14]) merges
    and keeps the OUTER end; disjoint ([30,31]) stays; a second key
    never bleeds in."""
    df = spark.createDataFrame(
        [
            ("a", 1, 3),
            ("a", 3, 5),
            ("a", 10, 20),
            ("a", 12, 14),
            ("a", 30, 31),
            ("b", 2, 4),
        ],
        "k string, s int, e int",
    )
    got = sorted(
        map(tuple, interval_merge(df, ["k"], "s", "e").collect())
    )
    assert got == [
        ("a", 1, 5, 2),
        ("a", 10, 20, 2),
        ("a", 30, 31, 1),
        ("b", 2, 4, 1),
    ]


def test_interval_merge_drops_null_boundaries(spark):
    """A NULL boundary has no interval semantics — the row is dropped
    (documented), never glued into a span by NULLS-FIRST ordering."""
    df = spark.createDataFrame(
        [("a", None, 9), ("a", 1, None), ("a", 1, 2)],
        "k string, s int, e int",
    )
    got = interval_merge(df, ["k"], "s", "e").collect()
    assert [tuple(r) for r in got] == [("a", 1, 2, 1)]


def test_interval_merge_rejects_working_key_names(spark):
    """r10 sweep: a KEY named like the island working column or an
    output name previously failed with AMBIGUOUS_REFERENCE naming a
    column the caller never wrote."""
    import pytest

    from miningfrequentpattern_spark.operators.timeseries import (
        interval_merge,
    )

    df = spark.createDataFrame(
        [(1, 0.0, 1.0)], "_island long, s double, e double"
    )
    with pytest.raises(ValueError, match="_island"):
        interval_merge(df, ["_island"], "s", "e")
