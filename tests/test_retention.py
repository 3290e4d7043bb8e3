"""Cohort retention matrix (operators/relational.py::retention_cohorts)
— PROMOTED round 8 as r85_retention_cohorts: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the closed-form triangle pins, the
offset-0-anchors-denominator invariant, and the single-corpus-scan
plan audit stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    retention_cohorts,
)
from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _r85(spark, sf_dir):
    return QUERIES["r85_retention_cohorts"](spark, sf_dir)


def test_retention_closed_form_triangle(spark):
    """u1 active weeks 0,1,2; u2 weeks 0,2; u3 week 1 only (a later
    cohort). Cohort W0: size 2, offset1 -> 1 (u1), offset2 -> 2.
    Cohort W1: size 1, offset0 only."""
    rows = [
        ("u1", "2024-01-01"), ("u1", "2024-01-08"), ("u1", "2024-01-17"),
        ("u2", "2024-01-03"), ("u2", "2024-01-15"),
        ("u3", "2024-01-10"),
    ]
    df = spark.createDataFrame(rows, "user_id string, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    got = {
        (r["cohort"].date().isoformat(), r["offset"]): (
            r["n_active"], r["n_cohort"], r["retention"]
        )
        for r in retention_cohorts(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-01", 2): (2, 2, 1.0),
        ("2024-01-08", 0): (1, 1, 1.0),
    }


def test_retention_offset_zero_anchors_every_cohort(spark):
    """Every cohort has an offset-0 row with retention exactly 1.0
    (the user's first week is active by definition), and every
    retention is in (0, 1]."""
    out = _r85(spark, SF_ORACLE).collect()
    cohorts = {r["cohort"] for r in out}
    zeros = {r["cohort"] for r in out if r["offset"] == 0}
    assert cohorts == zeros
    for r in out:
        assert 0 < r["retention"] <= 1.0
        if r["offset"] == 0:
            assert r["retention"] == 1.0 and r["n_active"] == r["n_cohort"]


def test_retention_month_grain_and_bad_grain(spark):
    import pytest

    rows = [("u", "2024-01-05"), ("u", "2024-03-20")]
    df = spark.createDataFrame(rows, "user_id string, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    got = {
        r["offset"]: r["n_active"]
        for r in retention_cohorts(df, "user_id", "ts", "month").collect()
    }
    assert got == {0: 1, 2: 1}
    with pytest.raises(ValueError, match="grain"):
        retention_cohorts(df, "user_id", "ts", "day")


def test_retention_single_corpus_scan(spark):
    """The corpus is scanned ONCE: the plan reads events a single
    time (one user-keyed aggregate feeds both the cohort and the
    active-period legs)."""
    plan = _r85(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") <= 1
