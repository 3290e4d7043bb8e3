"""Cohort retention matrix (operators/relational.py::retention_cohorts)
— round-8 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL the future r85_retention_cohorts registration
will carry (weekly user cohorts over events), plus closed-form
triangle pins, the offset-0-anchors-denominator invariant, and the
single-corpus-scan plan audit."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import (
    retention_cohorts,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r85 oracle, verbatim. Calendar pins: date_trunc('week') is
# ISO-Monday in both engines; offsets are exact integer day
# arithmetic / 7 (both Monday-truncated, so the quotient is exact);
# cohort re-emitted as TIMESTAMP (the r43/r52 dialect note).
R85_ORACLE = """
WITH e AS (SELECT user_id AS u, ts FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
fu AS (SELECT u, date_trunc('week', min(ts)) AS cohort
       FROM e GROUP BY 1),
up AS (SELECT DISTINCT e.u, fu.cohort,
              date_trunc('week', e.ts) AS p
       FROM e JOIN fu USING (u)),
m AS (SELECT cohort,
             CAST(date_diff('day', CAST(cohort AS DATE),
                            CAST(p AS DATE)) / 7 AS INT) AS "offset",
             count(*) AS n_active
      FROM up GROUP BY 1, 2)
SELECT CAST(cohort AS TIMESTAMP) AS cohort,
       "offset",
       CAST(n_active AS BIGINT) AS n_active,
       CAST(max(CASE WHEN "offset" = 0 THEN n_active END)
              OVER (PARTITION BY cohort) AS BIGINT) AS n_cohort,
       round(n_active * 1.0
             / max(CASE WHEN "offset" = 0 THEN n_active END)
                 OVER (PARTITION BY cohort), 4) AS retention
FROM m
"""


def _r85(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return retention_cohorts(ev, "user_id", "ts", grain="week")


def test_retention_matches_duckdb_oracle(spark, duck):
    compare(_r85(spark, SF_ORACLE), duck, R85_ORACLE)


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
