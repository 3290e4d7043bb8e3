"""Point-in-time trailing-window features
(operators/timeseries.py::pit_trailing_features) — round-8 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future r86_pit_features registration will carry
(per-purchase trailing 10-minute click/view features over events —
the feature-store primitive with the strict leakage contract), plus
closed-form frame pins, the same-instant-leak exclusion, and the
no-self-join plan audit."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    pit_trailing_features,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r86 oracle, verbatim. Frame pins: both engines run ONE
# user-keyed RANGE window over exact epoch-micros ordered rows,
# 600000000 PRECEDING AND 1 PRECEDING — strictly-before, so a
# same-instant touch can never leak into its own fact's features;
# sum_prior carries the paired sign-of-zero pin (values are signed);
# last_gap_s rounds at 6dp (the exact micros grid, the r62 stance).
R86_ORACLE = """
WITH b AS (
  SELECT user_id, ts, event_id, value,
         (event_type = 'purchase') AS is_fact,
         epoch_us(ts) AS us
  FROM events WHERE ts IS NOT NULL),
w AS (
  SELECT user_id, ts, event_id, is_fact,
         count(CASE WHEN NOT is_fact THEN 1 END) OVER f AS n_prior,
         round(sum(CASE WHEN NOT is_fact THEN value END) OVER f, 4)
           + 0.0 AS sum_prior,
         round((us - max(CASE WHEN NOT is_fact THEN us END) OVER f)
               / 1000000.0, 6) AS last_gap_s
  FROM b
  WINDOW f AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING))
SELECT user_id, ts, event_id AS purchase_id,
       CAST(n_prior AS BIGINT) AS n_prior, sum_prior, last_gap_s
FROM w WHERE is_fact
"""


def _r86(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_fact", F.col("event_type") == "purchase"
    )
    out = pit_trailing_features(
        ev,
        ["user_id"],
        "ts",
        "is_fact",
        value_col="value",
        window="10 minutes",
        carry=["event_id"],
    )
    return out.select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        "n_prior",
        "sum_prior",
        "last_gap_s",
    )


def test_pit_features_match_duckdb_oracle(spark, duck):
    compare(_r86(spark, SF_ORACLE), duck, R86_ORACLE)


def test_pit_features_closed_form(spark):
    """Touches at t=0s (v=5) and t=30s (v=7), facts at t=40s and
    t=100s with a 60s window: fact@40 sees both (n=2, sum=12,
    gap=10); fact@100 sees only t=30s... wait 100-30=70 > 60 — sees
    NOTHING (n=0, NULL sum, NULL gap)."""
    rows = [
        ("u", "2024-01-01 00:00:00", 1, 5.0, False),
        ("u", "2024-01-01 00:00:30", 2, 7.0, False),
        ("u", "2024-01-01 00:00:40", 3, 0.0, True),
        ("u", "2024-01-01 00:01:40", 4, 0.0, True),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, d string, event_id long, value double, is_fact boolean"
    ).select(
        "user_id", F.to_timestamp("d").alias("ts"),
        "event_id", "value", "is_fact",
    )
    got = {
        r["event_id"]: (r["n_prior"], r["sum_prior"], r["last_gap_s"])
        for r in pit_trailing_features(
            df, ["user_id"], "ts", "is_fact",
            value_col="value", window="1 minutes", carry=["event_id"],
        ).collect()
    }
    assert got[3] == (2, 12.0, 10.0)
    assert got[4] == (0, None, None)


def test_pit_features_same_instant_never_leaks(spark):
    """A touch at EXACTLY the fact's timestamp is outside the frame
    (1-microsecond-strict upper bound): the training-serving-skew
    pin — serving time cannot see a same-instant signal either."""
    rows = [
        ("u", "2024-01-01 00:00:40", 1, 9.0, False),  # same instant
        ("u", "2024-01-01 00:00:40", 2, 0.0, True),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, d string, event_id long, value double, is_fact boolean"
    ).select(
        "user_id", F.to_timestamp("d").alias("ts"),
        "event_id", "value", "is_fact",
    )
    got = pit_trailing_features(
        df, ["user_id"], "ts", "is_fact",
        value_col="value", window="1 minutes", carry=["event_id"],
    ).collect()[0]
    assert got["n_prior"] == 0 and got["sum_prior"] is None


def test_pit_features_prior_facts_do_not_count(spark):
    """Only NON-fact rows feed the aggregates: an earlier purchase
    inside the window is not a 'touch'."""
    rows = [
        ("u", "2024-01-01 00:00:00", 1, 3.0, True),
        ("u", "2024-01-01 00:00:10", 2, 4.0, False),
        ("u", "2024-01-01 00:00:20", 3, 0.0, True),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, d string, event_id long, value double, is_fact boolean"
    ).select(
        "user_id", F.to_timestamp("d").alias("ts"),
        "event_id", "value", "is_fact",
    )
    got = {
        r["event_id"]: (r["n_prior"], r["sum_prior"])
        for r in pit_trailing_features(
            df, ["user_id"], "ts", "is_fact",
            value_col="value", window="1 minutes", carry=["event_id"],
        ).collect()
    }
    assert got[3] == (1, 4.0)


def test_pit_features_rejects_bad_window(spark):
    import pytest

    df = spark.createDataFrame(
        [("u", "2024-01-01", False)], "user_id string, d string, is_fact boolean"
    ).select("user_id", F.to_timestamp("d").alias("ts"), "is_fact")
    with pytest.raises(ValueError, match="window"):
        pit_trailing_features(df, ["user_id"], "ts", "is_fact", window="7 fortnights")


def test_pit_features_single_window_no_self_join(spark):
    """The plan is ONE keyed window over one scan — no join node, no
    second events read (the range-join formulation would fan out
    facts x touches)."""
    plan = _r86(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") <= 1
    assert "Join" not in plan
