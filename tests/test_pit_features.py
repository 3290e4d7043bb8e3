"""Point-in-time trailing-window features
(operators/timeseries.py::pit_trailing_features) — PROMOTED round 8 as r86_pit_features: the DuckDB oracle moved
VERBATIM into the @query registration (tests/test_oracle_parity.py
now carries the compare); the closed-form frame pins,
the same-instant-leak exclusion, and the no-self-join plan audit stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    pit_trailing_features,
)
from .conftest import SF_ORACLE
from miningfrequentpattern_spark.queries.registry import (
    QUERIES,
    load_all_packs,
)

load_all_packs()

def _r86(spark, sf_dir):
    return QUERIES["r86_pit_features"](spark, sf_dir)



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


def test_pit_features_fixture_domains_overlap(spark):
    """r84 standing rule: the fact (purchase) and touch legs must
    share a time domain in the fixture, or the window features are
    certified on structurally-NULL priors."""
    from miningfrequentpattern_spark.sources.io import load_table

    from .conftest import assert_time_domains_overlap

    ev = load_table(spark, SF_ORACLE, "events")
    facts = ev.filter(F.col("event_type") == "purchase")
    touches = ev.filter(F.col("event_type") != "purchase")
    assert_time_domains_overlap(facts, "ts", touches, "ts")
    # and the window actually selects: some purchase has a prior touch
    out = _r86(spark, SF_ORACLE)
    assert out.filter(F.col("n_prior") > 0).count() > 0
