"""Arrival-cadence / freshness audit
(operators/timeseries.py::cadence_audit) —
PROMOTED round 7 as r71_feed_cadence: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import cadence_audit
from miningfrequentpattern_spark.sources.io import load_table


def test_cadence_closed_form(spark):
    """Arrivals at t = 0, 10, 40, 100 s: gaps 10/30/60 — median 30,
    p95 = 57 ((n−1)·p interpolation on [10,30,60]), max 60."""
    rows = [("a", f"2024-01-01 00:0{m}:{s:02d}") for m, s in
            [(0, 0), (0, 10), (0, 40), (1, 40)]]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.to_timestamp("ts").alias("ts")
    )
    got = cadence_audit(df, ["k"], "ts").collect()[0]
    assert got["n_obs"] == 4 and got["n_gaps"] == 3
    assert got["median_gap_s"] == 30.0
    assert got["p95_gap_s"] == round(30 + 0.9 * 30, 4)  # between 30 and 60
    assert got["max_gap_s"] == 60.0
    assert got["first_seen"].second == 0
    assert got["last_seen"].minute == 1


def test_cadence_single_observation(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "k string, ts string"
    ).select("k", F.to_timestamp("ts").alias("ts"))
    got = cadence_audit(df, ["k"], "ts").collect()[0]
    assert got["n_obs"] == 1 and got["n_gaps"] == 0
    assert got["median_gap_s"] is None
    assert got["p95_gap_s"] is None
    assert got["max_gap_s"] is None


def test_cadence_tied_timestamps_are_zero_gaps(spark):
    """Duplicate delivery is a cadence FACT: two rows at the same
    instant produce a genuine 0-second gap, never a dedup."""
    rows = [("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:00:00"),
            ("a", "2024-01-01 00:01:00")]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.to_timestamp("ts").alias("ts")
    )
    got = cadence_audit(df, ["k"], "ts").collect()[0]
    assert got["n_gaps"] == 2
    assert got["median_gap_s"] == 30.0  # interpolated between 0 and 60
    assert got["max_gap_s"] == 60.0


def test_cadence_null_timestamps_excluded(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", None)], "k string, ts string"
    ).select("k", F.to_timestamp("ts").alias("ts"))
    got = cadence_audit(df, ["k"], "ts").collect()[0]
    assert got["n_obs"] == 1 and got["n_gaps"] == 0
