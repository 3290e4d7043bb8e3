"""Arrival-cadence / freshness audit
(operators/timeseries.py::cadence_audit) — DEFERRED to the
round-7 window (registry.py ROUND 7 TODO; round 6 promoted 45 of 47
staged operators and ran out of slots), locally certified NOW: the
DuckDB oracle below is the exact SQL the future r71_feed_cadence
registration will carry (per-type arrival gaps over events — the
feed-staleness monitor), plus closed-form gap arithmetic,
single-observation, and tied-timestamp hand pins."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import cadence_audit
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r71 oracle, verbatim. Dialect pins: gaps run in the exact
# epoch-MICROS domain divided to seconds (epoch_us ≡ Spark's
# cast-to-double micros precision — the r62 attribution pin);
# quantile_cont ≡ Spark percentile (the winsorize pin); min/max keep
# the raw TIMESTAMP (no epoch round-trip).
R71_ORACLE = """
WITH g AS (
  SELECT event_type, ts,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY event_type ORDER BY epoch_us(ts)))
           / 1000000.0 AS gap
  FROM events WHERE ts IS NOT NULL)
SELECT event_type,
       count(*) AS n_obs,
       min(ts) AS first_seen,
       max(ts) AS last_seen,
       count(gap) AS n_gaps,
       round(quantile_cont(gap, 0.5), 4) AS median_gap_s,
       round(quantile_cont(gap, 0.95), 4) AS p95_gap_s,
       round(max(gap), 4) AS max_gap_s
FROM g GROUP BY 1
"""


def _r71(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    return cadence_audit(ev, ["event_type"], "ts")


def test_cadence_matches_duckdb_oracle(spark, duck):
    compare(_r71(spark, SF_ORACLE), duck, R71_ORACLE)


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
