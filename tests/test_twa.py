"""Time-weighted average (operators/timeseries.py::time_weighted_avg)
— round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future r56_time_weighted_value registration
will carry, plus hand-computed step-interpolation cases and the
tied-timestamp determinism pin."""

import math

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    time_weighted_avg,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r56 oracle, verbatim. Dialect pins: epoch_us(ts)/1000000.0
# is EXACTLY Spark's cast(timestamp as double) (micros over 1e6 in
# float64 — both engines divide the same integer by the same
# constant); lead() orders by (t, x) so tied timestamps resolve
# identically in both engines (operator docstring: the largest tied
# value holds, the rest contribute dt = 0); HUGEINT-free since
# count(*) is BIGINT.
R56_ORACLE = """
WITH v AS (
  SELECT user_id, epoch_us(ts)/1000000.0 AS t, value AS x
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
d AS (
  SELECT user_id, x,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, x) - t AS dt
  FROM v)
SELECT user_id,
       round(CASE WHEN sum(dt) > 0 THEN sum(x * dt) / sum(dt) END, 4)
         AS twa,
       count(*) AS n_obs
FROM d GROUP BY user_id
"""


def _r56(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, ["user_id"], "ts", "value").select(
        "user_id", F.round("twa", 4).alias("twa"), "n_obs"
    )


def test_twa_matches_duckdb_oracle(spark, duck):
    compare(_r56(spark, SF_ORACLE), duck, R56_ORACLE)


def test_twa_hand_computed_steps(spark):
    """Values 10 (held 1 s), 30 (held 3 s), 50 (no duration):
    twa = (10·1 + 30·3)/4 = 25. A single-observation series has zero
    covered duration → NULL, not NaN."""
    df = spark.createDataFrame(
        [("a", 0.0, 10.0), ("a", 1.0, 30.0), ("a", 4.0, 50.0),
         ("b", 7.0, 99.0)],
        "k string, t double, x double",
    )
    got = {
        r["k"]: (r["twa"], r["n_obs"])
        for r in time_weighted_avg(df, ["k"], "t", "x").collect()
    }
    assert math.isclose(got["a"][0], 25.0) and got["a"][1] == 3
    assert got["b"][0] is None and got["b"][1] == 1


def test_twa_tied_timestamps_deterministic(spark):
    """Two observations at the same instant: the (t, x) ordering pins
    the LARGER value as the segment holder — input order must not
    matter."""
    rows = [("a", 0.0, 5.0), ("a", 0.0, 15.0), ("a", 2.0, 1.0)]
    fwd = spark.createDataFrame(rows, "k string, t double, x double")
    rev = spark.createDataFrame(rows[::-1], "k string, t double, x double")
    for df in (fwd, rev):
        got = time_weighted_avg(df, ["k"], "t", "x").collect()[0]
        # 15 holds [0, 2): twa = 15; the tied 5 contributes dt = 0.
        assert math.isclose(got["twa"], 15.0) and got["n_obs"] == 3
