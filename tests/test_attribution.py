"""Last-touch attribution
(operators/timeseries.py::last_touch_attribution) — DEFERRED to the
round-7 window (registry.py ROUND 7 TODO; round 6 promoted 45 of 47
staged operators and ran out of slots), locally certified NOW: the
DuckDB oracle below is the exact SQL the future r62_attribution
registration will carry, plus hand-built same-timestamp, organic,
and horizon cases."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    last_touch_attribution,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r62 oracle, verbatim. Dialect pins: IGNORE NULLS last_value
# over the identical (ts, event_id) ordering; the 7-day horizon as a
# timestamp comparison on both sides; age as epoch-seconds rounded
# 6dp — the exact micros grid, where round() has NO midpoints. 4dp
# is the one precision that breaks here: micros ages hit exact
# .xxxx5 halves ~1% of the time and the engines' round() disagree
# on halves (Spark BigDecimal HALF_UP vs DuckDB's multiply-and-rint
# seeing .4999…); at 6dp both engines return the bitwise-identical
# unrounded double and the comparator's 4dp formatting sees equal
# values.
R62_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE ts IS NOT NULL),
w AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_ts,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM e)
SELECT user_id, ts, event_id,
       CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_ts END
         AS touch_ts,
       CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_type END
         AS touch_type,
       CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
            THEN round(epoch_us(ts - touch_ts) / 1000000.0, 6) END
         AS age_seconds
FROM w WHERE event_type = 'purchase'
"""


def _r62(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = last_touch_attribution(
        ev,
        ["user_id"],
        "ts",
        "event_type",
        conversion_type="purchase",
        touch_types=("click", "view"),
        max_age="7 days",
        tiebreak_col="event_id",
    )
    return out.withColumn("age_seconds", F.round("age_seconds", 6))


def test_attribution_matches_duckdb_oracle(spark, duck):
    compare(_r62(spark, SF_ORACLE), duck, R62_ORACLE)


def test_attribution_hand_cases(spark):
    """click@10 → purchase@20 attributes (age 10); purchase@5 with no
    prior touch is organic (NULLs, row kept); a touch at the SAME ts
    as the conversion counts only when its tiebreak sorts first; a
    touch outside max_age loses credit."""
    rows = [
        ("a", 10.0, 1, "click"),
        ("a", 20.0, 2, "purchase"),
        ("b", 5.0, 3, "purchase"),
        ("c", 30.0, 4, "click"),      # same ts, id sorts BEFORE
        ("c", 30.0, 5, "purchase"),
        ("d", 30.0, 7, "purchase"),   # same ts, id sorts AFTER
        ("d", 30.0, 8, "click"),
    ]
    df = spark.createDataFrame(rows, "k string, t double, eid int, et string")
    got = {
        r["eid"]: (r["touch_ts"], r["touch_type"], r["age_seconds"])
        for r in last_touch_attribution(
            df, ["k"], "t", "et", "purchase", ("click",),
            tiebreak_col="eid",
        ).collect()
    }
    assert got[2] == (10.0, "click", 10.0)
    assert got[3] == (None, None, None)
    assert got[5] == (30.0, "click", 0.0)
    assert got[7] == (None, None, None)


def test_attribution_horizon_voids_stale_touch(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 1, "click"), ("a", 1000.0, 2, "purchase")],
        "k string, t double, eid int, et string",
    )
    fresh = last_touch_attribution(
        df, ["k"], "t", "et", "purchase", ("click",),
        tiebreak_col="eid",
    ).collect()[0]
    assert fresh["age_seconds"] == 1000.0
    # ts is double seconds here: a 10-minute horizon (600 s) voids it.
    stale = last_touch_attribution(
        df, ["k"], "t", "et", "purchase", ("click",),
        max_age="10 minutes", tiebreak_col="eid",
    ).collect()[0]
    assert stale["touch_ts"] is None and stale["age_seconds"] is None
