"""Last-touch attribution
(operators/timeseries.py::last_touch_attribution) —
PROMOTED round 7 as r62_attribution: the DuckDB oracle moved VERBATIM
into the @query registration (tests/test_oracle_parity.py now
carries the compare); the property/edge/hand pins stay here."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    last_touch_attribution,
)
from miningfrequentpattern_spark.sources.io import load_table


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
