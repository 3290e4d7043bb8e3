"""Composed deseasonalized-outlier pipeline — round-6 window
candidate (future r73_deseasonal_outliers), locally certified NOW:
daily per-type volumes → day-of-week seasonal_profile → median/MAD
mad_outliers on the RESIDUAL, fused in ONE plan — the monitoring
composition that stops weekday cycles from masquerading as
anomalies (r44's raw z-score fires on every weekend of a
weekday-heavy feed; the residual doesn't). The oracle reuses the
r69/r67 certified fragment shapes stage by stage, proving the
COMPOSITION, not just the parts (the r65 stance)."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.relational import mad_outliers
from miningfrequentpattern_spark.operators.timeseries import seasonal_profile
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def test_deseasonal_outliers_catches_what_raw_zscore_misses(spark):
    """A weekday-heavy series (100 on weekdays, 20 on weekends) with
    ONE genuinely bad Wednesday (30): the raw per-series z-score
    sees weekends as extreme as the bad day, while the
    deseasonalized residual isolates exactly the Wednesday."""
    import datetime as dt

    rows = []
    day = dt.date(2024, 1, 1)  # a Monday
    # 16 weeks with period-5 jitter: the jitter keeps residuals from
    # collapsing to an all-zero MAD, and 16 strata samples dilute the
    # bad day's pull on its own Wednesday mean enough that sibling
    # Wednesdays stay under the 3.5 cut (4 weeks would flag them —
    # the usual masking/contamination trade of a small stratum).
    for i in range(112):
        d = day + dt.timedelta(days=i)
        n = (20.0 if d.isoweekday() >= 6 else 100.0) + 2.0 * (i % 5)
        if i == 9:  # Wednesday of week 2
            n = 30.0
        rows.append(("a", d.isoformat(), n))
    df = spark.createDataFrame(rows, "k string, day string, n double").select(
        "k", F.to_timestamp("day").alias("day"), "n"
    )
    prof = seasonal_profile(df, ["k"], "day", "n").drop("ratio")
    out = mad_outliers(prof, ["k"], "residual", carry=["day", "n"])
    flagged = [
        r["day"].date().isoformat()
        for r in out.filter(F.col("is_outlier")).collect()
    ]
    assert flagged == ["2024-01-10"]
