"""Composed monitoring pipeline — round-6 window candidate
(future r65_ops_monitor), locally certified NOW: daily per-type
volumes → per-series OLS trend (series_trend) + mean-centered CUSUM
drift (cusum_drift) fused in ONE plan, the monitoring counterpart of
l25/l40's composed LLM flagships. The oracle reuses the r57/r58
certified fragment shapes stage by stage, proving the COMPOSITION,
not just the parts."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    cusum_drift,
    series_trend,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare


def _r65(spark, sf_dir):
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mu = daily.groupBy("event_type").agg(
        F.avg(F.col("n") * 1.0).alias("mean_n")
    )
    trend = series_trend(
        daily.withColumn("t", F.datediff("day", F.lit("1970-01-01"))),
        ["event_type"],
        "t",
        "n",
    ).select("event_type", "slope")
    centered = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") - F.col("mean_n")).alias("x"),
    )
    cu = cusum_drift(
        centered, ["event_type"], "day", "x",
        target=0.0, threshold=50.0, carry=("n",),
    )
    return (
        cu.join(F.broadcast(trend), "event_type")
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "n",
            "slope",
            F.round("cusum", 4).alias("cusum"),
            "drifted",
        )
    )


def test_ops_monitor_composition_stays_fused(spark):
    """The composed plan must keep the parts' shapes: trend stays a
    pure aggregate (no extra corpus pass — the daily relation feeds
    BOTH branches), the CUSUM windows partition by event_type, the
    mean/trend legs broadcast back, and nothing plans a cartesian
    or a global window."""
    import io
    import re
    from contextlib import redirect_stdout

    df = _r65(spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2, p
    specs = re.findall(r"windowspecdefinition\((\w+)", p)
    assert specs and all(s == "event_type" for s in specs), specs
    # one corpus-grain scan family: events appears in ReadSchema
    # lines but every scan reads only ts/event_type.
    reads = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert reads and all("value" not in ln for ln in reads), reads
