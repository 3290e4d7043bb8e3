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

# Future r65 oracle, verbatim. Stage fragments: daily (shared scan),
# trend (r57's covar/var form per event_type over day numbers),
# centered CUSUM (r58's closed form on n − per-type mean, target 0).
# Per-type means are exact-count ÷ exact-count divisions; every
# accumulation is day-ordered on both sides (days are unique per
# type, so no tiebreak is needed).
R65_ORACLE = """
WITH daily AS MATERIALIZED (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
mu AS (SELECT event_type, avg(n * 1.0) AS mean_n FROM daily GROUP BY 1),
tr AS (
  SELECT event_type,
         round(CASE WHEN var_pop(tt) > 0
                    THEN covar_pop(tt, n * 1.0) / var_pop(tt) END, 4)
           AS slope
  FROM (SELECT event_type,
               date_diff('day', DATE '1970-01-01', day)::DOUBLE AS tt, n
        FROM daily)
  GROUP BY event_type),
cen AS (
  SELECT d.event_type, d.day, d.n, d.n - m.mean_n AS x
  FROM daily d JOIN mu m USING (event_type)),
pre AS (
  SELECT event_type, day, n, x,
         sum(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
  FROM cen),
cu AS (
  SELECT event_type, day, n, pp,
         min(pp) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS runmin
  FROM pre)
SELECT c.event_type, CAST(c.day AS TIMESTAMP) AS day, c.n,
       t.slope,
       round(c.pp - least(0.0, c.runmin), 4) AS cusum,
       (c.pp - least(0.0, c.runmin)) > 50.0 AS drifted
FROM cu c JOIN tr t USING (event_type)
"""


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


def test_ops_monitor_matches_duckdb_oracle(spark, duck):
    compare(_r65(spark, SF_ORACLE), duck, R65_ORACLE)


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
