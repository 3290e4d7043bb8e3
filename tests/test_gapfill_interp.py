"""Linear-interpolation gap fill
(operators/timeseries.py::gapfill_interpolate) — round-7 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL the future r83_gapfill_interp registration will carry
(the r43 dense grid with NULL gaps, interpolated per event type over
day numbers — gauge semantics where r43's zero-fill means counter
semantics), plus closed-form midpoint/thirds pins, the
leading/trailing-NULL extrapolation refusal, and a single-exchange
plan audit."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    gapfill_interpolate,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r83 oracle, verbatim. The grid is r43's certified fragment;
# t = epoch-day numbers (date_diff over DATE — number arithmetic, the
# r57 domain pin); interpolation divides exact integer counts and
# day deltas, so both engines stream identical float64; DuckDB's
# IGNORE NULLS frames mirror the operator's two passes.
R83_ORACLE = """
WITH b AS (SELECT min(CAST(ts AS DATE)) AS mn,
                  max(CAST(ts AS DATE)) AS mx
           FROM events),
types AS (SELECT DISTINCT event_type FROM events),
days AS (SELECT unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY))
           AS d FROM b),
grid AS (SELECT t.event_type, CAST(days.d AS DATE) AS day
         FROM types t CROSS JOIN days),
c AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2),
g AS (SELECT grid.event_type, grid.day,
             date_diff('day', DATE '1970-01-01', grid.day)::DOUBLE AS t,
             c.n::DOUBLE AS v
      FROM grid LEFT JOIN c USING (event_type, day)),
w AS (SELECT event_type, day, t, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pt,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nt
      FROM g)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       (v IS NULL) AS is_gap,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * (t - pt) / (nt - pt) END,
             4) AS filled
FROM w
"""


def _r83(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    b = ev.agg(F.min(day).alias("mn"), F.max(day).alias("mx"))
    grid = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"),
                           F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    c = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    g = grid.join(c, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.datediff("day", F.lit("1970-01-01")).cast("double").alias("t"),
        F.col("n").cast("double").alias("v"),
    )
    out = gapfill_interpolate(g, ["event_type"], "t", "v")
    return out.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        F.col("v").isNull().alias("is_gap"),
        F.round("filled", 4).alias("filled"),
    )


def test_gapfill_interp_matches_duckdb_oracle(spark, duck):
    compare(_r83(spark, SF_ORACLE), duck, R83_ORACLE)


def test_gapfill_interp_closed_form(spark):
    """[10, NULL, 20] fills the midpoint 15; [0, NULL, NULL, 30]
    fills the thirds 10 and 20; observed rows pass through."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 20.0),
         ("b", 1, 0.0), ("b", 2, None), ("b", 3, None), ("b", 4, 30.0)],
        "k string, t int, v double",
    )
    got = {
        (r["k"], r["t"]): r["filled"]
        for r in gapfill_interpolate(df, ["k"], "t", "v").collect()
    }
    assert got[("a", 2)] == 15.0
    assert got[("b", 2)] == 10.0 and got[("b", 3)] == 20.0
    assert got[("a", 1)] == 10.0 and got[("b", 4)] == 30.0


def test_gapfill_interp_refuses_extrapolation(spark):
    """Leading and trailing gaps have one-sided evidence only — they
    stay NULL (extrapolation is the caller's explicit decision), and
    an all-NULL series stays all-NULL."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None),
         ("z", 1, None), ("z", 2, None)],
        "k string, t int, v double",
    )
    got = {
        (r["k"], r["t"]): r["filled"]
        for r in gapfill_interpolate(df, ["k"], "t", "v").collect()
    }
    assert got[("a", 1)] is None and got[("a", 3)] is None
    assert got[("a", 2)] == 5.0
    assert got[("z", 1)] is None and got[("z", 2)] is None


def test_gapfill_interp_single_exchange_two_passes(spark):
    """Both IGNORE-NULLS passes share the (keys, t) sort: the plan
    must carry exactly ONE exchange keyed by the series, and no
    global (empty partition-spec) window."""
    import re

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0)],
        "k string, t int, v double",
    )
    out = gapfill_interpolate(df, ["k"], "t", "v")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert p.count("Exchange") <= 2, p  # one node + one details mention
    specs = re.findall(r"windowspecdefinition\((\w+)#", p)
    assert specs and set(specs) == {"k"}, specs
