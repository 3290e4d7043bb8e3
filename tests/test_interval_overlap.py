"""Interval×interval overlap join
(operators/timeseries.py::interval_overlap_join) — round-6 window
candidate, locally certified NOW: the DuckDB oracle below is the
exact SQL a future r80_concurrent_activity registration will carry
(per-user click-activity spans overlapped against view-activity
spans — "when was the user doing both"), plus half-open touching
pins and the bucketed ≡ naive equivalence the claim-cell dedup
must uphold."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import (
    interval_merge,
    interval_overlap_join,
)
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r80 oracle, verbatim. Span legs are r55's certified
# gaps-and-islands fragment per event type; the overlap join is the
# NAIVE non-equi form (the single-process contrast to the bucketed
# claim-cell plan, the l43 stance); boundaries convert to the exact
# epoch-seconds double domain (the r71 pin); half-open [s, e):
# touching spans do not overlap.
R80_ORACLE = """
WITH iv AS (
  SELECT user_id, event_type, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE ts IS NOT NULL
    AND event_type IN ('click', 'view')),
flag AS (
  SELECT user_id, event_type, s, e,
         CASE WHEN s <= max(e) OVER (PARTITION BY user_id, event_type
                ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS ni
  FROM iv),
isl AS (
  SELECT user_id, event_type, s, e,
         sum(ni) OVER (PARTITION BY user_id, event_type ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flag),
sp AS (
  SELECT user_id, event_type,
         epoch_us(min(s)) / 1000000.0 AS ss,
         epoch_us(max(e)) / 1000000.0 AS ee
  FROM isl GROUP BY user_id, event_type, island)
SELECT a.user_id,
       a.ss AS a_start, a.ee AS a_end,
       b.ss AS b_start, b.ee AS b_end,
       greatest(a.ss, b.ss) AS overlap_start,
       least(a.ee, b.ee) AS overlap_end
FROM sp a JOIN sp b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'view'
 AND a.ss < b.ee AND b.ss < a.ee
"""


def _spans(spark, sf_dir, tp):
    iv = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & (F.col("event_type") == tp))
        .select(
            "user_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        )
    )
    return interval_merge(iv, ["user_id"], "s", "e")


def _r80(spark, sf_dir, bucket="6 hours"):
    return interval_overlap_join(
        _spans(spark, sf_dir, "click"),
        _spans(spark, sf_dir, "view"),
        ["user_id"],
        "span_start",
        "span_end",
        bucket=bucket,
    )


def test_interval_overlap_matches_duckdb_oracle(spark, duck):
    compare(_r80(spark, SF_ORACLE), duck, R80_ORACLE)


def test_interval_overlap_bucketed_equals_naive(spark):
    """The claim-cell dedup must make the bucketed plan EXACTLY the
    naive plan's result — on the real fixture workload, for a bucket
    much smaller than many spans (so multi-bucket fan-out and
    multi-shared-bucket pairs genuinely occur)."""
    naive = {
        tuple(r)
        for r in _r80(spark, SF_ORACLE, bucket=None).collect()
    }
    bucketed = {
        tuple(r)
        for r in _r80(spark, SF_ORACLE, bucket="10 minutes").collect()
    }
    assert naive == bucketed and len(naive) > 0


def test_interval_overlap_touching_is_not_overlap(spark):
    a = spark.createDataFrame(
        [("u", 0.0, 10.0)], "k string, span_start double, span_end double"
    )
    b = spark.createDataFrame(
        [("u", 10.0, 20.0), ("u", 9.0, 12.0), ("u", 20.0, 30.0)],
        "k string, span_start double, span_end double",
    )
    got = interval_overlap_join(a, b, ["k"]).collect()
    # only [9, 12) overlaps [0, 10); the touching [10, 20) does not
    assert len(got) == 1
    r = got[0]
    assert (r["overlap_start"], r["overlap_end"]) == (9.0, 10.0)


def test_interval_overlap_claim_cell_no_duplicates(spark):
    """A pair sharing MANY buckets must appear exactly once — the
    whole point of claiming by the overlap's first instant."""
    a = spark.createDataFrame(
        [("u", 0.0, 100000.0)], "k string, span_start double, span_end double"
    )
    b = spark.createDataFrame(
        [("u", 50.0, 99999.0)], "k string, span_start double, span_end double"
    )
    got = interval_overlap_join(
        a, b, ["k"], bucket="1 minute"
    ).collect()
    assert len(got) == 1
    assert got[0]["overlap_start"] == 50.0


def test_interval_overlap_drops_null_and_empty_intervals(spark):
    a = spark.createDataFrame(
        [("u", None, 10.0), ("u", 5.0, 5.0), ("u", 1.0, 4.0)],
        "k string, span_start double, span_end double",
    )
    b = spark.createDataFrame(
        [("u", 0.0, 100.0)], "k string, span_start double, span_end double"
    )
    got = interval_overlap_join(a, b, ["k"]).collect()
    assert len(got) == 1 and got[0]["a_start"] == 1.0
