"""Interval consolidation (operators/timeseries.py::interval_merge) —
round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future r55_activity_spans registration will
carry (gaps-and-islands with a running-max end), plus hand-computed
merge cases covering touching, nested, and disjoint intervals."""

from pyspark.sql import functions as F

from miningfrequentpattern_spark.operators.timeseries import interval_merge
from miningfrequentpattern_spark.sources.io import load_table

from .conftest import SF_ORACLE
from .oracle import compare

# Future r55 oracle, verbatim. Each event opens a 30-minute activity
# window; overlapping-or-touching windows consolidate into spans —
# the heartbeat→uptime/session-coverage shape. Dialect pins: the
# empty window frame makes max() NULL and `s <= NULL` falls to the
# ELSE 1 branch in BOTH engines (first row of a series always opens
# an island); ordering is (s, e) so duplicate starts resolve
# deterministically.
R55_ORACLE = """
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE ts IS NOT NULL),
flag AS (
  SELECT user_id, s, e,
         CASE WHEN s <= max(e) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS ni
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flag)
SELECT user_id, min(s) AS span_start, max(e) AS span_end,
       count(*) AS n_intervals
FROM isl GROUP BY user_id, island
"""


def _r55(spark, sf_dir):
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    return interval_merge(iv, ["user_id"], "s", "e")


def test_interval_merge_matches_duckdb_oracle(spark, duck):
    compare(_r55(spark, SF_ORACLE), duck, R55_ORACLE)


def test_interval_merge_hand_cases(spark):
    """Touching ([1,3]+[3,5]) merges; nested ([10,20]+[12,14]) merges
    and keeps the OUTER end; disjoint ([30,31]) stays; a second key
    never bleeds in."""
    df = spark.createDataFrame(
        [
            ("a", 1, 3),
            ("a", 3, 5),
            ("a", 10, 20),
            ("a", 12, 14),
            ("a", 30, 31),
            ("b", 2, 4),
        ],
        "k string, s int, e int",
    )
    got = sorted(
        map(tuple, interval_merge(df, ["k"], "s", "e").collect())
    )
    assert got == [
        ("a", 1, 5, 2),
        ("a", 10, 20, 2),
        ("a", 30, 31, 1),
        ("b", 2, 4, 1),
    ]


def test_interval_merge_drops_null_boundaries(spark):
    """A NULL boundary has no interval semantics — the row is dropped
    (documented), never glued into a span by NULLS-FIRST ordering."""
    df = spark.createDataFrame(
        [("a", None, 9), ("a", 1, None), ("a", 1, 2)],
        "k string, s int, e int",
    )
    got = interval_merge(df, ["k"], "s", "e").collect()
    assert [tuple(r) for r in got] == [("a", 1, 2, 1)]
