"""CDC snapshot materialization (operators/relational.py::cdc_apply)
— round-6 window candidate, locally certified NOW: the DuckDB oracle
below is the exact SQL a future r61_cdc_snapshot registration will
carry (events replayed as a change feed: every event upserts the
user's state, an 'error' event tombstones it), plus hand-built
last-writer-wins / tombstone / NULL-seq cases."""

from miningfrequentpattern_spark.operators.relational import cdc_apply
from miningfrequentpattern_spark.sources.io import load_table

from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle import compare

# Future r61 oracle, verbatim. Dialect pins: (ts, event_id) DESC is
# the unique change order on both sides (fixture invariant:
# event_id is unique); DuckDB default NULL ordering never fires
# because NULL-seq rows are filtered on both sides.
R61_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
w AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM c)
SELECT user_id, ts AS last_ts, event_type AS last_type,
       round(value, 4) AS last_value
FROM w WHERE rn = 1 AND op <> 'D'
"""


def _r61(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    snap = cdc_apply(ev, ["user_id"], ["ts", "event_id"], "op")
    return snap.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
    )


def test_cdc_apply_matches_duckdb_oracle(spark, duck):
    compare(_r61(spark, SF_ORACLE), duck, R61_ORACLE)


def test_cdc_apply_last_writer_wins_and_tombstone(spark):
    """Key 1: I@1 → U@2 wins (payload b). Key 2: I@1 → D@5 deletes.
    Key 3: D@1 → I@2 resurrects (a delete is only final if LAST).
    Key 4: NULL seq dropped → only the seq=1 insert remains."""
    rows = [
        (1, 1, "I", "a"), (1, 2, "U", "b"),
        (2, 1, "I", "x"), (2, 5, "D", None),
        (3, 1, "D", None), (3, 2, "I", "back"),
        (4, None, "U", "ghost"), (4, 1, "I", "real"),
    ]
    df = spark.createDataFrame(rows, "k long, seq int, op string, v string")
    got = {
        r["k"]: (r["seq"], r["op"], r["v"])
        for r in cdc_apply(df, ["k"], ["seq"], "op").collect()
    }
    assert got[1] == (2, "U", "b")
    assert 2 not in got
    assert got[3] == (2, "I", "back")
    assert got[4] == (1, "I", "real")


def test_cdc_apply_empty(spark):
    empty = spark.createDataFrame([], "k long, seq int, op string")
    assert cdc_apply(empty, ["k"], ["seq"], "op").count() == 0


def test_cdc_apply_null_op_winner_is_kept_not_deleted(spark):
    """Only an EXPLICIT delete tombstones: a NULL-op winner must
    survive (review r5: a plain != filter silently dropped it —
    NULL != 'D' is NULL)."""
    df = spark.createDataFrame(
        [(1, 1, "I", "a"), (1, 2, None, "b")],
        "k long, seq int, op string, v string",
    )
    got = cdc_apply(df, ["k"], ["seq"], "op").collect()
    assert len(got) == 1
    assert got[0]["seq"] == 2 and got[0]["op"] is None
