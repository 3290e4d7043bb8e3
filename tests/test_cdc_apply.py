"""CDC snapshot materialization (operators/relational.py::cdc_apply)
— promoted round 6: the oracle moved verbatim onto the r61_cdc_snapshot registration and driver-grade value parity now runs in tests/test_oracle_parity.py; this file keeps (events replayed as a change feed: every event upserts the
user's state, an 'error' event tombstones it), plus hand-built
last-writer-wins / tombstone / NULL-seq cases."""

from miningfrequentpattern_spark.operators.relational import cdc_apply
from miningfrequentpattern_spark.sources.io import load_table

from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle import compare


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
