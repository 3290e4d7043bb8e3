"""SessionizeUDTF edge pins (functions/udtf.py) — the u08 surface:
NULL-ts rows are dropped (they sort FIRST under Spark's NULLS FIRST
and used to either eat the first real row's count or crash on
timestamp arithmetic, code-review r9), and the exactly-gap boundary
SPLITS (>=) — deliberately one character different from t03's native
session_window, which merges there."""

import duckdb
import pandas as pd

from miningfrequentpattern_spark.functions.udtf import register_udtfs
from miningfrequentpattern_spark.queries.registry import (
    ORACLES,
    load_all_packs,
)

load_all_packs()


def _sessionize(spark, rows):
    register_udtfs(spark)
    spark.createDataFrame(
        rows, "user_id long, d string, event_id long"
    ).selectExpr(
        "user_id", "to_timestamp(d) AS ts", "event_id"
    ).createOrReplaceTempView("events_u8t")
    return {
        (r["user_id"], str(r["session_start"]), r["n_events"],
         str(r["last_ts"]))
        for r in spark.sql(
            """
            SELECT * FROM sessionize(
              TABLE(SELECT user_id, ts, event_id FROM events_u8t)
              PARTITION BY user_id ORDER BY (ts, event_id)
            )
            """
        ).collect()
    }


def test_null_ts_rows_dropped_and_oracle_agrees(spark):
    rows = [
        (1, None, 1),                    # NULLS FIRST — must be skipped
        (1, "2024-01-01 00:00:00", 2),
        (1, None, 3),                    # (sorts first too)
        (1, "2024-01-01 00:10:00", 4),
        (1, "2024-01-01 01:00:00", 5),   # 50 min gap -> new session
        (2, None, 6),                    # all-NULL user -> no output
    ]
    got = _sessionize(spark, rows)
    assert got == {
        (1, "2024-01-01 00:00:00", 2, "2024-01-01 00:10:00"),
        (1, "2024-01-01 01:00:00", 1, "2024-01-01 01:00:00"),
    }
    # the registered u08 oracle on the same data agrees (its
    # WHERE ts IS NOT NULL is the same drop)
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "event_id": [r[2] for r in rows],
            }
        ),
    )
    want = {
        (r[0], str(r[1]), r[2], str(r[3]))
        for r in con.execute(ORACLES["u08_udtf_table_args"]).fetchall()
    }
    assert got == want


def test_exactly_gap_boundary_splits(spark):
    """ts exactly 30 minutes after the previous event STARTS a new
    session (>= split) — the deliberate one-character difference from
    t03's native merge-at-boundary semantics."""
    rows = [
        (1, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:30:00", 2),   # exactly the gap -> split
    ]
    got = _sessionize(spark, rows)
    assert got == {
        (1, "2024-01-01 00:00:00", 1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:30:00", 1, "2024-01-01 00:30:00"),
    }
