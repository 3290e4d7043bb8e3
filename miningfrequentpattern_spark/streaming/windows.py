"""Event-time window aggregations (SURVEY.md §2.5 T1-T4).

Each operator is a single expression tree valid in BOTH batch and
streaming mode — the driver's oracle runs the batch plan, the
streaming tests run the identical plan behind readStream + watermark.
That equivalence is the point: Structured Streaming's incremental
execution of a windowed agg converges to exactly the batch answer
once all data is ingested (complete/append mode with watermark past
max event time).

Scale: event-time windows group by (window, key) — the shuffle key
cardinality is bounded by (#buckets × #keys), not #events, and
partial aggregation compacts map-side. Session windows are the
exception (unbounded key space); Spark handles them with a dedicated
session-merge exec, and the 100 TB lever is watermarking to bound
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """T1: tumbling-window counts per event_type."""
    return (
        events.groupBy(
            F.window(ts_col, width).alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """T1: sliding-window counts (each event lands in width/slide
    windows; Spark expands via the `window` generator)."""
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """T2: session windows per user — sessions close after `gap` of
    inactivity. Returns (user_id, session_start, n_events, last_ts).

    `session_window` is valid in batch mode too; last_ts (not the
    window end) is exposed because Spark defines end = last + gap,
    which a SQL oracle would have to special-case.
    """
    return (
        events.groupBy(
            F.session_window(ts_col, gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "last_ts",
        )
    )


def dedup_events(events: DataFrame, keys: list[str], ts_col: str = "ts") -> DataFrame:
    """T4 (batch form): deterministic dedup — earliest (ts, event_id)
    row per key. The streaming twin is dropDuplicatesWithinWatermark,
    exercised in tests/test_streaming.py; this batch form is the
    oracle-checkable contract (dropDuplicates keeps an ARBITRARY row,
    which can never hash-match an oracle)."""
    from ..functions.guards import reject_working_cols

    # withColumn REPLACES (and drop then deletes) a user _rn column
    # silently (r10 sweep, the 73e18de class)
    reject_working_cols(events, ("_rn",), "dedup_events")
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col("event_id"))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def click_purchase_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """T7: stream-stream interval join — purchases within `horizon`
    after a click by the same user (the streaming twin of batch query
    r06_click_to_purchase_10min).

    Both sides carry watermarks and the join condition bounds the two
    event times against each other, which is what lets Structured
    Streaming EVICT buffered state: a buffered click can be dropped
    once the purchase watermark passes click.ts + horizon, so state is
    O(events within the watermark window), not O(stream). Without the
    time-interval condition the join would buffer both streams
    forever — the stream-stream scale cliff.

    `how="left_outer"` adds the abandoned-click rows (no purchase
    within the horizon → NULL purchase columns). Outer semantics
    change WHEN rows emit, not just which: a matched pair emits as
    soon as both sides arrive, but an unmatched click can only emit
    once the watermark proves no qualifying purchase can still
    arrive (purchase watermark > click.ts + horizon) — so outer
    results trail the watermark by design, and clicks near the head
    of a replay stay buffered, not dropped, until later input closes
    them (asserted in tests/test_streaming.py).

    The equi-key (user_id) carries the shuffle exactly as in the
    batch plan; each side shuffles once.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    return c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") > F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        # exact integer micros, not double-cast ts (the r62/r06 pin,
        # extended to this twin in the r10 sweep): epoch-scale double
        # quantization (~2.4e-7 s) flips 4dp boundary cases vs the
        # registered r06 batch query and its oracle; micros subtract
        # exactly and one divide is correctly rounded. NULL-safe for
        # the outer join (unix_micros(NULL) is NULL).
        F.round(
            (F.unix_micros(F.col("p.ts")) - F.unix_micros(F.col("c.ts")))
            / F.lit(1_000_000.0),
            4,
        ).alias("gap_sec"),
    )


def enrich_events_stream(
    events_stream: DataFrame, customer: DataFrame
) -> DataFrame:
    """T8: stream-STATIC join — enrich each event with its customer's
    market segment, the standard streaming dimension-join.

    The static side is explicitly broadcast: a stream-static join
    re-evaluates the static plan per micro-batch, so a shuffle join
    would re-shuffle the dim every batch; the broadcast ships it to
    executors once per batch and keeps the stream side's partitioning
    untouched (no state store involved at all — unlike stream-stream,
    a static row can't be late). At 100 TB the dim must stay
    broadcast-sized or become a pre-bucketed static table."""
    dim = customer.select(
        F.col("c_custkey"), F.col("c_mktsegment"), F.col("c_name")
    )
    return events_stream.join(
        F.broadcast(dim),
        events_stream["user_id"] == dim["c_custkey"],
        "left",
    ).select(
        "event_id", "user_id", "event_type", "ts", "c_mktsegment", "c_name"
    )
