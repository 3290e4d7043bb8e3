"""Stateful streaming operators (SURVEY.md §2.5 T3/T5/T6).

These are the genuinely non-SQL-expressible pieces: arbitrary
per-key state (applyInPandasWithState), watermark-bounded dedup, and
micro-batch re-mining (foreachBatch + FPGrowth — MLlib estimators
cannot fit on a stream, so the sanctioned pattern is to re-fit per
micro-batch or on a rolling cache).

All run against the parquet-replay source in sources/io.py
(read_events_stream); tests drive them with availableNow triggers so
every micro-batch is deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id BIGINT, n_events BIGINT, n_purchases BIGINT"
STATE_SCHEMA = "n BIGINT, p BIGINT"


def _update_user_counts(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """T5 state function: running (events, purchases) per user.

    State is a single (n, p) tuple — constant size per key, the shape
    that scales: state store holds O(#users) not O(#events).
    """
    n, p = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        p += int((pdf["event_type"] == "purchase").sum())
    state.update((n, p))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "n_purchases": [p]}
    )


def running_user_counts_stream(events_stream: DataFrame) -> DataFrame:
    """T5: arbitrary stateful processing over a stream."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def watermark_dedup_stream(
    events_stream: DataFrame, delay: str = "1 hour"
) -> DataFrame:
    """T3+T4: watermark-bounded streaming dedup on event_id. State for
    an id is dropped once the watermark passes delay — bounded memory
    on an infinite stream, the whole reason watermarks exist."""
    return events_stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def windowed_counts_stream(
    events_stream: DataFrame, width: str = "1 hour", delay: str = "2 hours"
) -> DataFrame:
    """T1+T3 streaming twin of windows.tumbling_counts, with a
    watermark so late data beyond `delay` is dropped and window state
    is evicted."""
    return (
        events_stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


def mine_stream_foreach_batch(
    events_stream: DataFrame,
    sink_path: str,
    min_support: float = 0.2,
):
    """T6: per-micro-batch frequent-itemset mining.

    Each micro-batch is basketized (user -> distinct event types) and
    re-mined with FPGrowth; each batch's itemsets land in the parquet
    sink at `sink_path` under a `batch_id=<id>` partition via DYNAMIC
    partition overwrite — foreachBatch is at-least-once, so a
    re-delivered batch must replace its own partition, not append a
    duplicate row set (the idempotent-write contract the Structured
    Streaming guide prescribes for foreachBatch sinks). `sink_path`
    must be a fresh directory or one already in this hive-partitioned
    layout — flat-file parquet dirs from other writers cannot be
    mixed in (partition discovery would see conflicting depths). A
    model
    snapshot per batch, fully distributed: no result ever rides
    through the driver — itemset counts are exponential in the item
    universe, so a driver-side collect here is the one place this
    operator could fall over at scale. Returns the StreamingQuery.
    """
    from ..operators.mining import fit_fpgrowth

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        baskets = batch_df.groupBy("user_id").agg(
            F.sort_array(F.collect_set("event_type")).alias("items")
        )
        model = fit_fpgrowth(baskets, min_support=min_support)
        (
            model.freqItemsets.select(
                F.lit(batch_id).alias("batch_id"),
                F.sort_array("items").alias("items"),
                "freq",
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink_path)
        )

    return (
        events_stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )


try:  # Spark 4 transformWithState surface; absent on older runtimes.
    from pyspark.sql.streaming import StatefulProcessor as _StatefulProcessor
except ImportError:  # pragma: no cover
    _StatefulProcessor = object


class RunningCountsProcessor(_StatefulProcessor):
    """T5 (Spark 4 transformWithStateInPandas): the same running
    (events, purchases) per-user state as _update_user_counts, on the
    modern StatefulProcessor API — typed state handles (getValueState)
    instead of a raw tuple; the surface that also offers timers, TTL
    and list/map state for richer operators. State remains O(#users).
    """

    def init(self, handle) -> None:
        from pyspark.sql.types import LongType, StructField, StructType

        self._state = handle.getValueState(
            "counts",
            StructType(
                [StructField("n", LongType()), StructField("p", LongType())]
            ),
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, p = self._state.get()
        else:
            n, p = 0, 0
        for pdf in rows:
            n += len(pdf)
            p += int((pdf["event_type"] == "purchase").sum())
        self._state.update((n, p))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_purchases": [p]}
        )

    def close(self) -> None:
        pass


def running_user_counts_tws(events_stream: DataFrame) -> DataFrame:
    """T5 (modern form): arbitrary stateful processing via
    transformWithStateInPandas — result-identical to
    running_user_counts_stream (asserted in tests/test_streaming.py,
    skipped where the runtime lacks TWS's protobuf dependency: the
    state-server protocol needs google.protobuf, which this container
    does not bundle — re-probed and still absent 2026-08-14 round 5;
    the applyInPandasWithState twin above is the always-available
    path)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        raise ModuleNotFoundError(
            "transformWithStateInPandas requires google.protobuf "
            "(pyspark[connect] extra); use running_user_counts_stream "
            "on runtimes without it"
        )
    return (
        events_stream.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningCountsProcessor(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
