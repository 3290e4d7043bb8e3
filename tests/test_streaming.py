"""True Structured Streaming runs (readStream over the events parquet,
availableNow trigger) asserted equal to their batch twins — the
equivalence the streaming pack's oracles rely on."""

import tempfile

from pyspark.sql import functions as F

from miningfrequentpattern_spark.sources.io import (
    load_table,
    read_events_stream,
)
from miningfrequentpattern_spark.streaming.stateful import (
    mine_stream_foreach_batch,
    running_user_counts_stream,
    watermark_dedup_stream,
    windowed_counts_stream,
)
from miningfrequentpattern_spark.streaming.windows import tumbling_counts

from .conftest import SF_SMOKE
import pytest


def _run_to_memory(sdf, name, mode="update"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_window_equals_batch(spark):
    """Windowed streaming agg over the full replay == batch agg."""
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(
        windowed_counts_stream(stream, "1 hour", "2 hours"), "win", "append"
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM win").collect()
    }
    batch = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in tumbling_counts(batch, "1 hour").collect()
    }
    # Append mode only emits windows the watermark has closed; every
    # emitted window must match batch exactly, and most windows close.
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want.get(k) == v, k
    assert len(got) >= 0.9 * len(want)


def test_stream_stateful_counts(spark):
    """applyInPandasWithState final state == batch group counts."""
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(running_user_counts_stream(stream), "run_counts")
    # update mode: last emitted row per user is the final state
    got = {
        r.user_id: (r.n_events, r.n_purchases)
        for r in spark.sql("SELECT * FROM run_counts").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("p"),
        )
    )
    want = {r.user_id: (r.n, r.p) for r in batch.collect()}
    assert got == want


def test_stream_watermark_dedup(spark):
    """dropDuplicatesWithinWatermark on unique event_id keeps all rows
    of the replay (ids never repeat -> dedup is the identity here; the
    operator's value is bounded state, which this exercises)."""
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(watermark_dedup_stream(stream), "dedup", "append")
    n_stream = spark.sql("SELECT count(*) AS n FROM dedup").collect()[0].n
    n_batch = load_table(spark, SF_SMOKE, "events").count()
    assert n_stream == n_batch


def test_stream_foreachbatch_mining(spark, tmp_path):
    """foreachBatch re-mining: itemsets from the single availableNow
    micro-batch == batch FPGrowth over the same baskets. The sink is
    a parquet directory (one append per batch) — nothing rides
    through the driver."""
    stream = read_events_stream(spark, SF_SMOKE)
    sink_path = str(tmp_path / "t06_sink")
    q = mine_stream_foreach_batch(stream, sink_path, min_support=0.2)
    q.awaitTermination(120)
    snapshots = spark.read.parquet(sink_path)
    assert snapshots.select("batch_id").distinct().count() >= 1
    mined = {
        (tuple(sorted(r["items"])), r["freq"])
        for r in snapshots.select("items", "freq").collect()
    }
    from miningfrequentpattern_spark.operators.mining import fit_fpgrowth

    batch = load_table(spark, SF_SMOKE, "events")
    baskets = batch.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("items")
    )
    want = {
        (tuple(sorted(r["items"])), r["freq"])
        for r in fit_fpgrowth(baskets, min_support=0.2).freqItemsets.collect()
    }
    assert mined == want


@pytest.mark.slow  # driver test budget (VERDICT r11 item 2):
# heavyweight property/stream-twin cert, full-suite-only
def test_stream_stream_interval_join(spark):
    """T7: stream-stream interval join over the replay == the batch
    range join (r06 semantics). availableNow replay closes every
    watermark, so the emitted pair set must be exactly the batch one."""
    from miningfrequentpattern_spark.streaming.windows import (
        click_purchase_join_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    _run_to_memory(
        click_purchase_join_stream(clicks, purchases), "ss_join", "append"
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_sec)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_sec)
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("click_id"),
            F.col("b.event_id").alias("purchase_id"),
            # exact micros, matching the operator's r10 fix (the
            # r62/r06 pin) — cast-double flips 4dp boundary cases
            F.round(
                (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts")))
                / F.lit(1_000_000.0),
                4,
            ).alias("gap_sec"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.slow  # driver test budget (VERDICT r11 item 2):
# heavyweight property/stream-twin cert, full-suite-only
def test_stream_stream_left_outer_join(spark):
    """T7 (outer): the left-outer interval join must emit every
    matched pair immediately PLUS a NULL-purchase row for each
    abandoned click — but only once the purchase watermark proves no
    qualifying purchase can still arrive (watermark > click.ts +
    horizon). Asserted three ways: everything emitted matches the
    batch left join, the inner subset emits completely, and every
    abandoned click old enough for the final watermark emits its
    NULL row (clicks newer than watermark+horizon may legitimately
    still be buffered when the replay ends)."""
    import datetime

    from miningfrequentpattern_spark.streaming.windows import (
        click_purchase_join_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    _run_to_memory(
        click_purchase_join_stream(clicks, purchases, how="left_outer"),
        "ss_ljoin",
        "append",
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_sec)
        for r in spark.sql("SELECT * FROM ss_ljoin").collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    batch = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (
                F.col("b.ts")
                <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")
            ),
            "left",
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("click_id"),
            F.col("b.event_id").alias("purchase_id"),
            F.round(
                (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts")))
                / F.lit(1_000_000.0),
                4,
            ).alias("gap_sec"),
            F.col("a.ts").alias("click_ts"),
        )
        .collect()
    )
    want_full = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_sec) for r in batch
    }
    inner_want = {t for t in want_full if t[2] is not None}
    assert got <= want_full, got - want_full
    assert inner_want <= got, inner_want - got
    # The query's GLOBAL watermark is the MIN across both sides'
    # watermark nodes (each = its own max event ts - 30 min) — the
    # latest click itself can therefore never close, because the
    # click side's watermark is gated on it. An abandoned click is
    # provably closed once global watermark > click.ts + 10 min
    # horizon; 5 min slack for the discrete watermark update.
    maxes = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    )
    wm_base = min(r.m for r in maxes)
    cutoff = wm_base - datetime.timedelta(minutes=45)
    closed_nulls = {
        (r.user_id, r.click_id, r.purchase_id, r.gap_sec)
        for r in batch
        if r.purchase_id is None and r.click_ts < cutoff
    }
    assert closed_nulls, "fixture has no closeable abandoned clicks"
    assert closed_nulls <= got, closed_nulls - got


def test_stream_transform_with_state(spark):
    """T5 (Spark 4 transformWithStateInPandas): final per-user state
    == batch group counts — same contract as the
    applyInPandasWithState twin."""
    import pytest

    pytest.importorskip("google.protobuf", reason="TWS state protocol needs google.protobuf")
    from miningfrequentpattern_spark.streaming.stateful import (
        running_user_counts_tws,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(running_user_counts_tws(stream), "tws_counts")
    got = {
        r.user_id: (r.n_events, r.n_purchases)
        for r in spark.sql("SELECT * FROM tws_counts").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("p"),
        )
    )
    want = {r.user_id: (r.n, r.p) for r in batch.collect()}
    assert got == want


def test_stream_python_datasource(spark):
    """S7 streaming leg: the custom Python DataSource feeds a real
    micro-batch query; offsets advance deterministically so the
    collected prefix must be gapless, duplicate-free, and match the
    row formula exactly (the exactly-once contract of
    readBetweenOffsets replay)."""
    import time

    from miningfrequentpattern_spark.sources.pydatasource import (
        SyntheticTxnDataSource,
    )

    spark.dataSource.register(SyntheticTxnDataSource)
    sdf = (
        spark.readStream.format("synthetic_txns")
        .option("rowsPerBatch", "250")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="ckpt_pyds_")
        )
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS c FROM pyds_stream").collect()[0].c
            if n >= 500:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = spark.sql("SELECT txn_id, item FROM pyds_stream").collect()
    assert len(rows) >= 500
    ids = sorted(r.txn_id for r in rows)
    assert ids == list(range(len(ids)))
    assert all(r.item == f"item{(r.txn_id * 7919) % 100}" for r in rows)


def test_stream_python_datasource_sink(spark, tmp_path):
    """S-extension (writer leg): the custom jsonl_sink must land every
    replayed event exactly once, with per-batch commit manifests
    listing exactly the staged files (atomic-batch visibility)."""
    import glob
    import json as jsonlib

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamSink,
    )

    spark.dataSource.register(JsonlStreamSink)
    out = str(tmp_path / "sink")
    stream = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "event_type"
    )
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    manifests = sorted(glob.glob(f"{out}/_commit_*.json"))
    assert manifests, "no batch committed"
    rows = []
    n_manifested = 0
    for mf in manifests:
        m = jsonlib.load(open(mf))
        n_manifested += m["n_rows"]
        for fname in m["files"]:
            with open(fname) as f:
                rows.extend(jsonlib.loads(line) for line in f)
    batch = load_table(spark, SF_SMOKE, "events")
    assert len(rows) == n_manifested == batch.count()
    assert {r["event_id"] for r in rows} == {
        r.event_id for r in batch.select("event_id").collect()
    }


def test_stream_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Exactly-once across a restart: replay events as FOUR single-file
    micro-batches into the custom jsonl_sink, stop the query after the
    first batches commit, then restart from the SAME checkpoint — the
    union of manifested batches must contain every event exactly once
    (no re-delivery of committed batches, no gaps from the handoff)."""
    import glob
    import json as jsonlib
    import time

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamSink,
    )

    spark.dataSource.register(JsonlStreamSink)
    # Four-file copy of the events fixture so maxFilesPerTrigger=1
    # yields four distinct micro-batches.
    src = str(tmp_path / "events_split")
    batch = load_table(spark, SF_SMOKE, "events")
    batch.repartition(4).write.parquet(src)
    schema = batch.schema
    out, cp = str(tmp_path / "sink"), str(tmp_path / "cp")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("event_id", "event_type")
        )
        return (
            stream.writeStream.format("jsonl_sink")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    # Let at least one batch commit, then stop mid-run.
    deadline = time.time() + 60
    while not glob.glob(f"{out}/_commit_*.json") and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    n_first = len(glob.glob(f"{out}/_commit_*.json"))
    assert n_first >= 1, "no batch committed before the stop"

    # Restart from the same checkpoint; availableNow drains the rest.
    q2 = start()
    q2.awaitTermination(120)

    rows = []
    for mf in sorted(glob.glob(f"{out}/_commit_*.json")):
        m = jsonlib.load(open(mf))
        for fname in m["files"]:
            with open(fname) as f:
                rows.extend(jsonlib.loads(line) for line in f)
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)), "restart re-delivered a committed batch"
    assert set(ids) == {
        r.event_id for r in batch.select("event_id").collect()
    }, "handoff lost events"


def test_stream_static_broadcast_join(spark):
    """T8: the stream-static enrichment over the full replay must
    equal the batch left join, and the static dim side must ride a
    broadcast (no per-batch shuffle of the dim)."""
    from miningfrequentpattern_spark.streaming.windows import (
        enrich_events_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    cust = load_table(spark, SF_SMOKE, "customer")
    enriched = enrich_events_stream(stream, cust)
    _run_to_memory(enriched, "enriched", "append")
    got = {
        (r.event_id, r.c_mktsegment)
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.event_id, r.c_mktsegment)
        for r in ev.join(
            cust, ev["user_id"] == cust["c_custkey"], "left"
        )
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert got == want


def test_stream_sink_vacuums_own_orphans_only(spark, tmp_path):
    """Commit-time vacuum, both halves of the contract: staged files in
    THIS writer's subdir that no manifest references (superseded
    attempt / staging-time crash) are deleted by its next commit and
    manifested files survive — while another writer's mid-epoch staged
    files are NEVER touched (the multi-writer data-loss hazard a
    path-global vacuum would create)."""
    import json as jsonlib
    import os

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamWriter,
        _FileCommitMessage,
    )

    out = str(tmp_path / "sink")
    w = JsonlStreamWriter(out)
    own = os.path.join(out, "_staging", w.writer_id)
    os.makedirs(own)
    committed = os.path.join(own, "part-real.jsonl")
    orphan = os.path.join(own, "part-superseded-attempt.jsonl")
    for f in (committed, orphan):
        with open(f, "w") as fh:
            fh.write('{"event_id": 1}\n')
    foreign = os.path.join(out, "_staging", "otherwriter")
    os.makedirs(foreign)
    foreign_file = os.path.join(foreign, "part-inflight.jsonl")
    with open(foreign_file, "w") as fh:
        fh.write('{"event_id": 2}\n')

    w.commit([_FileCommitMessage(file=committed, n_rows=1)], batchId=0)

    manifest = jsonlib.load(
        open(os.path.join(out, "_commit_default_0.json"))
    )
    assert manifest["files"] == [committed]
    assert os.path.exists(committed), "manifested file must survive"
    assert not os.path.exists(orphan), "own orphan not vacuumed"
    assert os.path.exists(foreign_file), (
        "another writer's mid-epoch staged file was deleted"
    )


def test_stream_sink_staging_bounded_after_run(spark, tmp_path):
    """End-to-end: after a full availableNow run, _staging holds
    nothing beyond manifest-referenced files."""
    import glob
    import json as jsonlib
    import os

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamSink,
    )

    spark.dataSource.register(JsonlStreamSink)
    out = str(tmp_path / "sink")
    stream = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "event_type"
    )
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    manifested = set()
    for mf in glob.glob(f"{out}/_commit_*.json"):
        manifested.update(jsonlib.load(open(mf))["files"])
    assert manifested and all(os.path.exists(f) for f in manifested)
    staged = set(glob.glob(os.path.join(out, "_staging", "*", "*")))
    assert staged <= manifested


def test_stream_observed_metrics(spark):
    """functions/telemetry.observed in STREAMING form: the same
    observe() expressions surface per-micro-batch on
    StreamingQueryProgress.observedMetrics — summed over the
    availableNow replay they must equal the batch aggregate over the
    whole fixture (in-flight quality counters without a second
    query, the streaming twin of the batch test in test_smoke)."""
    from miningfrequentpattern_spark.functions.telemetry import observed

    stream = read_events_stream(spark, SF_SMOKE)
    inst, _obs = observed(
        stream,
        "stream_gate",
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("event_type") == "purchase").alias(
            "n_purchases"
        ),
    )
    q = _run_to_memory(
        inst.groupBy("event_type").count(), "obs_sink", "complete"
    )
    total_rows = 0
    total_purch = 0
    for prog in q.recentProgress:
        om = prog["observedMetrics"].get("stream_gate")
        if om:
            total_rows += om["n_rows"]
            total_purch += om["n_purchases"]
    batch = load_table(spark, SF_SMOKE, "events")
    want = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("event_type") == "purchase").alias("p"),
    ).collect()[0]
    assert total_rows == want["n"], (total_rows, want["n"])
    assert total_purch == want["p"], (total_purch, want["p"])


def test_stream_cdc_snapshot_equals_batch_apply(spark):
    """Streaming last-writer-wins == batch cdc_apply over the full
    replay: every non-deleted user matches the batch snapshot's
    (ts, event_id, type); deleted users appear ONLY as tombstones
    (is_deleted=true), mirroring the batch operator's absence."""
    from miningfrequentpattern_spark.operators.relational import cdc_apply
    from miningfrequentpattern_spark.streaming.stateful import (
        cdc_snapshot_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(cdc_snapshot_stream(stream), "cdc_snap")
    # update mode: the LAST emitted row per user is the final state —
    # order within the memory sink follows emission order, so take
    # the max-seq row per user.
    emitted = {}
    for r in spark.sql("SELECT * FROM cdc_snap").collect():
        cur = emitted.get(r.user_id)
        if cur is None or (r.last_ts_us, r.last_event_id) > (
            cur.last_ts_us,
            cur.last_event_id,
        ):
            emitted[r.user_id] = r
    batch = load_table(spark, SF_SMOKE, "events").withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    want = {
        r["user_id"]: (r["ts"], r["event_id"], r["event_type"])
        for r in cdc_apply(
            batch, ["user_id"], ["ts", "event_id"], "op"
        ).collect()
    }
    assert emitted, "stream emitted nothing"
    live = {u: r for u, r in emitted.items() if not r.is_deleted}
    assert set(live) == set(want)
    for u, r in live.items():
        ts, eid, et = want[u]
        assert r.last_event_id == eid and r.last_type == et, u
        assert r.last_ts_us == int(ts.timestamp() * 1_000_000), u
    # every user in the feed is accounted for: live snapshot or
    # tombstone
    n_users = load_table(spark, SF_SMOKE, "events").filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    ).select("user_id").distinct().count()
    assert len(emitted) == n_users


def test_stream_cusum_equals_batch(spark):
    """Streaming CUSUM over the full replay == the batch closed-form
    operator (r58) row for row: same (type, ts) keys, same cusum to
    1e-9, same drifted flags — certifying that (P_last, runmin_last)
    is exactly the sufficient statistic of the closed form across
    micro-batch splits."""
    from miningfrequentpattern_spark.operators.timeseries import (
        cusum_drift,
    )
    from miningfrequentpattern_spark.streaming.stateful import (
        cusum_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(
        cusum_stream(stream, target=10.0, threshold=25.0), "cusum_s"
    )
    got = {
        (r.event_type, r.ts_us): (r.cusum, r.drifted)
        for r in spark.sql("SELECT * FROM cusum_s").collect()
    }
    batch = load_table(spark, SF_SMOKE, "events")
    want_rows = cusum_drift(
        batch, ["event_type"], "ts", "value", target=10.0, threshold=25.0
    ).collect()
    assert len(got) == len(want_rows) > 0
    for r in want_rows:
        ts_us = int(r["ts"].timestamp() * 1_000_000)
        g_cusum, g_drift = got[(r["event_type"], ts_us)]
        assert abs(g_cusum - r["cusum"]) < 1e-9, (r["event_type"], ts_us)
        assert g_drift == r["drifted"]


def test_stream_cusum_split_independent():
    """The (P, runmin) state is the exact sufficient statistic: any
    in-order split of the same rows into micro-batches emits
    identical cusum values. Exercised directly through the update
    function with a fake GroupState (availableNow replays of one
    parquet file run as a single batch, so the streaming test above
    can't see splits)."""
    import pandas as pd

    from miningfrequentpattern_spark.streaming.stateful import (
        _make_cusum_update,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    ts = pd.date_range("2024-01-01", periods=12, freq="h")
    vals = [12.0, 8.0, 15.0, 30.0, 2.0, 11.0, 40.0, 41.0, 9.0, 10.0, 50.0, 1.0]
    full = pd.DataFrame({"ts": ts, "value": vals})

    def run(splits):
        fn = _make_cusum_update(10.0, 0.0, 25.0)
        st = FakeState()
        out = []
        for lo, hi in splits:
            out.extend(
                pd.concat(list(fn(("t",), iter([full.iloc[lo:hi]]), st)))[
                    "cusum"
                ].tolist()
            )
        return out, st._v

    one, st_one = run([(0, 12)])
    many, st_many = run([(0, 3), (3, 4), (4, 9), (9, 12)])
    assert one == many
    assert st_one == st_many


def test_stream_heavy_hitters_guarantee_vs_batch(spark):
    """Misra–Gries guarantees over the full replay, checked against
    exact batch counts per event type: (1) every user with true
    frequency > n/(k+1) appears in the final summary; (2) every
    estimate is an UNDER-count within n/(k+1) of truth. Estimates
    are approximate by design (no value-hash oracle — the bound IS
    the contract)."""
    from miningfrequentpattern_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    k = 8
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(heavy_hitters_stream(stream, k=k), "hh")
    # update mode: the LAST emission per key is the final summary —
    # n_seen strictly grows, so keep rows carrying the max n_seen.
    rows = spark.sql("SELECT * FROM hh").collect()
    last_n = {}
    for r in rows:
        last_n[r.event_type] = max(last_n.get(r.event_type, 0), r.n_seen)
    summ = {
        (r.event_type, r.user_id): r.est_count
        for r in rows
        if r.n_seen == last_n[r.event_type]
    }
    batch = load_table(spark, SF_SMOKE, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    true = {
        (r["event_type"], r["user_id"]): r["c"]
        for r in batch.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    totals = {}
    for (et, _), c in true.items():
        totals[et] = totals.get(et, 0) + c
    assert summ, "stream emitted nothing"
    for et, n in totals.items():
        assert last_n[et] == n, (et, last_n.get(et), n)
        bound = n / (k + 1)
        for (tet, u), c in true.items():
            if tet != et:
                continue
            if c > bound:
                assert (et, u) in summ, (et, u, c, bound)
        for (tet, u), est in summ.items():
            if tet != et:
                continue
            assert est <= true[(et, u)], (et, u)
            assert est >= true[(et, u)] - bound, (et, u)


def test_stream_heavy_hitters_exact_when_under_k(spark):
    """A key with ≤ k distinct contributors never compacts: the
    summary IS the exact count table. Driven through the update
    function with a fake state over explicit splits."""
    import pandas as pd

    from miningfrequentpattern_spark.streaming.stateful import (
        _make_hh_update,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    users = [1, 2, 1, 3, 2, 1, 3, 3, 3]
    fn = _make_hh_update(8)
    st = FakeState()
    out = None
    for lo, hi in [(0, 4), (4, 9)]:
        for pdf in fn(
            ("t",), iter([pd.DataFrame({"user_id": users[lo:hi]})]), st
        ):
            out = pdf
    got = dict(zip(out["user_id"], out["est_count"]))
    assert got == {1: 3, 2: 2, 3: 4}
    assert set(out["n_seen"]) == {9}


def test_stream_running_moments_equals_batch(spark):
    """The (n, mean, M2) state over the full replay == batch
    avg/stddev_pop per type to fp-merge tolerance — and, being
    order-insensitive (unlike the CUSUM recurrence), needs no
    ordering contract: any split converges to the same moments.
    Split-independence exercised directly through the update
    function below."""
    import pandas as pd

    from miningfrequentpattern_spark.streaming.stateful import (
        _update_running_moments,
        running_moments_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(running_moments_stream(stream), "moments")
    rows = spark.sql("SELECT * FROM moments").collect()
    last_n = {}
    for r in rows:
        last_n[r.event_type] = max(last_n.get(r.event_type, 0), r.n)
    got = {
        r.event_type: (r.n, r.mean, r.std_pop)
        for r in rows
        if r.n == last_n[r.event_type]
    }
    want = {
        r["event_type"]: (r["n"], r["mu"], r["sd"])
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mu"),
            F.stddev_pop("value").alias("sd"),
        )
        .collect()
    }
    assert set(got) == set(want) and got
    for et, (n, mu, sd) in got.items():
        wn, wmu, wsd = want[et]
        assert n == wn
        assert abs(mu - wmu) < 1e-9 and abs(sd - wsd) < 1e-9

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]

    def run(splits):
        st = FakeState()
        out = None
        for lo, hi in splits:
            for pdf in _update_running_moments(
                ("t",),
                iter([pd.DataFrame({"value": vals[lo:hi]})]),
                st,
            ):
                out = pdf
        return out.iloc[0]

    one = run([(0, 8)])
    many = run([(0, 1), (1, 5), (5, 8)])
    assert one["n"] == many["n"] == 8
    assert abs(one["mean"] - many["mean"]) < 1e-12
    assert abs(one["std_pop"] - many["std_pop"]) < 1e-12


def test_stream_holt_equals_batch_from_second_row(spark):
    """Streaming Holt over the full replay == the staged r82 batch
    operator (holt_linear) bitwise from each key's SECOND row onward;
    the first row's trend is the ONE documented deviation (the batch
    op backfills trend_1 = x_2 − x_1 retroactively, which a true
    stream cannot know at row-1 emission time — it emits NULL and
    never re-emits), while its LEVEL (= x_1) matches exactly."""
    from miningfrequentpattern_spark.operators.timeseries import (
        holt_linear,
    )
    from miningfrequentpattern_spark.streaming.stateful import holt_stream

    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(holt_stream(stream, alpha=0.2, beta=0.3), "holt_s")
    got = {
        (r.event_type, r.ts_us): (r.level, r.trend)
        for r in spark.sql("SELECT * FROM holt_s").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "ts", "value")
    )
    want = holt_linear(
        batch, ["event_type"], "ts", "value",
        alpha=0.2, beta=0.3, tiebreak_col="value",
    ).collect()
    assert len(got) == len(want) > 0
    firsts = {}
    for r in want:
        ts_us = int(r["ts"].timestamp() * 1_000_000)
        k = (r["event_type"], ts_us)
        firsts.setdefault(r["event_type"], []).append((ts_us, r))
    for etype, rows in firsts.items():
        rows.sort(key=lambda p: p[0])
        first_ts = rows[0][0]
        for ts_us, r in rows:
            g_level, g_trend = got[(r["event_type"], ts_us)]
            assert abs(g_level - r["level"]) < 1e-9, (etype, ts_us)
            if ts_us == first_ts:
                assert g_trend is None  # the documented deviation
            else:
                assert abs(g_trend - r["trend"]) < 1e-9, (etype, ts_us)


def test_stream_holt_split_independent():
    """(level, trend, n, x0) is the recurrence's exact sufficient
    statistic: any in-order micro-batch split — including one that
    separates the two INIT observations — emits identical levels and
    trends. Driven directly through the update function with a fake
    GroupState (the cusum-split harness)."""
    import pandas as pd

    from miningfrequentpattern_spark.streaming.stateful import (
        _make_holt_update,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    ts = pd.date_range("2024-01-01", periods=10, freq="h")
    vals = [10.0, 20.0, 40.0, 35.0, 5.0, 60.0, 61.0, 2.0, 33.0, 34.0]
    full = pd.DataFrame({"ts": ts, "value": vals})

    def run(splits):
        fn = _make_holt_update(0.5, 0.5)
        st = FakeState()
        levels, trends = [], []
        for lo, hi in splits:
            for out in fn(("t",), iter([full.iloc[lo:hi]]), st):
                levels.extend(out["level"].tolist())
                trends.extend(
                    [None if pd.isna(v) else float(v)
                     for v in out["trend"]]
                )
        return levels, trends, st._v

    one = run([(0, 10)])
    # split between the init pair (0,1 | 1,2) and at arbitrary points
    many = run([(0, 1), (1, 3), (3, 7), (7, 10)])
    assert one == many
    # hand anchor (α=β=0.5, x=[10,20,40]): levels 10, 20, 35
    assert one[0][:3] == [10.0, 20.0, 35.0]
    assert one[1][0] is None and one[1][1] == 10.0 and one[1][2] == 12.5


def test_stream_cusum_multi_chunk_out_of_order_batch(spark, tmp_path):
    """Cross-chunk regression (code-review r8): a micro-batch larger
    than the Arrow chunk cap arrives as multiple unordered chunks;
    the recurrence must buffer and sort the WHOLE group or the
    (p, runmin) state folds out of time order."""
    from miningfrequentpattern_spark.operators.timeseries import cusum_drift
    from miningfrequentpattern_spark.streaming.stateful import cusum_stream

    rows = [
        ("a", f"2024-01-01 00:0{m}:00", float(v))
        for m, v in [(5, 30.0), (4, 5.0), (3, 25.0), (2, 2.0), (1, 20.0), (0, 1.0)]
    ]
    batch = spark.createDataFrame(
        rows, "event_type string, d string, value double"
    ).select("event_type", F.to_timestamp("d").alias("ts"), "value")
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(f"{src}/f000")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(batch.schema).parquet(f"{src}/f*")
        _run_to_memory(
            cusum_stream(stream, target=10.0, threshold=25.0),
            "cusum_chunk",
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {
        r["ts_us"]: (round(r["cusum"], 6), r["drifted"])
        for r in spark.sql("SELECT * FROM cusum_chunk").collect()
    }
    want = {
        int(r["ts"].timestamp() * 1_000_000): (
            round(r["cusum"], 6), r["drifted"]
        )
        for r in cusum_drift(
            batch, ["event_type"], "ts", "value",
            target=10.0, threshold=25.0,
        ).collect()
    }
    assert got == want


def test_stream_holt_multi_chunk_out_of_order_batch(spark, tmp_path):
    """Same cross-chunk fixture for Holt: per-chunk sorting could
    seed the (n, x0) init handshake from a late chunk delivered
    first, diverging every later level/trend from holt_linear."""
    from miningfrequentpattern_spark.operators.timeseries import holt_linear
    from miningfrequentpattern_spark.streaming.stateful import holt_stream

    rows = [
        ("a", f"2024-01-01 00:0{m}:00", float(v))
        for m, v in [(5, 13.0), (4, 8.0), (3, 21.0), (2, 5.0), (1, 12.0), (0, 10.0)]
    ]
    batch = spark.createDataFrame(
        rows, "event_type string, d string, value double"
    ).select("event_type", F.to_timestamp("d").alias("ts"), "value")
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(f"{src}/f000")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(batch.schema).parquet(f"{src}/f*")
        _run_to_memory(
            holt_stream(stream, alpha=0.2, beta=0.3), "holt_chunk"
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {
        r["ts_us"]: (round(r["level"], 9),
                     None if r["trend"] is None else round(r["trend"], 9))
        for r in spark.sql("SELECT * FROM holt_chunk").collect()
    }
    want_rows = holt_linear(
        batch, ["event_type"], "ts", "value",
        alpha=0.2, beta=0.3, tiebreak_col="value",
    ).orderBy("ts").collect()
    # the documented deviation: the streamed FIRST row's trend is NULL
    first_us = int(want_rows[0]["ts"].timestamp() * 1_000_000)
    for r in want_rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        lvl, tr = got[us]
        assert lvl == round(r["level"], 9), (us, lvl, r["level"])
        if us == first_us:
            assert tr is None
        else:
            assert tr == round(r["trend"], 9), (us, tr, r["trend"])


def test_stream_heavy_hitters_empty_summary_tombstone(spark, tmp_path):
    """k+1 equal-count users empty the Misra-Gries summary; the batch
    must emit a NULL-user tombstone carrying the fresh n_seen, never
    silently nothing (the previous snapshot would masquerade as
    current)."""
    from miningfrequentpattern_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    rows = [("a", f"2024-01-01 00:00:0{i}", i) for i in range(5)]
    batch = spark.createDataFrame(
        rows, "event_type string, d string, user_id long"
    ).select("event_type", F.to_timestamp("d").alias("ts"), "user_id")
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(f"{src}/f000")
    stream = spark.readStream.schema(batch.schema).parquet(f"{src}/f*")
    _run_to_memory(heavy_hitters_stream(stream, k=4), "hh_tomb")
    rows_out = spark.sql("SELECT * FROM hh_tomb").collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["user_id"] is None and r["est_count"] == 0 and r["n_seen"] == 5


def test_jsonl_sink_nested_struct_serializes_as_json(spark, tmp_path):
    """A nested struct column must land as a JSON OBJECT in the sink
    file — non-recursive asDict left it a Row whose repr was dumped
    as a string (code-review r8)."""
    import json as jsonlib

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamSink,
    )

    spark.dataSource.register(JsonlStreamSink)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, ("img", 42))],
        "doc_id long, meta struct<kind string, n bigint>",
    ).coalesce(1).write.parquet(f"{src}/f000")
    stream = (
        spark.readStream.schema("doc_id long, meta struct<kind string, n bigint>")
        .parquet(f"{src}/f*")
    )
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import glob

    rows = []
    manifests = sorted(glob.glob(f"{out}/_commit_*.json"))
    assert manifests, "no batch committed"
    for mf in manifests:
        m = jsonlib.load(open(mf))
        for fpath in m["files"]:
            with open(fpath) as f:
                rows.extend(jsonlib.loads(line) for line in f)
    assert rows == [{"doc_id": 1, "meta": {"kind": "img", "n": 42}}]


def test_session_window_exact_gap_merges(spark):
    """Boundary pin (code-review r8, probed on 4.1.2): an event
    arriving EXACTLY gap after the previous one MERGES into the
    session — the t03 oracle therefore splits on strict `>` only.
    Guards the batch session_counts path against both a Spark
    semantics change and an oracle regression to `>=`."""
    from miningfrequentpattern_spark.streaming.windows import (
        session_counts,
    )

    rows = [
        (1, "2024-01-01 12:00:00", 1),
        (1, "2024-01-01 12:30:00", 2),   # exactly 30 min -> merges
        (1, "2024-01-01 13:00:01", 3),   # 30:01 after -> new session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_id long"
    ).select("user_id", F.to_timestamp("d").alias("ts"), "event_id")
    got = sorted(
        r["n_events"]
        for r in session_counts(df, "30 minutes").collect()
    )
    assert got == [1, 2]


def test_holt_stream_rejects_out_of_domain_params(spark):
    """The stream validates alpha/beta exactly like its batch twin
    holt_linear (code-review r9: the stream silently ran parameters
    the batch side refuses, so 'batch parity' could not hold)."""
    import pytest

    from miningfrequentpattern_spark.streaming.stateful import holt_stream

    for bad in ({"alpha": 0.0}, {"alpha": 1.5}, {"beta": 0.0},
                {"beta": -0.1}):
        with pytest.raises(ValueError, match="alpha|beta"):
            holt_stream(None, **bad)


def test_stream_sink_binary_columns_base64_not_repr(spark, tmp_path):
    """code-review r10: a BINARY column must land as base64 in the
    jsonl output, not json.dumps's default=str Python repr
    ("bytearray(b'...')") — the same defect class as the r8 Row-repr
    fix, one type further down."""
    import base64
    import glob
    import json as jsonlib

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamSink,
        SyntheticTxnDataSource,
    )

    spark.dataSource.register(SyntheticTxnDataSource)
    spark.dataSource.register(JsonlStreamSink)
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.format("synthetic_txns")
        .option("rowsperbatch", "8")
        .load()
        .select(
            "txn_id",
            F.encode(F.col("item"), "utf-8").alias("payload"),
        )
    )
    (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    rows = []
    for mf in sorted(glob.glob(f"{out}/_commit_*.json")):
        for fpath in jsonlib.load(open(mf))["files"]:
            with open(fpath) as fh:
                rows += [jsonlib.loads(line) for line in fh]
    assert rows, "sink wrote nothing"
    for r in rows:
        decoded = base64.b64decode(r["payload"]).decode("utf-8")
        assert decoded == f"item{(r['txn_id'] * 7919) % 100}", r
        assert "bytearray" not in r["payload"]


def test_stream_sink_name_scopes_manifests(spark, tmp_path):
    """code-review r10 (multi-writer data loss): two writers sharing
    a sink path collide on batch ids unless their manifests are
    name-scoped — writer B's batch-0 commit must not clobber writer
    A's batch-0 manifest, or A's committed files become unreferenced
    and A's own next vacuum deletes them."""
    import json as jsonlib
    import os

    from miningfrequentpattern_spark.sources.pydatasource import (
        JsonlStreamWriter,
        _FileCommitMessage,
    )

    out = str(tmp_path / "sink")
    a = JsonlStreamWriter(out, "live")
    b = JsonlStreamWriter(out, "backfill")
    files = {}
    for w, tag in ((a, "a"), (b, "b")):
        staging = os.path.join(out, "_staging", w.writer_id)
        os.makedirs(staging)
        f = os.path.join(staging, f"part-{tag}.jsonl")
        with open(f, "w") as fh:
            fh.write('{"x": 1}\n')
        files[tag] = f
    a.commit([_FileCommitMessage(file=files["a"], n_rows=1)], batchId=0)
    b.commit([_FileCommitMessage(file=files["b"], n_rows=1)], batchId=0)
    # both manifests exist independently; neither clobbered the other
    ma = jsonlib.load(open(os.path.join(out, "_commit_live_0.json")))
    mb = jsonlib.load(open(os.path.join(out, "_commit_backfill_0.json")))
    assert ma["files"] == [files["a"]] and mb["files"] == [files["b"]]
    # and B's commit-time vacuum did NOT delete A's committed file
    assert os.path.exists(files["a"]) and os.path.exists(files["b"])
    # a restart of the SAME query (same name, re-delivered epoch)
    # still overwrites its own manifest — exactly-once preserved
    a2 = JsonlStreamWriter(out, "live")
    staging2 = os.path.join(out, "_staging", a2.writer_id)
    os.makedirs(staging2)
    f2 = os.path.join(staging2, "part-a2.jsonl")
    with open(f2, "w") as fh:
        fh.write('{"x": 2}\n')
    a2.commit([_FileCommitMessage(file=f2, n_rows=1)], batchId=0)
    ma2 = jsonlib.load(open(os.path.join(out, "_commit_live_0.json")))
    assert ma2["files"] == [f2]


def test_synthetic_txns_rejects_nonpositive_sizing(spark):
    """code-review r10: rowsperbatch=0 spins forever with zero
    progress; negative partitions silently yields an empty source.
    Both fail eagerly with the option named."""
    import pytest

    from miningfrequentpattern_spark.sources.pydatasource import (
        SyntheticTxnReader,
        SyntheticTxnStreamReader,
    )

    with pytest.raises(ValueError, match="rowsperbatch"):
        SyntheticTxnStreamReader({"rowsperbatch": "0"})
    with pytest.raises(ValueError, match="partitions"):
        SyntheticTxnReader({"partitions": "-1"})
    with pytest.raises(ValueError, match="rowsperpartition"):
        SyntheticTxnReader({"rowsperpartition": "0"})
