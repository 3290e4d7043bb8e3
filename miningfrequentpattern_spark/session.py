"""SparkSession construction and per-session config hardening.

The driver harness passes its own SparkSession into ``entry``/
``queries()``; we therefore split config into two tiers:

- build-time config (only honored at session construction):
  master, shuffle partitions, memory — applied in :func:`get_session`
  for tests and bench runs;
- runtime-settable config (safe to set on any live session):
  session timezone, Arrow, AQE — applied by :func:`harden` which every
  query entry point calls so oracle parity holds even on a session we
  did not build.

Scale posture: `spark.sql.shuffle.partitions` is sized for local[32]
here; on a 1000-executor cluster it should be left to AQE coalescing
(`spark.sql.adaptive.coalescePartitions.enabled`, on by default) with
an `initialPartitionNum` in the thousands. Nothing in the engine
assumes a partition count.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

def _local_parallelism() -> int:
    """Shuffle-partition count for LOCAL runs: $SPARK_GRAFT_CPUS
    (the driver's core-count knob), floored at 8 so tiny-core smoke
    runs keep some parallelism headroom; 32 when unset/garbage."""
    try:
        return max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8)
    except ValueError:
        return 32


# Config that can be flipped on a running session (verified runtime-settable
# in PySpark 4.1.2). Everything oracle parity depends on lives here.
RUNTIME_CONF: dict[str, str] = {
    # Timestamp parity with DuckDB: both engines must render instants in UTC.
    "spark.sql.session.timeZone": "UTC",
    # Arrow-accelerated toPandas()/pandas UDFs (SNIPPETS.md:78 pattern).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime shuffle-partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # ANSI off: TPC-H-ish queries rely on permissive casts; DuckDB oracle
    # comparisons are done on rounded values so overflow semantics never bite.
    "spark.sql.ansi.enabled": "false",
    # Spark's parquet reader cannot represent TIMESTAMP(NANOS) (events.ts
    # is timestamp[ns], FIXTURES.md): read as epoch-nanos LongType and let
    # sources/io.py convert to a microsecond timestamp (lossless on the
    # fixtures — verified zero sub-microsecond components).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Optimization r11 (guide §7.2 — read the plan): Catalyst's
    # InferFiltersFromGenerate copies the GENERATOR EXPRESSION into an
    # inferred `isnotnull AND size > 0` filter below each explode, so
    # an expensive generator (the 2–5-gram zip_with shingle chains)
    # evaluates 3× per row — once per conjunct in the pushed filter,
    # once in the Generate. The inferred filter is semantically
    # redundant (explode already skips NULL/empty arrays), so
    # excluding the rule cannot change results; measured interleaved
    # at sf0.1: l02 1.96→1.28 s, l02g 1.83→1.32 s, neutral elsewhere.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # Runtime-settable; pinned so an externally-built session (driver
    # default: 200) doesn't pay 200-task overhead on local shuffles.
    # Optimization r11: derived from $SPARK_GRAFT_CPUS instead of a
    # hard-coded 32 — the driver also benches at LOWER core counts,
    # where 32 shuffle partitions mean multiple task waves per
    # exchange for no benefit. Local parallelism tracks cores; at
    # cluster scale AQE coalescing governs the effective count (set
    # initialPartitionNum in the thousands there — module docstring).
    "spark.sql.shuffle.partitions": str(_local_parallelism()),
}

BUILD_CONF: dict[str, str] = {
    "spark.driver.memory": "24g",
    # Reliable-checkpoint files (operators/ckpt.py durable=True) are
    # reclaimed when their RDD is GC'd instead of accumulating until
    # the directory is deleted.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    # Broadcast anything under 64 MB — the fixture dims (region, nation,
    # supplier, part, customer) are all far below this at every SF we run;
    # at 100 TB the same threshold still correctly broadcasts true dims.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Djava.io.tmpdir=/tmp",
}


_SHIPPED_TO: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Python UDFs (mapInPandas etc.) are cloudpickled BY REFERENCE to
    this module's name; workers import it from their own sys.path,
    which does not inherit the driver's. Shipping a zip via addPyFile
    fixes that identically in local mode and on a real cluster —
    verified failure mode: driver process launched outside the repo
    root → ModuleNotFoundError on the worker.
    """
    import tempfile
    import zipfile
    from pathlib import Path

    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_TO:
        return
    pkg_dir = Path(__file__).resolve().parent
    zpath = Path(tempfile.gettempdir()) / f"mfp_spark_pkg_{os.getpid()}.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for py in sorted(pkg_dir.rglob("*.py")):
            z.write(py, py.relative_to(pkg_dir.parent))
    spark.sparkContext.addPyFile(str(zpath))
    _SHIPPED_TO.add(app_id)


_HARDENED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def harden(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable config to an externally-built session and
    ship this package to executor workers.

    Idempotent per session: the registry wrapper calls this on EVERY
    query invocation, and each conf.set is a py4j round-trip — ~8
    round-trips × hundreds of bench/test calls is pure overhead on
    the light queries (VERDICT r7 bisect candidate). Nothing in the
    repo mutates RUNTIME_CONF keys mid-session (grep-audited; the
    test/pack conf flips touch other keys and restore in finally), so
    one application per SESSION is sufficient and safe. The memo is
    keyed by the SparkSession object, not applicationId: SQLConf is
    per-session while applicationId is per-SparkContext, so a sibling
    spark.newSession() over the same context must be hardened again
    (timezone/nanosAsLong parity) rather than skipped. Package
    shipping keeps its own per-applicationId success memo inside
    _ship_package — a transient addPyFile failure is retried on the
    next call instead of being latched as done.
    """
    if spark not in _HARDENED_SESSIONS:
        for k, v in RUNTIME_CONF.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                # Some confs may be frozen by the host harness;
                # parity-critical ones (timezone, Arrow, AQE) are all
                # runtime-settable in 4.1.2.
                pass
        _HARDENED_SESSIONS.add(spark)
    try:
        _ship_package(spark)
    except Exception:
        # Shipping is best-effort; pure-DataFrame queries don't need it.
        pass
    return spark


def get_session(app_name: str = "mfp-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a hardened local session for tests/bench.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**BUILD_CONF, **RUNTIME_CONF}.items():
        builder = builder.config(k, v)
    return harden(builder.getOrCreate())


DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"
