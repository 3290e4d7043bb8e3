"""File-layout maintenance (SCALING.md): small-file compaction.

At 100 TB the silent killer is not one big shuffle but millions of
tiny files — every scan task pays open/footer/codec setup, and the
driver pays listing. Streaming sinks and over-parallel writes both
produce them. `compact_parquet` rewrites a parquet directory into
~target-sized files, optionally range-clustered on sort columns so
downstream min/max skipping works (the lightweight cousin of the
z-order layout in functions/zorder.py — use z-order for multi-column
point lookups, range clustering for single-dimension scans).

Sizing uses the SOURCE's on-disk bytes (compressed), so the target is
a post-compression file size — the number that matters for scan-task
amortization.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of parquet data files under `path` (local walk; on
    an object store swap in the Hadoop FileSystem listing — same
    number, different API).

    Counts every non-hidden data file (not just `*.parquet` — engines
    like Hive write extensionless part files, and compressed size is
    what matters regardless of suffix), skipping `_SUCCESS`/metadata
    sidecars and dotfiles. Raises if no data files are found at all:
    `os.walk` yields nothing for non-local URIs (s3://, hdfs://), and
    silently returning 0 would make `compact_parquet` rewrite an
    arbitrarily large dataset into ONE partition — a single-task
    rewrite is strictly worse than failing fast.
    """
    total = 0
    found = False
    for root, dirs, files in os.walk(path):
        # Prune hidden/underscore DIRECTORIES too, in place: a
        # _temporary/ tree from a killed write (or _delta_log/,
        # .hive-staging*/) holds part files whose NAMES pass the file
        # filter — counting them sizes uncommitted data and makes
        # compact_parquet plan ~2x the intended files (code-review r8).
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.startswith((".", "_")):
                continue
            found = True
            total += os.path.getsize(os.path.join(root, f))
    if not found:
        raise FileNotFoundError(
            f"no data files found under {path!r} via local walk — "
            "either the directory is empty, or this is a non-local URI "
            "(s3://, hdfs://): size those with the Hadoop FileSystem "
            "listing instead of os.walk"
        )
    return total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite `src_dir` into `dst_dir` as ~`target_file_bytes` files;
    returns the PLANNED partition count — an upper bound on files
    actually written (repartitionByRange samples boundaries, and a
    low-cardinality or skewed sort key can leave some partitions
    empty; empty partitions write no part files).

    Shape: ONE repartition exchange sized from the source's real
    on-disk bytes (never a fixed constant — the round-trip that makes
    compaction self-tuning), then a parallel write. With `sort_cols`
    the exchange is `repartitionByRange`, which both compacts AND
    range-clusters: each output file covers a disjoint key range, so
    parquet min/max stats prune whole files for range predicates.
    """
    n_files = max(1, math.ceil(dir_parquet_bytes(src_dir) / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst_dir)
    return n_files
