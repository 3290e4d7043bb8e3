"""Custom Python Data Source (Spark 4 DataSource API, SURVEY.md §2.2
S-extensions): a partition-parallel synthetic transaction generator.

Demonstrates the batch reader surface end-to-end: `partitions()`
plans N independent splits, each executor generates its own rows from
the split index — no driver data path, no files. The row formula is
deterministic (txn_id * 7919 mod 100), so the source is
ORACLE-CHECKABLE: DuckDB regenerates the identical rows from
generate_series and the driver hash-compares the aggregates (s07).

At scale this is the pattern for reading any custom system Spark has
no connector for: options → partitions plan → per-partition iterator,
with Spark handling distribution, retries, and AQE downstream.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def _txn_rows(start: int, end: int) -> Iterator[tuple]:
    """The one deterministic row formula, shared by the batch reader,
    the stream reader, and its replay path — identical ids always
    yield identical rows, which is what makes exactly-once replay
    (readBetweenOffsets) and the DuckDB oracle both possible."""
    for txn_id in range(start, end):
        yield txn_id, f"item{(txn_id * 7919) % 100}"


class SyntheticTxnDataSource(DataSource):
    """`spark.read.format("synthetic_txns")` — options:
    partitions (default 4), rowsperpartition (default 1000);
    `spark.readStream.format("synthetic_txns")` — option
    rowsperbatch (default 500)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_txns"

    def schema(self) -> str:
        return "txn_id BIGINT, item STRING"

    def reader(self, schema) -> "SyntheticTxnReader":  # noqa: ANN001
        return SyntheticTxnReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticTxnStreamReader":  # noqa: ANN001
        return SyntheticTxnStreamReader(self.options)


class SyntheticTxnReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # Option keys arrive lowercased from the reader API.
        self.n_partitions = int(options.get("partitions", 4))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        # Fail eagerly with the option named (code-review r10, the
        # sample_frames stance): a non-positive value silently yields
        # an empty source instead of the sized feed the caller asked
        # for.
        for opt, v in (
            ("partitions", self.n_partitions),
            ("rowsperpartition", self.rows_per_partition),
        ):
            if v < 1:
                raise ValueError(
                    f"synthetic_txns: option {opt!r} must be >= 1, "
                    f"got {v}"
                )

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * self.rows_per_partition
        return _txn_rows(base, base + self.rows_per_partition)


class SyntheticTxnStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch leg of the custom source (Spark 4 streaming Python
    DataSource): the offset is simply the next txn_id to emit, so
    progress tracking, recovery, and replay are all integer
    arithmetic. `read` advances the offset by one batch;
    `readBetweenOffsets` re-derives any committed batch from its
    offset range — deterministic replay is what upgrades the source
    from at-least-once to exactly-once under checkpoint recovery.
    The simple-reader variant executes `read` on the driver (sized
    for control-plane-scale feeds); a partition-parallel
    `DataSourceStreamReader` is the upgrade path for data-plane
    volumes."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsperbatch", 500))
        # rowsperbatch=0 makes read() return the same offset forever —
        # micro-batches fire and commit with zero progress and no
        # error; a negative value REGRESSES the checkpointed offset so
        # recovery replays empty ranges. Name the misuse instead
        # (code-review r10).
        if self.rows_per_batch < 1:
            raise ValueError(
                f"synthetic_txns: option 'rowsperbatch' must be >= 1, "
                f"got {self.rows_per_batch}"
            )

    def initialOffset(self) -> dict:
        return {"next_txn": 0}

    # Both row-returning hooks materialize to lists: the simple-reader
    # protocol PICKLES the prefetched rows to ship them into the plan
    # (generators aren't picklable, and the batch is driver-sized by
    # contract anyway).
    def read(self, start: dict) -> tuple[list[tuple], dict]:
        s = int(start["next_txn"])
        e = s + self.rows_per_batch
        return list(_txn_rows(s, e)), {"next_txn": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return list(_txn_rows(int(start["next_txn"]), int(end["next_txn"])))


# ---------------------------------------------------------------------------
# Streaming SINK leg (DataSourceStreamWriter): transactional jsonl sink
# ---------------------------------------------------------------------------

@dataclass
class _FileCommitMessage(WriterCommitMessage):
    """Per-partition commit message: the staged file and its row count."""

    file: str
    n_rows: int


class JsonlStreamSink(DataSource):
    """`df.writeStream.format("jsonl_sink").option("path", dir)` — the
    WRITER leg of the Python DataSource API (Spark 4), completing the
    custom-connector story: executors stage one jsonl file per
    partition, and the driver-side `commit` publishes a per-batch
    manifest (`_commit_<batchId>.json`) listing exactly the staged
    files — readers that honor manifests get atomic-batch visibility,
    and `abort` removes staged files so failed epochs leave nothing
    visible. That staged-files-plus-manifest protocol is the same
    commit shape the parquet/Delta sinks use.

    Exactly-once on restart: manifests are named by (sink name,
    batchId), so a re-delivered epoch (crash between sink commit and
    checkpoint commit) OVERWRITES its manifest rather than adding one
    — readers following manifests see each batch's file set exactly
    once. The sink NAME comes from `.option("name", ...)` (default
    "default") and is the manifest namespace: it must be STABLE
    across restarts of the same query (restart = same name = correct
    re-delivery overwrite) and DISTINCT between queries sharing the
    sink path — two writers on one name collide on batch ids (both
    checkpoints restart at 0), each clobbering the other's manifests,
    after which the loser's committed files look unreferenced and its
    own next vacuum deletes them (code-review r10: data loss, found
    before any multi-writer deployment).
    Readers MUST follow manifests: listing `_staging` directly can
    observe files whose epoch never committed. Each writer instance
    stages under its own `_staging/<writer_id>/` subdir; files
    orphaned by a superseded commit attempt or by a driver crash
    between staging and commit are vacuumed by that writer's NEXT
    commit (each commit deletes ITS OWN subdir's files referenced by
    no manifest — safe because one writer's epochs are serialized,
    and scoped so a second writer sharing the sink path can never
    lose mid-epoch files to another's vacuum). `_staging` is thus
    bounded to referenced files plus at most one crashed epoch per
    writer restart; crashed instances' subdirs are swept offline.
    Verified by the stop/restart test in tests/test_streaming.py.

    Local-mode note: executors and driver share one filesystem here;
    on a real cluster `path` must be shared storage (object store /
    NFS) — which is exactly where this pattern is used in production
    for systems Spark has no native sink for."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def streamWriter(self, schema, overwrite):  # noqa: ANN001
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        return JsonlStreamWriter(path, self.options.get("name", "default"))


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str, sink_name: str = "default") -> None:
        import uuid as _uuid

        self.path = path
        # Manifest namespace (see class docstring): stable across
        # restarts of the same query, distinct between queries that
        # share the sink path.
        self.sink_name = sink_name
        # Per-writer-instance staging namespace: this writer stages
        # under _staging/<writer_id>/ and its vacuum scans ONLY that
        # subdir, so a second writer sharing the sink path (a backfill
        # beside a live stream) can never have its mid-epoch files
        # deleted by this writer's commit. Orphans left by a CRASHED
        # previous writer instance live in that instance's subdir and
        # are bounded (≤ one epoch per crash); sweep them offline by
        # deleting subdirs whose files no manifest references.
        self.writer_id = _uuid.uuid4().hex

    def write(self, iterator) -> _FileCommitMessage:  # noqa: ANN001
        """Executor-side: stage this partition's rows as one jsonl
        file. Staged files are invisible until commit manifests them."""
        import json as _json
        import os as _os
        import uuid as _uuid

        staging = _os.path.join(self.path, "_staging", self.writer_id)
        _os.makedirs(staging, exist_ok=True)
        fname = _os.path.join(staging, f"part-{_uuid.uuid4().hex}.jsonl")
        import base64 as _b64

        def _jsonable(v):  # noqa: ANN001
            # BINARY columns (media payloads, avro/proto blobs) are
            # bytearray here; default=str would emit the Python repr
            # "bytearray(b'...')" as the JSON value — undecodable
            # garbage with no error, the same defect class as the
            # r8 Row-repr fix one type further down (code-review
            # r10). Base64 is the JSON convention for bytes.
            if isinstance(v, (bytes, bytearray)):
                return _b64.b64encode(bytes(v)).decode("ascii")
            return str(v)

        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                # recursive=True: a nested struct column otherwise
                # stays a Row object and json.dumps's default= hook
                # emits its Python repr ("Row(a=1, ...)") instead of
                # a JSON object (code-review r8).
                f.write(
                    _json.dumps(
                        row.asDict(recursive=True), default=_jsonable
                    )
                    + "\n"
                )
                n += 1
        return _FileCommitMessage(file=fname, n_rows=n)

    def commit(self, messages, batchId) -> None:  # noqa: ANN001, N803
        """Driver-side, once per epoch: publish the manifest. A batch
        is visible iff its manifest exists — the atomicity boundary."""
        import json as _json
        import os as _os

        files = [m.file for m in messages if m is not None]
        manifest = {
            "batch_id": batchId,
            "files": files,
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        # Write-then-rename: rename is atomic on a POSIX filesystem,
        # so a reader can never observe a truncated manifest — the
        # property the visibility contract above depends on.
        final = _os.path.join(
            self.path, f"_commit_{self.sink_name}_{batchId}.json"
        )
        tmp = final + ".inprogress"
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        _os.replace(tmp, final)
        # Vacuum: drop staged files no manifest references — orphans
        # from a superseded attempt of a re-delivered epoch, or from a
        # driver crash between staging and commit. Scoped to THIS
        # writer instance's staging subdir: within one writer, epochs
        # are serialized, so nothing of its own can be mid-staging
        # here, and other writers' subdirs are never touched. Cost:
        # one manifest-directory read per epoch — O(batches) small
        # JSON files; at production epoch counts, roll manifests up or
        # track the referenced set incrementally.
        referenced: set[str] = set()
        for entry in _os.listdir(self.path):
            if entry.startswith("_commit_") and entry.endswith(".json"):
                try:
                    with open(_os.path.join(self.path, entry)) as mf:
                        referenced.update(_json.load(mf).get("files", []))
                except (OSError, ValueError):
                    continue
        staging = _os.path.join(self.path, "_staging", self.writer_id)
        if _os.path.isdir(staging):
            for fname in _os.listdir(staging):
                full = _os.path.join(staging, fname)
                if full not in referenced:
                    try:
                        _os.remove(full)
                    except OSError:
                        pass

    def abort(self, messages, batchId) -> None:  # noqa: ANN001, N803
        """Driver-side on epoch failure: drop staged files — nothing
        of the failed batch ever becomes visible."""
        import os as _os

        for m in messages or []:
            if m is not None and _os.path.exists(m.file):
                _os.remove(m.file)
