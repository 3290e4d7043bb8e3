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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticTxnDataSource(DataSource):
    """`spark.read.format("synthetic_txns")` — options:
    partitions (default 4), rowsperpartition (default 1000)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_txns"

    def schema(self) -> str:
        return "txn_id BIGINT, item STRING"

    def reader(self, schema) -> "SyntheticTxnReader":  # noqa: ANN001
        return SyntheticTxnReader(self.options)


class SyntheticTxnReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # Option keys arrive lowercased from the reader API.
        self.n_partitions = int(options.get("partitions", 4))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * self.rows_per_partition
        for i in range(self.rows_per_partition):
            txn_id = base + i
            yield txn_id, f"item{(txn_id * 7919) % 100}"
