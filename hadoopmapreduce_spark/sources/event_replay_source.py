"""A Spark 4 STREAMING Python Data Source: deterministic replay of a
parquet table as a rate-limited micro-batch stream.

The batch half of the Python Data Source API is already covered by
``textkv_source.py``; this module exercises the STREAMING half
(``DataSourceStreamReader`` — the partition-planning variant, not the
driver-side ``SimpleDataSourceStreamReader``), which is the Spark-4-native
replacement for writing a custom ``Source`` in Scala: offsets, per-batch
partition planning, and executor-side reads, all in pure Python.

Semantics: the source exposes the file's rows in CHUNKS deterministic from
metadata alone — ``latestOffset`` advances one chunk per trigger, so a
``processAllAvailable()`` drain replays the table over ``ceil(rows/chunk)``
micro-batches; each batch is split into two ``InputPartition`` row ranges
so the executor-parallel path is exercised too.  Offsets are row counts
(JSON dict ``{"row": n}``), checkpointable like any streaming source.

Scale notes: row-range planning needs ONLY parquet footer metadata
(``num_rows`` — no data read on the driver).  Executors slice their range
via pyarrow.  At 100 TB the same shape maps chunk boundaries to row-group
or file boundaries so each task reads only its byte range — the contract
(local/NFS-visible paths, like textkv_source) and the slicing math are
unchanged; the fixture-scale implementation reads the column pair and
slices, which is the lightweight-source tier the API documents.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_CHUNKS = 4


@dataclass
class RowRangePartition(InputPartition):
    path: str
    lo: int
    hi: int


class EventReplayDataSource(DataSource):
    """``format("event_replay")`` — micro-batch replay of a parquet file."""

    @classmethod
    def name(cls) -> str:
        return "event_replay"

    def schema(self) -> str:
        return "event_type string, value double"

    def streamReader(self, schema) -> "EventReplayStreamReader":
        return EventReplayStreamReader(self.options)


class EventReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path or not os.path.exists(self.path):
            raise ValueError(f"event_replay: path not found: {self.path}")
        import pyarrow.parquet as pq

        # metadata-only: row count from the footer, no data read
        self.n_rows = pq.ParquetFile(self.path).metadata.num_rows
        chunks = int(options.get("chunks", DEFAULT_CHUNKS))
        self.chunk_rows = max(1, math.ceil(self.n_rows / max(1, chunks)))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # advance ONE chunk per trigger: the rate limit that turns a static
        # file into a multi-batch replay (processAllAvailable drains it)
        self._cursor = min(
            getattr(self, "_cursor", 0) + self.chunk_rows, self.n_rows
        )
        return {"row": self._cursor}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [RowRangePartition(self.path, lo, lo)]
        mid = (lo + hi) // 2
        # two row-range splits per batch: exercises parallel executor reads
        return [
            RowRangePartition(self.path, lo, mid),
            RowRangePartition(self.path, mid, hi),
        ]

    def read(self, partition: RowRangePartition):
        import pyarrow.parquet as pq

        if partition.hi <= partition.lo:
            return
        tbl = pq.read_table(
            partition.path, columns=["event_type", "value"]
        ).slice(partition.lo, partition.hi - partition.lo)
        # yield Arrow batches directly (same protocol as the batch textkv
        # reader): the data is already columnar — flattening to Python
        # tuples and back would be the only per-row work in the source
        yield from tbl.combine_chunks().to_batches()

    def commit(self, end: dict) -> None:
        pass
