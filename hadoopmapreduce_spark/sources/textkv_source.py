"""A Spark 4 Python Data Source for the reference's text-KV line format.

The reference's entire I/O surface is Hadoop ``TextInputFormat`` /
``TextOutputFormat`` lines of ``[k1, k2]\\tvalue`` (``ClickThru.java:166,
186-187``).  ``sources/sinks.py:write_textkv`` writes that shape; this module
makes it a first-class *readable* format via the Python Data Source API
(``pyspark.sql.datasource``), so ``spark.read.format("textkv").load(dir)``
round-trips the reference's files like any built-in source:

* one ``InputPartition`` per part-file → reads parallelize across the
  cluster exactly like Hadoop's file splits (a directory written by N tasks
  is read by N tasks);
* the reader yields plain (key, value) string tuples; all typed parsing
  stays in DataFrame expressions on top, where Catalyst can prune/push.

This is the Spark-4-native replacement for writing a Hadoop InputFormat in
Java — pure Python, Arrow-batched by the runtime.

CONTRACT — local/shared filesystem paths only: partition planning uses
``os``/``glob`` on the driver and ``open()`` on the executors, so the path
must be visible to both via a POSIX mount (local disk, NFS, FUSE-mounted
object store).  ``hdfs://``/``s3://`` URIs are NOT resolved — reading those
schemes needs the JVM Hadoop filesystem, i.e. the built-in ``spark.read
.text`` + ``F.split`` path, which is also the right production choice when
the bytes live in an object store.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class TextKVDataSource(DataSource):
    """``format("textkv")`` — directory of ``key\\tvalue`` lines."""

    @classmethod
    def name(cls) -> str:
        return "textkv"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> "TextKVReader":
        return TextKVReader(self.options)


class TextKVReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("textkv source requires a path")
        self.path = path

    def partitions(self) -> list[InputPartition]:
        # File-granular splits, like TextInputFormat's per-file splits.
        # Deterministic order; empty part-files are fine (yield nothing).
        if os.path.isdir(self.path):
            files = sorted(
                f
                for f in glob.glob(os.path.join(self.path, "*"))
                if os.path.basename(f).startswith("part-")
            )
        else:
            files = [self.path]
        if not files:
            raise FileNotFoundError(f"no part-files under {self.path!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, _tab, value = line.partition("\t")
                yield (key, value)


def register_textkv(spark) -> None:
    """Idempotent per-session registration of the textkv format."""
    spark.dataSource.register(TextKVDataSource)
