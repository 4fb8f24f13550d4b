"""Python DataSource API sources (Spark 4 `pyspark.sql.datasource`).

The reference's table-function protocol separates a `bind` phase (returns
schema + bind data) from an `execute` phase (returns a batch stream), with the
function registered by name in the catalog
(reference: src/query_engine/src/function/table/table_function.rs:26-49,
read_csv.rs:18-210). Spark's Python DataSource API is the same contract made
cluster-parallel: `DataSource.schema()` is the bind phase,
`DataSourceReader.partitions()` declares the parallel split, and
`read(partition)` is the per-partition execute phase running on executors.

`kvgen` is a deterministic keyed-row generator (the moral equivalent of the
reference's ExpressionScan/DummyScan sources made partition-parallel): useful
as a test/benchmark source with no input files. Every value derives from the
key via md5, so any slice of the output is reproducible on any executor —
the property that matters when a 1000-task scan retries a partition.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


@dataclass
class _Range(InputPartition):
    start: int
    end: int  # exclusive


class KVGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.num_rows = int(options.get("numrows", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.num_buckets = int(options.get("numbuckets", 16))

    def partitions(self):  # the parallel split declared to the scheduler
        n, p = self.num_rows, max(1, self.num_partitions)
        step = (n + p - 1) // p
        return [_Range(i, min(i + step, n)) for i in range(0, n, step)]

    def read(self, partition: _Range):
        # executes on the executor; deterministic per key → safe retries
        for key in range(partition.start, partition.end):
            digest = hashlib.md5(f"k{key}".encode()).hexdigest()
            yield (key, key % self.num_buckets, digest[:12])


class KVGenDataSource(DataSource):
    """spark.read.format("kvgen").option("numRows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "kvgen"

    def schema(self) -> str:  # bind phase: fixed schema, options validated here
        int(self.options.get("numrows", 1000))
        return "key bigint, bucket int, value string"

    def reader(self, schema) -> KVGenReader:
        return KVGenReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    """Register all Python DataSources on the session (idempotent)."""
    spark.dataSource.register(KVGenDataSource)


def expected_kv_value(key: int) -> str:
    """The oracle twin of KVGenReader.read's value derivation."""
    return hashlib.md5(f"k{key}".encode()).hexdigest()[:12]
