"""Write-path sinks.

The reference's only sink is collect-to-Vec (executor/mod.rs:58-64 try_collect);
a usable engine needs durable outputs. Everything here is the standard Spark
writer surface with the two decisions that matter at 100 TB made explicit:

- **partitioned parquet** (`write_partitioned`): directory-partitioned by a
  low-cardinality key so downstream reads prune partitions; high-cardinality
  keys belong in `bucketBy` (operators/scale.write_bucketed) instead.
- **single-file CSV** (`write_csv_single`): for small exports only — it
  coalesces to one task by design and says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite") -> None:
    """Directory-partitioned parquet; readers prune on `partition_by` columns."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv_single(df: DataFrame, path: str, header: bool = True) -> None:
    """One-file CSV export (coalesce(1) — small results only, by contract)."""
    df.coalesce(1).write.mode("overwrite").option("header", str(header).lower()).csv(path)


def append_atomic(df: DataFrame, path: str) -> None:
    """Append batch to a parquet dataset; each Spark write commit is atomic at
    the job level (the WriteBatch role from the KV layer, for tabular data)."""
    df.write.mode("append").parquet(path)
