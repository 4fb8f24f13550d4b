"""In-memory tables (reference: storage/memory.rs InMemoryTable;
VALUES / ExpressionScan: execution/volcano_executor/expression_scan.rs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def values_table(spark: SparkSession, rows: list[tuple], names: list[str]) -> DataFrame:
    """`INSERT ... VALUES`-style literal rows (reference ExpressionScan)."""
    return spark.createDataFrame(rows, names)


def dummy_scan(spark: SparkSession) -> DataFrame:
    """One-row dummy source for table-less SELECT (reference dummy_scan.rs)."""
    return spark.range(1).select()
