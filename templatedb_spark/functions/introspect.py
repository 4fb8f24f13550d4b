"""Catalog introspection table functions.

Parity with the reference's v2 table functions (SURVEY.md §2.1):
- `template_query_tables()`  → schema_name, schema_oid, table_name, table_oid
  (reference: function/table/query_tables.rs:14-117)
- `template_query_columns()` → table_name, column_name, column_type
  (reference: function/table/query_columns.rs)

On Spark these are views over `spark.catalog` — driver-side metadata, tiny, never
distributed (same as the reference, which walks its catalog hash maps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType


def query_tables(spark: SparkSession) -> DataFrame:
    """List tables: (schema_name, schema_oid, table_name, table_oid)."""
    rows = []
    for i, t in enumerate(spark.catalog.listTables()):
        schema = t.namespace[0] if t.namespace else "main"
        rows.append((schema, 0, t.name, i))
    schema = StructType(
        [
            StructField("schema_name", StringType()),
            StructField("schema_oid", LongType()),
            StructField("table_name", StringType()),
            StructField("table_oid", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def query_columns(spark: SparkSession, table: str | None = None) -> DataFrame:
    """List columns: (table_name, column_name, column_type)."""
    rows = []
    tables = [table] if table else [t.name for t in spark.catalog.listTables()]
    for name in tables:
        for c in spark.catalog.listColumns(name):
            rows.append((name, c.name, c.dataType))
    schema = StructType(
        [
            StructField("table_name", StringType()),
            StructField("column_name", StringType()),
            StructField("column_type", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
