"""read_csv table function.

Parity with the reference's v2 `read_csv(file, header=>bool, delim=>char)` TVF and
the implicit `FROM 'file.csv'` binding (reference: function/table/read_csv.rs:18-210;
tests/slt/table_function.slt:23-52), and with the v1 CSV storage (storage/csv.rs —
1024-row batches, schema inference, projection/limit pushdown via reader bounds).

Spark's csv source subsumes all of it: schema inference, header handling, custom
delimiters, and Catalyst-driven projection pushdown. COPY FROM is the same
string-level rewrite the reference does (bind_copy.rs:9-36): read_csv → insertInto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delim: str = ",",
    infer_schema: bool = True,
    schema=None,
) -> DataFrame:
    """The reference's read_csv TVF as a reader helper."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delim)
        .option("nullValue", "")  # reference: empty field → NULL (FIXTURES.md employee.csv)
        .option("emptyValue", '""')
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def copy_from(spark: SparkSession, table: str, path: str, header: bool = True, delim: str = ",") -> None:
    """COPY table FROM 'file' (FORMAT CSV ...) — rewrite into read_csv + insert,
    exactly the reference's approach (bind_copy.rs:9-36 rewrites at SQL level)."""
    df = read_csv(spark, path, header=header, delim=delim, infer_schema=False,
                  schema=spark.table(table).schema)
    df.write.insertInto(table)
