"""JSONL (newline-delimited JSON) source and sink.

Extension beyond the reference's source surface (CSV + VALUES + in-memory;
reference storage/csv.rs, function/table/read_csv.rs): modern training-data
corpora ship as JSONL shards, so the engine reads and writes them first-class.

Spark's json source provides schema inference, permissive/corrupt-record
handling, and Catalyst projection pushdown. Conventions chosen here:

- **PERMISSIVE with a corrupt-record column** by default: a 100 TB crawl
  always contains malformed lines; failing the job on line 73 billion is
  wrong, silently dropping it is worse. Bad lines land in `_corrupt_json`
  for a quarantine audit (`read_jsonl_quarantine` splits them out).
- **Explicit schema when known**: inference is a full extra pass over the
  data — at scale callers pass the schema and inference is only the
  exploratory default.
- Writes are one JSON object per line (`df.write.json`), the shard format
  every downstream tokenizer expects; compression is the caller's knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_json"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    multiline: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON. With no schema, infers (extra pass)."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", str(multiline).lower())
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): valid rows without the corrupt column, and the raw
    text of every malformed line. Requires an explicit schema (PERMISSIVE
    corrupt-record capture only applies under a user schema that includes the
    corrupt column)."""
    from pyspark.sql.types import StringType, StructType

    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = StructType(schema.fields[:]).add(CORRUPT_COL, StringType())
    df = read_jsonl(spark, path, schema=schema).cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None) -> None:
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
