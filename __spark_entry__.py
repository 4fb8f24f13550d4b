"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``templatedb_spark/``; every operator from SURVEY.md §2
plus the LLM-data-pipeline tier is declared as a QuerySpec in
``templatedb_spark/operators/*`` pairing the Spark implementation with its
DuckDB oracle (see templatedb_spark/suite.py for the cross-engine conventions
that make value hashes match exactly).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from templatedb_spark.suite import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing summary."""
    from templatedb_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extension tier)."""
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
