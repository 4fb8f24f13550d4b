"""Write-path sinks: partitioned parquet round-trip with partition pruning,
CSV export, atomic append."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from templatedb_spark.suite import table


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from templatedb_spark.plans.explain import formatted_plan
    from templatedb_spark.sources.sinks import read_partitioned, write_partitioned

    d = table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(d, out, ["lang"])

    back = read_partitioned(spark, out)
    assert back.count() == d.count()

    pruned = back.filter(F.col("lang") == "en")
    assert pruned.count() == d.filter(F.col("lang") == "en").count()
    # partition pruning: the scan must carry a partition filter on lang
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]


def test_csv_single_file_roundtrip(spark, tmp_path):
    from templatedb_spark.sources.sinks import write_csv_single

    d = table(spark, SF_SMALL, "region")
    out = str(tmp_path / "region_csv")
    write_csv_single(d, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == d.count()
    files = [p for p in __import__("pathlib").Path(out).glob("*.csv")]
    assert len(files) == 1  # single-file contract


def test_append_atomic(spark, tmp_path):
    from templatedb_spark.sources.sinks import append_atomic

    d = table(spark, SF_SMALL, "region")
    out = str(tmp_path / "appended")
    append_atomic(d, out)
    append_atomic(d, out)
    assert spark.read.parquet(out).count() == 2 * d.count()
