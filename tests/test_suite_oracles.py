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


def test_division_specs_survive_ansi_mode(spark):
    """The driver's vanilla session runs with ANSI mode ON (Spark 4 default),
    where a division by zero is an error, not a NULL — the engine session's
    permissive mode must never mask a degenerate-denominator spec (the
    ab_test_zscore p=1 incident). Run every ratio/statistic-bearing spec
    under ANSI and require clean execution."""
    from templatedb_spark.suite import all_specs

    division_specs = [
        "ab_test_zscore",
        "correlation_quantity_price",
        "mutual_info_lang_source",
        "chi2_lang_source",
        "gini_revenue",
        "basket_rules",
        "revenue_concentration",
        "join_skew_report",
        "dataset_profile",
        "funnel_three_step",
        "funnel_signup_purchase",
        "event_transitions",
        "rolling_active_users",
        "ngram_novelty",  # novelty_frac = n_novel / count (r4)
        "dedup_substring",  # dup_frac division (r4 plan rewrite)
    ]
    specs = all_specs()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for name in division_specs:
            rows = specs[name].spark(spark, SF_SMALL).collect()
            assert rows, name
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
