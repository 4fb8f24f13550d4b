"""Semantic plan-property tests — the Spark analogue of the reference's golden
planner tests (SURVEY.md §5.2): instead of matching plan text, assert the
invariants that make queries viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from templatedb_spark.plans.explain import (
    has_pushed_filters,
    join_strategies,
    read_schema_columns,
    uses_python_udf,
)
from templatedb_spark.suite import all_specs, table


def test_filter_pushdown_reaches_scan(spark):
    """reference parity: PushPredicateThroughNonJoin/Join → Catalyst pushes to
    the parquet reader (optimizer/rules/pushdown_predicates.rs ↔ built-in)."""
    df = table(spark, SF_SMALL, "lineitem").filter(F.col("l_quantity") > 45).select("l_orderkey")
    assert has_pushed_filters(df)


def test_column_pruning_reaches_scan(spark):
    """reference parity: PushProjectIntoTableScan → ReadSchema shrinks
    (optimizer/rules/column_pruning.rs ↔ built-in)."""
    df = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_q1_prunes_unused_columns(spark):
    specs = all_specs()
    cols = read_schema_columns(specs["q1_pricing_summary"].spark(spark, SF_SMALL))
    assert "l_orderkey" not in cols  # q1 never touches it
    assert "l_partkey" not in cols


def test_dimension_joins_broadcast(spark):
    """multi_join_revenue: nation/region must broadcast, fact joins shuffle."""
    specs = all_specs()
    strategies = join_strategies(specs["multi_join_revenue"].spark(spark, SF_SMALL))
    assert "BroadcastHashJoin" in strategies


def test_no_python_udf_in_relational_suite(spark):
    """Everything in the relational tier stays JVM-side (whole-stage codegen)."""
    specs = all_specs()
    relational = [
        "q1_pricing_summary",
        "filter_project",
        "multi_join_revenue",
        "window_rank",
        "events_rollup",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_quality_score",
    ]
    for name in relational:
        assert not uses_python_udf(specs[name].spark(spark, SF_SMALL)), name


def test_topk_fuses_to_take_ordered(spark):
    """ORDER BY + LIMIT must fuse (TakeOrderedAndProject), not global-sort."""
    from templatedb_spark.plans.explain import formatted_plan

    specs = all_specs()
    plan = formatted_plan(specs["topk"].spark(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
