"""Scale strategies: salting must preserve results; bucketed joins must elide
the shuffle (no Exchange over the bucketed scans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from templatedb_spark.suite import table


def test_salted_group_count_matches_naive(spark):
    from templatedb_spark.operators.scale import salted_group_count

    l = table(spark, SF_SMALL, "lineitem")
    naive = {r.l_suppkey: r.n for r in l.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.l_suppkey: r.n for r in salted_group_count(l, "l_suppkey").collect()}
    assert salted == naive


def test_salted_join_matches_naive(spark):
    from templatedb_spark.operators.scale import salted_join

    o = table(spark, SF_SMALL, "orders")
    c = table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    naive = o.join(c, o.o_custkey == c.c_custkey).count()
    salted = salted_join(o, c, "o_custkey", "c_custkey").count()
    assert salted == naive


def test_bucketed_join_elides_shuffle(spark):
    from templatedb_spark.operators.scale import bucketed_join, write_bucketed
    from templatedb_spark.plans.explain import formatted_plan

    # warehouse dir is static config, set session-wide in conftest
    o = table(spark, SF_SMALL, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    write_bucketed(o, "b_orders", "o_custkey")
    write_bucketed(c, "b_customer", "o_custkey")

    # force the sort-merge path (tiny test tables would broadcast, which hides
    # the property under test: bucketed SMJ without exchanges)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = formatted_plan(joined)
        # co-bucketed sort-merge join: no Exchange anywhere in the plan
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it actually answers correctly
        naive = o.join(c, "o_custkey").count()
        assert joined.count() == naive
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_merge_upsert(spark):
    from templatedb_spark.operators.scale import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    source = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k int, v string"
    )
    got = {(r.k, r.v) for r in merge_upsert(target, source, "k").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_salted_rollup_two_stage_plan(spark):
    """The salted rollup must actually run two aggregation stages (salted
    partial -> final) — i.e. two Exchanges — and the salt must be derived
    from data (deterministic), never rand()."""
    from templatedb_spark.operators.scale import skew_salted_rollup
    from templatedb_spark.plans.explain import formatted_plan

    df = skew_salted_rollup(spark, SF_SMALL)
    plan = formatted_plan(df)
    # two shuffle stages: (event_type, salt) partials, then event_type finals
    assert plan.count("Arguments: hashpartitioning") == 2
    assert "rand(" not in plan
    # deterministic: two independent executions agree exactly
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, skew_salted_rollup(spark, SF_SMALL).collect()))
    assert a == b


def test_bloom_prune_no_false_negatives(spark):
    """Every truly-matching lineitem row must survive the bloom stage
    (n_matched == exact semi-join count), and the bloom must actually prune
    (n_candidates well below the full fact table)."""
    from templatedb_spark.operators.scale import _BLOOM_PRICE_T, bloom_semi_join
    from templatedb_spark.plans.explain import formatted_plan

    row = bloom_semi_join(spark, SF_SMALL).collect()[0]
    l = table(spark, SF_SMALL, "lineitem")
    o = table(spark, SF_SMALL, "orders").filter(
        F.col("o_totalprice") > float(_BLOOM_PRICE_T)
    )
    exact = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi").count()
    total = l.count()
    assert row.n_matched == exact  # no false negatives
    assert row.n_candidates >= row.n_matched  # FPs only add
    assert row.n_candidates < total  # it pruned something
    # the bitmap reaches the fact side via broadcast, never a shuffle join
    plan = formatted_plan(bloom_semi_join(spark, SF_SMALL))
    assert "BroadcastExchange" in plan


def test_salt_entropy_guard(spark):
    """Key-only salt columns carry no row-distinguishing entropy — the helper
    must refuse rather than silently disable the skew spread (ADVICE r3)."""
    import pytest

    from templatedb_spark.operators.scale import salted_group_count, salted_join
    from templatedb_spark.suite import table

    l = table(spark, SF_SMALL, "lineitem").select("l_suppkey")
    with pytest.raises(ValueError, match="entropy"):
        salted_group_count(l, "l_suppkey")
    o = table(spark, SF_SMALL, "orders").select("o_custkey")
    c = table(spark, SF_SMALL, "customer")
    with pytest.raises(ValueError, match="entropy"):
        salted_join(o, c, "o_custkey", "c_custkey")
    # explicit key-only salt_cols is refused the same way
    with pytest.raises(ValueError, match="entropy"):
        salted_group_count(
            table(spark, SF_SMALL, "lineitem"), "l_suppkey", salt_cols=["l_suppkey"]
        )


def test_partition_pruning_opens_one_directory(spark):
    """The o_orderstatus='F' filter must prune at planning time: every file
    the scan touches lives under the matching partition directory."""
    from templatedb_spark.operators.scale import partition_pruned_scan

    import io
    from contextlib import redirect_stdout

    df = partition_pruned_scan(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the status predicate must appear as a PARTITION filter on the scan
    # (planning-time directory pruning), not a post-scan data filter
    assert "PartitionFilters" in plan, plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "o_orderstatus" in pf and "F" in pf, pf
