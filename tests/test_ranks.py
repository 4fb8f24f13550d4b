"""Distributed exact rank/cumsum (operators/ranks.py) — property tests.

The module replaces unpartitioned global-sort windows (the 100-TB
scale-killer) with a range shuffle + per-partition local window + broadcast
prefix offsets. These tests pin BOTH halves of the contract:

1. Exactness: results are identical to the single-task window formulation,
   including duplicate sort keys broken by a tiebreak column, values
   straddling range-partition boundaries, and relations smaller than the
   partition count.
2. Plan shape: no unpartitioned ordered window node appears anywhere — the
   property the suite-wide gate (test_plans.py) enforces for every spec.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from templatedb_spark.operators.ranks import global_cumsum, global_row_number
from templatedb_spark.plans.explain import global_sort_window_lines, physical_plan


def _data(spark, n=997):
    # deterministic pseudo-random values with heavy duplication (v % 13) so
    # ties straddle range boundaries; k is the unique tiebreak
    rows = [(i, (i * 2654435761 % 2**32) % 13, Decimal(i % 101) / 4) for i in range(n)]
    return spark.createDataFrame(rows, "k long, v long, amt decimal(10,2)")


def test_global_row_number_matches_single_task_window(spark):
    df = _data(spark)
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r.k: r.i
        for r in global_row_number(df, order, rank_col="i").select("k", "i").collect()
    }
    w = Window.orderBy(*order)
    want = {
        r.k: r.i
        for r in df.select("k", F.row_number().over(w).cast("long").alias("i")).collect()
    }
    assert got == want


def test_global_row_number_desc_order(spark):
    df = _data(spark, n=251)
    order = [F.col("amt").desc(), F.col("k").asc()]
    got = {r.k: r.i for r in global_row_number(df, order).select("k", "i").collect()}
    want = {
        r.k: r.i
        for r in df.select(
            "k", F.row_number().over(Window.orderBy(*order)).cast("long").alias("i")
        ).collect()
    }
    assert got == want


def test_global_cumsum_matches_single_task_window(spark):
    df = _data(spark)
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r.k: r.cum
        for r in global_cumsum(df, order, F.col("amt"), cum_col="cum")
        .select("k", "cum")
        .collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.k: r.cum for r in df.select("k", F.sum("amt").over(w).alias("cum")).collect()
    }
    assert got == want


def test_tiny_relation_smaller_than_partition_count(spark):
    df = _data(spark, n=3)  # shuffle partitions = 8 > rows
    got = sorted(
        (r.k, r.i) for r in global_row_number(df, [F.col("k").asc()]).collect()
    )
    assert [i for _, i in got] == [1, 2, 3]


def test_exact_with_exchange_reuse_disabled(spark):
    """ADVICE r6 (medium): counts and join-back consume the pid-tagged
    relation twice; without the localCheckpoint in _range_local, disabling
    exchange reuse would execute the range exchange twice with independently
    sampled boundaries — nondeterministic pids → corrupted ranks. The
    checkpoint makes both subtrees read one materialized RDD, so exactness
    must hold with reuse off."""
    old = spark.conf.get("spark.sql.exchange.reuse", None)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = _data(spark, n=503)
        order = [F.col("v").asc(), F.col("k").asc()]
        got = {
            r.k: r.i for r in global_row_number(df, order).select("k", "i").collect()
        }
        want = {
            r.k: r.i
            for r in df.select(
                "k", F.row_number().over(Window.orderBy(*order)).cast("long").alias("i")
            ).collect()
        }
        assert got == want
        cum = {
            r.k: r.cum
            for r in global_cumsum(df, order, F.col("amt"), cum_col="cum")
            .select("k", "cum")
            .collect()
        }
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want_cum = {
            r.k: r.cum
            for r in df.select("k", F.sum("amt").over(w).alias("cum")).collect()
        }
        assert cum == want_cum
    finally:
        if old is None:
            spark.conf.unset("spark.sql.exchange.reuse")
        else:
            spark.conf.set("spark.sql.exchange.reuse", old)


def test_plan_has_no_unpartitioned_window(spark):
    df = _data(spark, n=100)
    ranked = global_row_number(df, [F.col("v").asc(), F.col("k").asc()])
    assert global_sort_window_lines(physical_plan(ranked)) == []
    summed = global_cumsum(df, [F.col("v").asc(), F.col("k").asc()], F.col("amt"))
    assert global_sort_window_lines(physical_plan(summed)) == []


def test_global_cumsum_multi_matches_single_task_window(spark):
    """Both measures of a shared-exchange multi-cumsum must equal the
    single-task window formulation — including ties straddling range
    boundaries and DECIMAL exactness on the second measure."""
    from templatedb_spark.operators.ranks import global_cumsum_multi

    df = _data(spark)
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r.k: (r.c_cnt, r.c_amt)
        for r in global_cumsum_multi(
            df, order, [(F.lit(1).cast("long"), "c_cnt"), (F.col("amt"), "c_amt")]
        )
        .select("k", "c_cnt", "c_amt")
        .collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.k: (r.c_cnt, r.c_amt)
        for r in df.select(
            "k",
            F.sum(F.lit(1)).over(w).cast("long").alias("c_cnt"),
            F.sum("amt").over(w).alias("c_amt"),
        ).collect()
    }
    assert got == want


def test_global_cumsum_multi_plan_free_of_global_window(spark):
    from templatedb_spark.operators.ranks import global_cumsum_multi
    from templatedb_spark.plans.explain import global_sort_window_lines, physical_plan

    df = _data(spark, n=251)
    out = global_cumsum_multi(
        df, [F.col("v").asc(), F.col("k").asc()], [(F.col("v"), "cv"), (F.col("k"), "ck")]
    )
    assert global_sort_window_lines(physical_plan(out)) == []


def test_global_prefix_max_matches_classic_group_window(spark):
    """global_prefix_max (r10: the distributed replacement for a per-group
    strictly-preceding MAX window over few giant groups) must equal the
    classic window bit-for-bit — including the NULL on each group's first
    row and duplicate order keys straddling range boundaries."""
    from templatedb_spark.operators.ranks import global_prefix_max

    df = _data(spark, n=503).withColumn("g", (F.col("k") % 3).cast("long"))
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r.k: r.pm
        for r in global_prefix_max(df, ["g"], order, F.col("amt"), out_col="pm")
        .select("k", "pm")
        .collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r.k: r.pm
        for r in df.select("k", F.max("amt").over(w).alias("pm")).collect()
    }
    assert got == want


def test_global_prefix_max_plan_free_of_global_window(spark):
    from templatedb_spark.operators.ranks import global_prefix_max

    df = _data(spark, n=251).withColumn("g", (F.col("k") % 3).cast("long"))
    out = global_prefix_max(df, ["g"], [F.col("v").asc(), F.col("k").asc()], F.col("amt"))
    assert global_sort_window_lines(physical_plan(out)) == []


def test_pareto_front_sweep_equals_window_path(spark, monkeypatch):
    """The size-adaptive pareto_front must produce the identical front on
    both tiers (the classic window below _PARETO_SWEEP_MIN_BYTES, the
    distributed sweep above)."""
    from templatedb_spark.operators import analytics

    sf = "/root/testdata/sf0.001"
    small = {
        (r.grp, r.price): r.qty for r in analytics.pareto_front(spark, sf).collect()
    }
    monkeypatch.setattr(analytics, "_PARETO_SWEEP_MIN_BYTES", 0)
    big = {
        (r.grp, r.price): r.qty for r in analytics.pareto_front(spark, sf).collect()
    }
    assert small == big
