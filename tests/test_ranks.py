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


def test_grouped_row_number_matches_classic_group_window(spark):
    """grouped_row_number (r10: per-group ranks without one-task-per-group)
    must equal the classic partitioned window bit-for-bit, including
    duplicate order keys straddling range boundaries."""
    from templatedb_spark.operators.ranks import grouped_row_number

    df = _data(spark, n=503).withColumn("g", (F.col("k") % 3).cast("long"))
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r.k: r.i
        for r in grouped_row_number(df, ["g"], order, rank_col="i")
        .select("k", "i")
        .collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        r.k: r.i
        for r in df.select(
            "k", F.row_number().over(w).cast("long").alias("i")
        ).collect()
    }
    assert got == want


def test_grouped_exact_percentiles_matches_percentile_agg(spark):
    """grouped_exact_percentiles must reproduce Spark's Percentile
    interpolation EXACTLY (same doubles, unrounded), across group sizes that
    hit every interpolation branch: fractional positions, exact-integer
    positions (p*(n-1) whole), and n == 1 groups."""
    from templatedb_spark.operators.ranks import grouped_exact_percentiles

    # groups of size 1, 2, 5, 41, 101 with duplicated values inside groups
    rows = []
    k = 0
    for g, n in [(0, 1), (1, 2), (2, 5), (3, 41), (4, 101)]:
        for i in range(n):
            rows.append((k, g, float((i * 2654435761 % 97) % 23) / 7.0))
            k += 1
    df = spark.createDataFrame(rows, "k long, g long, v double")
    ps = [("q05", 0.05), ("q25", 0.25), ("q50", 0.5), ("q75", 0.75), ("q99", 0.99)]
    got = {
        r.g: (r.n, r.q05, r.q25, r.q50, r.q75, r.q99)
        for r in grouped_exact_percentiles(df, "g", F.col("v"), ps).collect()
    }
    want = {
        r.g: (r.n, r.ps[0], r.ps[1], r.ps[2], r.ps[3], r.ps[4])
        for r in df.groupBy("g")
        .agg(
            F.count("v").alias("n"),
            F.expr("percentile(v, array(0.05, 0.25, 0.5, 0.75, 0.99))").alias("ps"),
        )
        .collect()
    }
    assert got == want


def test_grouped_exact_percentiles_null_groups_match_percentile_agg(spark):
    """NULL handling must match the percentile() aggregate tier exactly
    (ADVICE r10): a group whose values are ALL NULL stays in the output with
    NULL percentiles, n is COUNT(*) (not the non-null count), and positions
    interpolate over non-null values only."""
    from templatedb_spark.operators.ranks import grouped_exact_percentiles

    rows = []
    k = 0
    # g=0: all NULL; g=1: half NULL; g=2: no NULL; g=3: single NULL row
    for g, vals in [
        (0, [None, None, None]),
        (1, [None, 3.0, None, 1.0, 7.0]),
        (2, [2.0, 9.0, 4.0]),
        (3, [None]),
    ]:
        for v in vals:
            rows.append((k, g, v))
            k += 1
    df = spark.createDataFrame(rows, "k long, g long, v double")
    ps = [("q25", 0.25), ("q50", 0.5), ("q90", 0.9)]
    got = {
        r.g: (r.n, r.q25, r.q50, r.q90)
        for r in grouped_exact_percentiles(df, "g", F.col("v"), ps).collect()
    }
    want = {
        r.g: (r.n, r.ps[0] if r.ps else None, r.ps[1] if r.ps else None,
              r.ps[2] if r.ps else None)
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(v, array(0.25, 0.5, 0.9))").alias("ps"),
        )
        .collect()
    }
    assert got == want


def test_grouped_percentile_specs_equal_on_both_tiers(spark, monkeypatch):
    """The three size-adaptive exact-percentile specs must produce identical
    rows on the classic tier (percentile() agg, below
    _PCT_DISTRIBUTED_MIN_BYTES) and the distributed tier
    (ranks.grouped_exact_percentiles, forced via the guard)."""
    from templatedb_spark.operators import profiling

    sf = "/root/testdata/sf0.001"
    for fn in (
        profiling.percentiles_price,
        profiling.anomaly_mad,
        profiling.winsorize_stats,
    ):
        small = sorted(tuple(r) for r in fn(spark, sf).collect())
        monkeypatch.setattr(profiling, "_PCT_DISTRIBUTED_MIN_BYTES", 0)
        big = sorted(tuple(r) for r in fn(spark, sf).collect())
        monkeypatch.setattr(profiling, "_PCT_DISTRIBUTED_MIN_BYTES", 100 << 20)
        assert small == big, fn.__name__


def test_grouped_percentile_distributed_plan_has_no_group_buffer_agg(spark):
    """Above the guard the plan must contain no Percentile aggregate (the
    per-group buffer) and no unpartitioned global-sort window."""
    from templatedb_spark.operators import profiling
    from templatedb_spark.operators.ranks import grouped_exact_percentiles

    df = _data(spark, n=251).withColumn("g", (F.col("k") % 3).cast("long"))
    out = grouped_exact_percentiles(
        df, "g", F.col("v"), [("p50", 0.5), ("p90", 0.9)]
    )
    plan = physical_plan(out)
    assert "percentile(" not in plan.lower().replace("approx_percentile", "")
    assert global_sort_window_lines(plan) == []
