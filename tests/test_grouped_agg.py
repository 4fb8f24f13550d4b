"""GROUPED_AGG pandas UDFs: the UDAF surface the reference lacks
(hardcoded accumulators, executor/aggregate/mod.rs:27-45)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_weighted_mean_group_agg(spark):
    from templatedb_spark.functions.grouped import weighted_mean
    from templatedb_spark.suite import table

    c = table(spark, SF_SMALL, "customer")
    got = {
        r.c_nationkey: r.wm
        for r in c.groupBy("c_nationkey")
        .agg(weighted_mean("c_acctbal", "c_custkey").alias("wm"))
        .collect()
    }
    rows = c.select("c_nationkey", "c_acctbal", "c_custkey").collect()
    want: dict[int, list[float]] = {}
    for r in rows:
        want.setdefault(r.c_nationkey, [0.0, 0.0])
        want[r.c_nationkey][0] += r.c_acctbal * r.c_custkey
        want[r.c_nationkey][1] += r.c_custkey
    for k, (num, den) in want.items():
        assert math.isclose(got[k], num / den, rel_tol=1e-9), k


def test_midrange_as_window_function(spark):
    from pyspark.sql.window import Window

    from templatedb_spark.functions.grouped import midrange
    from templatedb_spark.suite import table

    c = table(spark, SF_SMALL, "customer")
    w = Window.partitionBy("c_mktsegment")
    got = (
        c.select("c_mktsegment", "c_acctbal", midrange("c_acctbal").over(w).alias("mr"))
        .groupBy("c_mktsegment")
        .agg(F.min("mr").alias("mr"))
    )
    expected = c.groupBy("c_mktsegment").agg(
        ((F.min("c_acctbal") + F.max("c_acctbal")) / 2).alias("want")
    )
    joined = got.join(expected, "c_mktsegment").collect()
    assert len(joined) > 0
    for r in joined:
        assert math.isclose(r.mr, r.want, rel_tol=1e-12), r


def test_grouped_agg_from_sql(spark):
    from templatedb_spark.functions.grouped import register_grouped_aggs
    from templatedb_spark.suite import table

    register_grouped_aggs(spark)
    table(spark, SF_SMALL, "customer").createOrReplaceTempView("t_cust_ga")
    rows = spark.sql(
        "SELECT c_nationkey, weighted_mean(c_acctbal, CAST(1.0 AS DOUBLE)) AS m, midrange(c_acctbal) AS mr "
        "FROM t_cust_ga GROUP BY c_nationkey"
    ).collect()
    assert len(rows) > 0
    avg = {
        r.c_nationkey: r.a
        for r in spark.sql(
            "SELECT c_nationkey, AVG(c_acctbal) AS a FROM t_cust_ga GROUP BY c_nationkey"
        ).collect()
    }
    for r in rows:
        assert math.isclose(r.m, avg[r.c_nationkey], rel_tol=1e-9)
