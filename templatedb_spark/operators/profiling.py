"""Data-profiling operators: the first queries anyone runs against a new
100 TB corpus — distribution quantiles, histograms, and embedding
quantization stats.

Cross-engine exactness notes:
- `percentile` (Spark) and `quantile_cont` (DuckDB) both use linear
  interpolation over the sorted set; results agree to float-repr noise,
  absorbed by ROUND(..., 6) (the suite's standard grain).
- Histogram bins use floor(value/width) — pure IEEE double ops, bit-identical
  across engines (DuckDB lacks width_bucket; floor-binning is also what
  survives at scale: a map-side expression feeding one shuffle).
- Quantization maps each float to int8 space with floor(x*127) — exact in
  both engines; the spec outputs integer aggregates of the quantized vector
  (sums/extremes), proving the quantized representation matches without
  emitting array columns.

Scale notes: exact percentiles sort within each group — fine for bounded
group counts; an unbounded-cardinality profile at 100 TB would switch to
approx_percentile (t-digest, mergeable partial state). Histogram and
quantization are single-pass map-side expressions + one partial+final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from templatedb_spark.suite import QuerySpec, register, table


# ---------------------------------------------------------------------------
# Exact interpolated percentiles per group.
# ---------------------------------------------------------------------------
def percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    # one percentile(col, array(...)) call: the per-group value buffer is
    # built and sorted ONCE for all three quantiles (three scalar percentile
    # aggregates would each keep their own OpenHashMap buffer — measured 3×
    # the aggregation work at sf0.1)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("ps"),
        )
        .select(
            "l_returnflag",
            "n",
            F.round(F.col("ps")[0], 6).alias("p50"),
            F.round(F.col("ps")[1], 6).alias("p90"),
            F.round(F.col("ps")[2], 6).alias("p99"),
        )
    )


_PERCENTILES_ORACLE = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Histogram: floor-binned distribution of event values.
# ---------------------------------------------------------------------------
_BIN_WIDTH = 25.0


def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / F.lit(_BIN_WIDTH)).cast("long")
    return (
        e.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


_HISTOGRAM_ORACLE = f"""
SELECT CAST(FLOOR(value / {_BIN_WIDTH}) AS BIGINT) AS bin, COUNT(*) AS n,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Embedding int8 quantization: floor(x*127) per element; integer aggregates
# of the quantized vector prove the representation matches bit-for-bit.
# ---------------------------------------------------------------------------
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = F.expr("transform(embedding, x -> cast(floor(cast(x as double) * 127) as long))")
    return e.select("vec_id", q.alias("q")).select(
        "vec_id",
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


_QUANTIZE_ORACLE = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127) AS BIGINT)) AS qv
  FROM embeddings
)
SELECT vec_id,
       list_sum(qv)::BIGINT AS q_sum,
       list_min(qv) AS q_min,
       list_max(qv) AS q_max
FROM q
"""


# ---------------------------------------------------------------------------
# Approximate percentiles: the 100 TB path. Spark's approx_percentile keeps a
# bounded mergeable sketch per partition (partial state merges map-side), so
# unbounded group cardinality never triggers a per-group sort. Sketch results
# are engine-specific (Spark GK vs DuckDB t-digest) → rows-only driver check;
# the accuracy bound vs the exact sort is asserted in
# tests/test_analytics.py::test_approx_percentile_within_tolerance.
# ---------------------------------------------------------------------------
_APPROX_ACC = 10000  # 1/accuracy relative-rank error bound


def approx_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"approx_percentile(l_extendedprice, 0.5, {_APPROX_ACC})").alias("p50"),
        F.expr(f"approx_percentile(l_extendedprice, 0.9, {_APPROX_ACC})").alias("p90"),
        F.expr(f"approx_percentile(l_extendedprice, 0.99, {_APPROX_ACC})").alias("p99"),
    )


for spec in [
    QuerySpec("percentiles_price", percentiles_price, _PERCENTILES_ORACLE, "exact interpolated percentiles per group"),
    QuerySpec("approx_percentiles_price", approx_percentiles_price, None, "sketch-based percentiles (rows-only + tolerance test)"),
    QuerySpec("histogram_event_values", histogram_event_values, _HISTOGRAM_ORACLE, "floor-binned value histogram"),
    QuerySpec("embedding_quantize", embedding_quantize, _QUANTIZE_ORACLE, "int8 embedding quantization stats"),
]:
    register(spec)
