"""Grouped-aggregate pandas UDFs — the user-defined *aggregate* surface.

The reference hardcodes its accumulator set (count/sum/min/max,
executor/aggregate/mod.rs:27-45) and exposes no UDAF API. Spark's
GROUPED_AGG pandas UDFs are the missing surface: an Arrow-batched aggregate
usable in groupBy().agg(...) AND as a window function over an unbounded
frame — each group's column slices arrive as pandas Series, one scalar comes
back.

Scale note: GROUPED_AGG has no partial aggregation — every group's full
column ships to one task (fine for bounded per-group cardinality; for
unbounded groups prefer a built-in or an Aggregator in Scala). That trade is
inherent to the API and documented here so callers choose deliberately.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """sum(v*w)/sum(w) over the group (numpy-vectorized, Arrow transfer)."""
    denom = w.sum()
    return float((v * w).sum() / denom) if denom else float("nan")


@pandas_udf("double")
def midrange(v: pd.Series) -> float:
    """(min+max)/2 — a shape no built-in composition of aggregates returns
    directly from one UDF call."""
    return float((v.min() + v.max()) / 2.0)


def register_grouped_aggs(spark: SparkSession) -> None:
    """Make the UDAFs usable from SQL text too."""
    spark.udf.register("weighted_mean", weighted_mean)
    spark.udf.register("midrange", midrange)
