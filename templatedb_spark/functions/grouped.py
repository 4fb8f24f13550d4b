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

The UDFs are built LAZILY (PEP 562 module __getattr__): the pandas_udf
decorator parses its return type through the active SparkContext, so a
module-level decoration would make `import grouped` require a session —
which breaks spec registration in session-free contexts (the driver lists
queries() before building Spark).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession

_UDFS: dict = {}


def _build_udfs() -> dict:
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

    return {"weighted_mean": weighted_mean, "midrange": midrange}


def __getattr__(name: str):
    if name in ("weighted_mean", "midrange"):
        if not _UDFS:
            _UDFS.update(_build_udfs())
        return _UDFS[name]
    raise AttributeError(name)


def register_grouped_aggs(spark: SparkSession) -> None:
    """Make the UDAFs usable from SQL text too."""
    spark.udf.register("weighted_mean", __getattr__("weighted_mean"))
    spark.udf.register("midrange", __getattr__("midrange"))


# ---------------------------------------------------------------------------
# Driver-gated spec: the GROUPED_AGG pandas-UDAF protocol under the oracle.
# midrange is the float-SAFE choice: min/max are order-independent and the
# single (min+max)/2 double op is bit-identical in both engines — so the
# Arrow group-slicing, the UDAF evaluation, and the agg plumbing are all
# hash-compared, with no accumulation-order hazard (weighted_mean would
# have one; it stays pytest-covered). GROUPED_AGG cannot mix with built-in
# aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the spec output
# is the UDAF column alone.
# ---------------------------------------------------------------------------
def udaf_midrange_price(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from templatedb_spark.suite import table

    l = table(spark, sf_dir, "lineitem")
    midrange_udf = __getattr__("midrange")
    return l.groupBy("l_returnflag").agg(
        midrange_udf(F.col("l_extendedprice")).alias("mid_price")
    )


_MIDRANGE_ORACLE = """
SELECT l_returnflag,
       (MIN(l_extendedprice) + MAX(l_extendedprice)) / 2 AS mid_price
FROM lineitem GROUP BY 1
"""


def _register_spec() -> None:
    from templatedb_spark.suite import QuerySpec, register

    register(
        QuerySpec(
            "udaf_midrange_price",
            udaf_midrange_price,
            _MIDRANGE_ORACLE,
            "GROUPED_AGG pandas-UDAF protocol (Arrow group slices) vs SQL oracle",
        )
    )


_register_spec()
