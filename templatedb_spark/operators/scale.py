"""Scale strategies as reusable operators: salting for skewed keys, bucketing
for co-located (shuffle-free) joins.

These are the two knobs AQE cannot always turn for you at 100 TB:

- **Salting** splits a hot key's rows across `salt_factor` sub-keys so one
  executor never owns the whole key. The aggregate runs in two stages
  (salted partial → final over de-salted keys); a salted *join* replicates the
  small side per salt. AQE's skew-join handles sort-merge skew at runtime, but
  salted aggregation is still the only fix for a skewed groupBy.
- **Bucketing** pre-shuffles a table once at write time (`bucketBy` on the
  join key); subsequent joins between co-bucketed tables run with NO exchange
  on either side — the pattern for a fact table joined on the same key by
  every query of the day.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, key: str, salt_factor: int = 16) -> DataFrame:
    """groupBy(key).count() that survives a pathologically hot key.

    Stage 1 aggregates (key, salt) — the hot key spreads over `salt_factor`
    tasks; stage 2 sums the partials per key. Identical result to the naive
    plan, bounded per-task state.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias("n"))


def salted_join(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str, salt_factor: int = 8
) -> DataFrame:
    """Equi-join where `big` is skewed on the join key: salt the big side,
    replicate the small side once per salt value, join on (key, salt).

    Equivalent to `big.join(small, big[big_key] == small[small_key])`; the hot
    key's probe rows land on `salt_factor` tasks instead of one.
    """
    salts = big.sparkSession.range(salt_factor).select(F.col("id").cast("int").alias("_salt"))
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(
        small_s, (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"])
    )
    return joined.drop("_salt")


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE INTO semantics over plain DataFrames: rows in `source` update
    matching `target` rows (by `key`) and insert the rest — the tabular form
    of the KV layer's newest-version-wins merge (kv.py), and the engine-side
    equivalent of Delta's MERGE for environments without a lakehouse format.

    One anti-join + union; both sides shuffle once on the key. Deterministic:
    source wins on key collision.
    """
    surviving = target.join(source.select(key), on=key, how="left_anti")
    return surviving.unionByName(source)


def write_bucketed(df: DataFrame, name: str, key: str, buckets: int = 8) -> None:
    """Persist `df` bucketed+sorted by `key` into the session warehouse."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two co-bucketed tables — Catalyst elides both shuffles."""
    return spark.table(left_table).join(spark.table(right_table), on)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering — the data-layout tier. Interleaving the
# bits of two dimensions into one sort key clusters BOTH dimensions at once,
# so range-partitioning/sorting files by z-value lets min/max row-group stats
# prune scans filtered on either dimension (the Delta/Iceberg OPTIMIZE ZORDER
# shape). The spec computes an 8+8-bit Morton code over (user bucket, value
# bucket) for every event and reports per-z-range locality stats: each
# z-bucket bounds a small rectangle in (x, y) space, which is exactly the
# property file skipping exploits.
#
# Exactness: the interleave is pure integer arithmetic (DIV/mod/scale by
# powers of two, 16 unrolled terms generated in lockstep for both dialects).
# Scale: map-side projection + one groupBy over <=256 buckets; the real
# deployment sorts by `z` with repartitionByRange, which is a range shuffle.
# ---------------------------------------------------------------------------
_Z_BITS = 8


def _morton_terms(xe: str, ye: str) -> str:
    """SQL for the interleaved z-value; identical text works in both dialects
    (integer division via explicit DIV/(// in DuckDB) avoided: uses CAST)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({xe}) % {2 ** (i + 1)} DIV {2 ** i}) * {2 ** (2 * i)}")
        terms.append(f"(({ye}) % {2 ** (i + 1)} DIV {2 ** i}) * {2 ** (2 * i + 1)}")
    return " + ".join(terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from templatedb_spark.suite import table

    e = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).cast("long").alias("x"),
        (F.floor(F.coalesce(F.col("value"), F.lit(0.0))).cast("long") % 256).alias("y"),
    )
    z = F.expr(_morton_terms("x", "y").replace(" DIV ", " div ")).cast("long").alias("z")
    zb = e.select("x", "y", z).select(
        "x", "y", "z", (F.col("z") / 256).cast("long").alias("zbucket")
    )
    return zb.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("z").cast("long").alias("z_min"),
        F.max("z").cast("long").alias("z_max"),
        F.min("x").cast("long").alias("x_min"),
        F.max("x").cast("long").alias("x_max"),
        F.min("y").cast("long").alias("y_min"),
        F.max("y").cast("long").alias("y_max"),
    )


def _zorder_oracle() -> str:
    morton = _morton_terms("x", "y").replace(" DIV ", " // ")
    return f"""
WITH e AS (
  SELECT (user_id % 256)::BIGINT AS x,
         (CAST(FLOOR(COALESCE(value, 0.0)) AS BIGINT) % 256)::BIGINT AS y
  FROM events
),
zb AS (SELECT x, y, ({morton})::BIGINT AS z FROM e)
SELECT (z // 256)::BIGINT AS zbucket,
       COUNT(*)::BIGINT AS n_events,
       MIN(z)::BIGINT AS z_min, MAX(z)::BIGINT AS z_max,
       MIN(x)::BIGINT AS x_min, MAX(x)::BIGINT AS x_max,
       MIN(y)::BIGINT AS y_min, MAX(y)::BIGINT AS y_max
FROM zb GROUP BY 1
"""


from templatedb_spark.suite import QuerySpec, register  # noqa: E402

register(
    QuerySpec(
        "zorder_layout",
        zorder_layout,
        _zorder_oracle(),
        "Z-order (Morton) layout clustering with per-z-bucket locality stats",
    )
)
