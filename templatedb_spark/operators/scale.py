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
