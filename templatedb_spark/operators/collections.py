"""Collection (array/map) and generator operators.

The reference has **no** nested types at all (SURVEY.md §1.2: List/Struct/Map
return NotImplementedArrowDataType, src/query_engine/src/types/types.rs:285-303)
— this module is the Spark-gained capability tier for the nested-data shapes a
training pipeline actually hits: array columns (embeddings), map lookups,
row generators (explode/posexplode ≈ the reference's table-function protocol
generalized to per-row expansion), and date spines.

Oracle-exactness rules for nested data:
- Array specs output **scalars only** (size/element_at/min/max are comparisons
  and picks, never float arithmetic — results are bit-identical to DuckDB's
  list functions over the same parquet floats).
- The map spec builds the map Spark-side (map_from_entries) but outputs
  element_at lookups; the oracle states the same semantics as conditional
  aggregation — the contract is the *result*, not the physical encoding.
- All generators are bounded and deterministic.

Scale notes: every spec is a single groupBy/projection pass — no joins except
the broadcast-sized date spine; posexplode/sequence are map-side row
generators that feed partial aggregation before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from templatedb_spark.operators.dedup import tokens_col, _TOKENS_SQL
from templatedb_spark.suite import QuerySpec, register, table


# ---------------------------------------------------------------------------
# Array function family over the embeddings table — structural ops only
# (size / element_at / array_min / array_max / array_sort picks), so every
# value is an exact float from the parquet file in both engines.
# ---------------------------------------------------------------------------
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.element_at(emb, -1).cast("double").alias("last_val"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.element_at(F.array_sort(emb), 2).cast("double").alias("second_smallest"),
    )


_ARRAY_ORACLE = """
SELECT vec_id,
       len(embedding)::BIGINT AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(embedding[-1] AS DOUBLE) AS last_val,
       CAST(list_min(embedding) AS DOUBLE) AS min_val,
       CAST(list_max(embedding) AS DOUBLE) AS max_val,
       CAST(list_sort(embedding)[2] AS DOUBLE) AS second_smallest
FROM embeddings
"""


# ---------------------------------------------------------------------------
# Map function family: per-user map(event_type -> count) built with
# map_from_entries, consumed with element_at lookups. The oracle spells the
# same result as conditional aggregation (DuckDB's MAP is a physical detail,
# not part of the result contract).
# ---------------------------------------------------------------------------
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.element_at("m", "click").alias("n_click"),
        F.element_at("m", "purchase").alias("n_purchase"),
        F.coalesce(F.element_at("m", "error"), F.lit(0)).cast("long").alias("n_error"),
    )


_MAP_ORACLE = """
SELECT user_id,
       COUNT(DISTINCT event_type) AS n_types,
       NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS n_click,
       NULLIF(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS n_purchase,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# posexplode generator: first 5 tokens of each document with their positions —
# per-row expansion, the generalization of the reference's table-function
# protocol (function/table/table_function.rs:26-49) to correlated generators.
# ---------------------------------------------------------------------------
_EXPLODE_DOCS = 200
_EXPLODE_TOKENS = 5


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _EXPLODE_DOCS)
    toks = d.select("doc_id", tokens_col(F.col("text")).alias("t"))
    return toks.select(
        "doc_id",
        F.posexplode(F.slice("t", 1, _EXPLODE_TOKENS)).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")


_EXPLODE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS t FROM documents WHERE doc_id < {_EXPLODE_DOCS}
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, least(len(t), {_EXPLODE_TOKENS}))) AS pos
  FROM toks WHERE len(t) >= 1
)
SELECT doc_id, pos::BIGINT AS pos, t[pos] AS token FROM idx
"""


# ---------------------------------------------------------------------------
# Date spine: generated calendar × left join — sequence() + explode as the
# standard missing-dates densification (1996, per-day order counts including
# zero days).
# ---------------------------------------------------------------------------
def date_spine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    o = table(spark, sf_dir, "orders")
    per_day = (
        o.filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .groupBy(F.col("o_orderdate").cast("date").alias("od"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(per_day, spine.d == per_day.od, "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


_DATE_SPINE_ORACLE = """
WITH spine AS (
  SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-12-31', INTERVAL 1 DAY))::DATE AS d
),
per_day AS (
  SELECT o_orderdate::DATE AS od, COUNT(*) AS n
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1
)
SELECT STRFTIME(spine.d, '%Y-%m-%d') AS day,
       COALESCE(per_day.n, 0)::BIGINT AS n_orders
FROM spine LEFT JOIN per_day ON spine.d = per_day.od
"""


# ---------------------------------------------------------------------------
# VariantType (Spark 4): parse the JSON props column ONCE into the binary
# variant encoding, then extract typed paths — the open-format answer to
# repeated get_json_object reparsing (each extraction re-parses the string;
# variant_get reads the parsed tree). The oracle states the same semantics
# via DuckDB's json_extract: the result contract is typed values, not the
# encoding.
# ---------------------------------------------------------------------------
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'long')")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       SUM(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# unionByName with schema evolution: batches written under an old schema
# union with new-schema batches by COLUMN NAME (position-based union silently
# miswires reordered columns); missing columns null-fill. This is the append
# path every long-lived 100 TB table hits when its schema grows.
# ---------------------------------------------------------------------------
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    old_batch = e.filter(F.col("event_id") % 2 == 0).select("user_id", "event_id")
    new_batch = e.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "value"  # reordered + extra column
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True).select(
        "event_id", "user_id", "value"
    )


_UNION_BY_NAME_ORACLE = """
SELECT event_id, user_id, NULL::DOUBLE AS value FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, user_id, value FROM events WHERE event_id % 2 = 1
"""


for spec in [
    QuerySpec("array_functions", array_functions, _ARRAY_ORACLE, "array structural ops over embeddings"),
    QuerySpec("union_by_name_evolution", union_by_name_evolution, _UNION_BY_NAME_ORACLE, "unionByName schema evolution append"),
    QuerySpec("variant_extract", variant_extract, _VARIANT_ORACLE, "VariantType semi-structured extraction (Spark 4)"),
    QuerySpec("map_functions", map_functions, _MAP_ORACLE, "map build + lookup per user"),
    QuerySpec("explode_tokens", explode_tokens, _EXPLODE_ORACLE, "posexplode correlated generator"),
    QuerySpec("date_spine_orders", date_spine_orders, _DATE_SPINE_ORACLE, "sequence() date spine densification"),
]:
    register(spec)
