"""Query suite registry: every operator from SURVEY.md §2 (plus the LLM-pipeline
extension tier) is declared as a QuerySpec pairing

  - a Spark implementation   (spark, sf_dir) -> DataFrame
  - a DuckDB oracle SQL text (or None for non-SQL-expressible ops)

The driver's correctness gate runs both at sf0.01 and hash-compares values, so the
conventions below are load-bearing:

- **Identical column aliases** on both sides (driver sorts columns by name).
- **Explicit output types**: BIGINT for counts/ints (`.cast("long")` / `::BIGINT`),
  DOUBLE for measures. Money aggregates go through DECIMAL first (exact, order-
  independent — also the right answer at 100 TB where float sum order is
  nondeterministic across partitions) then cast to DOUBLE.
- **Deterministic LIMIT**: every LIMIT is preceded by a total ORDER BY.
- Cross-engine hashes come from functions.hashing (md5-derived, bit-identical).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query spec: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def _driver_covered_names() -> set[str]:
    """Spec names already audited by the driver in a prior round.

    The driver's correctness gate checks queries() in dict order and caps the
    number of entries it records per round (round 1 stopped at 50 of 80), so
    registration order decides what gets hard evidence. We read the prior
    rounds' CORRECTNESS_r*.json artifacts and treat any spec with a recorded
    row as covered; all_specs() then yields the *uncovered* specs first so
    each round's capped audit extends the union instead of re-checking the
    same prefix.
    """
    import json
    from pathlib import Path

    covered: set[str] = set()
    root = Path(__file__).resolve().parents[1]
    for artifact in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            covered.update(json.loads(artifact.read_text()).keys())
        except Exception:
            continue  # a malformed artifact never breaks spec listing
    return covered


def all_specs() -> dict[str, QuerySpec]:
    # import for side effects: each module registers its specs
    from templatedb_spark.operators import (  # noqa: F401
        relational,
        dedup,
        similarity,
        textstats,
        multimodal,
        analytics,
        collections,
        profiling,
        tpch,
        tpch2,
        pipeline,
        curation,
        scale,
    )
    from templatedb_spark.functions import grouped  # noqa: F401
    from templatedb_spark.sources import pyds  # noqa: F401
    from templatedb_spark.streaming import gate  # noqa: F401

    covered = _driver_covered_names()
    # Specs whose semantics, output schema, or oracle changed THIS round:
    # prior-round audit rows no longer vouch for them, so they re-enter the
    # front of the driver's capped audit window as if never covered. Rounds
    # roll: once the driver's artifact for the changing round has recorded
    # them (r5's changed set is fully present in CORRECTNESS_r05.json), the
    # subtraction is retired — keeping it would burn audit slots re-checking
    # rows the changing round already vouched for.
    # (r6's changed set is fully recorded in CORRECTNESS_r06.json — retired.)
    # Round-7 churn (standing invariant, VERDICT r5 #8):
    # - the three rank-based specs gained a localCheckpoint materialization
    #   barrier in operators/ranks.py (ADVICE r6 medium — same oracles, same
    #   results, new execution shape);
    # - the six graph/funnel specs' ORACLES were rewritten funnel-style
    #   (survivor-restricted minhash in SQL, VERDICT r6 #2) so DuckDB can
    #   verify them at generated sf1 — same results, new oracle text.
    changed_r7 = {
        "histogram_equidepth", "gini_revenue", "revenue_concentration",
        "dedup_dup_clusters", "dedup_keep_policy", "dedup_cascade",
        "graph_pagerank", "graph_triangles", "graph_bfs_hops",
        # PPJoin length+positional filters — same oracle, new candidate plan
        "dedup_ngram_prefix",
        # df cap via agg+join instead of unbounded window — same oracle
        "dedup_ngram_capped",
    }
    covered -= changed_r7
    # Round-8 churn: the KV write path was refactored into the layout-aware
    # _write_version_df (kv.py — range layout, per-bucket key ranges,
    # bucket-granular compact_range). Same semantics and same physical shape
    # for the default hash layout, but every KV-backed spec now commits
    # through the new code, so their prior-round rows no longer vouch.
    changed_r8 = {
        "stream_cdc_kv_state", "cdc_apply", "kv_compact_range_state",
    }
    covered -= changed_r8
    # Round-9 churn: the streaming CDC sink now commits each micro-batch
    # with an idempotency tag in its manifest record (exactly-once under
    # replay, kv.write_batch_df(tag=...)) — same state, new commit path;
    # hll_distinct_users was refactored into shared partial/fill/finalize
    # helpers (same semantics, new code path feeding the streaming gate).
    changed_r9 = {"stream_cdc_kv_state", "hll_distinct_users"}
    covered -= changed_r9
    # Round-10 churn: the three KV-merge gates dropped from 3 staged
    # micro-batches to the 2-trigger semantic minimum (same oracles, same
    # state contract, shorter serial chain — VERDICT r6 #4's lever), and
    # stream_mv_join's per-batch apply was referenced against the new
    # distributed-merge twin. Prior-round rows no longer vouch for the new
    # trigger shape.
    changed_r10 = {
        "stream_hll_users", "stream_cms_tokens", "stream_mv_join",
        # adaptive IVF nlist cap (corpus-proportional centroid count was
        # quadratic at sf10) — same results at every driver-audited tier
        # (step unchanged for n ≤ 25,600), new parameter plumbing
        "ann_ivf_topk", "semantic_dedup", "ann_recall_eval",
    }
    covered -= changed_r10
    # The round-2 verdict singled out eleven specs that no driver round has
    # ever audited ("close the CORRECTNESS union"); the driver caps how many
    # entries it records per round, so those eleven outrank every other
    # uncovered spec, which in turn outrank already-covered ones. Stable sort
    # keeps registration order within each tier.
    priority = {
        "anomaly_zscore", "cdc_apply", "contamination_check",
        "dedup_dup_clusters", "dedup_keep_policy", "graph_pagerank",
        "pack_token_shards", "scd2_user_segments", "text_repetition_score",
        "tfidf_top_terms", "vocab_top_tokens",
    }
    ordered = sorted(
        _REGISTRY.items(),
        key=lambda kv: (kv[0] in covered, kv[0] not in priority),
    )
    return dict(ordered)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a session-timezone TIMESTAMP.

    The driver has shipped the column as both TIMESTAMP(NANOS) (read as long
    under spark.sql.legacy.parquet.nanosAsLong) and plain TIMESTAMP(MICROS)
    (read natively as TIMESTAMP_NTZ), so adapt on the observed type.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def fused_topk(df: DataFrame, order, k: int, rank_col: str) -> DataFrame:
    """Distributed deterministic top-k with rank numbers 1..k.

    `row_number() OVER (ORDER BY ...)` with no PARTITION BY is the classic
    scale-killer: Spark executes the unpartitioned window as a full global
    sort into ONE task, so the whole scored relation (billions of rows at
    100 TB) funnels through a single executor. Instead: `orderBy(...).
    limit(k)` first — Catalyst fuses that to TakeOrderedAndProject
    (per-partition size-k heaps, then a k·numPartitions merge) — and only
    then number the ≤k survivors with the window. `order` must be a TOTAL
    order (include a tiebreaker column) so the prefilter keeps exactly the
    rows the window would rank 1..k; with that, results are bit-identical
    to the naive global window and the oracles stay unchanged.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    order = list(order)
    pruned = df.orderBy(*order).limit(k)
    return pruned.withColumn(
        rank_col, F.row_number().over(Window.orderBy(*order)).cast("long")
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Tolerate TIMESTAMP(NANOS) variants of the file (see normalize_events_ts).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
