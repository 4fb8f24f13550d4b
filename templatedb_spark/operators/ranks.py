"""Distributed exact rank / cumulative sum — the two-pass range-partition
pattern that replaces single-task global windows.

An unpartitioned ``row_number() OVER (ORDER BY ...)`` forces Spark to sort the
whole relation in ONE task — the scale-killer the suite-wide plan gate
(tests/test_plans.py) rejects. The exact, fully distributed alternative
implemented here (classic external-rank / TeraSort bookkeeping):

1. ``repartitionByRange(N, order_cols)`` — a sampled range shuffle puts each
   task a contiguous, non-overlapping key range; partition ids are ordered by
   the sort key (ascending per the given column sort directions).
2. A window PARTITIONED BY ``spark_partition_id()`` computes the local
   row_number / running sum per range — N parallel tasks, never one.
3. Per-partition totals (N rows — bounded by the shuffle-partition count, not
   the data) are broadcast-joined back as prefix offsets via a tiny
   nested-loop join (``b._pid < a._pid``), keeping the whole plan lazy — no
   driver collect anywhere.

Exactness does not depend on where the sampled range boundaries land: any
non-overlapping ordered ranges give the same global rank, so the result is
deterministic even though the sampling isn't. The order columns must form a
total order (callers append a unique tiebreak key) so local row_numbers are
reproducible.

Reference parity: the reference's physical sort is likewise a single total
order feeding rank-style consumers (sort.rs / TopN executors); this module is
the Spark-native distributed equivalent used by histogram_equidepth,
gini_revenue and revenue_concentration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"


def _num_parts(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _with_prefix_offsets(local: DataFrame, per_part_col: Column) -> DataFrame:
    """Attach each row's prefix offset = sum of ``per_part_col`` over all
    range-partitions strictly before its own. The per-partition totals
    relation has at most N rows (N = shuffle partitions), so the prefix sum is
    a broadcast nested-loop theta-join over N×N ≤ 1024 cells — trivially
    sized, fully lazy, and partitioned-window-free."""
    counts = local.groupBy(_PID).agg(per_part_col.alias("__part_total"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum("b.__part_total"), F.lit(0)).alias(_OFFSET))
    )
    return local.join(F.broadcast(offsets), _PID)


def _range_local(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Range-shuffle by the total order and tag rows with their (range-ordered)
    physical partition id. spark_partition_id() is evaluated in the project
    directly above the range exchange, before any later exchange.

    The tagged relation is LAZILY local-checkpointed before being returned:
    both downstream consumers (the per-partition counts and the join-back)
    must observe ONE physical execution of the range exchange —
    repartitionByRange samples boundaries per exchange execution and
    spark_partition_id() is nondeterministic, so if the two subtrees were
    ever planned as separate exchanges (spark.sql.exchange.reuse=false, or a
    future plan divergence) the pid→offset map could silently mismatch rows
    (ADVICE r6, medium). The checkpoint truncates lineage into a single
    materialized RDD shared by both subtrees; eager=False keeps the whole
    plan lazy until the caller's action, and a lost block FAILS the job
    rather than recomputing with fresh (different) boundaries — fail-stop,
    never silent corruption. Cost: one executor-local materialization of the
    relation being ranked — the same spill the classic TeraSort-style
    external rank pays."""
    return _range_local_plan(df, order_cols).localCheckpoint(eager=False)


def _range_local_plan(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """The pre-barrier shape (range exchange + pid projection) WITHOUT the
    checkpoint — exposed so plan pins can assert the RangePartitioning
    exchange, which the checkpoint's `Scan ExistingRDD` hides from the
    final explain output (the exchange still executes, once, inside the
    checkpointed subtree)."""
    parted = df.repartitionByRange(_num_parts(df), *order_cols)
    return parted.withColumn(_PID, F.spark_partition_id())


def global_row_number(
    df: DataFrame, order_cols: list[Column], rank_col: str = "i"
) -> DataFrame:
    """Exact global 1-based row_number over a total order, computed with N
    parallel tasks instead of one: local row_number per range partition plus
    broadcast prefix-count offsets."""
    local = _range_local(df, order_cols)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = local.withColumn(_LOCAL, F.row_number().over(w).cast("long"))
    out = _with_prefix_offsets(local, F.count(F.lit(1)).cast("long"))
    return out.withColumn(
        rank_col, (F.col(_LOCAL) + F.col(_OFFSET)).cast("long")
    ).drop(_PID, _LOCAL, _OFFSET)


def global_cumsum_multi(
    df: DataFrame, order_cols: list[Column], values: list[tuple[Column, str]]
) -> DataFrame:
    """Exact global running sums of SEVERAL measures over ONE total order,
    sharing a single range exchange, one per-partition window pass, and one
    broadcast prefix-offset map (global_cumsum called k times would pay k
    range shuffles and k checkpoints for the same order). `values` is a list
    of (measure column, output name)."""
    local = _range_local(df, order_cols)
    for i, (v, _) in enumerate(values):
        local = local.withColumn(f"__rv{i}", v)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for i in range(len(values)):
        local = local.withColumn(f"__loc{i}", F.sum(f"__rv{i}").over(w))
    counts = local.groupBy(_PID).agg(
        *[F.sum(f"__rv{i}").alias(f"__tot{i}") for i in range(len(values))]
    )
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(
            *[
                F.coalesce(F.sum(f"b.__tot{i}"), F.lit(0)).alias(f"__off{i}")
                for i in range(len(values))
            ]
        )
    )
    out = local.join(F.broadcast(offsets), _PID)
    for i, (_, name) in enumerate(values):
        out = out.withColumn(name, F.col(f"__loc{i}") + F.col(f"__off{i}"))
    drop = [_PID] + [
        c
        for i in range(len(values))
        for c in (f"__rv{i}", f"__loc{i}", f"__off{i}")
    ]
    return out.drop(*drop)


def global_prefix_max(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    value: Column,
    out_col: str = "prefix_max",
) -> DataFrame:
    """Exact strictly-preceding running MAX of ``value`` per ``part_cols``
    group over a total order — the distributed replacement for
    ``max(...).over(partitionBy(g).orderBy(o).rowsBetween(unboundedPreceding,
    -1))`` when the group count is small: a handful of giant groups
    serialize the classic window into as many tasks as groups (the
    straggler shape at 100 TB). Same two-pass scheme as global_cumsum —
    range-shuffle by (group, order), local window per (partition, group),
    broadcast per-(partition, group) maxima as offsets from strictly
    earlier partitions — with max as the (commutative, idempotent) monoid.
    First row of a group gets NULL, exactly like the classic window."""
    local = _range_local(df, [F.col(c) for c in part_cols] + order_cols)
    w = (
        Window.partitionBy(_PID, *part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = local.withColumn(_LOCAL, F.max(value).over(w))
    totals = local.groupBy(_PID, *part_cols).agg(F.max(value).alias("__part_max"))
    a, b = totals.alias("a"), totals.alias("b")
    cond = F.col(f"b.{_PID}") < F.col(f"a.{_PID}")
    for c in part_cols:
        cond = cond & (F.col(f"b.{c}") == F.col(f"a.{c}"))
    offsets = (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID), *[F.col(f"a.{c}").alias(c) for c in part_cols])
        .agg(F.max("b.__part_max").alias(_OFFSET))
    )
    out = local.join(F.broadcast(offsets), [_PID, *part_cols])
    prefix = (
        F.when(F.col(_LOCAL).isNull(), F.col(_OFFSET))
        .when(F.col(_OFFSET).isNull(), F.col(_LOCAL))
        .otherwise(F.greatest(F.col(_LOCAL), F.col(_OFFSET)))
    )
    return out.withColumn(out_col, prefix).drop(_PID, _LOCAL, _OFFSET)


def global_cumsum(
    df: DataFrame, order_cols: list[Column], value: Column, cum_col: str = "cum"
) -> DataFrame:
    """Exact global running sum of ``value`` over a total order (rows between
    unbounded preceding and current row), distributed the same way: local
    running sum per range partition plus broadcast prefix-sum offsets. Pass a
    DECIMAL value for order-independent exactness."""
    local = _range_local(df, order_cols).withColumn("__rank_val", value)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local.withColumn(_LOCAL, F.sum("__rank_val").over(w))
    out = _with_prefix_offsets(local, F.sum("__rank_val"))
    return out.withColumn(cum_col, F.col(_LOCAL) + F.col(_OFFSET)).drop(
        _PID, _LOCAL, _OFFSET, "__rank_val"
    )
