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


def _range_sorted_mid(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Range-shuffle by the total order, sort within each partition, and tag
    rows with (partition id, monotonically_increasing_id). The mid encodes
    `partitionIndex * 2^33 + rowOffset` over the SORTED partition, so the
    0-based position within the partition is `mid - pid * 2^33` — a pure
    projection, where a `row_number() OVER (PARTITION BY pid)` window would
    force a SECOND full-relation exchange (hash by pid on top of the range
    shuffle) plus its own sort (measured r10: the window path re-shuffled
    everything; dropping it is −20% at sf0.1 and one whole exchange at any
    scale). 33-bit row offsets cap a partition at 8.5 B rows — looser than
    the int row_number the window produced. Checkpointed for the same
    one-execution / fail-stop contract as _range_local (the mids are
    order-derived and must never be recomputed against fresh range
    boundaries)."""
    parted = df.repartitionByRange(_num_parts(df), *order_cols).sortWithinPartitions(
        *order_cols
    )
    return (
        parted.withColumn(_PID, F.spark_partition_id())
        .withColumn("__rank_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )


def global_row_number(
    df: DataFrame, order_cols: list[Column], rank_col: str = "i"
) -> DataFrame:
    """Exact global 1-based row_number over a total order, computed with N
    parallel tasks instead of one: local positions from the sorted-partition
    mid (no window, no second exchange) plus broadcast prefix-count
    offsets."""
    local = _range_sorted_mid(df, order_cols).withColumn(
        _LOCAL,
        F.col("__rank_mid") - F.col(_PID).cast("long") * F.lit(1 << 33) + 1,
    )
    out = _with_prefix_offsets(local, F.count(F.lit(1)).cast("long"))
    return out.withColumn(
        rank_col, (F.col(_LOCAL) + F.col(_OFFSET)).cast("long")
    ).drop(_PID, _LOCAL, _OFFSET, "__rank_mid")


def grouped_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    rank_col: str = "i",
) -> DataFrame:
    """Exact 1-based row_number PER GROUP over a total order within the
    group, distributed the same way as global_row_number: range-shuffle by
    (group, order) so every task holds a contiguous slice, local row_number
    per (partition, group), and broadcast per-(partition, group) counts from
    strictly earlier partitions as offsets. The classic
    ``row_number().over(partitionBy(g).orderBy(o))`` serializes each group
    into ONE task — the straggler shape when a few giant groups hold most
    rows (guide §2.5); this keeps all N tasks busy regardless of group
    count. Order must be total within each group for reproducible ranks
    wherever rank VALUES (not just positions) are consumed.

    Window-free (r10): groups are contiguous inside each range-sorted
    partition, so the local rank is `mid − min(mid over the (partition,
    group) run) + 1` — the group-run minima ride along in the same
    broadcast offsets relation the prefix counts already need, instead of a
    second full-relation exchange for a (pid, group)-partitioned window."""
    local = _range_sorted_mid(df, [F.col(c) for c in part_cols] + order_cols)
    counts = local.groupBy(_PID, *part_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__part_n"),
        F.min("__rank_mid").alias("__min_mid"),
    )
    a, b = counts.alias("a"), counts.alias("b")
    cond = F.col(f"b.{_PID}") < F.col(f"a.{_PID}")
    for c in part_cols:
        cond = cond & (F.col(f"b.{c}") == F.col(f"a.{c}"))
    offsets = (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(
            F.col(f"a.{_PID}").alias(_PID),
            *[F.col(f"a.{c}").alias(c) for c in part_cols],
        )
        .agg(
            F.coalesce(F.sum("b.__part_n"), F.lit(0)).alias(_OFFSET),
            F.min("a.__min_mid").alias("__min_mid"),
        )
    )
    out = local.drop("__min_mid").join(F.broadcast(offsets), [_PID, *part_cols])
    return out.withColumn(
        rank_col,
        (F.col("__rank_mid") - F.col("__min_mid") + 1 + F.col(_OFFSET)).cast("long"),
    ).drop(_PID, _OFFSET, "__rank_mid", "__min_mid")


def grouped_exact_percentiles(
    df: DataFrame,
    part_col: str,
    value: Column,
    ps: list[tuple[str, float]],
) -> DataFrame:
    """Exact interpolated percentiles per group WITHOUT the per-group value
    buffer: the distributed replacement for
    ``percentile(v, array(...))``, whose final aggregation materializes and
    sorts every group's values inside ONE task (with 3-5 groups that is a
    3-5-task stage no core count can speed up, and an OOM at 100 TB).

    Returns one row per group: (part_col, n, <name> per requested p), where
    n is the group's ROW count (COUNT(*), matching the classic tier's
    ``count(lit(1))`` companion aggregate) and each <name> reproduces
    Spark's ``Percentile`` interpolation bit-for-bit (pinned by
    tests/test_ranks.py): with pos = p * (nn - 1) over the NON-NULL value
    count nn, lower = floor(pos), higher = ceil(pos), the result is the
    value at lower when higher == lower (or when both neighbour values are
    equal), else (higher - pos) * v[lower] + (pos - lower) * v[higher] —
    the exact expression Percentile.getPercentile evaluates, in the same
    operand order. A group whose values are ALL NULL stays in the output
    with NULL percentiles — exactly like the ``percentile()`` aggregate it
    replaces (ADVICE r10: the old isNotNull prefilter silently dropped such
    groups on this tier only). Only rank-targeted rows (≤ 2 per percentile
    per group) leave the ranked relation, so the whole computation after
    the range shuffle is N parallel tasks plus a broadcast-sized tail."""
    pc = df.select(part_col, value.cast("double").alias("__v"))
    counts = pc.groupBy(part_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("__v").cast("long").alias("__nn"),
    )
    for i, (_, p) in enumerate(ps):
        pos = F.lit(p) * (F.col("__nn") - F.lit(1)).cast("double")
        counts = (
            counts.withColumn(f"__pos{i}", pos)
            .withColumn(f"__lo{i}", F.floor(F.col(f"__pos{i}")).cast("long") + 1)
            .withColumn(f"__hi{i}", F.ceil(F.col(f"__pos{i}")).cast("long") + 1)
        )
    ranked = grouped_row_number(
        pc.filter(F.col("__v").isNotNull()),
        [part_col],
        [F.col("__v").asc()],
        rank_col="__gi",
    )
    j = ranked.join(F.broadcast(counts), part_col)
    need = F.lit(False)
    for i in range(len(ps)):
        need = need | (F.col("__gi") == F.col(f"__lo{i}")) | (
            F.col("__gi") == F.col(f"__hi{i}")
        )
    aggs = []
    for i in range(len(ps)):
        aggs += [
            F.max(F.when(F.col("__gi") == F.col(f"__lo{i}"), F.col("__v"))).alias(f"__vlo{i}"),
            F.max(F.when(F.col("__gi") == F.col(f"__hi{i}"), F.col("__v"))).alias(f"__vhi{i}"),
        ]
    g = j.filter(need).groupBy(part_col).agg(*aggs)
    # LEFT join keeps all-NULL-value groups (no ranked row → no g row):
    # their vlo/vhi stay NULL and the interpolation below yields NULL, the
    # classic aggregate's answer. pos/lo/hi already live in `counts`.
    out = counts.join(F.broadcast(g), part_col, "left")
    sel: list[Column] = [F.col(part_col), F.col("n")]
    for i, (name, _) in enumerate(ps):
        pos, lo, hi = F.col(f"__pos{i}"), F.col(f"__lo{i}"), F.col(f"__hi{i}")
        vlo, vhi = F.col(f"__vlo{i}"), F.col(f"__vhi{i}")
        val = F.when((lo == hi) | (vlo == vhi), vlo).otherwise(
            ((hi - 1).cast("double") - pos) * vlo
            + (pos - (lo - 1).cast("double")) * vhi
        )
        sel.append(val.alias(name))
    return out.select(*sel)


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
