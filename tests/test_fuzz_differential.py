"""Seeded random-query differential fuzz: generate dialect-neutral ANSI SQL
over the synthetic tables, run the SAME text through Spark SQL and DuckDB,
and require identical results.

This extends the reference's fixed sqllogictest corpus (SURVEY.md §5) with
randomized coverage of the filter/aggregate/order surface — the strategy the
reference lacks entirely (no property-based testing, §5.3). The seed is
pinned: failures reproduce.

Dialect-neutral subset: comparisons, AND/OR, IN, BETWEEN, GROUP BY, HAVING,
ORDER BY (+ key tiebreaker) with LIMIT. Aggregate sums go through DECIMAL
(order-independent — Spark shuffles, DuckDB doesn't; float sums would
diverge).
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_SMALL, normalize_pdf

_NUM_CASES = 30
_SEED = 20260813

_NUM_COLS = ["c_acctbal", "c_custkey", "c_nationkey"]
_STR_COL_VALS = {
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
}
_GROUP_COLS = ["c_mktsegment", "c_nationkey"]


def _gen_query(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["cmp", "between", "in"])
        if kind == "cmp":
            col = rng.choice(_NUM_COLS)
            op = rng.choice([">", ">=", "<", "<=", "<>"])
            val = round(rng.uniform(-500, 8000), 2)
            preds.append(f"{col} {op} {val}")
        elif kind == "between":
            col = rng.choice(_NUM_COLS)
            lo = round(rng.uniform(-500, 4000), 2)
            preds.append(f"{col} BETWEEN {lo} AND {round(lo + rng.uniform(1, 5000), 2)}")
        else:
            col, vals = rng.choice(list(_STR_COL_VALS.items()))
            chosen = rng.sample(vals, rng.randint(1, 3))
            preds.append(f"{col} IN ({', '.join(repr(v) for v in chosen)})")
    conn = " AND " if rng.random() < 0.7 else " OR "
    where = " WHERE " + conn.join(preds) if preds else ""

    if rng.random() < 0.7:
        keys = rng.sample(_GROUP_COLS, rng.randint(1, 2))
        having = (
            f" HAVING COUNT(*) >= {rng.randint(1, 3)}" if rng.random() < 0.4 else ""
        )
        return (
            f"SELECT {', '.join(keys)}, COUNT(*) AS n, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS s, "
            "MIN(c_custkey) AS mn, MAX(c_custkey) AS mx "
            f"FROM customer{where} GROUP BY {', '.join(keys)}{having}"
        )
    n = rng.randint(1, 50)
    return (
        "SELECT c_custkey, c_mktsegment, c_acctbal "
        f"FROM customer{where} "
        f"ORDER BY c_acctbal DESC, c_custkey ASC LIMIT {n}"
    )


def _gen_query2(rng: random.Random) -> str:
    """Round-3 grammar extension: joins, set operations, CASE projections —
    the surfaces the original generator didn't reach. Same dialect-neutral
    discipline (DECIMAL sums, total ORDER BY before LIMIT)."""
    shape = rng.choice(["join", "setop", "case"])
    if shape == "join":
        op = rng.choice([">", ">=", "<", "<="])
        val = round(rng.uniform(0, 5000), 2)
        how = rng.choice(["JOIN", "LEFT JOIN"])
        return (
            "SELECT c_mktsegment, COUNT(*) AS n, "
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS s "
            f"FROM customer {how} orders ON c_custkey = o_custkey "
            f"WHERE c_acctbal {op} {val} "
            "GROUP BY c_mktsegment"
        )
    if shape == "setop":
        setop = rng.choice(
            ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
        )
        lo_a = rng.randint(0, 800)
        lo_b = rng.randint(0, 800)
        n = rng.randint(5, 40)
        return (
            f"SELECT * FROM ("
            f"SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey > {lo_a} "
            f"{setop} "
            f"SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey > {lo_b}"
            f") t ORDER BY c_nationkey, c_mktsegment LIMIT {n}"
        )
    pivot = round(rng.uniform(0, 5000), 2)
    return (
        "SELECT c_nationkey, "
        f"COUNT(CASE WHEN c_acctbal > {pivot} THEN 1 END) AS n_hi, "
        f"COUNT(CASE WHEN c_acctbal <= {pivot} THEN 1 END) AS n_lo, "
        "CAST(SUM(CAST(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END "
        "AS DECIMAL(12,2))) AS DOUBLE) AS pos_bal "
        "FROM customer GROUP BY c_nationkey"
    )


def _gen_query3(rng: random.Random) -> str:
    """Late-round-3 grammar extension: window functions. Determinism comes
    from total window orders (c_custkey is unique, so every ORDER BY inside a
    window ends with it) and DECIMAL running sums (each prefix is exact, so
    the frame result is identical regardless of partitioning)."""
    shape = rng.choice(["rank", "frame", "nav"])
    pdir = rng.choice(["ASC", "DESC"])
    if shape == "rank":
        f = rng.choice(["RANK()", "DENSE_RANK()", "ROW_NUMBER()", f"NTILE({rng.randint(2, 5)})"])
        n = rng.randint(1, 5)
        return (
            f"SELECT * FROM ("
            f"SELECT c_custkey, c_nationkey, {f} OVER "
            f"(PARTITION BY c_nationkey ORDER BY c_acctbal {pdir}, c_custkey) AS r "
            f"FROM customer) t WHERE r <= {n} "
            f"ORDER BY c_nationkey, r, c_custkey"
        )
    if shape == "frame":
        k = rng.randint(1, 6)
        frame = rng.choice(
            [f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
             "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"]
        )
        n = rng.randint(10, 60)
        return (
            "SELECT c_custkey, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) OVER "
            f"(PARTITION BY c_nationkey ORDER BY c_custkey {frame}) AS DOUBLE) AS s, "
            "COUNT(*) OVER "
            f"(PARTITION BY c_nationkey ORDER BY c_custkey {frame}) AS n "
            f"FROM customer ORDER BY c_custkey LIMIT {n}"
        )
    off = rng.randint(1, 3)
    fn = rng.choice(["LAG", "LEAD"])
    n = rng.randint(10, 60)
    return (
        f"SELECT c_custkey, {fn}(c_custkey, {off}, -1) OVER "
        f"(PARTITION BY c_nationkey ORDER BY c_acctbal {pdir}, c_custkey) AS nb "
        f"FROM customer ORDER BY c_custkey LIMIT {n}"
    )




def _gen_query4(rng: random.Random) -> str:
    """Continuation-session grammar extension: nested aggregation — derived
    tables of grouped aggregates re-aggregated or filtered by scalar
    subqueries, plus EXISTS/IN correlation against orders. All measures go
    through DECIMAL; every ORDER BY ends in a unique key or covers the full
    projection, so results are total-ordered in both engines."""
    shape = rng.choice(["reagg", "scalar_having", "exists"])
    if shape == "reagg":
        inner_agg = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
        expr = (
            "COUNT(*)" if inner_agg == "COUNT"
            else f"CAST({inner_agg}(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)"
        )
        outer = rng.choice(["AVG_N", "MINMAX"])
        if outer == "AVG_N":
            return (
                f"SELECT COUNT(*) AS n_groups, CAST(MIN(m) AS DOUBLE) AS min_m "
                f"FROM (SELECT c_nationkey, {expr} AS m FROM customer "
                f"GROUP BY c_nationkey) t"
            )
        return (
            f"SELECT MIN(m) AS lo, MAX(m) AS hi "
            f"FROM (SELECT c_mktsegment, {expr} AS m FROM customer "
            f"GROUP BY c_mktsegment) t"
        )
    if shape == "scalar_having":
        cmp_op = rng.choice([">", "<", ">="])
        return (
            "SELECT c_nationkey, COUNT(*) AS n "
            "FROM customer GROUP BY c_nationkey "
            f"HAVING COUNT(*) {cmp_op} (SELECT COUNT(*) FROM customer) / {rng.randint(20, 40)} "
            "ORDER BY c_nationkey"
        )
    neg = rng.choice(["", "NOT "])
    status = rng.choice(["'O'", "'F'", "'P'"])
    n = rng.randint(10, 50)
    return (
        "SELECT c_custkey, c_nationkey FROM customer c "
        f"WHERE {neg}EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        f"AND o.o_orderstatus = {status}) "
        f"ORDER BY c_custkey LIMIT {n}"
    )


def _gen_query5(rng: random.Random) -> str:
    """Round-4 grammar: the Engine.sql SHIM surface (sqlparse.py), not plain
    spark.sql — WHERE references to select-list aliases (filter.slt:30-45),
    alias names that shadow a real column (binder resolves the column first —
    DuckDB agrees), string literals containing comparison operators (must not
    trip the strict scanner or the substitution), `OFFSET n LIMIT m` ordering
    (order.slt:1-5), and the named-arithmetic registry (add/subtract/...).
    The SAME text runs through DuckDB, which shares all these semantics."""
    k = rng.randint(1, 900)
    shadow = rng.random() < 0.3
    # alias either a fresh name or shadowing the real column c_nationkey
    alias = "c_nationkey" if shadow else rng.choice(["a", "v", "scorex"])
    fn = rng.choice(["add", "subtract", "plain"])
    if fn == "plain":
        expr = f"c_custkey + {k}"
    else:
        expr = f"{fn}(c_custkey, {k})"
    preds = []
    if not shadow:
        # reference the alias in WHERE -> substitution path
        lo = rng.randint(1, 1200)
        preds.append(f"{alias} >= {lo}")
    else:
        # shadowed: WHERE must hit the real column (values 0..24)
        preds.append(f"{alias} >= {rng.randint(0, 20)}")
    if rng.random() < 0.5:
        # string literal with an operator inside — must be inert
        preds.append(f"c_mktsegment <> 'X > {rng.randint(0, 99)}'")
    if rng.random() < 0.4:
        preds.append(f"c_acctbal > {round(rng.uniform(-500, 5000), 2)}")
    off, lim = rng.randint(0, 5), rng.randint(1, 30)
    tail = (
        f"OFFSET {off} LIMIT {lim}"
        if rng.random() < 0.5
        else f"LIMIT {lim} OFFSET {off}"
    )
    return (
        f"SELECT c_custkey, {expr} AS {alias} FROM customer "
        f"WHERE {' AND '.join(preds)} "
        f"ORDER BY c_custkey {tail}"
    )


_NUM_CASES2 = 20
_NUM_CASES3 = 20
_NUM_CASES4 = 20
_CASES = (
    [_gen_query(random.Random(_SEED + i)) for i in range(_NUM_CASES)]
    + [_gen_query2(random.Random(_SEED + 1000 + i)) for i in range(_NUM_CASES2)]
    + [_gen_query3(random.Random(_SEED + 2000 + i)) for i in range(_NUM_CASES3)]
    + [_gen_query4(random.Random(_SEED + 3000 + i)) for i in range(_NUM_CASES4)]
)


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    from templatedb_spark.suite import table

    table(spark, SF_SMALL, "customer").createOrReplaceTempView("customer")
    table(spark, SF_SMALL, "orders").createOrReplaceTempView("orders")
    yield
    spark.catalog.dropTempView("customer")
    spark.catalog.dropTempView("orders")


@pytest.mark.parametrize("sql", _CASES)
def test_random_query_matches_duckdb(sql, spark, duck):
    got = normalize_pdf(spark.sql(sql).toPandas())
    want = normalize_pdf(duck.sql(sql).df())
    assert len(got) == len(want), f"rowcount {len(got)} vs {len(want)}\n{sql}"
    assert got == want, sql


def _gen_query6(rng: random.Random) -> str:
    """Round-4/5 grammar: LATERAL, null-safe joins, and QUALIFY — routed
    through Engine.sql (VERDICT r4 #10) so the shim surface, including the
    round-5 QUALIFY → derived-table rewrite, gets adversarial differential
    coverage. DuckDB runs the SAME text natively (it ships QUALIFY; LATERAL
    legs carry a total ORDER BY + LIMIT; null-safe legs compare CASE-derived
    nullable keys with IS NOT DISTINCT FROM)."""
    shape = rng.choice(["lateral", "nullsafe", "qualify_fn", "qualify_alias"])
    if shape == "lateral":
        k = rng.randint(1, 4)
        cut = rng.randint(20, 300)
        direction = rng.choice(["DESC", "ASC"])
        return (
            "SELECT c.c_custkey, t.o_orderkey, t.price FROM customer c, "
            "LATERAL (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price "
            "FROM orders o WHERE o.o_custkey = c.c_custkey "
            f"ORDER BY o_totalprice {direction}, o_orderkey ASC LIMIT {k}) t "
            f"WHERE c.c_custkey < {cut}"
        )
    if shape == "nullsafe":
        thresh_a = round(rng.uniform(-500, 2000), 2)
        thresh_b = round(rng.uniform(-500, 2000), 2)
        mod = rng.randint(2, 6)
        return (
            "WITH a AS (SELECT CASE WHEN c_acctbal < "
            f"{thresh_a} THEN NULL ELSE c_nationkey % {mod} END AS k FROM customer), "
            "b AS (SELECT CASE WHEN c_acctbal < "
            f"{thresh_b} THEN NULL ELSE c_nationkey % {mod} END AS kb FROM customer "
            "WHERE c_custkey < 300) "
            "SELECT k, COUNT(*) AS n_pairs FROM a JOIN b ON k IS NOT DISTINCT FROM kb GROUP BY k"
        )
    if shape == "qualify_fn":
        # window call literally in the QUALIFY predicate → hoist path
        n = rng.randint(1, 4)
        direction = rng.choice(["DESC", "ASC"])
        fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
        where = (
            f"WHERE c_acctbal > {round(rng.uniform(-500, 3000), 2)} "
            if rng.random() < 0.5
            else ""
        )
        return (
            "SELECT c_custkey, c_nationkey FROM customer "
            + where
            + f"QUALIFY {fn} OVER (PARTITION BY c_nationkey "
            f"ORDER BY c_acctbal {direction}, c_custkey) <= {n} "
            "ORDER BY c_nationkey, c_custkey"
        )
    # qualify_alias: predicate references a select-list window alias
    n = rng.randint(1, 6)
    direction = rng.choice(["DESC", "ASC"])
    return (
        "SELECT c_custkey, RANK() OVER "
        f"(ORDER BY c_acctbal {direction}, c_custkey) AS r FROM customer "
        f"QUALIFY r <= {n} ORDER BY r, c_custkey"
    )


_NUM_CASES5 = 25
_CASES5 = [_gen_query5(random.Random(_SEED + 4000 + i)) for i in range(_NUM_CASES5)]
_NUM_CASES6 = 24
_CASES6 = [_gen_query6(random.Random(_SEED + 5000 + i)) for i in range(_NUM_CASES6)]


@pytest.mark.parametrize("sql", _CASES6)
def test_lateral_nullsafe_qualify_fuzz_matches_duckdb(sql, spark, duck):
    """Grammar 6 routes through Engine.sql (QUALIFY rewrite + shims active);
    DuckDB executes the identical text natively."""
    from templatedb_spark.engine import Engine

    eng = Engine(spark)
    got = normalize_pdf(eng.sql(sql).toPandas())
    want = normalize_pdf(duck.sql(sql).df())
    assert len(got) == len(want), f"rowcount {len(got)} vs {len(want)}\n{sql}"
    assert got == want, sql


@pytest.mark.parametrize("sql", _CASES5)
def test_engine_shim_query_matches_duckdb(sql, spark, duck):
    """Grammar 5 routes through Engine.sql (shims active) so the round-4
    mini-parser gets adversarial differential coverage (VERDICT r3 #10)."""
    from templatedb_spark.engine import Engine

    eng = Engine(spark)
    got = normalize_pdf(eng.sql(sql).toPandas())
    want = normalize_pdf(duck.sql(sql).df())
    assert len(got) == len(want), f"rowcount {len(got)} vs {len(want)}\n{sql}"
    assert got == want, sql


def _gen_query7(rng: random.Random) -> str:
    """Round-5 grammar: the §2.8 scalar surface — date/interval arithmetic,
    date parts, and string functions — in the shared ANSI dialect (identical
    text, both engines). Dates render via CAST(.. AS VARCHAR) (ISO in both);
    rounding only touches 2-decimal source values (exact in both)."""
    shape = rng.choice(["date_arith", "date_part", "string_fn", "like_filter"])
    d = "CAST(o_orderdate AS DATE)"
    if shape == "date_arith":
        n = rng.randint(1, 400)
        unit = rng.choice(["DAY", "MONTH"])
        sign = rng.choice(["+", "-"])
        lim = rng.randint(5, 40)
        # cast the result back to DATE before rendering: Spark keeps
        # DATE ± month/day intervals as DATE while DuckDB promotes to
        # TIMESTAMP; the DATE values themselves agree exactly
        return (
            f"SELECT o_orderkey, CAST(CAST({d} {sign} INTERVAL {n} {unit} AS DATE) AS STRING) AS shifted "
            f"FROM orders WHERE o_orderkey < 500 "
            f"ORDER BY o_orderkey LIMIT {lim}"
        )
    if shape == "date_part":
        part = rng.choice(["YEAR", "MONTH", "DAY"])
        return (
            f"SELECT CAST(EXTRACT({part} FROM {d}) AS BIGINT) AS p, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS s "
            "FROM orders GROUP BY p ORDER BY p"
        )
    if shape == "string_fn":
        i = rng.randint(1, 6)
        ln = rng.randint(1, 8)
        fn = rng.choice(
            [
                f"UPPER(SUBSTR(c_name, {i}, {ln}))",
                f"LOWER(SUBSTR(c_mktsegment, {i}, {ln}))",
                "CAST(LENGTH(c_name) AS BIGINT)",
                "CONCAT(c_mktsegment, '-', CAST(c_nationkey AS STRING))",
                "TRIM(CONCAT('  ', c_mktsegment, ' '))",
                "REPLACE(c_mktsegment, 'A', '@')",
            ]
        )
        lim = rng.randint(5, 50)
        return (
            f"SELECT c_custkey, {fn} AS v FROM customer "
            f"ORDER BY c_custkey LIMIT {lim}"
        )
    pat = rng.choice(["%UILD%", "AUTO%", "%RY", "%OUSE%", "F%"])
    neg = "NOT " if rng.random() < 0.3 else ""
    return (
        f"SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer "
        f"WHERE c_mktsegment {neg}LIKE '{pat}' "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


_NUM_CASES7 = 28
_CASES7 = [_gen_query7(random.Random(_SEED + 6000 + i)) for i in range(_NUM_CASES7)]


@pytest.mark.parametrize("sql", _CASES7)
def test_scalar_surface_fuzz_matches_duckdb(sql, spark, duck):
    """Grammar 7 routes through Engine.sql; DuckDB executes identical text."""
    from templatedb_spark.engine import Engine

    eng = Engine(spark)
    got = normalize_pdf(eng.sql(sql).toPandas())
    want = normalize_pdf(duck.sql(sql).df())
    assert len(got) == len(want), f"rowcount {len(got)} vs {len(want)}\n{sql}"
    assert got == want, sql


def _gen_ddl_script(rng: random.Random, tname: str) -> tuple[list[str], str]:
    """Grammar 8: the DDL/DML surface — typed CREATE TABLE, full-row VALUES,
    column-subset inserts (permutation + NULL fill), INSERT..SELECT — as a
    statement script both engines execute verbatim, compared on the final
    order-insensitive SELECT *."""
    types = ["int", "bigint", "varchar", "double"]
    ncols = rng.randint(2, 4)
    cols = [(f"c{i}", rng.choice(types)) for i in range(ncols)]

    def val(t: str) -> str:
        if rng.random() < 0.15:
            return "NULL"
        if t == "int":
            return str(rng.randint(-1000, 1000))
        if t == "bigint":
            return str(rng.randint(-10**12, 10**12))
        if t == "double":
            return str(round(rng.uniform(-500, 500), 2))
        return f"'s{rng.randint(0, 99)}'"

    stmts = [f"CREATE TABLE {tname} ({', '.join(f'{n} {t}' for n, t in cols)})"]
    for _ in range(rng.randint(2, 6)):
        if rng.random() < 0.4:
            rows = ", ".join(
                "(" + ", ".join(val(t) for _, t in cols) + ")"
                for _ in range(rng.randint(1, 3))
            )
            stmts.append(f"INSERT INTO {tname} VALUES {rows}")
        else:
            k = rng.randint(1, ncols)
            subset = rng.sample(cols, k)
            names = ", ".join(n for n, _ in subset)
            vals = ", ".join(val(t) for _, t in subset)
            stmts.append(f"INSERT INTO {tname} ({names}) VALUES ({vals})")
    if rng.random() < 0.5:
        stmts.append(f"INSERT INTO {tname} SELECT * FROM {tname} WHERE c0 IS NOT NULL")
    return stmts, f"SELECT * FROM {tname}"


_NUM_CASES8 = 15
_CASES8 = list(range(_NUM_CASES8))


@pytest.mark.parametrize("case", _CASES8)
def test_ddl_insert_fuzz_matches_duckdb(case, spark, duck):
    """Grammar 8 drives the slt-session dispatcher (Catalog typed DDL +
    Engine) and DuckDB with identical statement scripts."""
    from templatedb_spark.slt import SltSession

    rng = random.Random(_SEED + 7000 + case)
    tname = f"t8_{case}"
    stmts, query = _gen_ddl_script(rng, tname)
    sess = SltSession(spark, base_dir=".", strict=False)
    for s in stmts:
        sess.run(s)
    duck.sql(f"DROP TABLE IF EXISTS {tname}")
    for s in stmts:
        duck.sql(s)
    got = normalize_pdf(sess.run(query).toPandas())
    want = normalize_pdf(duck.sql(query).df())
    duck.sql(f"DROP TABLE IF EXISTS {tname}")
    spark.catalog.dropTempView(tname)
    assert got == want, "\n".join(stmts)


# ---------------------------------------------------------------------------
# Grammar 9 (round 6, VERDICT r5 #5): the v2 DDL/DML + introspection surface
# END-TO-END — CREATE/INSERT/COPY scripts interleaved with SHOW TABLES /
# DESCRIBE / EXPLAIN (Spark-side liveness: they must execute, they have no
# DuckDB twin), finished with a CTE/QUALIFY/LATERAL read compared against
# DuckDB running the IDENTICAL script. This is the regression net for the
# binder-edge class the r5 self-review caught (CTE declared-column shadowing,
# chained-CTE planning, derived tables that start with WITH).
# ---------------------------------------------------------------------------
_G9_TYPES = [("c0", "int"), ("c1", "double"), ("c2", "varchar"), ("c3", "bigint")]


def _g9_val(rng: random.Random, t: str, allow_null: bool = True) -> str:
    if allow_null and rng.random() < 0.12:
        return "NULL"
    if t == "int":
        return str(rng.randint(-50, 50))
    if t == "bigint":
        return str(rng.randint(-10**9, 10**9))
    if t == "double":
        return str(round(rng.uniform(-100, 100), 2))
    return f"'s{rng.randint(0, 9)}'"


def _gen_script9(rng: random.Random, tname: str, csv_path: str) -> tuple[list[str], list[str], str]:
    """(spark_stmts, duck_stmts, final_query): the statement scripts differ
    ONLY in COPY option spelling (both read the same csv text) and in the
    Spark-only introspection statements."""
    ncols = rng.randint(3, 4)
    cols = _G9_TYPES[:ncols]
    create = f"CREATE TABLE {tname} ({', '.join(f'{n} {t}' for n, t in cols)})"
    spark_stmts, duck_stmts = [create], [create]

    def maybe_introspect():
        if rng.random() < 0.4:
            spark_stmts.append(
                rng.choice(
                    ["SHOW TABLES", f"DESCRIBE {tname}", f"EXPLAIN SELECT * FROM {tname}"]
                )
            )

    for _ in range(rng.randint(2, 5)):
        if rng.random() < 0.5:
            rows = ", ".join(
                "(" + ", ".join(_g9_val(rng, t) for _, t in cols) + ")"
                for _ in range(rng.randint(1, 3))
            )
            stmt = f"INSERT INTO {tname} VALUES {rows}"
        else:
            k = rng.randint(1, ncols)
            subset = rng.sample(cols, k)
            stmt = (
                f"INSERT INTO {tname} ({', '.join(n for n, _ in subset)}) "
                f"VALUES ({', '.join(_g9_val(rng, t) for _, t in subset)})"
            )
        spark_stmts.append(stmt)
        duck_stmts.append(stmt)
        maybe_introspect()

    if rng.random() < 0.5:
        # COPY FROM a header csv both engines parse (values NULL-free so the
        # empty-field convention never diverges)
        lines = [",".join(n for n, _ in cols)]
        for _ in range(rng.randint(1, 4)):
            lines.append(
                ",".join(_g9_val(rng, t, allow_null=False).strip("'") for _, t in cols)
            )
        with open(csv_path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        spark_stmts.append(f"COPY {tname} FROM '{csv_path}'")
        duck_stmts.append(f"COPY {tname} FROM '{csv_path}' (FORMAT CSV, HEADER)")
        maybe_introspect()

    shape = rng.randrange(4)
    thr = rng.randint(-20, 20)
    if shape == 0:
        # declared CTE column list + chained CTE + WHERE alias shadowing:
        # y names BOTH the select alias (x+1) and v's column — the column
        # must win in both engines (reference binder semantics)
        q = (
            f"WITH w(x, y, z) AS (SELECT c0, c1, c2 FROM {tname}), "
            f"v AS (SELECT x, y FROM w WHERE x IS NOT NULL) "
            f"SELECT x + 1 AS y, y AS yy FROM v WHERE y > {thr}"
        )
    elif shape == 1:
        order = ", ".join(
            f"{n} ASC NULLS FIRST" for n, _ in cols[1 : rng.randint(2, ncols)]
        ) or "c1 ASC NULLS FIRST"
        q = (
            f"SELECT c0, c1, ROW_NUMBER() OVER (PARTITION BY c0 ORDER BY {order}) AS rn "
            f"FROM {tname} QUALIFY rn <= 2"
        )
    elif shape == 2:
        q = (
            f"SELECT s.x + 1 AS x2 FROM "
            f"(WITH iw AS (SELECT c0 AS x FROM {tname} WHERE c0 IS NOT NULL) "
            f"SELECT x FROM iw) s WHERE s.x > {thr}"
        )
    else:
        q = (
            f"SELECT a.c0, l.mx FROM {tname} a, "
            f"LATERAL (SELECT MAX(c1) AS mx FROM {tname} b WHERE b.c0 = a.c0) l "
            f"WHERE a.c0 IS NOT NULL"
        )
    return spark_stmts, duck_stmts, q


_NUM_CASES9 = 25


@pytest.mark.parametrize("case", list(range(_NUM_CASES9)))
def test_v2_ddl_introspection_end_to_end_fuzz(case, spark, duck, tmp_path):
    from templatedb_spark.slt import SltSession

    rng = random.Random(_SEED + 9000 + case)
    tname = f"t9e_{case}"
    spark_stmts, duck_stmts, query = _gen_script9(
        rng, tname, str(tmp_path / f"{tname}.csv")
    )
    sess = SltSession(spark, base_dir=".", strict=False)
    for s in spark_stmts:
        sess.run(s)  # introspection statements must execute, not just parse
    duck.sql(f"DROP TABLE IF EXISTS {tname}")
    for s in duck_stmts:
        duck.sql(s)
    got = normalize_pdf(sess.run(query).toPandas())
    want = normalize_pdf(duck.sql(query).df())
    duck.sql(f"DROP TABLE IF EXISTS {tname}")
    spark.catalog.dropTempView(tname)
    assert got == want, "\n".join(spark_stmts) + "\n-- " + query
