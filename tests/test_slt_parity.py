"""Ported sqllogictest cases from the reference's slt corpus, run over the
original CSV fixtures (FIXTURES.md). Expected outputs are the reference's own
golden values (reference: tests/slt/*.slt), order-normalized per FIXTURES.md §4.
"""

from __future__ import annotations


def rows(engine, sql: str) -> list[list[str]]:
    return sorted(engine.format_rows(engine.sql(sql)))


# reference: tests/slt/join.slt:1-9 — left join with NULL padding
def test_left_join_employee_department(engine):
    got = rows(
        engine,
        "select employee.id, employee.first_name, employee.last_name, "
        "department.department_name from employee "
        "left join department on employee.department_id = department.id",
    )
    assert got == sorted(
        [
            ["1", "Bill", "Hopkins", "IT"],
            ["2", "Gregg", "Langford", "Marketing"],
            ["3", "John", "Travis", "Engineering"],
            ["4", "Von", "Mill", "NULL"],
        ]
    )


# reference: tests/slt/join.slt right-join arm — department 3 (Finance) matches
# no employee → null-padded left side
def test_right_join_null_padding(engine):
    got = rows(
        engine,
        "select employee.first_name, department.department_name from employee "
        "right join department on employee.department_id = department.id",
    )
    assert got == sorted(
        [
            ["Bill", "IT"],
            ["Gregg", "Marketing"],
            ["NULL", "Finance"],
            ["John", "Engineering"],
        ]
    )


# reference: tests/slt/select.slt:1-7 — NULL prints NULL, empty string prints (empty)
def test_null_and_empty_rendering(engine):
    got = rows(engine, "select state, salary from employee where id = 4")
    assert got == [["(empty)", "NULL"]]


# reference: tests/slt/distinct.slt — t1 has duplicate a=2
def test_distinct_t1(engine):
    got = rows(engine, "select distinct a from t1")
    assert got == sorted([["0"], ["1"], ["2"]])


# reference: tests/slt/aggregation.slt — group agg over t1
def test_group_agg_t1(engine):
    got = rows(engine, "select a, count(a) as cnt, sum(b) as s from t1 group by a")
    assert got == sorted([["0", "1", "4"], ["1", "1", "5"], ["2", "2", "15"]])


# reference: tests/slt/aggregation.slt:22-33 — sum of all-NULL group is NULL
def test_sum_null_group(engine):
    got = rows(engine, "select sum(salary) as s from employee where id = 4")
    assert got == [["NULL"]]


# reference: tests/slt/limit.slt:21-24 — limit 0 returns empty
def test_limit_zero(engine):
    assert rows(engine, "select id from employee order by id limit 0") == []


# reference: tests/slt/limit.slt — offset beyond end
def test_limit_offset(engine):
    got = rows(engine, "select id from employee order by id limit 2 offset 3")
    assert got == [["4"]]


# reference: tests/slt/filter.slt:30-45 — WHERE on select-list alias
def test_where_alias_substitution(engine):
    got = rows(engine, "select id + 10 as big_id from employee where big_id >= 13")
    assert got == sorted([["13"], ["14"]])


# reference: tests/slt/join_filter.slt — join with non-equi residual
def test_join_residual_filter(engine):
    got = rows(
        engine,
        "select t1.a, t2.a from t1 join t2 on t1.b = t2.b and t1.c > t2.c",
    )
    # t1.b=4 matches t2.b=4 (t2.a=40, c=6): t1 rows with b=4: (0,4,7) → 7>6 ✓
    assert got == [["0", "40"]]


# reference: tests/slt/subquery.slt — scalar subquery
def test_scalar_subquery(engine):
    got = rows(
        engine,
        "select id from employee where salary > (select avg(salary) from employee)",
    )
    assert got == sorted([["1"], ["3"]])


# reference: tests/slt/table_function.slt / csv.slt — read_csv TVF
def test_read_csv_tvf(spark):
    from tests.conftest import FIXTURES
    from templatedb_spark.sources.csv import read_csv

    df = read_csv(spark, f"{FIXTURES}/employee.csv")
    assert df.count() == 4
    row4 = df.filter(df.id == 4).collect()[0]
    assert row4.salary is None  # empty numeric field → NULL
    # quoted comma survives (reference employee.csv row 3)
    row3 = df.filter(df.id == 3).collect()[0]
    assert row3.job_title == "Manager, Software"


# reference: function/table/query_tables.rs / query_columns.rs — one row per
# table, bracketed column/type lists (tests/slt/table_function.slt:7-20)
def test_introspection(spark, engine):
    from templatedb_spark.functions.introspect import query_columns, query_tables

    tables = {r.table_name for r in query_tables(spark).collect()}
    assert {"employee", "department", "t1", "t2"} <= tables
    row = query_columns(spark, "employee").collect()[0]
    assert row.table_name == "employee"
    assert row.column_names.startswith("[id, first_name")
    assert row.column_types.startswith("[Integer, Varchar")


# reference: comparison strictness (comparison_function.slt:1-8)
def test_strict_comparison_rejected(spark):
    import pytest

    from templatedb_spark.engine import Engine, StrictTypeError

    eng = Engine(spark, strict=True)
    with pytest.raises(StrictTypeError):
        eng.sql("select * from t1 where 'abc' > 10")


# reference: function registry add/subtract/multiply/divide (function/mod.rs:59-67)
def test_named_arithmetic_rewrite():
    from templatedb_spark.functions.registry import rewrite_named_arithmetic

    assert rewrite_named_arithmetic("select add(1, 2)") == "select (1 + 2)"
    assert (
        rewrite_named_arithmetic("select multiply(subtract(5, 2), 3)")
        == "select ((5 - 2) * 3)"
    )


# reference: tests/slt/conjunction_function.slt:150-159 — Kleene 3-valued logic
def test_kleene_logic(engine):
    got = rows(
        engine,
        "select (false and null) as a, (true and null) as b, "
        "(true or null) as c, (false or null) as d",
    )
    assert got == [["false", "NULL", "true", "NULL"]]


# reference: tests/slt/time.slt — date ± interval year/month/day
def test_date_plus_interval(engine):
    got = rows(
        engine,
        "select cast(cast('2021-01-02' as date) + interval '1' day as date) as d, "
        "cast(cast('2021-01-02' as date) + interval '1' month as date) as m, "
        "cast(cast('2021-01-02' as date) + interval '1' year as date) as y",
    )
    assert got == [["2021-01-03", "2021-02-02", "2022-01-02"]]


# reference: tests/slt/time.slt — interval commutes for +, and date - interval
def test_interval_commute_and_minus(engine):
    got = rows(
        engine,
        "select cast(interval '1' day + cast('2021-01-02' as date) as date) as a, "
        "cast(cast('2021-01-02' as date) - interval '1' day as date) as b",
    )
    assert got == [["2021-01-03", "2021-01-01"]]


# reference: tests/slt/alias.slt — table and column aliases
def test_aliases(engine):
    got = rows(
        engine,
        "select e.id as emp_id, e.salary * 2 as double_pay "
        "from employee as e where e.id <= 2",
    )
    assert got == sorted([["1", "24000"], ["2", "20000"]])


# reference: tests/slt/select.slt:33-39 — qualified star expansion
def test_qualified_star(engine):
    df = engine.sql("select t1.*, t2.a as a2 from t1 join t2 on t1.b = t2.b")
    assert df.columns == ["a", "b", "c", "a2"]


# reference: explain.slt — EXPLAIN renders a plan
def test_explain_renders(engine):
    plan = engine.explain("select id from employee where id > 1")
    assert "Scan" in plan and "PushedFilters" in plan


# reference: tests/slt/scalar_function.slt — add/subtract/multiply/divide run
# through the engine SQL entry (function registry parity end-to-end)
def test_named_arithmetic_through_sql(engine):
    got = rows(engine, "select add(id, 10) as a, multiply(id, 2) as m from employee where id <= 2")
    assert got == sorted([["11", "2"], ["12", "4"]])


# reference: table-function protocol (function/table/table_function.rs) —
# user-defined Python TVFs registered into SQL
def test_python_udtf_table_functions(spark):
    from templatedb_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    got = [tuple(r) for r in spark.sql("SELECT * FROM shingles('A b c d', 3)").collect()]
    assert got == [(0, "a b c"), (1, "b c d")]
    # lateral usage over a table
    got = spark.sql(
        "SELECT t.id, s.sh FROM (SELECT 1 AS id, 'x y z' AS txt) t, "
        "LATERAL shingles(t.txt, 2) s"
    ).collect()
    assert [(r.id, r.sh) for r in got] == [(1, "x y"), (1, "y z")]
    counts = {r.tok: r['count'] for r in spark.sql("SELECT * FROM token_counts('a b a')").collect()}
    assert counts == {"a": 2, "b": 1}


# reference: tests/slt/order.slt — ORDER BY semantics need ordered comparison
# (the one slt file whose expected output is order-sensitive end-to-end).
def ordered_rows(engine, sql: str) -> list[list[str]]:
    return engine.format_rows(engine.sql(sql))


# order.slt:1-5 — order desc + offset/limit compose (offset skips first)
def test_order_desc_offset_limit(engine):
    got = ordered_rows(engine, "select id from employee order by id desc limit 1 offset 2")
    assert got == [["2"]]


# order.slt:7-14 — multi-key: state asc (empty string sorts first), id desc
def test_order_multi_key_asc_desc(engine):
    got = ordered_rows(engine, "select id, state from employee order by state, id desc")
    assert got == [["4", "(empty)"], ["1", "CA"], ["3", "CO"], ["2", "CO"]]


# order.slt:16-20 — order by a non-projected column
def test_order_by_non_projected_column(engine):
    got = ordered_rows(
        engine, "select id from employee order by first_name desc limit 1 offset 2"
    )
    assert got == [["2"]]
