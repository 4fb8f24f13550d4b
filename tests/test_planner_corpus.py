"""Replay the reference's optimizer-rule corpus at the RESULT level.

The reference validates its HepOptimizer with golden plan-tree fixtures
(tests/planner/*.yml + *.planner.sql — 23 queries over its shipped CSV
fixtures). Golden Spark plan text is brittle (SURVEY.md §5.2), and every
rule those fixtures exercise is a stock Catalyst rewrite — so the semantic
claim worth testing is that each corpus query computes the SAME RESULT
here as in an independent engine. Every yml SQL runs verbatim through
Engine.sql AND DuckDB over the reference's own CSVs; queries with
LIMIT/OFFSET but no ORDER BY are legitimately nondeterministic and compare
on row count only. Plan-level counterparts of the four rule families
(pushdown, pruning, limit, collapse) are asserted in tests/test_plans.py.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

_REF_PLANNER = Path("/root/reference/tests/planner")
_REF_CSV = Path("/root/reference/tests/csv")

pytestmark = pytest.mark.skipif(
    not _REF_PLANNER.is_dir(), reason="reference planner corpus not available"
)


def _parse_yml(path: Path) -> list[str]:
    sqls: list[str] = []
    lines = path.read_text().splitlines()
    i = 0
    while i < len(lines):
        if lines[i].strip() == "- sql: |":
            i += 1
            buf: list[str] = []
            while i < len(lines) and not lines[i].lstrip().startswith("desc:"):
                buf.append(lines[i].strip())
                i += 1
            sql = " ".join(x for x in buf if x).strip().rstrip(";").strip()
            if sql:
                sqls.append(sql)
        else:
            i += 1
    return sqls


_CASES = [
    pytest.param(f.stem, q, id=f"{f.stem}-{k}")
    for f in sorted(_REF_PLANNER.glob("*.yml"))
    for k, q in enumerate(_parse_yml(f))
]

_TABLES = ["t1", "t2", "employee", "department", "state"]


@pytest.fixture(scope="module", autouse=True)
def _corpus_tables(spark, duck):
    for t in _TABLES:
        spark.read.csv(
            str(_REF_CSV / f"{t}.csv"), header=True, inferSchema=True
        ).createOrReplaceTempView(t)
        duck.sql(f"DROP VIEW IF EXISTS {t}")
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_csv_auto('{_REF_CSV}/{t}.csv', header=true)"
        )
    yield
    for t in _TABLES:
        spark.catalog.dropTempView(t)


def _positional_rows(pdf) -> list[tuple]:
    """Order-insensitive rows compared POSITIONALLY (the corpus has unaliased
    scalar-subquery columns whose auto-generated names differ per engine)."""
    import math

    rows = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.10g}")
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    rows.sort()
    return rows


@pytest.mark.parametrize("family,sql", _CASES)
def test_planner_corpus_query_matches_duckdb(family, sql, spark, duck):
    from templatedb_spark.engine import Engine

    eng = Engine(spark)
    got_pdf = eng.sql(sql).toPandas()
    want_pdf = duck.sql(sql).df()
    assert len(got_pdf.columns) == len(want_pdf.columns), sql
    if re.search(r"\blimit\b|\boffset\b", sql, re.I) and not re.search(
        r"\border\s+by\b", sql, re.I
    ):
        # unordered LIMIT/OFFSET: any k rows are a correct answer
        assert len(got_pdf) == len(want_pdf), sql
        return
    assert _positional_rows(got_pdf) == _positional_rows(want_pdf), sql
