"""Engine: the `sql()` entry point plus reference-semantics shims.

The reference's query lifecycle (SURVEY.md §3) — parse → bind → plan → HepOptimizer →
executors — collapses into `spark.sql()`: Catalyst performs every rewrite the
reference implements (predicate/limit pushdown, column pruning, project collapsing,
cast simplification; SURVEY.md §4.1 maps each rule to its built-in Catalyst
equivalent). What remains for us is the *semantic* surface the reference exposes
that Spark does not match 1:1:

1. **WHERE-clause alias substitution** (reference: planner/binder/expression_binder/
   column_alias_binder.rs; tests/slt/filter.slt:30-45): `SELECT v1+1 AS a ... WHERE a >= 2`
   must resolve `a` to `v1+1`. Spark resolves lateral aliases in SELECT but not WHERE;
   we substitute the alias expression textually before planning.
2. **Strict comparison typing** (reference: function/comparison/default_comparison.rs:10-78;
   comparison_function.slt:1-8): `'abc' > 10` is a bind error in the reference while
   Spark would coerce; `strict=True` rejects literal string↔numeric comparisons.
3. **slt result formatting**: NULL prints `NULL`, empty string prints `(empty)`
   (reference: tests/slt/select.slt:1-7).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from templatedb_spark.catalog import register_csv_dir, register_parquet_dir
from templatedb_spark.functions.registry import register_builtin_functions

_ALIAS_RE = re.compile(
    r"(?i)select\s+(?:distinct\s+)?(.*?)\s+from\s", re.DOTALL
)
# literal string compared to numeric literal, either direction
_STRICT_CMP_RE = re.compile(
    r"""'(?:[^'\\]|\\.)*'\s*(?:=|!=|<>|<=|>=|<|>)\s*\d+(?:\.\d+)?
      | \d+(?:\.\d+)?\s*(?:=|!=|<>|<=|>=|<|>)\s*'(?:[^'\\]|\\.)*'""",
    re.VERBOSE,
)


class StrictTypeError(ValueError):
    """Raised in strict mode for comparisons the reference's binder rejects."""


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren/quote depth 0."""
    out, depth, cur, in_str = [], 0, [], False
    for ch in s:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == sep and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def extract_select_aliases(sql: str) -> dict[str, str]:
    """Map select-list alias → source expression (textual)."""
    m = _ALIAS_RE.search(sql)
    if not m:
        return {}
    aliases: dict[str, str] = {}
    for item in _split_top_level(m.group(1)):
        am = re.match(r"(?is)(.+?)\s+as\s+(\w+)\s*$", item)
        if am and am.group(1).strip() != am.group(2).strip():
            aliases[am.group(2)] = f"({am.group(1).strip()})"
    return aliases


def substitute_where_aliases(sql: str, aliases: dict[str, str]) -> str:
    """Replace alias names with their expressions inside the WHERE clause only."""
    if not aliases:
        return sql
    wm = re.search(r"(?is)\bwhere\b(.*?)(\bgroup\s+by\b|\border\s+by\b|\blimit\b|\bhaving\b|$)", sql)
    if not wm:
        return sql
    where = wm.group(1)
    for name, expr in aliases.items():
        where = re.sub(rf"(?<![\w.]){re.escape(name)}(?![\w.])", expr, where)
    return sql[: wm.start(1)] + where + sql[wm.end(1) :]


class Engine:
    """Session + catalog + sql() entry. The reference's `Database::run(sql)`
    (src/query_engine/src/db.rs:125-168) equivalent, where stages 2-6 are Catalyst."""

    def __init__(self, spark: SparkSession, strict: bool = False):
        self.spark = spark
        self.strict = strict
        register_builtin_functions(spark)

    # -- catalog -----------------------------------------------------------
    def register_parquet_dir(self, sf_dir: str):
        return register_parquet_dir(self.spark, sf_dir)

    def register_csv_dir(self, csv_dir: str):
        return register_csv_dir(self.spark, csv_dir)

    # -- query -------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        if self.strict and _STRICT_CMP_RE.search(query):
            raise StrictTypeError(
                "comparison between string literal and numeric literal "
                "(reference rejects at bind time: comparison_function.slt:1-8)"
            )
        from templatedb_spark.functions.registry import rewrite_named_arithmetic

        query = rewrite_named_arithmetic(query)
        query = substitute_where_aliases(query, extract_select_aliases(query))
        return self.spark.sql(query)

    def explain(self, query: str) -> str:
        """EXPLAIN — renders the plan tree as a string
        (reference: bind_explain.rs / physical_explain.rs; tests/slt/explain.slt)."""
        from templatedb_spark.plans.explain import formatted_plan

        return formatted_plan(self.sql(query))

    # -- slt-compatible result rendering ------------------------------------
    @staticmethod
    def format_rows(df: DataFrame) -> list[list[str]]:
        """Render like the reference's record_batch_to_string: NULL / (empty)."""

        def fmt(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, str):
                return "(empty)" if v == "" else v
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float) and v == int(v):
                return str(int(v))
            return str(v)

        return [[fmt(v) for v in row] for row in df.collect()]
