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
    (src/query_engine/src/db.rs:125-168) equivalent, where stages 2-6 are Catalyst.

    ``base_dir`` anchors relative file paths in ``FROM 'file.csv'`` / ``read_csv``
    (the reference resolves them against its process cwd — sql_logic.rs:6-9 chdirs
    to the repo root). ``catalog`` (a :class:`templatedb_spark.ddl.Catalog`) backs
    the introspection TVFs when present, so declared logical types are reported.
    """

    def __init__(self, spark: SparkSession, strict: bool = False, base_dir: str = ".", catalog=None):
        self.spark = spark
        self.strict = strict
        self.base_dir = base_dir
        self.catalog = catalog
        self._view_n = 0
        register_builtin_functions(spark)

    # -- catalog -----------------------------------------------------------
    def register_parquet_dir(self, sf_dir: str):
        return register_parquet_dir(self.spark, sf_dir)

    def register_csv_dir(self, csv_dir: str):
        return register_csv_dir(self.spark, csv_dir)

    # -- table-source rewrites ----------------------------------------------
    def _fresh_view(self, df: DataFrame, prefix: str) -> str:
        self._view_n += 1
        name = f"__{prefix}_{self._view_n}"
        df.createOrReplaceTempView(name)
        return name

    def _resolve(self, path: str) -> str:
        import os

        return path if os.path.isabs(path) else os.path.join(self.base_dir, path)

    def _rewrite_read_csv(self, query: str) -> str:
        """`FROM read_csv('f.csv'[, header=>b, delim=>'c'])` → registered view.

        The reference binds read_csv as a TVF (function/table/read_csv.rs:18-210);
        with header=>false it names columns column_1.. (table_function.slt:23-29).
        """
        from templatedb_spark.sources.csv import read_csv

        def repl(m: re.Match) -> str:
            args = m.group(1)
            pm = re.search(r"'([^']+)'", args)
            if not pm:
                return m.group(0)
            header = not re.search(r"(?i)header\s*=>\s*false", args)
            dm = re.search(r"(?i)delim\s*=>\s*'([^']*)'", args)
            df = read_csv(
                self.spark, self._resolve(pm.group(1)),
                header=header, delim=dm.group(1) if dm else ",",
            )
            if not header:
                df = df.toDF(*[f"column_{i + 1}" for i in range(len(df.columns))])
            return self._fresh_view(df, "read_csv")

        return re.sub(r"(?is)\bread_csv\s*\(([^)]*)\)", repl, query)

    def _rewrite_quoted_csv(self, query: str) -> str:
        """Implicit `FROM 'file.csv' [alias]` binding (reference: read_csv.rs /
        table_function.slt:37-52 — the bare path binds as a table whose qualifier
        is the file stem, or the explicit alias when given).

        The view gets a fresh name and the file stem becomes an ALIAS, so an
        existing table with the same name isn't clobbered and `stem.col`
        references still resolve.
        """
        import os

        from templatedb_spark.sources.csv import read_csv

        def repl(m: re.Match) -> str:
            kw, path, alias = m.group(1), m.group(2), m.group(3)
            stem = os.path.splitext(os.path.basename(path))[0]
            df = read_csv(self.spark, self._resolve(path))
            view = self._fresh_view(df, "csvfile")
            return f"{kw} {view} AS {alias or stem}"

        return re.sub(
            r"(?is)\b(from|join)\s+'([^']+\.csv)'(?:\s+(?:as\s+)?(\w+))?",
            repl,
            query,
        )

    def _rewrite_introspection(self, query: str) -> str:
        """template_query_tables() / template_query_columns() TVFs
        (reference: function/table/query_tables.rs, query_columns.rs)."""
        from templatedb_spark.functions.introspect import query_columns, query_tables

        if re.search(r"(?i)template_query_tables\s*\(\s*\)", query):
            view = self._fresh_view(query_tables(self.spark, catalog=self.catalog), "tables")
            query = re.sub(r"(?i)template_query_tables\s*\(\s*\)", view, query)
        if re.search(r"(?i)template_query_columns\s*\(\s*\)", query):
            view = self._fresh_view(query_columns(self.spark, catalog=self.catalog), "columns")
            query = re.sub(r"(?i)template_query_columns\s*\(\s*\)", view, query)
        return query

    @staticmethod
    def _normalize_offset_limit(query: str) -> str:
        """The reference grammar accepts `OFFSET n LIMIT m` (order.slt:1-5);
        Spark only parses `LIMIT m OFFSET n` — swap."""
        return re.sub(
            r"(?is)\boffset\s+(\d+)\s+limit\s+(\d+)", r"limit \2 offset \1", query
        )

    def _check_derived_alias(self, query: str) -> None:
        """The reference requires FROM-subqueries to carry an alias, like
        Postgres (tests/slt/subquery.slt:4-7); Spark would accept them."""
        for m in re.finditer(r"(?is)\b(?:from|join)\s*\(\s*select\b", query):
            depth, j = 0, m.end() - len("select") - 1
            for j in range(m.start(), len(query)):
                if query[j] == "(":
                    depth += 1
                elif query[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            rest = query[j + 1 :].lstrip()
            am = re.match(r"(?i)(?:as\s+)?([a-z_]\w*)", rest)
            if not am or am.group(1).lower() in (
                "where", "group", "order", "limit", "having", "on", "join",
                "inner", "left", "right", "full", "cross", "union",
                "intersect", "except",
            ):
                raise StrictTypeError(
                    "subquery in FROM must have an alias (reference: subquery.slt:4-7)"
                )

    # -- query -------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        if self.strict and _STRICT_CMP_RE.search(query):
            raise StrictTypeError(
                "comparison between string literal and numeric literal "
                "(reference rejects at bind time: comparison_function.slt:1-8)"
            )
        if self.strict:
            self._check_derived_alias(query)
        from templatedb_spark.functions.registry import rewrite_named_arithmetic

        query = rewrite_named_arithmetic(query)
        query = self._rewrite_read_csv(query)
        query = self._rewrite_quoted_csv(query)
        query = self._rewrite_introspection(query)
        query = self._normalize_offset_limit(query)
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

        from decimal import Decimal

        def fmt(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, str):
                return "(empty)" if v == "" else v
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float) and v == int(v):
                return str(int(v))
            if isinstance(v, Decimal):
                return str(int(v)) if v == v.to_integral_value() else str(v.normalize())
            return str(v)

        return [[fmt(v) for v in row] for row in df.collect()]
