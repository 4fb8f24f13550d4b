"""Python UDTFs — the extensibility twin of the reference's table-function
protocol (bind → schema, execute → row stream; reference:
function/table/table_function.rs:26-49).

The reference's TVFs each get a faster native mapping elsewhere (read_csv →
spark.read.csv, introspection → spark.catalog); this module provides the
*user-defined* path: arbitrary Python table functions registered into SQL.
Note the engine's own hot paths never use these (dedup shingling runs as JVM
explode/transform — see operators/dedup.shingles); UDTFs are the escape hatch
for user logic, same position the reference's table-function registry holds.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, sh: string")
class ShingleUDTF:
    """Word n-gram shingles of a text: SELECT * FROM shingles('a b c d', 3)."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        toks = re.findall(r"[a-z0-9]+", text.lower())
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="tok: string, count: int")
class TokenCountUDTF:
    """Per-token counts of a text (table-function form of a word-count)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        counts: dict[str, int] = {}
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            counts[t] = counts.get(t, 0) + 1
        for tok, n in sorted(counts.items()):
            yield tok, n


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("shingles", ShingleUDTF)
    spark.udtf.register("token_counts", TokenCountUDTF)
