"""Property test: the cross-engine hash convention (functions/hashing) must be
bit-identical between Spark and DuckDB over arbitrary strings — this is the
foundation every minhash/simhash oracle stands on.

The reference has no property-based tests at all (SURVEY.md §5.3); hypothesis
generates the adversarial corpus here (unicode, quotes, empties), evaluated in
ONE Spark job / ONE DuckDB query per run.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


@st.composite
def corpus(draw):
    return draw(
        st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=50,
            unique=True,
        )
    )


@settings(max_examples=5, deadline=None)
@given(corpus())
def test_md5_long_matches_duckdb(spark_global, strings):
    import duckdb

    from pyspark.sql import functions as F

    from templatedb_spark.functions.hashing import MERSENNE_31, h32, md5_long, md5_long_sql

    sdf = spark_global.createDataFrame([(s,) for s in strings], "s string").select(
        "s", md5_long(F.col("s")).alias("h"), h32(F.col("s")).alias("h32")
    )
    got = {r.s: (r.h, r.h32) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = {
        s: (h, hm)
        for s, h, hm in con.sql(
            f"SELECT s, {md5_long_sql('s')}, {md5_long_sql('s')} % {MERSENNE_31} FROM t"
        ).fetchall()
    }
    assert got == want


# hypothesis re-runs the function per example; a session-scoped spark fixture
# can't be injected via @given, so alias it through a module-level fixture
import pytest


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
