"""naive_bayes_lang micro-nat lattice boundary safety (ADVICE r7 #1).

The NB spec's cross-engine determinism rests on floor(Q * ln(x)) agreeing
between JVM Math.log and DuckDB's libm log, which can differ by ~1 ulp. A
disagreement flips the quantized log-prob ONLY when Q*ln(x) lands within
~1e-8 of an integer lattice point (Q = 1e6; |ln| <= ~20 so the double error
on Q*ln is bounded by ~2e-8). This test enumerates every distinct ratio the
operator quantizes at the test scale — likelihoods (c+1)/(tot+v), unseen
mass 1/(tot+v), and priors ndl/nd — computes Q*ln(x) to 40 significant
digits with Decimal, and asserts every value sits further than 1e-6 from
the nearest integer: ~50x the worst-case double error, so BOTH engines'
floors provably agree on the audited data. If data ever lands a ratio on
the lattice boundary, this fails loudly instead of a silent argmax flip.
"""

from __future__ import annotations

from decimal import Decimal, getcontext
from pathlib import Path

import duckdb
import pytest

from templatedb_spark.functions.hashing import md5_long_sql
from templatedb_spark.operators.curation import _NB_Q, _NB_TRAIN_PCT
from templatedb_spark.operators.dedup import _TOKENS_SQL

SF_DIR = Path("/root/testdata/sf0.001")

# distance budget: worst-case |computed - true| for Q*ln(x) as a double is
# ~|Q*ln(x)| * 2^-52 * (a few ulps of accumulated log+multiply error)
# <= 1e6 * 20 * 2e-16 * ~5 ~= 2e-8; require 50x that margin.
_MIN_LATTICE_DIST = Decimal("1e-6")


@pytest.mark.skipif(not SF_DIR.is_dir(), reason="driver testdata not present")
def test_nb_quantized_ratios_clear_of_lattice():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    ratios = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id, lang, {_TOKENS_SQL} AS t,
                 ({md5_long_sql("'nb|' || CAST(doc_id AS VARCHAR)")} % 100
                  < {_NB_TRAIN_PCT}) AS is_train
          FROM documents
        ),
        toks AS (SELECT doc_id, lang, is_train, unnest(t) AS tok FROM d),
        cnt AS (SELECT lang, tok, COUNT(*)::BIGINT AS c
                FROM toks WHERE is_train GROUP BY 1, 2),
        tot AS (SELECT lang, SUM(c)::BIGINT AS tot FROM cnt GROUP BY 1),
        voc AS (SELECT COUNT(DISTINCT tok)::BIGINT AS v FROM toks WHERE is_train),
        ndl AS (SELECT lang, COUNT(*)::BIGINT AS ndl FROM d WHERE is_train GROUP BY 1),
        ndt AS (SELECT SUM(ndl)::BIGINT AS nd FROM ndl)
        SELECT DISTINCT (c + 1)::BIGINT AS num, (tot + v)::BIGINT AS den
        FROM cnt JOIN tot USING (lang), voc
        UNION
        SELECT DISTINCT 1::BIGINT, (tot + v)::BIGINT FROM tot, voc
        UNION
        SELECT DISTINCT ndl::BIGINT, nd::BIGINT FROM ndl, ndt
        """
    ).fetchall()
    con.close()
    assert len(ratios) > 100, "expected a real ratio population at sf0.001"

    getcontext().prec = 40
    worst = Decimal(1)
    for num, den in ratios:
        x = Decimal(num) / Decimal(den)
        q = Decimal(_NB_Q) * x.ln()
        frac = q - q.to_integral_value(rounding="ROUND_FLOOR")
        dist = min(frac, 1 - frac)
        worst = min(worst, dist)
        assert dist > _MIN_LATTICE_DIST, (
            f"ratio {num}/{den}: Q*ln = {q} sits {dist} from the integer "
            "lattice — floor() may disagree across engines"
        )
    # keep the measured margin visible in -v output via the assertion message
    assert worst > _MIN_LATTICE_DIST
