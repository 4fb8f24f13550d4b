"""dedup_ngram_prefix — exactness property vs the brute-force self-join.

The r7 candidate pruning (length filter in the prefix join + PPJoin-style
positional bound) must lose NOTHING: the spec's oracle is still the plain
Jaccard join, and these tests drive the filters through an adversarial
corpus the shipped testdata doesn't contain — similarity spread around the
t = 0.8 design point, and an engineered pair sitting EXACTLY on the
threshold (where a float-rounded boundary or an off-by-one in the integer
bounds would first bite: overlap 8 of |A| = |B| = 9 ⇒ J = 8/10 = 0.8)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _bruteforce_pairs(spark, sf_dir: str, t: float) -> set:
    """Plain shared-shingle self-join at threshold t — the reference
    semantics, no prefix/length/positional pruning anywhere."""
    from templatedb_spark.operators.dedup import hashed_shingles

    sh = hashed_shingles(spark, sf_dir)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    out = (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("ca.n") + F.col("cb.n") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )
    return {(r.doc_a, r.doc_b, r.jaccard) for r in out.collect()}


def _write_docs(tmp_path, docs) -> str:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_prefix_filter_equals_bruteforce_on_adversarial_corpus(spark, tmp_path):
    from templatedb_spark.operators.dedup import _PREFIX_THRESHOLD, dedup_ngram_prefix

    rng = random.Random(7)
    words = [f"w{i}" for i in range(300)]
    docs = []
    did = 0
    for _ in range(15):
        base = [rng.choice(words) for _ in range(40)]
        docs.append((did, " ".join(base)))
        did += 1
        # mutation ladder: k token swaps spread pair similarity across and
        # around the threshold (k=1..2 above, 3..5 straddling, 8+ below)
        for k in (1, 2, 3, 4, 5, 8, 12):
            mut = list(base)
            for _ in range(k):
                mut[rng.randrange(len(mut))] = rng.choice(words)
            docs.append((did, " ".join(mut)))
            did += 1
    sf_dir = _write_docs(tmp_path, docs)

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ngram_prefix(spark, sf_dir).collect()
    }
    want = _bruteforce_pairs(spark, sf_dir, _PREFIX_THRESHOLD)
    assert got == want
    assert len(want) >= 15, "adversarial corpus must actually produce pairs"
    # the ladder must also have produced BELOW-threshold shared-shingle pairs
    # (otherwise the filters were never asked to keep/drop anything close)
    loose = _bruteforce_pairs(spark, sf_dir, 0.3)
    assert len(loose) > len(want)


def test_prefix_filter_keeps_exact_threshold_pair(spark, tmp_path):
    """|A| = |B| = 9 trigram shingles sharing exactly 8 ⇒ J = 8/10 = 0.8 —
    exactly t. The integer-arithmetic bounds must keep it; any float
    boundary slip or an over-tight positional/length bound drops it."""
    from templatedb_spark.operators.dedup import _PREFIX_THRESHOLD, dedup_ngram_prefix

    assert _PREFIX_THRESHOLD == 0.8  # the construction below encodes t=0.8
    a_toks = [f"u{i}" for i in range(11)]
    b_toks = a_toks[:10] + ["u99"]  # only the final trigram differs
    docs = [
        (1, " ".join(a_toks)),
        (2, " ".join(b_toks)),
        # decoys sharing nothing
        (3, " ".join(f"v{i}" for i in range(12))),
        (4, " ".join(f"x{i}" for i in range(12))),
    ]
    sf_dir = _write_docs(tmp_path, docs)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ngram_prefix(spark, sf_dir).collect()
    }
    assert got == {(1, 2, 0.8)}


def _bruteforce_containment(spark, sf_dir: str, t: float) -> set:
    """Plain full self-join containment — the reference semantics."""
    from templatedb_spark.operators.dedup import hashed_shingles

    sh = hashed_shingles(spark, sf_dir)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("da"), F.col("n").alias("n_a"))
    nb = counts.select(F.col("doc_id").alias("db"), F.col("n").alias("n_b"))
    scored = inter.join(na, "da").join(nb, "db")
    ab = scored.select(
        F.col("da").alias("doc_contained"), F.col("db").alias("doc_container"),
        "inter", F.col("n_a").alias("n_contained"),
        F.round(F.col("inter") / F.col("n_a"), 6).alias("containment"),
    )
    ba = scored.select(
        F.col("db").alias("doc_contained"), F.col("da").alias("doc_container"),
        "inter", F.col("n_b").alias("n_contained"),
        F.round(F.col("inter") / F.col("n_b"), 6).alias("containment"),
    )
    out = ab.unionByName(ba).filter(F.col("containment") >= t)
    return {
        (r.doc_contained, r.doc_container, r.inter, r.n_contained, r.containment)
        for r in out.collect()
    }


def test_containment_prefix_equals_bruteforce(spark, tmp_path):
    """Containment equality net. r7 built an asymmetric PPJoin candidate
    path, proved it exact against this very test, then REVERTED it after
    the sf3 measurement came back slower (the full self-join doubles as
    verification — see dedup_containment's in-source negative result). The
    test stays: any future candidate-path change must keep equality with
    the plain full self-join over quoted-subset structure (short docs
    embedded wholesale in long ones) plus a mutation ladder around t."""
    from templatedb_spark.operators.dedup import _CONTAINMENT_T, dedup_containment

    rng = random.Random(11)
    words = [f"w{i}" for i in range(300)]
    docs = []
    did = 0
    for _ in range(10):
        base = [rng.choice(words) for _ in range(40)]
        docs.append((did, " ".join(base)))
        did += 1
        # a short doc quoted wholesale inside a longer one (the asymmetric
        # relation Jaccard misses: J small, containment ≈ 1 for the quote)
        quote = base[5:17]
        docs.append((did, " ".join(quote)))
        did += 1
        long_doc = [rng.choice(words) for _ in range(15)] + base + [
            rng.choice(words) for _ in range(15)
        ]
        docs.append((did, " ".join(long_doc)))
        did += 1
        # mutation ladder straddling t=0.8 on the contained side
        for k in (1, 2, 3, 5):
            mut = list(base)
            for _ in range(k):
                mut[rng.randrange(len(mut))] = rng.choice(words)
            docs.append((did, " ".join(mut)))
            did += 1
    sf_dir = _write_docs(tmp_path, docs)

    got = {
        (r.doc_contained, r.doc_container, r.inter, r.n_contained, r.containment)
        for r in dedup_containment(spark, sf_dir).collect()
    }
    want = _bruteforce_containment(spark, sf_dir, _CONTAINMENT_T)
    assert got == want
    assert len(want) >= 20, "adversarial corpus must produce directed pairs"
    # the quoted-subset structure must actually appear (containment ≈ 1 with
    # asymmetric sizes), or the test isn't exercising the asymmetric case
    assert any(c >= 0.99 and n < 30 for (_, _, _, n, c) in want)


def test_containment_exact_threshold_pair(spark, tmp_path):
    """|A| = 10 shingles, |A∩B| = 8 ⇒ containment(A ⊂ B) = 0.8 exactly —
    the integer bounds must keep the directed row."""
    from templatedb_spark.operators.dedup import _CONTAINMENT_T, dedup_containment

    assert _CONTAINMENT_T == 0.8
    # A: 12 tokens → 10 trigrams; B embeds 10 of A's 12 tokens (t1..t10) so
    # the shared trigram run is t1..t10 → 8 trigrams; B is long enough that
    # only A's direction passes.
    a_toks = [f"a{i}" for i in range(12)]
    b_toks = [f"b{i}" for i in range(10)] + a_toks[:10] + [f"c{i}" for i in range(10)]
    docs = [
        (1, " ".join(a_toks)),
        (2, " ".join(b_toks)),
        (3, " ".join(f"z{i}" for i in range(12))),
    ]
    sf_dir = _write_docs(tmp_path, docs)
    got = {
        (r.doc_contained, r.doc_container, r.containment)
        for r in dedup_containment(spark, sf_dir).collect()
    }
    assert (1, 2, 0.8) in got
    assert not any(c == 2 and f == 1 for (c, f, _) in got)  # B ⊄ A at t
