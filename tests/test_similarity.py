"""Similarity search: IVF recall against the brute-force baseline, and
multimodal feature plumbing."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=3 over ~10 buckets should recover most of the exact
    top-5; assert a recall floor so parameter regressions get caught."""
    from templatedb_spark.operators.similarity import ann_cosine_topk, ann_ivf_topk

    exact = {
        (r.qid, r.vec_id) for r in ann_cosine_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r.qid, r.vec_id) for r in ann_ivf_topk(spark, SF_SMALL).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"


def test_brute_force_is_jvm_side(spark):
    """The brute-force scorer must stay off the Python-UDF slow path."""
    from templatedb_spark.operators.similarity import ann_cosine_topk
    from templatedb_spark.plans.explain import uses_python_udf

    assert not uses_python_udf(ann_cosine_topk(spark, SF_SMALL))


def test_multimodal_decode_stub(spark):
    from templatedb_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"payload", codec="real")
    fake = decode_image(b"0123456789abcdef", codec="fake")
    assert len(fake) == 4 and len(fake[0]) == 4
    assert fake[0][0] == ord("0")


def test_multimodal_features_batch_shape(spark):
    from templatedb_spark.operators.multimodal import multimodal_features

    df = multimodal_features(spark, SF_SMALL)
    assert df.columns == ["doc_id", "n_bytes", "first_byte", "byte_sum_mod", "fake_pixel_mean"]
    rows = df.limit(5).collect()
    assert all(r.n_bytes > 0 for r in rows)


def test_lsh_recall_and_boundedness(spark):
    """Multi-probe LSH: assert (a) a recall floor against the exact top-5 so
    hyperplane/probe regressions get caught, and (b) the candidate set is
    genuinely bounded — no query scores anywhere near the whole corpus (the
    property that makes LSH the scale path; 6 bits + bits+1 probes covers at
    most ~(bits+1)/2^bits of the space in expectation)."""
    from templatedb_spark.operators.similarity import ann_cosine_topk, ann_lsh_topk
    from templatedb_spark.suite import table
    from pyspark.sql import functions as F

    exact = {(r.qid, r.vec_id) for r in ann_cosine_topk(spark, SF_SMALL).collect()}
    approx = {(r.qid, r.vec_id) for r in ann_lsh_topk(spark, SF_SMALL).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"LSH recall collapsed: {recall:.2f}"

    # boundedness: bucket population is spread out, so the largest bucket
    # (an upper bound on any single probe's candidate contribution) is a
    # small fraction of the corpus
    from templatedb_spark.operators.similarity import _lsh_sig_col, _vec_double

    e = table(spark, SF_SMALL, "embeddings").select(
        _lsh_sig_col(_vec_double("embedding")).alias("sig")
    )
    total = e.count()
    biggest = e.groupBy("sig").count().agg(F.max("count")).collect()[0][0]
    assert biggest < total * 0.25, (biggest, total)
