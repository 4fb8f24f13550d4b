"""Analytics operators: semantic assertions beyond the differential oracle
(which already covers exact values in test_suite_oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_sessions_partition_users(spark):
    from templatedb_spark.operators.analytics import sessionize

    df = sessionize(spark, SF_SMALL)
    # session_seq starts at 1 per user and is dense
    per_user = df.groupBy("user_id").agg(
        F.min("session_seq").alias("lo"),
        F.max("session_seq").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = per_user.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count()
    assert bad == 0


def test_asof_never_future(spark):
    from templatedb_spark.operators.analytics import asof_last_purchase

    df = asof_last_purchase(spark, SF_SMALL)
    bad = df.filter(F.col("last_purchase") > F.col("ts")).count()
    assert bad == 0  # as-of must never pick a future purchase


def test_approx_distinct_within_tolerance(spark):
    """The spec's within_tol verdict (|HLL - exact| <= max(2, 5%·exact)) must
    hold for every group — the same predicate the driver oracle now
    hash-compares against constant 1."""
    from templatedb_spark.operators.analytics import approx_distinct_users

    rows = approx_distinct_users(spark, SF_SMALL).collect()
    assert rows and all(r.within_tol == 1 for r in rows), rows


def test_approx_percentile_within_tolerance(spark):
    """Sketch percentiles track the exact sort within 1% of the group's value
    spread — the accuracy contract that justifies the 100 TB swap, now
    emitted as per-group pXX_ok verdicts the driver oracle hash-compares."""
    from templatedb_spark.operators.profiling import approx_percentiles_price

    rows = approx_percentiles_price(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert (r.p50_ok, r.p90_ok, r.p99_ok) == (1, 1, 1), r


def test_semi_anti_partition_customers(spark):
    """semi ∪ anti = all customers; semi ∩ anti = ∅ (same predicate)."""
    from templatedb_spark.operators.analytics import (
        anti_join_customers_without_orders,
        semi_join_customers_with_big_orders,
    )
    from templatedb_spark.suite import table

    semi = {r.c_custkey for r in semi_join_customers_with_big_orders(spark, SF_SMALL).collect()}
    anti = {r.c_custkey for r in anti_join_customers_without_orders(spark, SF_SMALL).collect()}
    allc = {r.c_custkey for r in table(spark, SF_SMALL, "customer").collect()}
    assert semi | anti == allc
    assert not (semi & anti)


def test_rollup_grand_total(spark):
    from templatedb_spark.operators.analytics import rollup_customers_by_geo
    from templatedb_spark.suite import table

    rows = rollup_customers_by_geo(spark, SF_SMALL).collect()
    grand = [r for r in rows if r.r_name is None and r.n_name is None]
    assert len(grand) == 1
    assert grand[0].n_customers == table(spark, SF_SMALL, "customer").count()


def test_dup_clusters_consistent_with_pairs(spark):
    """Every near-dup pair must land in one cluster, and cluster ids are the
    component-minimum doc id (so keep_doc_id == cluster_id)."""
    from templatedb_spark.operators.dedup import dedup_minhash_lsh
    from templatedb_spark.operators.pipeline import dedup_dup_clusters

    pairs = [(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_SMALL).collect()]
    clusters = dedup_dup_clusters(spark, SF_SMALL).collect()
    for c in clusters:
        assert c.keep_doc_id == c.cluster_id
        assert c.n_docs >= 2  # singletons are not dup clusters
    # rebuild membership: cluster_id is the min; recover per-doc labels by
    # union-find over the pairs and compare component structure
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for d in parent:
        comp.setdefault(find(d), set()).add(d)
    expected = {(min(m), len(m), max(m)) for m in comp.values()}
    got = {(c.cluster_id, c.n_docs, c.max_doc_id) for c in clusters}
    assert got == expected


def test_scd2_asof_one_row_per_covered_user(spark):
    """The AS OF snapshot returns at most one segment per user, and that
    segment's interval covers T."""
    from templatedb_spark.operators.pipeline import _ASOF_T, scd2_asof_snapshot

    from tests.conftest import SF_SMALL

    rows = scd2_asof_snapshot(spark, SF_SMALL).collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    for r in rows:
        assert r.valid_from <= _ASOF_T


def test_funnel_components_equal_raw_pair_graph(spark, tmp_path):
    """The round-5 funnel feed's load-bearing claim, tested adversarially:
    connected components over funnel_pair_graph (survivor LSH pairs + star
    edges) must equal components over the RAW LSH pair graph, including
    node sets and min-doc_id labels — on a corpus salted with exact copies
    that differ only in case/whitespace (the exact surface the
    fingerprint-equal ⇒ signature-equal argument rests on)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    doc_id = 0
    for _ in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 12))]
        t = " ".join(words)
        docs.append((doc_id, t)); doc_id += 1
        for _ in range(rng.randint(0, 2)):  # exact copies modulo case/ws
            variant = t.upper() if rng.random() < 0.5 else t.replace(" ", "   ")
            docs.append((doc_id, variant)); doc_id += 1
        if rng.random() < 0.3:  # near-dup: one extra word
            docs.append((doc_id, t + " " + rng.choice(vocab))); doc_id += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": [d[1] for d in docs],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    sf_dir = str(tmp_path)

    from templatedb_spark.operators.dedup import dedup_minhash_lsh
    from templatedb_spark.operators.pipeline import cluster_labels

    raw_pairs = [
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    assert raw_pairs  # the salted corpus must actually produce dup structure
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw_pairs:
        parent[find(a)] = find(b)
    raw_label = {}
    for n in parent:
        raw_label.setdefault(find(n), []).append(n)
    want = {}
    for members in raw_label.values():
        m = min(members)
        for n in members:
            want[n] = m

    got = {r.doc_id: r.label for r in cluster_labels(spark, sf_dir).collect()}
    assert got == want


def test_psi_terms_are_nonnegative(spark):
    """(p−q)·ln(p/q) ≥ 0 per bin, so PSI ≥ 0 always — a sign bug in the
    smoothing or the fold shows up here immediately."""
    from templatedb_spark.operators.profiling import feature_drift_psi

    rows = feature_drift_psi(spark, SF_SMALL).collect()
    assert rows and all(r.psi_x1000000 >= 0 for r in rows), rows
