"""Concurrent-submission chaos gate (VERDICT r2 item 8): the round-2 bench
silently lost 1-4 queries per run to a JVM-heap OOM that only fired under
16-thread concurrent submission. This test turns that failure mode into a
regression gate: submit the suite's heaviest specs from 16 driver threads at
sf0.01 (the correctness-gate scale) against the shared session and assert
EVERY query completes. A single exception here means the bench's headline
makespan would again be quietly excluding failed work.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tests.conftest import SF_ORACLE

# The queries bench.py fronts as its longest-processing-time-first prefix —
# the same population whose failures the round-2 artifacts recorded.
_HEAVIEST = [
    "dedup_ngram_jaccard",
    "dedup_ngram_capped",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "multimodal_features",
    "ann_ivf_topk",
    "multi_join_revenue",
    "q1_pricing_summary",
    "sessionize",
    "string_functions",
    "dedup_levenshtein",
    "approx_distinct_users",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q18_large_orders",
    "percentiles_price",
    "vocab_top_tokens",
    "tfidf_top_terms",
    # late-round-3 heavies (top of the contended bench among the new specs)
    "dedup_substring",
    "pmi_cooccurrence",
    "bigram_logprob",
    "train_val_split",
    "graph_bfs_hops",
    "bpe_encode",
    "bpe_learn_merges",
    "bloom_semi_join",
    # round-5 heavies: the third streaming gate, the funnel-fed graph tier,
    # and the new codecs/top-k rewrites
    "stream_interval_join_clicks",
    "graph_pagerank",
    "graph_triangles",
    "dedup_cascade",
    "multimodal_decode_png_rgb",
    "bm25_topk",
    "rrf_fusion",
    "dedup_ngram_prefix",
]


def test_concurrent_submission_zero_failures(spark):
    from templatedb_spark.suite import all_specs

    specs = all_specs()
    missing = [n for n in _HEAVIEST if n not in specs]
    assert not missing, f"chaos list out of date: {missing}"

    errors: dict[str, str] = {}

    def run_one(name: str) -> None:
        try:
            specs[name].spark(spark, SF_ORACLE).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — the assertion below reports all
            errors[name] = f"{type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(run_one, _HEAVIEST))

    assert not errors, f"concurrent submission lost queries: {errors}"


# ---------------------------------------------------------------------------
# Foreign-CPU tripwire (r8, VERDICT r7 #5): /proc/stat steal% is blind to
# same-host self-contention — NOTES_r9 recorded a 42.96 s artifact produced
# while a verification sweep hammered the same box, and BENCH_r07 started at
# load1 2.81, just under the 3.0 pre-check, with nothing sampled DURING the
# run. bench.foreign_cpu_pct attributes host busy ticks to the bench's own
# process tree vs everything else; these tests prove the attribution fires
# on a genuinely foreign (detached, reparented-to-init) burn and stays
# silent for the bench's own children — synthetic load, real /proc.
# ---------------------------------------------------------------------------
def _measure_window(seconds: float):
    import time

    import bench

    cpu0 = bench._cpu_counters()
    tree0 = bench._tree_cpu_ticks()
    time.sleep(seconds)
    cpu1 = bench._cpu_counters()
    tree1 = bench._tree_cpu_ticks()
    return bench.foreign_cpu_pct(cpu0, cpu1, tree0, tree1)


def test_foreign_cpu_tripwire_fires_on_detached_load():
    import os
    import subprocess

    import bench

    # ADVICE r8: this test injects real detached CPU load — the exact
    # contamination the repo polices — so it must not run beside a timing
    # window, and on an already-loaded host the burners may not get
    # scheduled enough to clear the threshold. Skip when the baseline
    # window is already noisy; allow a hard opt-out for hosts running
    # concurrent benches.
    import pytest

    if os.environ.get("SPARK_GRAFT_SKIP_CHAOS"):
        pytest.skip("SPARK_GRAFT_SKIP_CHAOS set — host shared with a timing run")
    fo_base = _measure_window(1.0)
    if fo_base is None or fo_base > 10.0:
        pytest.skip(f"host already carries {fo_base}% foreign load — burn would flake")

    # double-fork via a short-lived bash: the nohup'd burners reparent to
    # init the moment bash exits, so they are OUTSIDE this test's tree —
    # exactly the shape of a concurrent sweep contaminating a bench window.
    # 6 burners / >8% threshold: enough margin over a quiet baseline while
    # halving the injected contamination vs the original 12-burner shape.
    subprocess.run(
        [
            "bash",
            "-c",
            "for i in $(seq 6); do nohup timeout 2.5 bash -c "
            "'while :; do :; done' >/dev/null 2>&1 & done",
        ],
        check=True,
    )
    fo = _measure_window(2.0)
    assert fo is not None and fo - fo_base > 8.0, (
        f"detached 6-core burn invisible: base {fo_base} -> {fo}"
    )
    why = bench.contention_verdict(None, fo, 3.0, min(5.0, fo_base + 4.0))
    assert why is not None and "foreign" in why


def test_foreign_cpu_quiet_for_own_children():
    import subprocess
    import sys

    # Self-calibrating: whatever foreign load the host happens to carry
    # (another sweep, a daemon) shows up in the baseline window too — the
    # assertion is that OUR OWN 12-core burn adds ~nothing to the foreign
    # number (the bench's worker flood can never trip its own wire). A
    # fixed absolute threshold flaked when a concurrent sf1 sweep ran
    # beside the suite: 23.9% foreign, all of it real and none of it ours.
    fo_base = _measure_window(2.0)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                "import time\nt = time.time()\nwhile time.time() - t < 2.5: pass",
            ]
        )
        for _ in range(12)
    ]
    try:
        fo = _measure_window(2.0)
    finally:
        for p in procs:
            p.wait()
    assert fo is not None and fo_base is not None
    # 12 burners = 37.5% of capacity; attributing even a third of that to
    # "foreign" would be a real bug. 10 points absorbs sampling jitter.
    assert fo < fo_base + 10.0, (
        f"own children misattributed: baseline {fo_base} -> {fo} with burn"
    )
