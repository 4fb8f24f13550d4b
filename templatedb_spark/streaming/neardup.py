"""Streaming near-duplicate detection: MinHash banding with per-band state.

The batch spec `dedup_minhash_lsh` finds near-dup pairs with a banded
self-join. This is its online twin for a document firehose:

1. **Signatures are a row-local map** — the k=16 minhash values are computed
   per incoming document with the SAME md5-derived universal-hash family the
   batch path aggregates over exploded shingles (`functions/hashing.py`),
   here as an Arrow-batched `mapInPandas` (hashlib md5 + one numpy matrix op
   for all 16 affine mins). No streaming aggregation is needed to build a
   signature; it happens map-side in the micro-batch. Why Python and not a
   SQL expression: the batch path's explode+groupBy shape is whole-stage
   codegen, but a streaming micro-batch can't put an aggregation before the
   stateful operator, and the in-row SQL alternatives are higher-order
   functions (transform/aggregate lambdas) that Spark evaluates INTERPRETED
   — measured ~9 s per 2500-doc trigger vs well under 1 s for the
   vectorized pandas map. mapInPandas also acts as a materialization
   barrier, so banding's posexplode fans out computed values, never the
   expression tree (CollapseProject re-inlines projections through
   repartition, so a repartition is NOT such a barrier — measured).
2. **Banding is an explode** — each doc emits k rows keyed by (band index,
   minhash value); docs colliding on a band key are near-dup candidates.
3. **Pairing is sharded band state** (`applyInPandasWithState` keyed by
   (band, mh % _STATE_SHARDS)): state holds the (mh, doc_id, full signature)
   of every earlier doc seen in the shard; each arrival is scored against
   the earlier docs with the SAME mh (its true LSH bucket — the shard is
   only a packing unit) by matching-position count >= 8 of 16, i.e.
   estimated Jaccard >= 0.5, then appended. Sharding matters operationally:
   keying state by the raw (band, mh) value creates one state group — one
   Python call per micro-batch — per distinct bucket (~80k groups at sf0.1,
   measured: the whole spec blew past 100 s on Python call overhead alone).
   The shard key bounds the group count at 16 × _STATE_SHARDS regardless of
   corpus size while keeping per-group work vectorizable; at cluster scale
   you raise _STATE_SHARDS with the executor count.

The stream's distinct emitted pairs equal the batch spec's output exactly
(asserted in tests/test_stateful_streaming.py) — the same pair found via
several shared bands carries the same match count, so distinct() collapses it.

Scale: per-band state is the bucket's resident signature list. In the exact
twin mode it is unbounded by design (all-pairs within a bucket, matching the
batch semantics). The PRODUCTION mode (`mode="representatives"`, r7 — the
last documented unbounded-state caveat closed) caps every bucket at ONE
resident: the first-arriving doc is elected the bucket's representative
(`semantic_dedup`'s earliest-wins election applied online), later arrivals
are scored against the representative only and never enter state — per-band
state is one signature per DISTINCT bucket instead of one per doc, so k-copy
dup groups cost 1 resident instead of k. `evict_horizon` additionally bounds
bucket LIFETIME: doc_id is the stream's arrival order (the event-time
proxy), and a representative not touched within the last `horizon` doc_ids
is evicted — the watermark analog, after which the bucket re-elects. Both
knobs are deterministic given an ordered stage, so the mode sits under the
same DuckDB oracle discipline as the exact twin (streaming/gate.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from templatedb_spark.functions.hashing import MERSENNE_31
from templatedb_spark.operators.dedup import _MINHASH_MATCH_MIN, _PERMS

_OUTPUT_SCHEMA = "doc_a long, doc_b long, matches long"
_STATE_SCHEMA = "mhs array<bigint>, doc_ids array<bigint>, sigs array<array<bigint>>"
# representative mode: one resident per bucket + its last-touch doc_id clock
_REPS_STATE_SCHEMA = (
    "mhs array<bigint>, doc_ids array<bigint>, sigs array<array<bigint>>, "
    "last_docs array<bigint>"
)
_STATE_SHARDS = 16  # state groups = 16 bands × this; see module docstring


def signature_projection(docs: DataFrame) -> DataFrame:
    """(doc_id, sig): k=16 minhash signature as an Arrow-batched row-local map.

    Identical values to the batch `minhash_signatures_wide` (which MINs the
    same md5-derived hash over the exploded shingle stream): min over a set
    is min over the in-row array. Python twins of the Spark-side pieces —
    tokenizer `regexp_extract_all(lower(text), '[a-z0-9]+')` ≡
    `re.findall('[a-z0-9]+', text.lower())`, distinct word trigrams, and
    hashing.h32 ≡ `int(md5(s).hexdigest()[:15], 16) % MERSENNE_31`; the 16
    universal-hash mins are one numpy (k × n_shingles) matrix op (products
    < 2^62, no int64 overflow — same bound the SQL side relies on). Works
    unchanged on a streaming DataFrame (no aggregation state), and as a
    Python map node it is a hard materialization barrier: downstream
    explodes fan out VALUES, never the expression tree. See the module
    docstring for why the SQL-expression formulation lost by ~10×.
    """
    import numpy as np

    a_vec = np.array([a for a, _ in _PERMS], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in _PERMS], dtype=np.int64)[:, None]

    def compute(batches):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        tok = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            out_ids: list[int] = []
            out_sigs: list[list[int]] = []
            for doc_id, text in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
                toks = tok.findall((text or "").lower())
                if len(toks) < 3:
                    continue
                shs = {
                    f"{toks[i]} {toks[i + 1]} {toks[i + 2]}"
                    for i in range(len(toks) - 2)
                }
                hs = np.fromiter(
                    (
                        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
                        % MERSENNE_31
                        for s in shs
                    ),
                    dtype=np.int64,
                    count=len(shs),
                )
                sig = ((a_vec * hs[None, :] + b_vec) % MERSENNE_31).min(axis=1)
                out_ids.append(int(doc_id))
                out_sigs.append([int(x) for x in sig])
            yield pd.DataFrame({"doc_id": out_ids, "sig": out_sigs})

    return docs.select("doc_id", "text").mapInPandas(
        compute, "doc_id long, sig array<bigint>"
    )


def banded(sigs: DataFrame) -> DataFrame:
    """Explode each doc's signature into k band-keyed rows carrying the full
    signature (band size 1 = max recall, matching the batch spec)."""
    return sigs.select(
        "doc_id",
        "sig",
        F.posexplode("sig").alias("band", "mh"),
    ).select("band", "mh", "doc_id", "sig")


def _band_group(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    if state.exists:
        mhs, doc_ids, sigs = state.get
        mhs = list(mhs)
        doc_ids = list(doc_ids)
        sigs = [list(s) for s in sigs]
    else:
        mhs, doc_ids, sigs = [], [], []

    # mh -> earlier (doc_id, sig) in THIS shard: the true LSH bucket index,
    # so a shard never compares docs that don't actually share the band value
    seen: dict[int, list[tuple[int, list[int]]]] = {}
    for m, d, s in zip(mhs, doc_ids, sigs):
        seen.setdefault(m, []).append((d, s))

    arrivals: list[tuple[int, int, list[int]]] = []
    for pdf in pdfs:
        for m, doc, sig in zip(
            pdf["mh"].tolist(), pdf["doc_id"].tolist(), pdf["sig"].tolist()
        ):
            arrivals.append((int(doc), int(m), [int(x) for x in sig]))
    arrivals.sort()

    out = []
    for doc, m, sig in arrivals:
        for prev_doc, prev_sig in seen.get(m, ()):
            if prev_doc == doc:
                continue
            matches = sum(1 for x, y in zip(sig, prev_sig) if x == y)
            if matches >= _MINHASH_MATCH_MIN:
                a, b = sorted((prev_doc, doc))
                out.append({"doc_a": a, "doc_b": b, "matches": matches})
        seen.setdefault(m, []).append((doc, sig))
        mhs.append(m)
        doc_ids.append(doc)
        sigs.append(sig)

    state.update((mhs, doc_ids, sigs))
    yield pd.DataFrame(out, columns=["doc_a", "doc_b", "matches"])


def _band_group_reps(
    key: tuple, pdfs: Iterator, state: GroupState, evict_horizon: int | None = None
) -> Iterator:
    """Representative-election twin of _band_group — the BOUNDED-STATE
    production policy (module docstring). Per bucket (mh) the state holds
    exactly ONE (doc_id, sig): the first arrival, `semantic_dedup`'s
    earliest-wins election applied online. Later arrivals are scored against
    the representative only (emit (rep, doc) on >= _MINHASH_MATCH_MIN) and
    are NEVER appended — state grows with DISTINCT buckets, not docs, so a
    k-copy dup group costs 1 resident instead of k and the all-pairs
    quadratic inside a hot bucket is gone.

    `evict_horizon` bounds bucket lifetime: doc_id is the staged stream's
    arrival order (the event-time proxy); a representative last touched more
    than `horizon` doc_ids before an arrival is stale — the arrival
    re-elects itself instead of pairing (watermark semantics), and stale
    entries are dropped from state after the batch. Deterministic for an
    ordered stage, unlike wall-clock timeouts."""
    import pandas as pd

    if state.exists:
        mhs, doc_ids, sigs, last_docs = state.get
        reps: dict[int, list] = {
            m: [d, list(s), lb]
            for m, d, s, lb in zip(mhs, doc_ids, sigs, last_docs)
        }
    else:
        reps = {}

    arrivals: list[tuple[int, int, list[int]]] = []
    for pdf in pdfs:
        for m, doc, sig in zip(
            pdf["mh"].tolist(), pdf["doc_id"].tolist(), pdf["sig"].tolist()
        ):
            arrivals.append((int(doc), int(m), [int(x) for x in sig]))
    arrivals.sort()

    out = []
    clock = 0
    for doc, m, sig in arrivals:
        clock = max(clock, doc)
        rep = reps.get(m)
        if rep is not None and evict_horizon is not None and rep[2] < doc - evict_horizon:
            rep = None  # stale representative: the bucket re-elects below
        if rep is None:
            reps[m] = [doc, sig, doc]
            continue
        rep_doc, rep_sig, _ = rep
        if rep_doc != doc:
            matches = sum(1 for x, y in zip(sig, rep_sig) if x == y)
            if matches >= _MINHASH_MATCH_MIN:
                a, b = sorted((rep_doc, doc))
                out.append({"doc_a": a, "doc_b": b, "matches": matches})
        rep[2] = doc  # the bucket was touched: refresh its eviction clock

    if evict_horizon is not None:
        reps = {m: r for m, r in reps.items() if r[2] >= clock - evict_horizon}

    items = sorted(reps.items())
    state.update(
        (
            [m for m, _ in items],
            [r[0] for _, r in items],
            [r[1] for _, r in items],
            [r[2] for _, r in items],
        )
    )
    yield pd.DataFrame(out, columns=["doc_a", "doc_b", "matches"])


def stream_neardup_pairs(
    docs_stream: DataFrame,
    mode: str = "exact",
    evict_horizon: int | None = None,
) -> DataFrame:
    """Streaming near-dup candidate pairs (may repeat a pair across bands —
    consumers distinct()).

    mode="exact": batch-equivalent all-pairs within each band bucket
    (unbounded per-bucket state — the audit twin of dedup_minhash_lsh).
    mode="representatives": the bounded-state production policy — one
    elected representative per bucket, optional `evict_horizon` lifetime
    bound (see _band_group_reps)."""
    if mode not in ("exact", "representatives"):
        raise ValueError(f"unknown near-dup mode: {mode!r}")
    if evict_horizon is not None and mode != "representatives":
        raise ValueError("evict_horizon applies to mode='representatives' only")
    # repartition BEFORE the signature map: a micro-batch is one staged file
    # = ONE scan task, so without the shuffle the md5 work serializes on a
    # single core (measured: the dominant per-trigger cost)
    sigs = signature_projection(docs_stream.repartition("doc_id"))
    b = banded(sigs)
    shard = F.pmod(F.col("mh"), F.lit(_STATE_SHARDS)).alias("shard")
    grouped = b.select("band", shard, "mh", "doc_id", "sig").groupBy("band", "shard")
    if mode == "representatives":
        import functools

        return grouped.applyInPandasWithState(
            functools.partial(_band_group_reps, evict_horizon=evict_horizon),
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_REPS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return grouped.applyInPandasWithState(
        _band_group,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_documents_stream(spark: SparkSession, stage_dir: str) -> DataFrame:
    schema = spark.read.parquet(stage_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
