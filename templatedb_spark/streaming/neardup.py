"""Streaming near-duplicate detection: MinHash banding with per-band state.

The batch spec `dedup_minhash_lsh` finds near-dup pairs with a banded
self-join. This is its online twin for a document firehose:

1. **Signatures are a row-local projection** — the k=16 minhash values are
   computed per incoming document with the SAME md5-derived universal-hash
   expressions the batch path aggregates over exploded shingles
   (`functions/hashing.py`), rewritten as in-row `array_min(transform(...))`
   over the document's distinct shingle array. No streaming aggregation is
   needed to build a signature; it happens map-side in the micro-batch.
2. **Banding is an explode** — each doc emits k rows keyed by (band index,
   minhash value); docs colliding on a band key are near-dup candidates.
3. **Pairing is per-band state** (`applyInPandasWithState` keyed by the band
   key): state holds the (doc_id, full signature) of every earlier doc seen
   in this bucket; each arrival is scored against them (matching-position
   count >= 8 of 16, i.e. estimated Jaccard >= 0.5) and appended.

The stream's distinct emitted pairs equal the batch spec's output exactly
(asserted in tests/test_stateful_streaming.py) — the same pair found via
several shared bands carries the same match count, so distinct() collapses it.

Scale: per-band state is the bucket's resident signature list. In this exact
twin mode it is unbounded by design (all-pairs within a bucket, matching the
batch semantics); a production firehose caps it with a representative policy
(keep the earliest/centroid doc per bucket — new docs then match against one
representative, which is `semantic_dedup`'s election rule applied online).
Watermark/timeout eviction bounds bucket lifetime the same way the other
stateful twins bound per-user state.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from templatedb_spark.functions.hashing import MERSENNE_31
from templatedb_spark.operators.dedup import _MINHASH_K, _MINHASH_MATCH_MIN, _PERMS

_OUTPUT_SCHEMA = "doc_a long, doc_b long, matches long"
_STATE_SCHEMA = "doc_ids array<bigint>, sigs array<array<bigint>>"

# In-row twin of operators/dedup.shingles(): distinct word trigrams.
_SHINGLES_EXPR = (
    "array_distinct(transform(sequence(1, size(t) - 2), "
    "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))"
)
# In-row twin of hashing.h32: md5-derived 31-bit universal hash.
_H32_EXPR = f"(CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % {MERSENNE_31})"


def signature_projection(docs: DataFrame) -> DataFrame:
    """(doc_id, sig): k=16 minhash signature as a pure row-local projection.

    Identical values to the batch `minhash_signatures_wide` (which MINs the
    same hash over the exploded shingle stream): min over a set is min over
    the in-row array. Works unchanged on a streaming DataFrame because no
    aggregation state is involved.
    """
    toks = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("t"),
    ).filter(F.size("t") >= 3)
    sh = toks.select("doc_id", F.expr(_SHINGLES_EXPR).alias("shs"))
    mins = [
        F.array_min(
            F.expr(
                f"transform(shs, s -> ({a} * {_H32_EXPR} + {b}) % {MERSENNE_31})"
            )
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_PERMS)
    ]
    wide = sh.select("doc_id", *mins)
    return wide.select(
        "doc_id", F.array(*[f"mh_{i}" for i in range(_MINHASH_K)]).alias("sig")
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
        doc_ids, sigs = state.get
        doc_ids = list(doc_ids)
        sigs = [list(s) for s in sigs]
    else:
        doc_ids, sigs = [], []

    arrivals: list[tuple[int, list[int]]] = []
    for pdf in pdfs:
        for doc, sig in zip(pdf["doc_id"].tolist(), pdf["sig"].tolist()):
            arrivals.append((int(doc), [int(x) for x in sig]))
    arrivals.sort()

    out = []
    for doc, sig in arrivals:
        for prev_doc, prev_sig in zip(doc_ids, sigs):
            if prev_doc == doc:
                continue
            matches = sum(1 for x, y in zip(sig, prev_sig) if x == y)
            if matches >= _MINHASH_MATCH_MIN:
                a, b = sorted((prev_doc, doc))
                out.append({"doc_a": a, "doc_b": b, "matches": matches})
        doc_ids.append(doc)
        sigs.append(sig)

    state.update((doc_ids, sigs))
    yield pd.DataFrame(out, columns=["doc_a", "doc_b", "matches"])


def stream_neardup_pairs(docs_stream: DataFrame) -> DataFrame:
    """Streaming near-dup candidate pairs (may repeat a pair across bands —
    consumers distinct())."""
    b = banded(signature_projection(docs_stream))
    return b.groupBy("band", "mh").applyInPandasWithState(
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
