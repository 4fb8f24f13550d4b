"""Bounded-state streaming exact dedup on ingest (streaming/ingest.py —
native dropDuplicatesWithinWatermark). Pins the three contract points the
oracle gate can't isolate: cross-batch suppression, watermark-horizon
re-admission (the state really is bounded), and batch-split tolerance."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _stage(tmp_path, batches):
    """batches: list of [(doc_id, text)] — one parquet file per micro-batch,
    mtimes forcing pickup order, batch_idx = the stream's arrival clock."""
    stage = tmp_path / "docs_in"
    stage.mkdir(parents=True)
    for i, rows in enumerate(batches):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "batch_idx": pa.array([i] * len(rows), pa.int64()),
            }
        )
        p = stage / f"part-{i}.parquet"
        pq.write_table(t, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(stage)


def _drain(spark, stage, delay="1 hour"):
    from templatedb_spark.streaming.ingest import stream_dedup_ingest
    from templatedb_spark.streaming.neardup import read_documents_stream

    name = f"t_ingest_{abs(hash(stage)) % 10**8}"
    q = (
        stream_dedup_ingest(read_documents_stream(spark, stage), delay=delay)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [(r.doc_id, r.fingerprint) for r in spark.table(name).collect()]


def test_cross_batch_suppression_first_arrival_wins(spark, tmp_path):
    """A later-batch verbatim copy and a later-batch whitespace variant are
    both suppressed; the survivor is the batch-0 arrival."""
    stage = _stage(
        tmp_path,
        [
            [(1, "alpha beta"), (2, "gamma")],
            [(10, "alpha beta"), (11, "gamma")],  # verbatim copies
            [(20, "Alpha  Beta")],  # case+whitespace variant, same fingerprint
        ],
    )
    got = _drain(spark, stage)
    assert sorted(d for d, _ in got) == [1, 2]
    assert len({f for _, f in got}) == 2


def test_watermark_horizon_readmits_late_copy(spark, tmp_path):
    """State is bounded by the watermark horizon: a copy arriving after the
    first arrival has aged out of the horizon is ADMITTED again (the
    documented recall trade — the periodic batch sweep collapses it), while
    a copy inside the horizon stays suppressed."""
    batches = [[(1, "expires")], [(2, "expires")]]  # batch gap = 60 s
    batches += [[(100 + i, f"filler {i}")] for i in range(5)]  # advance clock
    batches += [[(9, "expires")]]  # arrives 7 min after doc 1
    stage = _stage(tmp_path, batches)
    # horizon 90 s: doc 2 (60 s later) suppressed, doc 9 (420 s) re-admitted
    got = _drain(spark, stage, delay="90 seconds")
    survivors = sorted(d for d, _ in got if d in (1, 2, 9))
    assert survivors == [1, 9]
    # same feed, unbounded-horizon control: only the first copy survives
    stage2 = _stage(tmp_path / "b", batches)
    got2 = _drain(spark, stage2, delay="1 hour")
    assert sorted(d for d, _ in got2 if d in (1, 2, 9)) == [1]


def test_split_invariance_on_fingerprints(spark, tmp_path):
    """However the same doc_id-ordered feed is cut into micro-batches, the
    emitted fingerprint set is identical and each appears exactly once; and
    whenever a group's first copy arrives in a strictly earlier batch than
    its others, the survivor is that first copy."""
    rows = [(i, f"doc {i % 7}") for i in range(21)]  # 7 groups × 3 copies
    cuts = [[rows], [rows[:5], rows[5:]], [rows[:1], rows[1:9], rows[9:]]]
    seen = []
    for j, cut in enumerate(cuts):
        got = _drain(spark, _stage(tmp_path / str(j), cut))
        fps = sorted(f for _, f in got)
        assert len(fps) == 7 and len(set(fps)) == 7
        seen.append(set(fps))
        first_batch_ids = {r[0] for r in cut[0]}
        for d, _f in got:
            grp_min = d % 7  # group's min doc_id is 0..6 by construction
            if grp_min in first_batch_ids and d not in first_batch_ids:
                # min copy arrived strictly earlier → it must have survived
                raise AssertionError(f"survivor {d} but first arrival {grp_min}")
    assert seen[0] == seen[1] == seen[2]
