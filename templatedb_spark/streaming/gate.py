"""Driver-gated streaming spec: the Structured Streaming CDC path under the
DuckDB oracle (VERDICT r3 #8 — the stream==batch twins were pytest-only).

`stream_cdc_kv_state` runs the REAL streaming pipeline end to end inside the
spec callable:

  1. stage the events feed as three ts-ordered micro-batch parquet files
     (deterministic split — same shape as tests/test_streaming.py's twin);
  2. drain them through `streaming/cdc.py`'s availableNow foreachBatch query
     (maxFilesPerTrigger=1 → three genuine micro-batches), each applied to a
     KVTable as one atomic MVCC version;
  3. return the final merged KV state, parsed back to typed columns.

Because micro-batches arrive in feed order and application is atomic,
the final state must equal the net-effect compaction of the WHOLE feed —
which is exactly what the oracle SQL computes on the raw events table. A
divergence in watermarking, batch boundaries, KV versioning, or the
delete-shadows contract shows up as a hash mismatch.

Float note: kv stores `event_type|value` with Python str(value) (shortest
roundtrip repr); casting back to DOUBLE is exact, so the oracle compares the
original doubles, not formatted strings.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from templatedb_spark.streaming.cdc import CDC_KEY_OFFSET
from templatedb_spark.suite import QuerySpec, register

_N_MICROBATCHES = 3


def _stage_microbatches(sf_dir: str, out_dir: str) -> None:
    """Split the events feed into N ts-ordered parquet files with mtimes
    forcing the file-source pickup order (pure pyarrow — preserves the
    shipped ts physical type so read_events_stream's schema probe sees the
    same layout as the original file)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = t.num_rows
    step = (n + _N_MICROBATCHES - 1) // _N_MICROBATCHES
    for i in range(_N_MICROBATCHES):
        part = t.slice(i * step, step)
        p = f"{out_dir}/part-{i}.parquet"
        pq.write_table(part, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


def stream_cdc_kv_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from templatedb_spark.kv import KVTable
    from templatedb_spark.streaming.cdc import changes_from_events, stream_cdc_to_kv
    from templatedb_spark.streaming.events import read_events_stream

    stage = tempfile.mkdtemp(prefix="cdc_stage_")
    _stage_microbatches(sf_dir, stage)
    kv = KVTable(spark, tempfile.mkdtemp(prefix="cdc_kv_"))
    stream = changes_from_events(read_events_stream(spark, stage))
    stream_cdc_to_kv(stream, kv, f"gate_cdc_{abs(hash(stage))}")
    snap = kv.snapshot()  # (key string, value string)
    parts = F.split(F.col("value"), r"\|", 2)
    return snap.select(
        F.col("key").cast("long").alias("key"),
        parts.getItem(0).alias("event_type"),
        parts.getItem(1).cast("double").alias("value"),
    )


_STREAM_CDC_ORACLE = f"""
WITH changes AS (
  SELECT user_id + {CDC_KEY_OFFSET} AS key, ts, event_id, event_type, value
  FROM events
),
latest AS (
  SELECT key, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC, event_id DESC) AS rn
    FROM changes
  ) WHERE rn = 1
)
SELECT key::BIGINT AS key, event_type, value::DOUBLE AS value
FROM latest WHERE event_type <> 'error'
"""

register(
    QuerySpec(
        "stream_cdc_kv_state",
        stream_cdc_kv_state,
        _STREAM_CDC_ORACLE,
        "Structured Streaming CDC (3 micro-batches, foreachBatch -> KV MVCC) vs whole-feed compaction oracle",
    )
)
