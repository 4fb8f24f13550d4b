"""KV layer: put/get/delete/write_batch/scan/snapshot/compact parity
(reference: src/storage_engine/src/db_trait.rs:13-47 — semantics, not LSM)."""

from __future__ import annotations

import tempfile

import pytest

from templatedb_spark.kv import KVTable


@pytest.fixture()
def kv(spark):
    with tempfile.TemporaryDirectory() as d:
        yield KVTable(spark, d)


def test_put_get(kv):
    kv.put("a", "1")
    kv.put("b", "2")
    assert kv.get("a") == "1"
    assert kv.get("b") == "2"
    assert kv.get("missing") is None


def test_overwrite_latest_wins(kv):
    kv.put("k", "old")
    kv.put("k", "new")
    assert kv.get("k") == "new"


def test_delete_tombstone(kv):
    kv.put("k", "v")
    kv.delete("k")
    assert kv.get("k") is None


def test_write_batch_atomic_version(kv):
    v = kv.write_batch(puts={"x": "1", "y": "2"}, deletes=[])
    v2 = kv.write_batch(puts={"z": "3"}, deletes=["x"])
    assert v2 == v + 1
    assert kv.get("x") is None
    assert kv.get("y") == "2"
    assert kv.get("z") == "3"


def test_snapshot_mvcc_read(kv):
    v1 = kv.put("k", "first")
    kv.put("k", "second")
    kv.delete("k")
    # snapshot pinned at v1 still sees the original value (MVCC)
    assert kv.get("k", as_of=v1) == "first"
    assert kv.get("k") is None


def test_ordered_scan_range(kv):
    kv.write_batch(puts={"b": "2", "a": "1", "d": "4", "c": "3"})
    keys = [r.key for r in kv.scan().collect()]
    assert keys == ["a", "b", "c", "d"]  # ordered iter (db_iter.rs)
    keys = [r.key for r in kv.scan(start="b", end="d").collect()]
    assert keys == ["b", "c"]  # [start, end)


def test_compact_preserves_state(kv):
    kv.put("a", "1")
    kv.put("a", "2")
    kv.put("b", "3")
    kv.delete("b")
    kv.compact()
    assert kv.get("a") == "2"
    assert kv.get("b") is None
    assert len(kv._versions()) == 1  # history collapsed


def test_approximate_size(kv):
    kv.write_batch(puts={f"k{i}": str(i) for i in range(10)})
    assert kv.approximate_size() == 10
    assert kv.approximate_size(start="k0", end="k5") == 5
