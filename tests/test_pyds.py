"""Python DataSource API (Spark 4): the partition-parallel table-function
contract — schema bind, declared partitions, per-partition deterministic
generation, retry-safety (reference table-function protocol analogue,
src/query_engine/src/function/table/table_function.rs:26-49)."""

from __future__ import annotations

from templatedb_spark.sources.pyds import expected_kv_value, register_python_sources


def _kvgen(spark, **opts):
    register_python_sources(spark)
    r = spark.read.format("kvgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_kvgen_schema_and_count(spark):
    df = _kvgen(spark, numRows=1000, numPartitions=8, numBuckets=16)
    assert [f.name for f in df.schema.fields] == ["key", "bucket", "value"]
    assert df.count() == 1000
    assert df.select("key").distinct().count() == 1000


def test_kvgen_partition_parallelism(spark):
    df = _kvgen(spark, numRows=100, numPartitions=5)
    assert df.rdd.getNumPartitions() == 5


def test_kvgen_values_deterministic(spark):
    rows = {r.key: (r.bucket, r.value) for r in _kvgen(spark, numRows=50).collect()}
    for key in (0, 7, 49):
        assert rows[key] == (key % 16, expected_kv_value(key))


def test_kvgen_composes_with_sql(spark):
    """The source is a first-class scan: filters/aggregates plan over it."""
    df = _kvgen(spark, numRows=1000, numBuckets=10)
    agg = df.filter("key >= 500").groupBy("bucket").count().collect()
    assert len(agg) == 10
    assert sum(r["count"] for r in agg) == 500


def test_jsondir_write_read_roundtrip(spark, tmp_path):
    """Write path: executors emit uniquely-named parts, driver commit publishes
    the manifest; read path: only manifest-listed files are visible."""
    import json
    import os

    path = str(tmp_path / "jd")
    register_python_sources(spark)
    src = spark.range(500).selectExpr(
        "id AS key", "concat('v', id) AS value", "cast(id % 7 as int) AS bucket"
    )
    src.write.format("jsondir").option("path", path).mode("append").save()

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert sum(e["rows"] for e in manifest["files"]) == 500

    back = spark.read.format("jsondir").option("path", path).load()
    assert back.schema.simpleString() == src.schema.simpleString()
    assert back.count() == 500
    assert sorted(r.key for r in back.collect()) == list(range(500))

    # an orphan (uncommitted) part file must be invisible to readers
    with open(os.path.join(path, "part-orphan.jsonl"), "w") as f:
        f.write('[9999, "ghost", 0]\n')
    assert spark.read.format("jsondir").option("path", path).load().count() == 500


def test_kvgen_stream_reader_exactly_once(spark):
    """The Python STREAMING data source (table-function protocol extended to
    micro-batches): draining the bounded backlog through readStream must
    produce exactly the batch source's rows — same keys, same md5-derived
    values, no dups, no gaps — across multiple genuine micro-batches."""
    register_python_sources(spark)
    n, per_batch = 500, 120
    stream = (
        spark.readStream.format("kvgen")
        .option("numRows", n)
        .option("rowsPerBatch", per_batch)
        .option("numPartitions", 4)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kvgen_stream_t")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        q.processAllAvailable()
        if spark.table("kvgen_stream_t").count() >= n:
            break
    q.stop()
    got = {(r.key, r.bucket, r.value) for r in spark.table("kvgen_stream_t").collect()}
    want = {
        (r.key, r.bucket, r.value)
        for r in spark.read.format("kvgen").option("numRows", n).load().collect()
    }
    assert got == want  # exactly-once, bit-identical to the batch twin
    # multiple genuine micro-batches happened (ceil(500/120) = 5)
    assert q.lastProgress["batchId"] >= 3


def test_kvgen_stream_to_jsondir_stream_sink(spark, tmp_path):
    """End-to-end PYTHON streaming pipeline: Python stream source -> Python
    stream sink, both through the DataSource API. The sink commits a
    manifest record per epoch (tmp+rename atomic), so the committed view is
    exactly-once: reading the jsondir back must equal the batch kvgen rows,
    with parts spread across multiple epochs."""
    import json
    import os

    register_python_sources(spark)
    out = str(tmp_path / "stream_out")
    n = 400
    stream = (
        spark.readStream.format("kvgen")
        .option("numRows", n)
        .option("rowsPerBatch", 150)
        .load()
    )
    q = (
        stream.writeStream.format("jsondir")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        q.processAllAvailable()
        with open(os.path.join(out, "_MANIFEST.json")) as f:
            if sum(fl["rows"] for fl in json.load(f)["files"]) >= n:
                break
    q.stop()
    back = spark.read.format("jsondir").option("path", out).load()
    got = {(r.key, r.bucket, r.value) for r in back.collect()}
    want = {
        (r.key, r.bucket, r.value)
        for r in spark.read.format("kvgen").option("numRows", n).load().collect()
    }
    assert got == want
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert len(manifest["epochs"]) >= 3  # ceil(400/150) = 3 epochs


def test_kvgen_stream_restart_exactly_once_with_offset_dir(spark, tmp_path):
    """Checkpoint restart: Spark restores committed offsets but builds a
    FRESH reader, so an in-memory backlog clock regresses below the
    committed start and duplicates rows (measured: 800 rows for a 600-row
    backlog). With offsetDir the clock persists across reader instances —
    the external-system monotonicity a real source has — and a mid-backlog
    stop/restart drains with NO duplicates."""
    import json
    import os
    import time

    register_python_sources(spark)
    out, ckpt, odir = (
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "clock"),
    )

    def start():
        return (
            spark.readStream.format("kvgen")
            .option("numRows", 600)
            .option("rowsPerBatch", 100)
            .option("offsetDir", odir)
            .load()
            .writeStream.format("jsondir")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    def total():
        try:
            with open(os.path.join(out, "_MANIFEST.json")) as f:
                return sum(x["rows"] for x in json.load(f)["files"])
        except FileNotFoundError:
            return 0

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and total() < 200:  # partial drain
        time.sleep(0.5)
    q.stop()
    assert 0 < total() < 600  # genuinely mid-backlog

    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline and total() < 600:
        q2.processAllAvailable()
    q2.stop()
    back = spark.read.format("jsondir").option("path", out).load()
    keys = [r.key for r in back.collect()]
    assert sorted(keys) == list(range(600))  # no dups, no gaps, post-restart


def test_jsondir_stream_sink_failed_epoch_invisible(spark, tmp_path):
    """Atomic epoch visibility: if an epoch's tasks die mid-write, its part
    files must never become readable — the manifest lists only committed
    epochs, so readers see exactly the prefix of successful epochs."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    register_python_sources(spark)
    out, ckpt, odir = (
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "clock"),
    )
    src = (
        spark.readStream.format("kvgen")
        .option("numRows", 300)
        .option("rowsPerBatch", 100)
        .option("offsetDir", odir)
        .load()
    )
    # poison keys >= 100: epoch 0 (rows 0..99) commits, epoch 1 dies mid-write
    @F.udf("bigint")
    def poison(k):
        if k >= 100:
            raise ValueError("poisoned row")
        return k

    q = (
        src.withColumn("key", poison("key"))
        .writeStream.format("jsondir")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 90
    failed = False
    while time.time() < deadline:
        try:
            q.processAllAvailable()
            time.sleep(0.3)
        except Exception:
            failed = True
            break
        if q.exception() is not None:
            failed = True
            break
    assert failed, "the poisoned epoch should have killed the query"
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    committed_rows = sum(x["rows"] for x in manifest["files"])
    assert committed_rows == 100  # only epoch 0
    back = spark.read.format("jsondir").option("path", out).load()
    keys = sorted(r.key for r in back.collect())
    assert keys == list(range(100))  # the dead epoch's parts are invisible


def test_jsondir_stream_sink_replayed_epoch_removes_orphan_parts(tmp_path):
    """r5 ADVICE (low): a replayed epoch's commit is an idempotent no-op for
    the manifest, but the replay's tasks already wrote fresh uniquely-named
    part files — they must be deleted, not leaked (unbounded disk growth
    under retries). Driver-side unit test: exercises the writer protocol
    directly, no streaming query needed."""
    import json
    import os

    from templatedb_spark.sources.pyds import JsonDirStreamWriter, _PartFile

    path = str(tmp_path / "sink")
    w = JsonDirStreamWriter({"path": path}, '{"type":"struct","fields":[]}')
    # epoch 0 commits normally
    m0 = w.write(iter([(1, "a"), (2, "b")]))
    w.commit([m0], 0)
    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert [f["name"] for f in manifest["files"]] == [m0.filename]
    # epoch 0 REPLAYS: new unique part written, then the duplicate commit
    m0r = w.write(iter([(1, "a"), (2, "b")]))
    assert os.path.exists(os.path.join(path, m0r.filename))
    w.commit([m0r], 0)
    manifest2 = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest2 == manifest  # manifest unchanged (idempotent)
    assert not os.path.exists(os.path.join(path, m0r.filename))  # orphan gone
    assert os.path.exists(os.path.join(path, m0.filename))  # committed stays
    # disk state == committed manifest + manifest file only
    parts = [p for p in os.listdir(path) if p.startswith("part-")]
    assert parts == [m0.filename]
