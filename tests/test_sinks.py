"""Write-path sinks: partitioned parquet round-trip with partition pruning,
CSV export, atomic append."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from templatedb_spark.suite import table


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from templatedb_spark.plans.explain import formatted_plan
    from templatedb_spark.sources.sinks import read_partitioned, write_partitioned

    d = table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(d, out, ["lang"])

    back = read_partitioned(spark, out)
    assert back.count() == d.count()

    pruned = back.filter(F.col("lang") == "en")
    assert pruned.count() == d.filter(F.col("lang") == "en").count()
    # partition pruning: the scan must carry a partition filter on lang
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]


def test_csv_single_file_roundtrip(spark, tmp_path):
    from templatedb_spark.sources.sinks import write_csv_single

    d = table(spark, SF_SMALL, "region")
    out = str(tmp_path / "region_csv")
    write_csv_single(d, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == d.count()
    files = [p for p in __import__("pathlib").Path(out).glob("*.csv")]
    assert len(files) == 1  # single-file contract


def test_append_atomic(spark, tmp_path):
    from templatedb_spark.sources.sinks import append_atomic

    d = table(spark, SF_SMALL, "region")
    out = str(tmp_path / "appended")
    append_atomic(d, out)
    append_atomic(d, out)
    assert spark.read.parquet(out).count() == 2 * d.count()


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """ORC is Spark's other built-in columnar format: write orders as ORC,
    read it back, and require the aggregate to match the parquet source
    exactly (schema + values). Covers the source/sink matrix beyond
    parquet/csv/jsonl."""
    from pyspark.sql import functions as F

    from templatedb_spark.suite import table
    from tests.conftest import SF_SMALL

    o = table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orders_orc")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == o.schema

    def rollup(df):
        return sorted(
            map(
                tuple,
                df.groupBy("o_orderstatus")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("s"),
                )
                .collect(),
            )
        )

    assert rollup(back) == rollup(o)


def test_orc_predicate_pushdown(spark, tmp_path):
    """Filters reach the ORC scan (PushedFilters) just as they do for
    parquet — the format swap keeps the scan-pruning contract."""
    from pyspark.sql import functions as F

    from templatedb_spark.plans.explain import formatted_plan
    from templatedb_spark.suite import table
    from tests.conftest import SF_SMALL

    path = str(tmp_path / "orders_orc")
    table(spark, SF_SMALL, "orders").write.mode("overwrite").orc(path)
    df = spark.read.orc(path).filter(F.col("o_totalprice") > 100000.0).select("o_orderkey")
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_xml_roundtrip_matches_parquet(spark, tmp_path):
    """Spark 4 built-in XML source: a written XML copy of a table slice must
    read back value-identical to the parquet original (the enterprise-feed
    interchange format the reference has no answer for). Types degrade to
    XML's string/long/double inference, so compare on normalized values."""
    from templatedb_spark.suite import table
    from tests.conftest import SF_SMALL

    src = (
        table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )
    out = str(tmp_path / "orders_xml")
    src.write.format("xml").option("rowTag", "order").mode("overwrite").save(out)
    back = spark.read.format("xml").option("rowTag", "order").load(out)
    want = {
        (r.o_orderkey, r.o_orderstatus, round(float(r.o_totalprice), 2))
        for r in src.collect()
    }
    got = {
        (int(r.o_orderkey), str(r.o_orderstatus), round(float(r.o_totalprice), 2))
        for r in back.collect()
    }
    assert got == want
    assert back.count() == 200


def test_binary_file_source_feeds_png_decode(spark, tmp_path):
    """The 100 TB multimodal INGESTION path: media arrives as FILES on object
    storage and enters Spark via the binaryFile source (path, length,
    content), then decodes through the same Arrow-batched codec the
    multimodal specs use. End-to-end: write real PNGs to disk, read with
    binaryFile (+ pathGlobFilter pruning), decode distributed via
    mapInPandas, verify pixel-exact roundtrip."""
    import pandas as pd

    from templatedb_spark.operators.multimodal import decode_png, encode_png

    imgs = {}
    for i in range(6):
        w, h = 8 + i, 5 + i
        pixels = bytes((r * 31 + c * 7 + i) % 256 for r in range(h) for c in range(w))
        (tmp_path / f"img_{i}.png").write_bytes(encode_png(pixels, w, h))
        imgs[f"img_{i}.png"] = (w, h, pixels)
    (tmp_path / "notes.txt").write_text("not an image")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(tmp_path))
    )
    assert df.count() == 6  # the glob pruned the .txt at listing time

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_png(bytes(content))
                flat = bytes(b for row in px for b in row)
                rows.append(
                    {
                        "name": path.rsplit("/", 1)[-1],
                        "width": len(px[0]),
                        "height": len(px),
                        "pixels": flat,
                    }
                )
            yield pd.DataFrame(rows, columns=["name", "width", "height", "pixels"])

    decoded = df.select("path", "content").mapInPandas(
        decode, "name string, width int, height int, pixels binary"
    )
    got = {r.name: (r.width, r.height, bytes(r.pixels)) for r in decoded.collect()}
    assert got == imgs
