"""JSONL source/sink: roundtrip, DuckDB differential read, quarantine of
malformed lines, projection pushdown on an explicit schema."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from tests.conftest import SF_SMALL, normalize_pdf

from templatedb_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_quarantine,
    write_jsonl,
)
from templatedb_spark.suite import table

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_jsonl_roundtrip_matches_duckdb(spark, duck, tmp_path):
    src = table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    out = tmp_path / "docs_jsonl"
    write_jsonl(src, str(out))

    back = read_jsonl(spark, str(out), schema=_SCHEMA)
    got = normalize_pdf(back.toPandas())

    want = normalize_pdf(
        duck.sql(
            f"SELECT doc_id, lang, n_chars FROM read_json_auto('{out}/part-*.json')"
        ).df()
    )
    assert got == want
    assert len(got) > 0


def test_jsonl_schema_inference(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(json.dumps({"a": i, "b": f"x{i}"}) for i in range(5)))
    df = read_jsonl(spark, str(p))
    assert set(df.columns) == {"a", "b"}
    assert df.count() == 5


def test_jsonl_quarantine_splits_malformed(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [json.dumps({"doc_id": i, "lang": "en", "n_chars": i * 10}) for i in range(4)]
    lines.insert(2, '{"doc_id": 99, "lang": "en", n_chars: BROKEN')
    lines.append("not json at all")
    p.write_text("\n".join(lines))

    good, bad = read_jsonl_quarantine(spark, str(p), _SCHEMA)
    assert good.count() == 4
    assert sorted(r["doc_id"] for r in good.collect()) == [0, 1, 2, 3]
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("BROKEN" in b for b in bad_rows)


def test_jsonl_explicit_schema_prunes(spark, tmp_path):
    """With an explicit schema, reading a projection must not fail and the
    scan's ReadSchema carries only the requested columns."""
    src = table(spark, SF_SMALL, "documents").select("doc_id", "lang", "n_chars")
    out = tmp_path / "docs_jsonl2"
    write_jsonl(src, str(out))
    from templatedb_spark.plans.explain import read_schema_columns

    df = read_jsonl(spark, str(out), schema=_SCHEMA).select("doc_id")
    assert read_schema_columns(df) == ["doc_id"]
