"""Multimodal columns: binary payloads with typed metadata.

Extension tier: image/audio/video payloads are opaque `binary` columns plus a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas`. The media codecs aren't in
this container, so the *codec* step is stubbed (`decode_image` raises
NotImplementedError unless given the deterministic fake codec) — but the
Spark-side plumbing (schema, batching, partitioning, UDF signatures) is real
and tested, which is the part that matters for the engine.

Scale: mapInPandas streams Arrow batches through one Python worker per core —
payload bytes never pass through the driver, and batch size is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` so executor memory stays flat
regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int>"
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from documents: payload = utf-8 bytes of the text.

    Stands in for an image/audio corpus with deterministic content; the binary
    column exercises the same Arrow binary path real payloads would.
    """
    from templatedb_spark.suite import table

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("text/fake").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(0).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, codec: str = "real"):
    """Codec stub: real decoders (PIL/ffmpeg) are not in this container."""
    if codec == "fake":
        # deterministic fake: 4x4 'pixels' from the payload's first 16 bytes
        buf = (payload[:16] + b"\x00" * 16)[:16]
        return [[buf[r * 4 + c] for c in range(4)] for r in range(4)]
    raise NotImplementedError("image codecs unavailable in this environment; use codec='fake'")


def extract_features(media: DataFrame) -> DataFrame:
    """Per-payload features via Arrow-batched mapInPandas (no driver round-trip)."""
    import pandas as pd

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                    "byte_sum_mod": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                    "fake_pixel_mean": payloads.map(
                        lambda b: float(
                            sum(sum(r) for r in decode_image(b, codec="fake")) / 16.0
                        )
                    ),
                }
            )
            yield out

    return media.mapInPandas(
        feats,
        schema="doc_id long, n_bytes long, first_byte long, byte_sum_mod long, fake_pixel_mean double",
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuerySpec entry: media table → deterministic feature extraction."""
    return extract_features(documents_as_media(spark, sf_dir))


# Oracle: the fake features are pure byte arithmetic over utf-8 text; the
# corpus is ASCII, so byte value == codepoint and DuckDB can reproduce them from
# the text column with ascii()/substr.
_MULTIMODAL_ORACLE = """
SELECT doc_id,
       strlen(text)::BIGINT AS n_bytes,
       (CASE WHEN strlen(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END)::BIGINT AS first_byte,
       (list_sum(list_transform(generate_series(1, strlen(text)::INT),
                                i -> ascii(substr(text, i, 1)))) % 997)::BIGINT AS byte_sum_mod,
       (list_sum(list_transform(generate_series(1, least(strlen(text)::INT, 16)),
                                i -> ascii(substr(text, i, 1)))) / 16.0) AS fake_pixel_mean
FROM documents
"""

from templatedb_spark.suite import QuerySpec, register  # noqa: E402

register(
    QuerySpec(
        "multimodal_features",
        multimodal_features,
        _MULTIMODAL_ORACLE,
        "binary media column → Arrow-batched feature extraction",
    )
)
