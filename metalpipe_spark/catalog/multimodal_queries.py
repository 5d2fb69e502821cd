"""Multimodal catalog query: the decode step's Arrow/mapInPandas
plumbing oracle-checked end-to-end.

The container ships no image codec, so ``decode_media``'s codec is a
DETERMINISTIC FAKE (md5-derived dimensions, sha256 content hash —
operators/multimodal.py).  That fake is deliberately SQL-expressible, so
the full distributed path — binary column in, Arrow batches through
Python, typed metadata out — gets a real CORRECTNESS row: the binary
fixture is the ``documents`` table's text as UTF-8 bytes, identical on
both engines (DuckDB ``encode()`` == Spark ``CAST(string AS BINARY)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metalpipe_spark.catalog import register
from metalpipe_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    frame_sample,
)
from metalpipe_spark.sources.readers import load_table


def _media(spark, sf_dir):
    """Binary media fixture: the documents table's text as UTF-8 bytes —
    identical bytes in DuckDB (``encode(text)``) and Spark
    (``CAST(text AS BINARY)``)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("content"),
    )


@register(
    "q_multimodal_decode",
    """
    SELECT doc_id AS id,
           'image' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           16 + (('0x' || substr(md5(text), 1, 2))::INT % 240) AS width,
           16 + (('0x' || substr(md5(text), 3, 2))::INT % 240) AS height,
           sha256(text) AS sha
    FROM documents
    ORDER BY id
    """,
    doc=(
        "Multimodal decode over Arrow batches (mapInPandas): binary "
        "content -> typed metadata; fake codec is md5/sha-derived so the "
        "oracle can replay it in SQL."
    ),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(_media(spark, sf_dir)).orderBy("id")


def _features_oracle(dim: int = FEATURE_DIM) -> str:
    # Fake embedding: byte i of sha256 → (b - 128) / 128.  Halves of
    # 1/128 are exact binary fractions, so float32 == the oracle DOUBLE.
    cols = ",\n           ".join(
        f"CAST((('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT - 128)"
        f" / 128.0 AS DOUBLE) AS f{i}"
        for i in range(dim)
    )
    return f"""
    SELECT doc_id AS id,
           {cols}
    FROM documents
    ORDER BY id
    """


@register(
    "q_multimodal_features",
    _features_oracle(),
    doc=(
        "Multimodal feature extraction (mapInPandas -> array<float>, "
        "ANN-compatible FEATURE_DIM vector), flattened to scalar columns "
        "for the hash compare; fake embedding is sha256-derived so the "
        "oracle replays it."
    ),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "id",
        *[
            F.col("feature")[i].cast("double").alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    ).orderBy("id")


@register(
    "q_frame_sample",
    # DuckDB cannot slice BLOBs, so the oracle slices the VARCHAR and
    # encodes the slice: identical bytes because the corpus is pure ASCII
    # (verified at every SF; 1 char == 1 byte).
    """
    WITH f AS (
      SELECT doc_id AS id, i - 1 AS frame_id,
             substring(text, 1 + (i - 1) * 64, 64) AS frame
      FROM documents, range(1, 5) r(i)
    )
    SELECT id, frame_id, md5(frame) AS frame_md5,
           octet_length(encode(frame)) AS frame_bytes
    FROM f
    WHERE octet_length(encode(frame)) > 0
    ORDER BY id, frame_id
    """,
    doc=(
        "Frame sampling (JVM byte slicing on BINARY, no Python): 4 fixed "
        "64-byte windows; frames surfaced as md5 + length (raw bytes "
        "arrive as unhashable bytearray in pandas)."
    ),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(_media(spark, sf_dir), n_frames=4, frame_size=64)
    return frames.select(
        "id",
        "frame_id",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").alias("frame_bytes"),
    ).orderBy("id", "frame_id")
