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
from metalpipe_spark.operators.multimodal import decode_media
from metalpipe_spark.sources.readers import load_table


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
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("content"),
    )
    return decode_media(media).orderBy("id")
