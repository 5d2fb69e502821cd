"""Literal / generated sources (SURVEY.md §2.1).

ConstantEmitter, SequenceEmitter, CounterOfThings
(/root/reference/metalpipe/node.py:978-993,1091-1142,1432-1450) produce
rows from configuration rather than storage.  In Spark these are
``spark.range`` / ``createDataFrame`` — distributed from the start, so a
"constant emitted N times" works the same at N=5 and N=5 billion.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def counter_of_things(spark: SparkSession, start: int = 0, end: int | None = None) -> DataFrame:
    """CounterOfThings (node.py:978-993) — emit incrementing integers."""
    return spark.range(start, end).withColumnRenamed("id", "count")


def constant_emitter(spark: SparkSession, thing: Any, max_loops: int = 5) -> DataFrame:
    """ConstantEmitter (node.py:1432-1450) — the same literal ``max_loops``
    times.  (The reference's ``delay`` is a throttle, not data-plane.)"""
    if isinstance(thing, dict):
        return spark.range(max_loops).select(
            *[F.lit(v).alias(k) for k, v in thing.items()]
        )
    return spark.range(max_loops).select(F.lit(thing).alias("thing"))


# SequenceEmitter's type tags (node.py:1091-1142): values arrive as
# {'int': '3'} / {'str': 'x'} / ... and are cast on emission.
_TYPE_TAGS = {"int": int, "str": str, "float": float, "bool": lambda v: str(v).lower() in ("true", "1", "yes", "t", "y")}


def sequence_emitter(
    spark: SparkSession, sequence: Sequence[Any], max_sequences: int = 1
) -> DataFrame:
    """SequenceEmitter (node.py:1091-1142) — emit a typed literal sequence
    ``max_sequences`` times."""
    values = []
    for item in sequence:
        if isinstance(item, dict) and len(item) == 1:
            ((tag, raw),) = item.items()
            if tag in _TYPE_TAGS:
                values.append(_TYPE_TAGS[tag](raw))
                continue
        values.append(item)
    rows = [(i, v) for i in range(max_sequences) for v in values]
    return spark.createDataFrame(rows, ["sequence_number", "value"])
