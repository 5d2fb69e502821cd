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
    """CounterOfThings (node.py:978-993) — emit incrementing integers.

    Python ``range`` semantics, made explicit: with ``end=None`` the
    single argument is the EXCLUSIVE end and counting starts at 0
    (``spark.range(start, None)`` silently means exactly that, which
    previously read as "count from start" — now it is the documented
    contract: pass both to count from a nonzero start)."""
    if end is None:
        start, end = 0, start
    return spark.range(start, end).withColumnRenamed("id", "count")


def constant_emitter(spark: SparkSession, thing: Any, max_loops: int = 5) -> DataFrame:
    """ConstantEmitter (node.py:1432-1450) — the same literal ``max_loops``
    times.  (The reference's ``delay`` is a throttle, not data-plane.)"""
    if isinstance(thing, dict):
        return spark.range(max_loops).select(
            *[F.lit(v).alias(k) for k, v in thing.items()]
        )
    return spark.range(max_loops).select(F.lit(thing).alias("thing"))


def _ref_to_bool(thing: Any) -> bool:
    """helpers.py:92-102 — the reference's to_bool, verbatim semantics:
    strings are true iff non-empty and first char is t/y (so '1' is
    FALSE), numbers iff > 0, booleans pass through."""
    if isinstance(thing, str):
        return len(thing) > 0 and thing[0].lower() in ("t", "y")
    if isinstance(thing, bool):
        return thing
    if isinstance(thing, (int, float)):
        return thing > 0
    raise ValueError(f"cannot convert {thing!r} to bool")


# SequenceEmitter's type tags (node.py:1106-1119): the REFERENCE shape is
# {'type': 'int', 'value': '3'} with lowercased tags and the
# integer/string aliases; the single-key {'int': '3'} shape stays as this
# engine's shorthand alias.
_TYPE_TAGS = {
    "int": int,
    "integer": int,
    "str": str,
    "string": str,
    "float": float,
    "bool": _ref_to_bool,
}


def sequence_emitter(
    spark: SparkSession, sequence: Sequence[Any], max_sequences: int = 1
) -> DataFrame:
    """SequenceEmitter (node.py:1091-1142) — emit a typed literal sequence
    ``max_sequences`` times.  An empty sequence (or ``max_sequences=0``)
    emits zero rows with the stable schema, as the reference generator
    does — never a schema-inference error."""
    values = []
    for item in sequence:
        if (
            isinstance(item, dict)
            and "type" in item
            and "value" in item
            and str(item["type"]).lower() in _TYPE_TAGS
        ):
            values.append(_TYPE_TAGS[str(item["type"]).lower()](item["value"]))
            continue
        if isinstance(item, dict) and len(item) == 1:
            ((tag, raw),) = item.items()
            if str(tag).lower() in _TYPE_TAGS:
                values.append(_TYPE_TAGS[str(tag).lower()](raw))
                continue
        values.append(item)
    rows = [(i, v) for i in range(max_sequences) for v in values]
    if not rows:
        return spark.createDataFrame(rows, "sequence_number long, value string")
    return spark.createDataFrame(rows, ["sequence_number", "value"])
