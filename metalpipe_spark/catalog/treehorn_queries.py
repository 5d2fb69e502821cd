"""Treehorn catalog query: traversal-compiled JSON extraction over
``events.props`` (SURVEY.md §2.10).

The traversal chain ``StayHere+'root' > GoDown(HasKey('k'))+'kdict'``
resolves against the parsed schema at plan time and compiles to a plain
select — the Spark-side realization of the reference's
``GO DOWN UNTIL HAS KEY …`` (treehorn.py:186-189).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metalpipe_spark.catalog import register
from metalpipe_spark.plans.treehorn import GoDown, HasKey, StayHere, apply_relation
from metalpipe_spark.sources.readers import load_table


@register(
    "q_treehorn_props",
    """
    SELECT event_id, CAST(json_extract_string(props, 'k') AS BIGINT) AS k
    FROM events
    ORDER BY event_id
    """,
    doc="GoDown-until-HasKey over parsed JSON, compiled to schema paths.",
)
def q_treehorn_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "props", F.from_json("props", "k BIGINT")
    )
    chain = StayHere("root") > (GoDown(HasKey("k")) + "kdict")
    out = apply_relation(
        ev,
        chain,
        {"event_id": ("root", "event_id"), "k": ("kdict", "k")},
    )
    return out.orderBy("event_id")
