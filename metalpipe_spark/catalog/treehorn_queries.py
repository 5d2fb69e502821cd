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


@register(
    "q_mtl_events",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, 'k') AS BIGINT) AS k
    FROM events
    ORDER BY event_id
    """,
    doc="MTL text query (treehorn_yaccer grammar): GO DOWN UNTIL HAS KEY, compiled to a select plan.",
)
def q_mtl_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.modelling.mtl import run_program

    ev = load_table(spark, sf_dir, "events").withColumn(
        "props", F.from_json("props", "k BIGINT")
    )
    text = """
    QUERY events_k IS
    SELECT root.event_id AS event_id,
           root.event_type AS event_type,
           kdict.k AS k
    FROM events
    START AT TOP AS root
    GO DOWN UNTIL HAS KEY k AS kdict ;
    """
    out = run_program({"events": ev}, text)["events_k"]
    return out.orderBy("event_id")
