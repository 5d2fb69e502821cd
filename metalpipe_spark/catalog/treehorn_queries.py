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


@register(
    "q_mtl_go_up",
    """
    SELECT event_id, user_id,
           CAST(json_extract_string(props, 'k') AS BIGINT) AS k
    FROM events
    ORDER BY event_id
    """,
    doc=(
        "MTL multi-chain with GO UP (treehorn_yaccer grammar, reference "
        "treehorn.py:385-391 ancestors-nearest-first): descend to the "
        "dict holding user_id, then climb to the nearest ancestor "
        "holding k — binds the enclosing payload, not the root.  "
        "Compiled to schema paths: the whole traversal is a select over "
        "one nested struct column, no explode, no shuffle."
    ),
)
def q_mtl_go_up(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.modelling.mtl import run_program

    ev = load_table(spark, sf_dir, "events")
    nested = ev.select(
        "event_id",
        F.struct(
            F.from_json("props", "k BIGINT")["k"].alias("k"),
            F.struct(F.col("user_id"), F.col("value")).alias("meta"),
        ).alias("payload"),
    )
    text = """
    QUERY up_k IS
    SELECT root.event_id AS event_id,
           meta.user_id AS user_id,
           pay.k AS k
    FROM events
    START AT TOP AS root
    GO DOWN UNTIL HAS KEY user_id AS meta
    GO UP UNTIL HAS KEY k AS pay ;
    """
    out = run_program({"events": nested}, text)["up_k"]
    return out.orderBy("event_id")
