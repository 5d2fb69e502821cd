"""Entity-graph modeling catalog queries (SURVEY.md §2.9): assertions
over the TPC-H star schema compiled to entity/edge tables and a
denormalized master table, oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metalpipe_spark.catalog import register
from metalpipe_spark.modelling.assertions import (
    compile_graph,
    master_table,
    parse_assertions,
)
from metalpipe_spark.sources.readers import load_table

# Customer table asserted as an entity model: c_name names a Customer;
# c_acctbal is a property; (c_name, n_name) is a LIVES_IN relationship.
_CUSTOMER_CONFIG = [
    {"type": "name", "column": "c_name", "entity_type": "Customer"},
    {"type": "property", "column": "c_acctbal", "designator": "c_name",
     "property_name": "acctbal"},
    {"type": "property", "column": "c_mktsegment", "designator": "c_name",
     "property_name": "segment"},
    {"type": "relationship", "source_column": "c_name", "target_column": "n_name",
     "relationship": "LIVES_IN", "source_type": "Customer", "target_type": "Nation"},
    {"type": "name", "column": "n_name", "entity_type": "Nation"},
]


def _customer_graph(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    src = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    return compile_graph(src, parse_assertions(_CUSTOMER_CONFIG))


@register(
    "q_entity_customer",
    """
    SELECT c_name AS name,
           MAX(c_acctbal) AS acctbal,
           MAX(c_mktsegment) AS segment
    FROM customer
    GROUP BY c_name
    ORDER BY name
    """,
    doc="NameAssertion + PropertyAssertion (nft_nodes.py:519-543,419-516): keyed entity upsert, deterministic last-writer.",
)
def q_entity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    graph = _customer_graph(spark, sf_dir)
    return graph.entities["Customer"].orderBy("name")


@register(
    "q_edges_lives_in",
    """
    SELECT DISTINCT c.c_name AS src_key, n.n_name AS tgt_key
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY src_key, tgt_key
    """,
    doc="RelationshipAssertion (nft_nodes.py:672-793): MERGE edge == deduped edge table.",
)
def q_edges_lives_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    graph = _customer_graph(spark, sf_dir)
    return graph.edges["LIVES_IN"].orderBy("src_key", "tgt_key")


@register(
    "q_master_customer",
    """
    WITH cust AS (
      SELECT c_name AS name, MAX(c_acctbal) AS acctbal, MAX(c_mktsegment) AS segment
      FROM customer GROUP BY c_name
    ),
    edges AS (
      SELECT DISTINCT c.c_name AS src_key, n.n_name AS tgt_key
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT cust.name, cust.acctbal, cust.segment, e.tgt_key AS nation_name
    FROM cust LEFT JOIN edges e ON cust.name = e.src_key
    ORDER BY name
    """,
    doc="extrapolate_model master denormalization (extrapolate_model.py:80-244): spine + edge joins.",
)
def q_master_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    graph = _customer_graph(spark, sf_dir)
    master = master_table(graph, "Customer", [("LIVES_IN", "Nation", "nation")])
    return master.select(
        "name", "acctbal", "segment", F.col("nation_name")
    ).orderBy("name")


@register(
    "q_compound_entity",
    """
    SELECT sha256(l_orderkey::VARCHAR || chr(31) || l_linenumber::VARCHAR) AS name,
           l_orderkey AS component_l_orderkey,
           l_linenumber AS component_l_linenumber
    FROM lineitem
    GROUP BY 1, 2, 3
    ORDER BY component_l_orderkey, component_l_linenumber
    """,
    doc="CompoundNameAssertion (nft_nodes.py:580-669): composite sha2 hub key + components.",
)
def q_compound_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    config = [
        {"type": "compound_name", "columns": ["l_orderkey", "l_linenumber"],
         "entity_type": "LineItem"}
    ]
    graph = compile_graph(li, parse_assertions(config))
    return graph.entities["LineItem"].orderBy(
        "component_l_orderkey", "component_l_linenumber"
    )
