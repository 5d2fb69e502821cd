"""Entity-graph modeling: column-to-entity assertions compiled to
entity/edge DataFrames (SURVEY.md §2.9).

The reference maps table columns onto an entity/relationship model with
six YAML assertion types and materializes the graph as Neo4j ``MERGE``
statements (/root/reference/metalpipe/node_classes/nft_nodes.py:10-22,
519-976).  Missing facts (e.g. an assertion's entity type) are inferred
with pyDatalog rules (nft_nodes.py:150-221), raising on ambiguity.

The Spark realization keeps the whole layer config-time: assertions
compile to DataFrame *definitions* —

* ``MERGE (x:Type {key: $v})``            → keyed entity table,
  ``dropDuplicates`` on the name key (idempotent upsert ≡ set semantics);
* ``MERGE … SET x.prop = $v``             → property column joined to the
  entity table, last-writer-wins made deterministic by an explicit
  ordering column (the reference is arrival-order — nondeterministic);
* ``MERGE (a)-[:R]->(b)``                 → deduped edge table;
* ``MERGE … SET r.prop``                  → value column on the edge table;
* coreference                             → id-crosswalk used to
  canonicalize keys before entity/edge builds;
* compound name                           → composite key
  ``sha2(concat_ws(...))`` hub entity plus component edges.

Inference (the pyDatalog part) is plain closure over the assertion list:
an assertion whose entity type is unstated inherits it from the name
assertion sharing its designator column; >1 candidate raises
``AmbiguityException`` (mirrors nft_nodes.py:156-161, 242-275).
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class AmbiguityException(Exception):
    """nft_nodes.py:255-275 — inference found more than one candidate."""


@dataclass
class Assertion:
    kind: str                      # name | property | relationship | ...
    column: str | None = None      # the asserted column
    entity_type: str | None = None
    designator: str | None = None  # column naming the owning entity
    property_name: str | None = None
    # relationship fields
    source_column: str | None = None
    target_column: str | None = None
    relationship: str | None = None
    source_type: str | None = None
    target_type: str | None = None
    # compound-name fields
    columns: list[str] = field(default_factory=list)


def parse_assertions(data_config: list[Mapping[str, Any]]) -> list[Assertion]:
    """Load the reference's YAML ``data_config`` list
    (nft_nodes.py:23-49,337-379).  Keys follow the reference's vocabulary;
    unknown kinds raise."""
    out = []
    for raw in data_config:
        kind = raw["type"]
        if kind not in (
            "name",
            "property",
            "relationship",
            "relationship_property",
            "coreference",
            "compound_name",
        ):
            raise ValueError(f"unknown assertion type {kind!r}")
        out.append(
            Assertion(
                kind=kind,
                column=raw.get("column"),
                entity_type=raw.get("entity_type"),
                designator=raw.get("designator"),
                property_name=raw.get("property_name", raw.get("column")),
                source_column=raw.get("source_column"),
                target_column=raw.get("target_column"),
                relationship=raw.get("relationship"),
                source_type=raw.get("source_type"),
                target_type=raw.get("target_type"),
                columns=list(raw.get("columns", [])),
            )
        )
    return out


def infer_model(assertions: list[Assertion]) -> list[Assertion]:
    """Config-time closure replacing the reference's Datalog pass.

    Rules (nft_nodes.py:150-221):
      * a property assertion with no entity_type inherits it from the
        name assertion whose column == the property's designator;
      * a relationship endpoint with no type inherits from the name
        assertion on that endpoint column;
      * >1 distinct candidate → AmbiguityException;
      * 0 candidates → left None (caller decides whether that's fatal).
    """
    by_column: dict[str, set[str]] = {}
    for a in assertions:
        if a.kind in ("name", "compound_name") and a.entity_type:
            for col in [a.column] if a.column else a.columns:
                by_column.setdefault(col, set()).add(a.entity_type)

    def lookup(col: str | None, what: str) -> str | None:
        if col is None:
            return None
        cands = by_column.get(col, set())
        if len(cands) > 1:
            raise AmbiguityException(f"{what}: column {col!r} names {sorted(cands)}")
        return next(iter(cands), None)

    for a in assertions:
        if a.kind == "property" and a.entity_type is None:
            a.entity_type = lookup(a.designator, "property entity_type")
        if a.kind == "relationship":
            if a.source_type is None:
                a.source_type = lookup(a.source_column, "relationship source_type")
            if a.target_type is None:
                a.target_type = lookup(a.target_column, "relationship target_type")
    return assertions


@dataclass
class EntityGraph:
    """Compiled graph: entity tables keyed by type, edge tables keyed by
    relationship name."""

    entities: dict[str, DataFrame]
    edges: dict[str, DataFrame]


def coreference_closure(
    src: DataFrame, source_column: str, target_column: str
) -> DataFrame:
    """TRANSITIVE coreference resolution: equivalence pairs across all
    rows form a graph; every key is replaced by its connected-component
    minimum, so A≡B in one row and B≡C in another unify all three —
    the semantics the reference's CoreferenceAssertion sketches but
    never finishes (nft_nodes.py:391-416).  Runs large-star/small-star
    connected components (O(log n) rounds), then two shuffled
    mapping joins."""
    from metalpipe_spark.operators.dedup import connected_components

    comp = connected_components(src, src=source_column, dst=target_column)
    out = src
    for col in (source_column, target_column):
        m = comp.select(
            F.col("node").alias(col), F.col("cluster_id").alias("__canon")
        )
        out = (
            out.join(m, col, "left")
            .withColumn(col, F.coalesce("__canon", F.col(col)))
            .drop("__canon")
        )
    return out


def compile_graph(
    src: DataFrame,
    assertions: list[Assertion],
    order_by: str | None = None,
    transitive_coreference: bool = False,
) -> EntityGraph:
    """Compile one source table's assertions to entity/edge DataFrames.

    ``order_by`` names the column giving the deterministic "last writer"
    for property upserts; None falls back to the max property value
    (stable, engine-independent).

    ``transitive_coreference`` switches the coreference crosswalk from
    the reference's rowwise pair-min to full transitive closure
    (:func:`coreference_closure`).
    """
    assertions = infer_model(assertions)
    entities: dict[str, DataFrame] = {}
    edges: dict[str, DataFrame] = {}

    # Coreference crosswalk first: canonical key = min over the
    # equivalence pair (join-and-replace, nft_nodes.py:391-416 intent).
    crosswalks = [a for a in assertions if a.kind == "coreference"]
    canon = src
    for a in crosswalks:
        if transitive_coreference:
            canon = coreference_closure(canon, a.source_column, a.target_column)
        else:
            pair = F.array(F.col(a.source_column), F.col(a.target_column))
            canon = canon.withColumn(
                a.source_column, F.array_min(pair)
            ).withColumn(a.target_column, F.array_min(pair))

    for a in assertions:
        if a.kind == "name":
            ent = canon.select(F.col(a.column).alias("name")).dropDuplicates()
            key = a.entity_type or a.column
            entities[key] = (
                entities[key].unionByName(ent).dropDuplicates() if key in entities else ent
            )
        elif a.kind == "compound_name":
            # The hub key is a deterministic function of the component
            # tuple, so dedup BEFORE hashing: the distinct runs over the
            # raw component columns (two ints shuffle instead of a
            # 64-char hex string per row) and sha2 prices once per
            # DISTINCT tuple, not once per source row on both sides of
            # the partial aggregate.
            key_col = F.sha2(F.concat_ws("\x1f", *[F.col(c) for c in a.columns]), 256)
            comps = canon.select(*a.columns).dropDuplicates()
            ent = comps.select(
                key_col.alias("name"),
                *[F.col(c).alias(f"component_{c}") for c in a.columns],
            )
            entities[a.entity_type or "_".join(a.columns)] = ent
            # Component edges: hub -> each component value (nft_nodes.py:607-657).
            # Re-deduped per edge: distinct (hub, component) pairs are a
            # projection of distinct component TUPLES only when sha2 is
            # injective on tuples, so each edge keeps its own distinct —
            # over the tuple-scale frame, no longer the source rows.
            for c in a.columns:
                edge = comps.select(
                    key_col.alias("src_key"), F.col(c).alias("tgt_key")
                ).dropDuplicates()
                edges[f"HAS_{c.upper()}"] = edge

    for a in assertions:
        if a.kind == "property":
            etype = a.entity_type
            if etype is None:
                raise ValueError(f"property {a.property_name!r}: entity type unresolved")
            # Deterministic last-writer-wins (SURVEY §7.4.3): order by the
            # explicit ordering column, else by the value itself.
            order_col = F.col(order_by) if order_by else F.col(a.column)
            prop = (
                canon.select(
                    F.col(a.designator).alias("name"),
                    F.col(a.column).alias(a.property_name),
                    order_col.alias("__ord"),
                )
                .withColumn("__rn", F.row_number().over(Window.partitionBy("name").orderBy(F.col("__ord").desc_nulls_last())))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__ord")
            )
            base = entities.get(etype)
            if base is None:
                base = canon.select(F.col(a.designator).alias("name")).dropDuplicates()
            entities[etype] = base.join(prop, on="name", how="left")
        elif a.kind == "relationship":
            edge = canon.select(
                F.col(a.source_column).alias("src_key"),
                F.col(a.target_column).alias("tgt_key"),
            ).dropDuplicates()
            edges[a.relationship or f"{a.source_column}->{a.target_column}"] = edge
        elif a.kind == "relationship_property":
            rel = a.relationship
            if rel not in edges:
                raise ValueError(f"relationship_property before relationship {rel!r}")
            prop = (
                canon.select(
                    F.col(a.source_column).alias("src_key"),
                    F.col(a.target_column).alias("tgt_key"),
                    F.col(a.column).alias(a.property_name),
                )
                .groupBy("src_key", "tgt_key")
                .agg(F.max(a.property_name).alias(a.property_name))
            )
            edges[rel] = edges[rel].join(prop, on=["src_key", "tgt_key"], how="left")

    return EntityGraph(entities=entities, edges=edges)


def master_table(
    graph: EntityGraph,
    spine: str,
    joins: list[tuple[str, str, str]],
) -> DataFrame:
    """extrapolate_model.py:80-244 parity — the auto-denormalizing master
    query.  ``joins`` is a list of (relationship, target_entity, prefix):
    starting from the ``spine`` entity table, follow each edge table and
    join the target entity's columns under ``prefix_``."""
    df = graph.entities[spine]
    for rel, target, prefix in joins:
        edge = graph.edges[rel]
        tgt = graph.entities[target]
        tgt_prefixed = tgt.select(
            *[F.col(c).alias(f"{prefix}_{c}") for c in tgt.columns]
        )
        df = (
            df.join(edge, df["name"] == edge["src_key"], "left")
            .drop("src_key")
            .join(tgt_prefixed, F.col("tgt_key") == F.col(f"{prefix}_name"), "left")
            .drop("tgt_key")
        )
    return df
