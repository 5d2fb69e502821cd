"""Entity-graph modeling unit tests: inference, ambiguity, coreference,
compound keys (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest

from metalpipe_spark.modelling.assertions import (
    AmbiguityException,
    compile_graph,
    infer_model,
    parse_assertions,
)


def test_infer_property_entity_type():
    assertions = parse_assertions(
        [
            {"type": "name", "column": "email", "entity_type": "Person"},
            {"type": "property", "column": "age", "designator": "email"},
        ]
    )
    inferred = infer_model(assertions)
    assert inferred[1].entity_type == "Person"


def test_infer_relationship_endpoint_types():
    assertions = parse_assertions(
        [
            {"type": "name", "column": "email", "entity_type": "Person"},
            {"type": "name", "column": "city", "entity_type": "City"},
            {"type": "relationship", "source_column": "email",
             "target_column": "city", "relationship": "LIVES_IN"},
        ]
    )
    inferred = infer_model(assertions)
    assert inferred[2].source_type == "Person"
    assert inferred[2].target_type == "City"


def test_ambiguity_raises():
    assertions = parse_assertions(
        [
            {"type": "name", "column": "email", "entity_type": "Person"},
            {"type": "name", "column": "email", "entity_type": "Account"},
            {"type": "property", "column": "age", "designator": "email"},
        ]
    )
    with pytest.raises(AmbiguityException):
        infer_model(assertions)


def test_unknown_assertion_type():
    with pytest.raises(ValueError, match="unknown assertion"):
        parse_assertions([{"type": "nonsense"}])


def test_coreference_canonicalizes(spark):
    df = spark.createDataFrame(
        [("a@x.com", "alias_a", 30), ("alias_a", "a@x.com", 31), ("b@x.com", "b@x.com", 40)],
        ["email", "alt_email", "age"],
    )
    assertions = parse_assertions(
        [
            {"type": "coreference", "source_column": "email", "target_column": "alt_email"},
            {"type": "name", "column": "email", "entity_type": "Person"},
            {"type": "property", "column": "age", "designator": "email"},
        ]
    )
    graph = compile_graph(df, assertions, order_by="age")
    people = {r["name"]: r["age"] for r in graph.entities["Person"].collect()}
    # Both alias rows collapse onto the canonical (min) key.
    assert set(people) == {"a@x.com", "b@x.com"}
    assert people["a@x.com"] == 31  # last writer by order_by=age


def test_compound_name_components(spark):
    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], ["k1", "k2"])
    graph = compile_graph(
        df,
        parse_assertions([{"type": "compound_name", "columns": ["k1", "k2"],
                           "entity_type": "Thing"}]),
    )
    assert graph.entities["Thing"].count() == 2
    assert set(graph.edges) == {"HAS_K1", "HAS_K2"}
    assert graph.edges["HAS_K1"].count() == 2


def test_relationship_property(spark):
    df = spark.createDataFrame(
        [("a", "x", 5), ("a", "x", 9), ("b", "y", 1)], ["src", "tgt", "weight"]
    )
    assertions = parse_assertions(
        [
            {"type": "relationship", "source_column": "src", "target_column": "tgt",
             "relationship": "R"},
            {"type": "relationship_property", "source_column": "src",
             "target_column": "tgt", "column": "weight", "relationship": "R",
             "property_name": "weight"},
        ]
    )
    graph = compile_graph(df, assertions)
    rows = {(r["src_key"], r["tgt_key"]): r["weight"] for r in graph.edges["R"].collect()}
    assert rows == {("a", "x"): 9, ("b", "y"): 1}
