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


def test_transitive_coreference_closure(spark):
    """A≡B and B≡C in separate rows must unify all three keys (the
    semantics the reference's CoreferenceAssertion never finished);
    the rowwise pair-min mode keeps them split."""
    from metalpipe_spark.modelling.assertions import (
        Assertion,
        compile_graph,
        coreference_closure,
    )

    src = spark.createDataFrame(
        [("b", "a", 1), ("c", "b", 2), ("e", "d", 3)],
        ["alias_id", "master_id", "val"],
    )
    closed = coreference_closure(src, "alias_id", "master_id")
    rows = {r["val"]: (r["alias_id"], r["master_id"]) for r in closed.collect()}
    assert rows[1] == ("a", "a") and rows[2] == ("a", "a")
    assert rows[3] == ("d", "d")

    a = [Assertion(kind="coreference", source_column="alias_id", target_column="master_id"),
         Assertion(kind="name", column="alias_id", entity_type="party")]
    g_transitive = compile_graph(src, a, transitive_coreference=True)
    names_t = sorted(r["name"] for r in g_transitive.entities["party"].collect())
    assert names_t == ["a", "d"]
    g_pairwise = compile_graph(src, a)
    names_p = sorted(r["name"] for r in g_pairwise.entities["party"].collect())
    assert names_p == ["a", "b", "d"]  # chain NOT unified rowwise
