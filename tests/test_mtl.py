"""MTL language tests: tokenizer, parser, and compiled query execution
over nested documents (the reference's test_treehorn.py:277-282 parse
smoke test, extended to full execution)."""

from __future__ import annotations

import pytest

from metalpipe_spark.modelling.mtl import (
    FuncApp,
    Keypath,
    compile_query,
    parse,
    run_program,
    tokenize,
)
from metalpipe_spark.plans.treehorn import parse_json_documents

DOCS = [
    """{"users": [
         {"name": "alice", "contact": {"email": "alice@x.com", "city": "berlin"}},
         {"name": "bob",   "contact": {"email": "bob@y.com",   "city": "paris"}}
       ],
       "meta": {"source": "crm"}}""",
    """{"users": [
         {"name": "carol", "contact": {"email": "carol@z.com", "city": "lyon"}}
       ],
       "meta": {"source": "import"}}""",
]

MTL_TEXT = """
QUERY emails IS
SELECT person.name AS person_name,
       contact.email AS email_address,
       upper(contact.city) AS city_upper
FROM document
START AT TOP AS root
GO DOWN UNTIL HAS KEY name AS person
GO DOWN UNTIL (HAS KEY email AND HAS KEY city) AS contact ;

email_address IS A UNIQUE PROPERTY OF ENTITY Person ;
person_name IS A PROPERTY OF ENTITY Person NAMED BY email_address ;
"""


@pytest.fixture(scope="module")
def docs_df(spark):
    df = spark.createDataFrame([(d,) for d in DOCS], ["raw"])
    return parse_json_documents(df, "raw").select("raw.*")


def test_tokenize_keywords_names():
    toks = tokenize("QUERY q IS SELECT a.b AS x FROM doc ;")
    kinds = [(t.kind, t.text) for t in toks]
    assert ("keyword", "QUERY") in kinds
    assert ("name", "a.b") in kinds
    assert kinds[-1] == ("punct", ";")


def test_parse_program_shapes():
    prog = parse(MTL_TEXT)
    q = prog.queries["emails"]
    assert [s.alias for s in q.selections] == ["person_name", "email_address", "city_upper"]
    assert isinstance(q.selections[0].expr, Keypath)
    assert isinstance(q.selections[2].expr, FuncApp)
    assert [t.direction for t in q.traversals] == ["here", "down", "down"]
    assert len(prog.assertions) == 2
    assert prog.assertions[0].kind == "name"
    assert prog.assertions[1].kind == "property"
    assert prog.assertions[1].designator == "email_address"


def test_parse_python_function_import():
    prog = parse("slugify IS A PYTHON FUNCTION IMPORTED FROM metalpipe_spark.functions.scalars.lower_str ;")
    assert prog.functions["slugify"].dotted_path == (
        "metalpipe_spark.functions.scalars.lower_str"
    )


def test_parse_errors():
    with pytest.raises(SyntaxError):
        parse("QUERY broken IS SELECT FROM doc ;")
    with pytest.raises(SyntaxError):
        parse("x IS A SOMETHING ;")


def test_query_end_to_end(spark, docs_df):
    results = run_program({"document": docs_df}, MTL_TEXT)
    rows = sorted(
        (r["person_name"], r["email_address"], r["city_upper"])
        for r in results["emails"].collect()
    )
    assert rows == [
        ("alice", "alice@x.com", "BERLIN"),
        ("bob", "bob@y.com", "PARIS"),
        ("carol", "carol@z.com", "LYON"),
    ]


def test_imported_function_udf(spark, docs_df):
    text = """
    lower IS A PYTHON FUNCTION IMPORTED FROM metalpipe_spark.functions.scalars.lower_str ;
    QUERY q IS
    SELECT lower(person.name) AS lname
    FROM document
    START AT TOP
    GO DOWN UNTIL HAS KEY name AS person ;
    """
    results = run_program({"document": docs_df}, text)
    assert sorted(r["lname"] for r in results["q"].collect()) == ["alice", "bob", "carol"]


def test_condition_algebra(spark, docs_df):
    # NOT HAS KEY email — matches the users structs and meta, not contact.
    text = """
    QUERY q IS
    SELECT person.name AS n
    FROM document
    GO DOWN UNTIL (HAS KEY name AND NOT HAS KEY email) AS person ;
    """
    results = run_program({"document": docs_df}, text)
    assert sorted(r["n"] for r in results["q"].collect()) == ["alice", "bob", "carol"]


def test_mtl_elided_is_related_and_keypath_temp_collision(spark):
    """'x RELATED TO y AS r ;' (elided IS) asserts the same relationship
    as the full form (previously silently dropped), and distinct
    keypaths whose underscore-joined parts collide (a.b_c vs a_b.c)
    resolve independently."""
    from metalpipe_spark.modelling.mtl import Keypath, _kp_name, parse

    prog = parse("email RELATED TO city AS LIVES_IN ;")
    (a,) = prog.assertions
    assert (a.kind, a.source_column, a.target_column, a.relationship) == (
        "relationship", "email", "city", "LIVES_IN"
    )
    assert _kp_name(Keypath(parts=["a", "b_c"])) != _kp_name(
        Keypath(parts=["a_b", "c"])
    )
