"""Ragged-JSON fallback tests: reference semantics (any depth, containing
dict, chained subtree scoping) on documents whose shapes differ row to
row — exactly the case the schema-compiled plan cannot express."""

from __future__ import annotations

from metalpipe_spark.plans.treehorn import GoDown, GoUp, HasKey, IsList, StayHere
from metalpipe_spark.plans.treehorn_fallback import search_ragged

RAGGED = [
    # email at depth 2
    '{"user": {"email": "a@x.com", "name": "alice"}}',
    # email at depth 4, inside a list
    '{"orgs": [{"members": [{"email": "b@y.com", "name": "bob"}]}]}',
    # email key holds a dict in this row (type varies across rows!)
    '{"email": {"primary": "c@z.com"}, "name": "carol"}',
    # no email anywhere
    '{"name": "dave"}',
]


def _df(spark):
    return spark.createDataFrame([(d,) for d in RAGGED], ["raw"])


def test_matches_at_any_depth(spark):
    chain = StayHere("root") > (GoDown(HasKey("email")) + "holder")
    out = search_ragged(
        _df(spark), "raw", chain,
        {"email": ("holder", "email"), "name": ("holder", "name")},
        "email string, name string",
    )
    rows = {(r["name"]) for r in out.collect()}
    # alice (depth 2) and bob (depth 4) match.  carol's containing dict
    # is the ROOT itself — GoDown yields STRICT descendants
    # (include_self=False, reference treehorn.py:396-402) — so no match;
    # dave has no email anywhere.
    assert rows == {"alice", "bob"}


def test_returns_containing_dict_not_value(spark):
    chain = GoDown(HasKey("email")) + "holder"
    out = search_ragged(
        _df(spark), "raw", chain, {"name": ("holder", "name")}, "name string"
    )
    names = sorted(r["name"] for r in out.collect() if r["name"])
    assert names == ["alice", "bob"]  # carol: root is not a strict descendant


def test_chained_traversal_scopes_to_subtree(spark):
    docs = [
        '{"a": {"list": [1, 2]}, "b": {"other": true}}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], ["raw"])
    chain = (GoDown(HasKey("list")) + "holder") > (GoDown(IsList()) + "lst")
    out = search_ragged(df, "raw", chain, {"lst": ("lst", None)}, "lst string")
    # Only the list under the matched holder, not anything in b.
    assert out.count() == 1


def test_go_up_finds_ancestor(spark):
    docs = ['{"wrapper": {"inner": {"email": "x@y.z"}, "tag": "T"}}']
    df = spark.createDataFrame([(d,) for d in docs], ["raw"])
    chain = (GoDown(HasKey("email")) + "leaf") > (GoUp(HasKey("tag")) + "up")
    out = search_ragged(
        df, "raw", chain, {"tag": ("up", "tag"), "email": ("leaf", "email")},
        "tag string, email string",
    )
    row = out.head()
    assert row["tag"] == "T" and row["email"] == "x@y.z"


def test_traversal_chain_unparenthesized_matches_reference_contract():
    """Python evaluates t1 > t2 > t3 as (t1>t2) and (t2>t3), whose value
    is the LAST comparison's result — __gt__ must accumulate on and
    return the right operand (the reference contract, node.py:278-284)
    or the first traversal silently drops out of the chain.  The
    parenthesized form must agree, and the head operand stays clean
    (only non-head reuse is the documented caveat)."""
    from metalpipe_spark.plans.treehorn import GoDown, HasKey

    def keys(ch):
        return [t.condition.key for t in ch._chain]

    chain = GoDown(HasKey("a")) > GoDown(HasKey("b")) > GoDown(HasKey("c"))
    assert keys(chain) == ["a", "b", "c"]
    paren = (GoDown(HasKey("a")) > GoDown(HasKey("b"))) > GoDown(HasKey("c"))
    assert keys(paren) == ["a", "b", "c"]
    head = GoDown(HasKey("h"))
    head > GoDown(HasKey("x"))
    assert keys(head) == ["h"]  # the head is never mutated
