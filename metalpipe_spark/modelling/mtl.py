"""MTL — the reference's SQL-ish text language over nested documents
(SURVEY.md §2.10, §3.3), parsed with a hand-written tokenizer +
recursive-descent parser (same grammar as the reference's PLY lex/yacc,
/root/reference/metalpipe/modelling/treehorn_tokenizer.py:3-104 and
treehorn_yaccer.py:29-522) and compiled to DataFrame plans.

Statement forms::

    name IS A PYTHON FUNCTION IMPORTED FROM dotted.module.path ;

    QUERY q IS
    SELECT email.email AS email_address, upper(person.name) AS person_name
    FROM document
    START AT TOP AS root
    GO DOWN UNTIL HAS KEY email AS email
    GO DOWN UNTIL (HAS KEY name AND NOT HAS KEY email) AS person ;

    email_address IS A UNIQUE PROPERTY OF ENTITY Person ;
    person_name IS A PROPERTY OF ENTITY Person NAMED BY email_address ;
    email_address IS RELATED TO city_name AS LIVES_IN ;
    email_address AND alt_email COREFER ;

Compilation targets:
  * queries      → treehorn traversal chains (plans/treehorn.py) →
                   explode/select plans; imported functions become typed
                   UDFs via the dotted-path registry;
  * assertions   → modelling.assertions vocabulary → entity/edge
                   DataFrames (the reference drove Cypher MERGEs from a
                   pyDatalog base instead, treehorn_yaccer.py:638-773).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metalpipe_spark.modelling.assertions import Assertion
from metalpipe_spark.plans.treehorn import (
    Condition,
    GoDown,
    GoUp,
    HasKey,
    IsDictionary,
    IsList,
    StayHere,
    Traversal,
    apply_relation,
)
from metalpipe_spark.udf_registry import load_function, wrap_udf

# ---------------------------------------------------------------------------
# Tokenizer (treehorn_tokenizer.py:3-104): keywords + identifiers + punct.

_KEYWORDS = {
    "QUERY", "IS", "SELECT", "AS", "FROM", "START", "AT", "TOP", "GO",
    "DOWN", "UP", "UNTIL", "HAS", "KEY", "AND", "OR", "NOT", "LIST",
    "DICTIONARY", "A", "PYTHON", "FUNCTION", "IMPORTED", "UNIQUE",
    "PROPERTY", "OF", "ENTITY", "NAMED", "BY", "RELATED", "TO", "COREFER",
}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<punct>[();,])|(?P<word>[A-Za-z_][A-Za-z0-9_.]*))"
)


@dataclass
class Token:
    kind: str  # keyword | name | punct
    text: str


def tokenize(text: str) -> list[Token]:
    # strip -- comments
    text = re.sub(r"--[^\n]*", "", text)
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise SyntaxError(f"MTL: cannot tokenize at {text[pos:pos+30]!r}")
            break
        pos = m.end()
        if m.group("punct"):
            tokens.append(Token("punct", m.group("punct")))
        else:
            word = m.group("word")
            if word.upper() in _KEYWORDS and "." not in word:
                tokens.append(Token("keyword", word.upper()))
            else:
                tokens.append(Token("name", word))
    return tokens


# ---------------------------------------------------------------------------
# AST


@dataclass
class Keypath:
    parts: list[str]  # [label, key, key, ...]


@dataclass
class FuncApp:
    name: str
    args: list


@dataclass
class Selection:
    expr: Keypath | FuncApp
    alias: str


@dataclass
class TraversalSpec:
    direction: str  # here | down | up
    condition: object | None
    label: str


@dataclass
class QueryStmt:
    name: str
    selections: list[Selection]
    from_obj: str
    traversals: list[TraversalSpec]


@dataclass
class FunctionImport:
    name: str
    dotted_path: str


@dataclass
class MTLProgram:
    functions: dict[str, FunctionImport] = field(default_factory=dict)
    queries: dict[str, QueryStmt] = field(default_factory=dict)
    assertions: list[Assertion] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Parser (treehorn_yaccer.py grammar, recursive descent)


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0) -> Token | None:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise SyntaxError("MTL: unexpected end of input")
        self.i += 1
        return t

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text.upper() != text.upper():
            raise SyntaxError(f"MTL: expected {text!r}, got {t.text!r}")
        return t

    def at(self, text: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t is not None and t.text.upper() == text.upper()

    # -- statements --------------------------------------------------------

    def program(self) -> MTLProgram:
        prog = MTLProgram()
        while self.peek() is not None:
            self.statement(prog)
        return prog

    def statement(self, prog: MTLProgram) -> None:
        if self.at("QUERY"):
            q = self.query()
            prog.queries[q.name] = q
        elif self.at("AND", 1):  # x AND y COREFER
            a = self.next().text
            self.expect("AND")
            b = self.next().text
            self.expect("COREFER")
            prog.assertions.append(
                Assertion(kind="coreference", source_column=a, target_column=b)
            )
        else:
            name = self.next().text
            if self.at("IS"):
                self.expect("IS")
                if self.at("A"):
                    self.expect("A")
                    if self.at("PYTHON"):
                        self.expect("PYTHON"); self.expect("FUNCTION")
                        self.expect("IMPORTED"); self.expect("FROM")
                        dotted = self.next().text
                        prog.functions[name] = FunctionImport(name, dotted)
                    else:
                        unique = False
                        if self.at("UNIQUE"):
                            self.expect("UNIQUE")
                            unique = True
                        self.expect("PROPERTY")
                        self.expect("OF"); self.expect("ENTITY")
                        entity = self.next().text
                        named_by = None
                        if self.at("NAMED"):
                            self.expect("NAMED"); self.expect("BY")
                            named_by = self.next().text
                        kind = "name" if unique else "property"
                        prog.assertions.append(
                            Assertion(
                                kind=kind,
                                column=name,
                                entity_type=entity,
                                designator=named_by,
                                property_name=name,
                            )
                        )
                elif self.at("RELATED"):
                    self.expect("RELATED"); self.expect("TO")
                    target = self.next().text
                    self.expect("AS")
                    rel = self.next().text
                    prog.assertions.append(
                        Assertion(
                            kind="relationship",
                            source_column=name,
                            target_column=target,
                            relationship=rel,
                        )
                    )
                else:
                    raise SyntaxError(f"MTL: unexpected token after {name} IS")
            elif self.at("RELATED"):
                # elided-IS form: 'x RELATED TO y AS r ;' asserts the
                # same relationship as the reference's full
                # 'x IS RELATED TO y AS r ;' (previously this branch
                # consumed RELATED and silently dropped the statement).
                self.expect("RELATED"); self.expect("TO")
                target = self.next().text
                self.expect("AS")
                rel = self.next().text
                prog.assertions.append(
                    Assertion(
                        kind="relationship",
                        source_column=name,
                        target_column=target,
                        relationship=rel,
                    )
                )
            else:
                raise SyntaxError(f"MTL: unexpected statement start {name!r}")
        self.expect(";")

    def query(self) -> QueryStmt:
        self.expect("QUERY")
        name = self.next().text
        self.expect("IS")
        self.expect("SELECT")
        sels = [self.selection()]
        while self.at(","):
            self.expect(",")
            sels.append(self.selection())
        self.expect("FROM")
        from_obj = self.next().text
        travs = [self.traversal()]
        while self.at("GO") or self.at("START"):
            travs.append(self.traversal())
        return QueryStmt(name=name, selections=sels, from_obj=from_obj, traversals=travs)

    def selection(self) -> Selection:
        expr = self.sel_expr()
        self.expect("AS")
        alias = self.next().text
        return Selection(expr=expr, alias=alias)

    def sel_expr(self):
        t = self.next()
        if t.kind != "name":
            raise SyntaxError(f"MTL: expected name in SELECT, got {t.text!r}")
        if self.at("("):
            self.expect("(")
            args = [self.sel_expr()]
            while self.at(","):
                self.expect(",")
                args.append(self.sel_expr())
            self.expect(")")
            return FuncApp(name=t.text, args=args)
        return Keypath(parts=t.text.split("."))

    def traversal(self) -> TraversalSpec:
        if self.at("START"):
            self.expect("START"); self.expect("AT"); self.expect("TOP")
            label = "top"
            if self.at("AS"):
                self.expect("AS")
                label = self.next().text
            return TraversalSpec(direction="here", condition=None, label=label)
        self.expect("GO")
        direction = self.next().text.lower()  # down | up
        if direction not in ("down", "up"):
            raise SyntaxError(f"MTL: GO {direction!r}")
        self.expect("UNTIL")
        cond = self.condition()
        self.expect("AS")
        label = self.next().text
        return TraversalSpec(direction=direction, condition=cond, label=label)

    def condition(self) -> Condition:
        if self.at("("):
            self.expect("(")
            left = self.condition()
            op = self.next().text.upper()
            right = self.condition()
            self.expect(")")
            if op == "AND":
                return left & right
            if op == "OR":
                return left | right
            raise SyntaxError(f"MTL: bad boolean op {op!r}")
        if self.at("NOT"):
            self.expect("NOT")
            return ~self.condition()
        if self.at("HAS"):
            self.expect("HAS"); self.expect("KEY")
            return HasKey(self.next().text)
        if self.at("IS"):
            self.expect("IS")
            if self.at("LIST"):
                self.expect("LIST")
                return IsList()
            self.expect("DICTIONARY")
            return IsDictionary()
        if self.at("TOP"):
            self.expect("TOP")
            from metalpipe_spark.plans.treehorn import IsRoot

            return IsRoot()
        raise SyntaxError(f"MTL: bad condition at {self.peek().text!r}")


def parse(text: str) -> MTLProgram:
    return _Parser(tokenize(text)).program()


# ---------------------------------------------------------------------------
# Compilation: QueryStmt → DataFrame plan


def _build_chain(travs: list[TraversalSpec]) -> Traversal:
    chain: Traversal | None = None
    for spec in travs:
        if spec.direction == "here":
            t: Traversal = StayHere(spec.label)
        elif spec.direction == "down":
            t = GoDown(spec.condition) + spec.label
        else:
            t = GoUp(spec.condition) + spec.label
        chain = t if chain is None else (chain > t)
    assert chain is not None
    return chain


def compile_query(
    df: DataFrame,
    query: QueryStmt,
    functions: dict[str, FunctionImport] | None = None,
    return_types: dict[str, str] | None = None,
) -> DataFrame:
    """Compile one MTL query against ``df`` (the FROM object).

    Keypath selections project labeled traversal matches
    (treehorn_yaccer.py:494-522); function applications resolve imported
    functions through the UDF registry (identity-wrapping default,
    treehorn_yaccer.py:494-503).  ``return_types`` optionally types each
    imported function's UDF (default string).
    """
    functions = functions or {}
    chain = _build_chain(query.traversals)

    # Collect every keypath the selections need, project them with
    # temp names through apply_relation, then apply function trees.
    keypaths: dict[str, tuple[str, str | None]] = {}

    def visit(expr) -> None:
        if isinstance(expr, Keypath):
            label, rest = expr.parts[0], expr.parts[1:]
            keypaths[_kp_name(expr)] = (label, ".".join(rest) or None)
        else:
            for a in expr.args:
                visit(a)

    for sel in query.selections:
        visit(sel.expr)

    projected = apply_relation(df, chain, keypaths)

    def build(expr) -> Column:
        if isinstance(expr, Keypath):
            return F.col(_kp_name(expr))
        args = [build(a) for a in expr.args]
        if expr.name in functions:
            rt = (return_types or {}).get(expr.name, "string")
            fn = wrap_udf(functions[expr.name].dotted_path, rt)
            return fn(*args)
        if expr.name == "identity":  # default wrapper (yaccer:494-503)
            return args[0]
        builtin = getattr(F, expr.name, None)
        if builtin is None:
            raise ValueError(f"MTL: unknown function {expr.name!r}")
        return builtin(*args)

    return projected.select(
        *[build(sel.expr).alias(sel.alias) for sel in query.selections]
    )


def _kp_name(expr: Keypath) -> str:
    """Collision-free temp-column name for a keypath: joining parts with
    '_' alone would alias distinct keypaths whose parts contain
    underscores (a.b_c vs a_b.c), silently resolving both selections
    from one projection — the md5 of the dotted form disambiguates while
    keeping the name readable and deterministic."""
    import hashlib

    dotted = ".".join(expr.parts)
    return (
        "__kp_"
        + "_".join(expr.parts)
        + "_"
        + hashlib.md5(dotted.encode()).hexdigest()[:8]
    )


def run_program(
    df_by_name: dict[str, DataFrame],
    text: str,
    return_types: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Parse and run every query in an MTL program; returns result
    DataFrames by query name.  Entity assertions over the results are
    available via ``parse(text).assertions`` + modelling.compile_graph —
    the reference executed them as Cypher MERGEs instead
    (treehorn_yaccer.py:638-773)."""
    prog = parse(text)
    out = {}
    for name, q in prog.queries.items():
        if q.from_obj not in df_by_name:
            raise ValueError(f"MTL: unknown FROM object {q.from_obj!r}")
        out[name] = compile_query(
            df_by_name[q.from_obj], q, prog.functions, return_types
        )
    return out
