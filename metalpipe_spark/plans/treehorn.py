"""Treehorn — the reference's jQuery-like nested-document query system
(/root/reference/metalpipe/utils/treehorn.py), re-expressed as
compile-time schema search + columnar explode/select plans (SURVEY.md
§2.10, §4.2.2).

Reference semantics preserved (treehorn.py:92-123,385-402 and
source/treehorn.rst:168-239):

* a "document" is one record (dict); here: one DataFrame row, whose
  root node is the row struct itself;
* ``GoDown(cond)`` yields every **strict descendant** satisfying the
  condition (``descendants(include_self=False)``), at any depth;
* ``HasKey(k)`` matches the **containing dict**, not the value;
* chaining ``t1 > t2`` searches t2 within each t1 match's subtree,
  producing the cross product of binding tuples;
* ``traversal + 'label'`` binds matches to a name; a ``Relation``
  projects keypaths out of labeled bindings.

The crucial difference from the reference: traversal runs over the
*schema* (StructType), once, at plan time — per-row Python recursion
(treehorn.py:100-123 with its per-match deepcopy) is replaced by static
path resolution plus ``explode`` for array crossings, so the same query
is a columnar plan at any data scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ARRAY_STEP = "[]"  # path step marking descent into array elements


# ---------------------------------------------------------------------------
# Conditions (treehorn.py:204-343) — evaluated on (path, dtype) at plan time.
# ---------------------------------------------------------------------------


class Condition:
    """Dual-evaluation condition: ``__call__`` tests a *schema* node
    (path, dtype) at plan time; ``test_data`` tests a *data* node (the
    ragged-JSON fallback's per-row evaluation, matching the reference's
    runtime semantics, treehorn.py:204-343)."""

    def __call__(self, path: tuple[str, ...], dtype: T.DataType) -> bool:
        raise NotImplementedError

    def test_data(self, node, path: tuple) -> bool:
        raise NotImplementedError

    def __and__(self, other: "Condition") -> "Condition":
        return And(self, other)

    def __or__(self, other: "Condition") -> "Condition":
        return Or(self, other)

    def __invert__(self) -> "Condition":
        return Not(self)


class And(Condition):
    def __init__(self, a: Condition, b: Condition):
        self.a, self.b = a, b

    def __call__(self, path, dtype):
        return self.a(path, dtype) and self.b(path, dtype)

    def test_data(self, node, path):
        return self.a.test_data(node, path) and self.b.test_data(node, path)


class Or(Condition):
    def __init__(self, a: Condition, b: Condition):
        self.a, self.b = a, b

    def __call__(self, path, dtype):
        return self.a(path, dtype) or self.b(path, dtype)

    def test_data(self, node, path):
        return self.a.test_data(node, path) or self.b.test_data(node, path)


class Not(Condition):
    def __init__(self, a: Condition):
        self.a = a

    def __call__(self, path, dtype):
        return not self.a(path, dtype)

    def test_data(self, node, path):
        return not self.a.test_data(node, path)


class HasKey(Condition):
    """treehorn.py:243-258 — node is a dict containing ``key``."""

    def __init__(self, key: str):
        self.key = key

    def __call__(self, path, dtype):
        return isinstance(dtype, T.StructType) and self.key in dtype.fieldNames()

    def test_data(self, node, path):
        return isinstance(node, dict) and self.key in node


class IsList(Condition):
    def __call__(self, path, dtype):
        return isinstance(dtype, T.ArrayType)

    def test_data(self, node, path):
        return isinstance(node, list)


class IsDictionary(Condition):
    def __call__(self, path, dtype):
        return isinstance(dtype, T.StructType)

    def test_data(self, node, path):
        return isinstance(node, dict)


class IsRoot(Condition):
    def __call__(self, path, dtype):
        return len(path) == 0

    def test_data(self, node, path):
        return len(path) == 0


class PathEndsIn(Condition):
    """treehorn.py:310-321 — last key on the node's path equals ``key``."""

    def __init__(self, key: str):
        self.key = key

    def __call__(self, path, dtype):
        keys = [s for s in path if s != ARRAY_STEP]
        return bool(keys) and keys[-1] == self.key

    def test_data(self, node, path):
        keys = [s for s in path if not isinstance(s, int)]
        return bool(keys) and keys[-1] == self.key


class Yes(Condition):
    def __call__(self, path, dtype):
        return True

    def test_data(self, node, path):
        return True


# ---------------------------------------------------------------------------
# Traversals (treehorn.py:60-201)
# ---------------------------------------------------------------------------


class Traversal:
    direction = "down"

    def __init__(self, condition: Condition | None = None, label: str | None = None):
        self.condition = condition or Yes()
        self.label = label
        self._chain: list[Traversal] = [self]

    def __add__(self, label: str) -> "Traversal":
        """treehorn.py:144-146 — bind matches to a label."""
        self.label = label
        return self

    def __gt__(self, other: "Traversal") -> "Traversal":
        """treehorn.py:148-151 — chain: search ``other`` inside each match.

        Accumulates on — and returns — the RIGHT operand, the
        reference's contract (node.py:278-284).  That is what makes the
        unparenthesized ``t1 > t2 > t3`` form work: Python evaluates it
        as ``(t1 > t2) and (t2 > t3)``, whose VALUE is the last
        comparison's result — an implementation accumulating on (and
        returning) SELF silently drops ``t1`` from the chain the
        expression yields, and an immutable implementation loses ``t1``
        too because the middle comparison re-reads the original ``t2``.
        Caveat (shared with the reference): chaining mutates the right
        operand, so don't reuse one traversal object as a NON-HEAD
        element of two different chains — construct fresh traversals
        per chain."""
        other._chain = self._chain + other._chain
        return other


class GoDown(Traversal):
    direction = "down"


class GoUp(Traversal):
    direction = "up"


class StayHere(Traversal):
    direction = "here"

    def __init__(self, label: str | None = None):
        super().__init__(Yes(), label)


# ---------------------------------------------------------------------------
# Schema resolution
# ---------------------------------------------------------------------------


def _dtype_at(schema: T.DataType, path: tuple[str, ...]) -> T.DataType:
    dt = schema
    for step in path:
        if step == ARRAY_STEP:
            assert isinstance(dt, T.ArrayType)
            dt = dt.elementType
        else:
            assert isinstance(dt, T.StructType)
            dt = dt[step].dataType
    return dt


def _descendant_paths(schema: T.DataType, anchor: tuple[str, ...]):
    """Strict descendants of the node at ``anchor``, in document order
    (mirrors TracedObject.descendants, treehorn.py:396-402)."""
    out: list[tuple[str, ...]] = []

    def walk(dt: T.DataType, path: tuple[str, ...]):
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                child = path + (f.name,)
                out.append(child)
                walk(f.dataType, child)
        elif isinstance(dt, T.ArrayType):
            child = path + (ARRAY_STEP,)
            out.append(child)
            walk(dt.elementType, child)

    walk(_dtype_at(schema, anchor), anchor)
    return out


def _candidate_paths(schema, anchor: tuple[str, ...], trav: Traversal):
    if trav.direction == "down":
        return _descendant_paths(schema, anchor)
    if trav.direction == "up":
        # ancestors, nearest first (treehorn.py:385-391)
        return [anchor[:i] for i in range(len(anchor) - 1, -1, -1)]
    return [anchor]


def resolve(schema: T.StructType, chain: Traversal) -> list[list[tuple[str, tuple[str, ...]]]]:
    """Resolve a traversal chain against a schema.

    Returns the list of binding tuples: each is ``[(label, abs_path),…]``
    in chain order — the static analogue of the reference's generator of
    labeled binding dicts (treehorn.py:115-123).
    """
    traversals = chain._chain
    bindings: list[list[tuple[str, tuple[str, ...]]]] = []

    def rec(i: int, anchor: tuple[str, ...], bound):
        if i == len(traversals):
            bindings.append(bound)
            return
        trav = traversals[i]
        for path in _candidate_paths(schema, anchor, trav):
            if trav.condition(path, _dtype_at(schema, path)):
                rec(i + 1, path, bound + [(trav.label or f"_t{i}", path)])

    rec(0, (), [])
    return bindings


# ---------------------------------------------------------------------------
# Relation → DataFrame compilation (treehorn.py:504-537)
# ---------------------------------------------------------------------------


def apply_relation(
    df: DataFrame,
    chain: Traversal,
    projections: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Compile ``chain`` + ``projections`` into a DataFrame plan.

    ``projections`` maps output column -> (label, keypath-or-None); a
    ``None`` keypath projects the labeled node itself.  Multiple schema
    bindings union (the reference yields results for every match
    combination).
    """
    all_bindings = resolve(df.schema, chain)
    if not all_bindings:
        raise ValueError("treehorn chain matched no schema path")
    plans = [_compile_binding(df, b, projections) for b in all_bindings]
    return reduce(lambda a, b: a.unionByName(b), plans)


def _compile_binding(df: DataFrame, binding, projections) -> DataFrame:
    exploded: dict[tuple[str, ...], str | None] = {(): None}
    counter = [0]

    def col_for(path: tuple[str, ...]) -> Column | None:
        nonlocal df
        best = max((p for p in exploded if path[: len(p)] == p), key=len)
        name = exploded[best]
        col = F.col(name) if name else None
        prefix = best
        for step in path[len(best):]:
            prefix = prefix + (step,)
            if step == ARRAY_STEP:
                counter[0] += 1
                tmp = f"__treehorn_{counter[0]}"
                df = df.withColumn(tmp, F.explode(col))
                exploded[prefix] = tmp
                col = F.col(tmp)
            else:
                col = col.getField(step) if col is not None else F.col(step)
        return col

    env: dict[str, Column | None] = {}
    for label, path in binding:
        env[label] = col_for(path)

    out_cols = []
    for out, (label, keypath) in projections.items():
        col = env[label]
        if keypath:
            for k in keypath.split("."):
                col = col.getField(k) if col is not None else F.col(k)
        if col is None:
            raise ValueError(f"projection {out} addresses the root without a keypath")
        out_cols.append(col.alias(out))
    return df.select(*out_cols)


def parse_json_documents(df: DataFrame, json_col: str, schema=None, sample_ratio: float = 1.0) -> DataFrame:
    """splitter-equivalent ingestion (treehorn.py:459-501): JSON text →
    typed tree.  If no schema is given it is inferred from the data once
    (driver-side aggregate over a sample), then applied columnwise."""
    if schema is None:
        sample = df.select(json_col).filter(F.col(json_col).isNotNull())
        if sample_ratio < 1.0:
            sample = sample.sample(sample_ratio)
        # One-time schema inference over the (sampled) JSON column; the
        # JSON datasource unions field sets across rows, handling ragged
        # documents (SURVEY §7.4.1).
        schema = df.sparkSession.read.json(
            sample.rdd.map(lambda r: r[0])
        ).schema
    return df.withColumn(json_col, F.from_json(F.col(json_col), schema))
