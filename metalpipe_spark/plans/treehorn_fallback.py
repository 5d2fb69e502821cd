"""Ragged-JSON treehorn fallback (SURVEY.md §7.4.1).

The schema-compiled plan (plans/treehorn.py) requires a stable
StructType.  When documents vary in shape — fields changing type or
position row to row — this module runs the *reference-style* recursive
search per document (semantics of /root/reference/metalpipe/utils/
treehorn.py:100-123: match at any depth, return the containing node,
chained traversals scoped to the prior match's subtree) as an
Arrow-batched ``mapInPandas`` pass.

Scale posture: this is the explicitly-marked slow path — O(rows) Python
with per-document tree walks, vectorized only at the transport layer.
Pipelines should prefer schema inference + the compiled plan; the
fallback exists so no document shape is unqueryable.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from metalpipe_spark.plans.treehorn import Traversal


def _descend(node, path=()):  # document-order (node, path) pairs, strict descendants
    if isinstance(node, dict):
        for k, v in node.items():
            yield v, path + (k,)
            yield from _descend(v, path + (k,))
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield v, path + (i,)
            yield from _descend(v, path + (i,))


def _node_at(root, path):
    cur = root
    for step in path:
        cur = cur[step]
    return cur


def _candidates(root, anchor_path, trav: Traversal):
    anchor = _node_at(root, anchor_path)
    if trav.direction == "down":
        for node, rel in _descend(anchor):
            yield node, anchor_path + rel
    elif trav.direction == "up":
        for i in range(len(anchor_path) - 1, -1, -1):
            yield _node_at(root, anchor_path[:i]), anchor_path[:i]
    else:
        yield anchor, anchor_path


def _bindings(root, traversals):
    def rec(i, anchor_path, bound):
        if i == len(traversals):
            yield dict(bound)
            return
        trav = traversals[i]
        for node, path in _candidates(root, anchor_path, trav):
            if trav.condition.test_data(node, path):
                yield from rec(
                    i + 1, path, bound + [(trav.label or f"_t{i}", path)]
                )

    yield from rec(0, (), [])


def _project(root, path, keypath: str | None):
    node = _node_at(root, path)
    if keypath:
        for k in keypath.split("."):
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
    # Non-scalar projections serialize to JSON text (the caller's output
    # schema is flat; nested values stay queryable via from_json).
    if isinstance(node, (dict, list)):
        return json.dumps(node)
    return node


def search_ragged(
    df: DataFrame,
    json_col: str,
    chain: Traversal,
    projections: dict[str, tuple[str, str | None]],
    output_schema: str,
) -> DataFrame:
    """Run a treehorn chain against ragged JSON text per row.

    Same contract as :func:`plans.treehorn.apply_relation`, but evaluated
    on data instead of schema: each document yields one output row per
    binding tuple (the reference's generator of labeled bindings).
    ``output_schema`` is the DDL of the projected columns (all values
    JSON-serializable; cast downstream as needed).
    """
    traversals = chain._chain
    proj = dict(projections)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for raw in pdf[json_col]:
                if raw is None:
                    continue
                root = json.loads(raw) if isinstance(raw, str) else raw
                for binding in _bindings(root, traversals):
                    row = {}
                    for out, (label, keypath) in proj.items():
                        row[out] = (
                            _project(root, binding[label], keypath)
                            if label in binding
                            else None
                        )
                    out_rows.append(row)
            cols = list(proj)
            yield pd.DataFrame(out_rows, columns=cols)

    return df.mapInPandas(run, schema=output_schema)
