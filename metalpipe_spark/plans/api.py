"""Programmatic composition API (SURVEY.md §3.2).

The reference's public Python surface is ``node1 > node2 > node3;
node1.global_start()`` (/root/reference/metalpipe/node.py:278-284;
README.rst:37-60): ``>`` wires an edge and returns the right operand so
chains compose.  Here a :class:`Node` is a declarative (class, options)
pair; ``>`` accumulates edges; :func:`compile_graph` walks the connected
component and lowers it through the same ``compile_pipeline`` path the
YAML entry uses — one compiler, two front ends.  ``global_start()``'s
run-everything semantics is :func:`run_graph` (actions on terminals).
"""

from __future__ import annotations

import itertools
from typing import Any

from pyspark.sql import SparkSession

from metalpipe_spark.plans.pipeline import (
    CompiledPipeline,
    compile_pipeline,
    run_pipeline,
)

_COUNTER = itertools.count()


class Node:
    """One pipeline node: ``Node("Filter", test=..., test_keypath=...)``.

    ``a > b`` adds edge a→b and returns ``b`` (the reference's chaining
    contract, node.py:278-284).  Fan-out: call ``>`` repeatedly from the
    same node.  Fan-in: point several nodes at one target.
    """

    def __init__(self, cls: str, name: str | None = None, **options: Any):
        self.cls = cls
        self.name = name or f"{cls.lower()}_{next(_COUNTER)}"
        self.options = options
        self.downstream: list[Node] = []
        self.upstream: list[Node] = []

    def __gt__(self, other: "Node") -> "Node":
        self.downstream.append(other)
        other.upstream.append(self)
        return other

    def connected(self) -> list["Node"]:
        """Every node reachable over edges in either direction."""
        seen: dict[int, Node] = {}
        stack = [self]
        while stack:
            n = stack.pop()
            if id(n) in seen:
                continue
            seen[id(n)] = n
            stack.extend(n.downstream)
            stack.extend(n.upstream)
        return list(seen.values())


def node(cls: str, name: str | None = None, **options: Any) -> Node:
    return Node(cls, name=name, **options)


def compile_graph(
    spark: SparkSession, any_node: Node, capture_dir: str | None = None
) -> CompiledPipeline:
    """Lower the connected component containing ``any_node`` to DataFrames
    via the YAML compiler's config shape."""
    nodes = any_node.connected()
    config = {
        "nodes": {n.name: {"class": n.cls, "options": n.options} for n in nodes},
        "edges": [[a.name, b.name] for a in nodes for b in a.downstream],
    }
    return compile_pipeline(spark, config, capture_dir=capture_dir)


def run_graph(spark: SparkSession, any_node: Node) -> dict[str, int]:
    """``global_start()`` parity: compile, then run every terminal action;
    returns per-terminal row counts (the reference's monitor counters)."""
    return run_pipeline(compile_graph(spark, any_node))
