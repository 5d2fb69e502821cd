"""Module-level callables for dotted-path UDF tests (the registry
imports by path, so fixtures must live in an importable module)."""

from __future__ import annotations


def count_is_ten(v) -> bool:
    """break_test predicate: fires on the message whose count == 10."""
    return int(v) == 10
