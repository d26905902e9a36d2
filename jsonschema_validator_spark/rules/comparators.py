"""Comparator registry — SURVEY.md §2.3.

Reference: /root/reference/comparators/ — ``RegisterBuiltInComparators``
(builtin.go:9-29) registers eq/ne via DeepEqual (builtin.go:32-42) and
gt/ge/lt/le via float64 coercion (builtin.go:45-75); ``RegisterComparator``
(simple.go:9-40, validator/validator.go:84-102) is the extension point.

Spark mapping: a comparator is a binary ``(Column, Column) -> Column``
boolean function; the registry is a plain dict with the same
register/lookup/duplicate semantics as the reference
(empty names and nil functions rejected, duplicates rejected —
validator.go:86-96).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column

CompareFunc = Callable[[Column, Column], Column]


class ComparatorError(ValueError):
    pass


_COMPARATORS: dict[str, CompareFunc] = {}


def register_comparator(name: str, fn: CompareFunc, overwrite: bool = False) -> None:
    """validator.go:84-102 semantics: empty name / nil fn / duplicate are
    errors (duplicate allowed only with overwrite=True)."""
    if not name:
        raise ComparatorError("comparator name cannot be empty")
    if fn is None:
        raise ComparatorError("comparator function cannot be nil")
    if name in _COMPARATORS and not overwrite:
        raise ComparatorError(f"comparator '{name}' already registered")
    _COMPARATORS[name] = fn


def get_comparator(name: str) -> Optional[CompareFunc]:
    return _COMPARATORS.get(name)


def compare(name: str, a: Column, b: Column) -> Column:
    fn = _COMPARATORS.get(name)
    if fn is None:
        raise ComparatorError(f"comparator '{name}' not found")
    return fn(a, b)


def _register_builtins() -> None:
    """comparators/builtin.go:9-29. eq/ne use Spark's null-safe semantics
    analogue of DeepEqual (``eqNullSafe``: NULL == NULL is true, like
    ``reflect.DeepEqual(nil, nil)``); gt/ge/lt/le are numeric-coercing
    Column comparisons (Catalyst inserts the casts toFloat64 hand-rolled)."""
    builtins: dict[str, CompareFunc] = {
        "eq": lambda a, b: a.eqNullSafe(b),
        "ne": lambda a, b: ~a.eqNullSafe(b),
        "gt": lambda a, b: a > b,
        "ge": lambda a, b: a >= b,
        "lt": lambda a, b: a < b,
        "le": lambda a, b: a <= b,
    }
    for n, fn in builtins.items():
        if n not in _COMPARATORS:
            _COMPARATORS[n] = fn


_register_builtins()

__all__ = [
    "CompareFunc",
    "ComparatorError",
    "register_comparator",
    "get_comparator",
    "compare",
]
