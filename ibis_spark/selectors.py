"""Column selectors (reference: ibis/selectors.py:84-546).

Predicate objects that expand to column lists against a Table's schema at
bind time; composable with ``& | ~``. Usable anywhere a column list is
accepted: ``t.select(s.numeric())``, ``t.drop(s.startswith("tmp_"))``,
``t.group_by(s.of_type("string"))``, and ``s.across(sel, fn)`` for
mutate/aggregate fan-out — schema-only logic, zero execution cost.
"""

from __future__ import annotations

import re as _re
from typing import Callable

from pyspark.sql import types as st

__all__ = [
    "Selector",
    "across",
    "all",
    "all_of",
    "any_of",
    "cols",
    "contains",
    "endswith",
    "first",
    "if_all",
    "if_any",
    "last",
    "matches",
    "none",
    "numeric",
    "of_type",
    "startswith",
    "string",
    "temporal",
    "boolean",
    "where",
]


class Selector:
    """Expands to a list of column names against a table's schema.

    Constructed from a per-field predicate (the common case) or a custom
    expansion (positional selectors like first()/last()). Compositions
    (``& | ~``) operate on the expanded name sets, preserving table
    column order."""

    __slots__ = ("_expand",)

    def __init__(self, pred: Callable = None, *, expand: Callable = None):
        if expand is None:
            if pred is None:
                raise TypeError("Selector needs a predicate or an expansion")

            def expand(table, pred=pred):
                return [f.name for f in table.df.schema.fields if pred(f)]

        self._expand = expand

    def expand(self, table) -> list[str]:
        return self._expand(table)

    def __and__(self, other: "Selector") -> "Selector":
        def both(table):
            keep = set(self.expand(table)) & set(other.expand(table))
            return [n for n in table.columns if n in keep]

        return Selector(expand=both)

    def __or__(self, other: "Selector") -> "Selector":
        def either(table):
            keep = set(self.expand(table)) | set(other.expand(table))
            return [n for n in table.columns if n in keep]

        return Selector(expand=either)

    def __invert__(self) -> "Selector":
        return Selector(
            expand=lambda table: [
                n for n in table.columns if n not in set(self.expand(table))
            ]
        )


def where(pred: Callable) -> Selector:
    """Selector from a StructField predicate (selectors.py:208 c/where)."""
    return Selector(pred)


def numeric() -> Selector:
    """All numeric columns (selectors.py:292)."""
    return Selector(lambda f: isinstance(f.dataType, st.NumericType))


def string() -> Selector:
    return Selector(lambda f: isinstance(f.dataType, st.StringType))


def boolean() -> Selector:
    return Selector(lambda f: isinstance(f.dataType, st.BooleanType))


def temporal() -> Selector:
    return Selector(
        lambda f: isinstance(
            f.dataType, (st.TimestampType, st.TimestampNTZType, st.DateType)
        )
    )


def of_type(dtype) -> Selector:
    """Columns of a given type — ibis dtype string or Spark DataType
    (selectors.py:324)."""
    if isinstance(dtype, st.DataType):
        target = dtype.simpleString()
    else:
        from ibis_spark.functions.generic import _spark_type

        target = _spark_type(dtype).simpleString()
    return Selector(lambda f: f.dataType.simpleString() == target)


def startswith(prefix: str) -> Selector:
    return Selector(lambda f: f.name.startswith(prefix))


def endswith(suffix: str) -> Selector:
    return Selector(lambda f: f.name.endswith(suffix))


def contains(needle: str) -> Selector:
    return Selector(lambda f: needle in f.name)


def matches(pattern: str) -> Selector:
    rx = _re.compile(pattern)
    return Selector(lambda f: rx.search(f.name) is not None)


def cols(*names: str) -> Selector:
    s = set(names)
    return Selector(lambda f: f.name in s)


def all() -> Selector:  # noqa: A001
    """Every column (reference selectors.py all)."""
    return Selector(lambda f: True)


def none() -> Selector:
    """No columns (reference selectors.py none)."""
    return Selector(lambda f: False)


def first() -> Selector:
    """The first column (reference selectors.py:732)."""
    return Selector(expand=lambda table: table.columns[:1])


def last() -> Selector:
    """The last column (reference selectors.py:756)."""
    return Selector(expand=lambda table: table.columns[-1:])


def _to_selector(obj) -> Selector:
    if isinstance(obj, Selector):
        return obj
    if isinstance(obj, str):
        return cols(obj)
    raise TypeError(f"cannot interpret {obj!r} as a selector")


def any_of(*predicates) -> Selector:
    """Columns satisfying ANY predicate (reference selectors.py:362)."""
    import functools

    return functools.reduce(
        lambda a, b: a | b, (_to_selector(p) for p in predicates)
    )


def all_of(*predicates) -> Selector:
    """Columns satisfying ALL predicates (reference selectors.py:378)."""
    import functools

    return functools.reduce(
        lambda a, b: a & b, (_to_selector(p) for p in predicates)
    )


def _apply_pred(pred, col):
    from ibis_spark.expr.deferred import Deferred

    if isinstance(pred, Deferred):
        return pred.resolve(col)
    return pred(col)


def if_any(selector: Selector, predicate) -> Callable:
    """Disjunction of `predicate` over the selected columns (reference
    selectors.py:546) — a table-callable usable directly in filter()."""
    import functools
    import operator

    def build(table):
        parts = [
            _apply_pred(predicate, table[n]) for n in selector.expand(table)
        ]
        return functools.reduce(operator.or_, parts)

    return build


def if_all(selector: Selector, predicate) -> Callable:
    """Conjunction of `predicate` over the selected columns (reference
    selectors.py:595)."""
    import functools
    import operator

    def build(table):
        parts = [
            _apply_pred(predicate, table[n]) for n in selector.expand(table)
        ]
        return functools.reduce(operator.and_, parts)

    return build


class Across:
    """Apply a function to every selected column (selectors.py:430 across):
    ``t.mutate(s.across(s.numeric(), lambda c: c.abs(), names="{col}_abs"))``.
    """

    __slots__ = ("selector", "fn", "names")

    def __init__(self, selector: Selector, fn: Callable, names: str = "{col}"):
        self.selector = selector
        self.fn = fn
        self.names = names

    def expand(self, table) -> list[tuple]:
        out = []
        for name in self.selector.expand(table):
            col = table[name]
            out.append((self.fn(col), self.names.format(col=name)))
        return out


def across(selector: Selector, fn: Callable, names: str = "{col}") -> Across:
    return Across(selector, fn, names)
