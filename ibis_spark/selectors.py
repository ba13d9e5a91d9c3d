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
    "cols",
    "contains",
    "endswith",
    "matches",
    "numeric",
    "of_type",
    "startswith",
    "string",
    "temporal",
    "boolean",
    "where",
]


class Selector:
    """A schema predicate; expands to matching column names."""

    __slots__ = ("_pred",)

    def __init__(self, pred: Callable):
        self._pred = pred

    def expand(self, table) -> list[str]:
        return [f.name for f in table.df.schema.fields if self._pred(f)]

    def __and__(self, other: "Selector") -> "Selector":
        return Selector(lambda f: self._pred(f) and other._pred(f))

    def __or__(self, other: "Selector") -> "Selector":
        return Selector(lambda f: self._pred(f) or other._pred(f))

    def __invert__(self) -> "Selector":
        return Selector(lambda f: not self._pred(f))


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
