"""Shared helpers between the Column core and the function mixins.

Kept import-cycle-free: function mixin modules import this, and
``column.py`` imports the mixins.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any, Optional

import pyspark.sql.functions as F
from pyspark.sql import Column as SparkColumn


def wrap(sc: SparkColumn, post=None, **meta):
    """Wrap a pyspark Column into our Column.

    ``post`` is a transform applied after a window spec binds (e.g. the
    0-index -1 shift for ranking functions); ``meta`` carries window
    bookkeeping (needs_window / order_hint / cumulative).
    """
    from ibis_spark.expr.column import Column

    return Column(sc, post=post, **meta)


def unwrap(value: Any) -> SparkColumn:
    """Coerce a value (our Column | SortKey | pyspark Column | python
    literal) to a pyspark Column expression."""
    from ibis_spark.expr.column import Column

    if isinstance(value, (Column, SortKey)):
        return value.spark()
    if isinstance(value, SparkColumn):
        return value
    return F.lit(value)


def is_literal(value: Any) -> bool:
    return isinstance(
        value,
        (
            int,
            float,
            str,
            bytes,
            bool,
            decimal.Decimal,
            datetime.date,
            datetime.datetime,
            datetime.timedelta,
            type(None),
        ),
    )


class SortKey:
    """A sort key: a Spark SortOrder expression plus the underlying child
    column and direction (reference SortKey sortkeys.py:16).

    ``unwrap`` yields the SortOrder (usable in orderBy / window specs);
    ordered reductions (collect/first/last/group_concat) need the raw
    ``child`` because a SortOrder cannot be evaluated inside a struct.
    """

    __slots__ = ("_sc", "child", "ascending")

    def __init__(self, sc: SparkColumn, child: SparkColumn, ascending: bool = True):
        self._sc = sc
        self.child = child
        self.ascending = ascending

    def spark(self) -> SparkColumn:
        return self._sc


class InSubquery:
    """Deferred ``x IN (SELECT y FROM t)`` predicate
    (reference: ibis/expr/operations/subqueries.py:65).

    Column.isin(column_or_table) produces this marker; ``Table.filter``
    lowers it to a left-semi (or left-anti when negated) join, which Spark
    executes as a distributed broadcast/shuffled semi join — never a
    driver-side collect.
    """

    __slots__ = ("needle", "haystack", "negated")

    def __init__(self, needle, haystack, negated=False):
        self.needle = needle
        self.haystack = haystack
        self.negated = negated

    def __invert__(self):
        return InSubquery(self.needle, self.haystack, not self.negated)


def name_of(value: Any, default: Optional[str] = None) -> Optional[str]:
    from ibis_spark.expr.column import Column

    if isinstance(value, Column):
        return value.get_name() or default
    if isinstance(value, str):
        return value
    return default
