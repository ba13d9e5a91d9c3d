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


class Expr:
    """Common marker base for Table and Column (reference
    ibis/expr/types/core.py Expr), so ``isinstance(x, ibis.Expr)`` works
    the way reference code expects."""

    __slots__ = ()


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
    if isinstance(value, (ScalarValue, ScalarExpr)):
        raise TypeError(
            "scalar subqueries are supported in filter/select/mutate "
            "contexts only (they lower to a broadcast cross join of the "
            "1-row aggregate); materialize the value first for other uses"
        )
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


import itertools as _itertools
import operator as _operator

_scalar_counter = _itertools.count()


class _ScalarOps:
    """Operator algebra shared by ScalarValue/ScalarExpr. Columns defer to
    us (their ops return NotImplemented for scalar-subquery operands), so
    Python's reflected dispatch lands here and the whole expression stays a
    lazy ScalarExpr until Table.filter/mutate lowers it."""

    def _binop(self, op, other, swapped=False):
        a, b = (other, self) if swapped else (self, other)
        return ScalarExpr.binop(op, a, b)

    def _unop(self, fn):
        """Post-compose a column transform onto this scalar expression."""
        return ScalarExpr(
            lambda: fn(ScalarExpr._to_col(self)), ScalarExpr._refs(self)
        )

    # common post-aggregation transforms (x / x.sum() then .round(...) is
    # the canonical shape); anything else: wrap in the projection and
    # transform the resulting column
    def round(self, digits: int = 0):
        return self._unop(lambda c: F.round(c, int(digits)))

    def abs(self):
        return self._unop(F.abs)

    def floor(self):
        return self._unop(lambda c: F.floor(c).cast("long"))

    def ceil(self):
        return self._unop(lambda c: F.ceil(c).cast("long"))

    def cast(self, dtype):
        from ibis_spark.functions.generic import _spark_type

        return self._unop(lambda c: c.cast(_spark_type(dtype)))

    def alias(self, name):
        return self._unop(lambda c: c.alias(name))

    name = alias

    def __lt__(self, other):
        return self._binop(_operator.lt, other)

    def __le__(self, other):
        return self._binop(_operator.le, other)

    def __gt__(self, other):
        return self._binop(_operator.gt, other)

    def __ge__(self, other):
        return self._binop(_operator.ge, other)

    def __eq__(self, other):  # type: ignore[override]
        return self._binop(_operator.eq, other)

    def __ne__(self, other):  # type: ignore[override]
        return self._binop(_operator.ne, other)

    __hash__ = object.__hash__

    def __add__(self, other):
        return self._binop(_operator.add, other)

    def __radd__(self, other):
        return self._binop(_operator.add, other, swapped=True)

    def __sub__(self, other):
        return self._binop(_operator.sub, other)

    def __rsub__(self, other):
        return self._binop(_operator.sub, other, swapped=True)

    def __mul__(self, other):
        return self._binop(_operator.mul, other)

    def __rmul__(self, other):
        return self._binop(_operator.mul, other, swapped=True)

    def __truediv__(self, other):
        return self._binop(_operator.truediv, other)

    def __rtruediv__(self, other):
        return self._binop(_operator.truediv, other, swapped=True)

    def __and__(self, other):
        return self._binop(_operator.and_, other)

    def __rand__(self, other):
        return self._binop(_operator.and_, other, swapped=True)

    def __or__(self, other):
        return self._binop(_operator.or_, other)

    def __ror__(self, other):
        return self._binop(_operator.or_, other, swapped=True)


class ScalarValue(_ScalarOps):
    """A 1-row scalar subquery (reference ScalarSubquery subqueries.py:36):
    an aggregate over a relation, usable inside expressions on another
    relation. Lowered as a broadcast cross join of the 1-row aggregated
    DataFrame — one tiny extra stage, no per-row recomputation, no
    single-partition funnel at any scale."""

    __slots__ = ("df", "sc", "ph")

    def __init__(self, df, sc):
        self.df = df
        self.sc = sc
        self.ph = f"__scalar_{next(_scalar_counter)}__"


class ScalarExpr(_ScalarOps):
    """A lazy expression tree containing ≥1 ScalarValue leaves."""

    __slots__ = ("_build", "_scalars")

    def __init__(self, build, scalars):
        self._build = build
        self._scalars = tuple(scalars)

    def scalars(self):
        return self._scalars

    def build(self) -> SparkColumn:
        return self._build()

    @staticmethod
    def _to_col(v):
        if isinstance(v, ScalarValue):
            return F.col(v.ph)
        if isinstance(v, ScalarExpr):
            return v.build()
        return unwrap(v)

    @staticmethod
    def _refs(v):
        if isinstance(v, ScalarValue):
            return (v,)
        if isinstance(v, ScalarExpr):
            return v._scalars
        return ()

    @classmethod
    def binop(cls, op, a, b):
        scalars = tuple(dict.fromkeys(cls._refs(a) + cls._refs(b)))
        return cls(lambda: op(cls._to_col(a), cls._to_col(b)), scalars)


def is_scalar_subquery(v) -> bool:
    return isinstance(v, (ScalarValue, ScalarExpr))


class AndPredicates(list):
    """AND-composition of ordinary predicates with subquery markers
    (``cond & t.x.isin(sub)``): Table.filter unpacks the parts and applies
    each with its own lowering. OR-composition with a subquery marker has
    no join-based lowering and raises."""

    def __and__(self, other):
        return AndPredicates([*self, other])

    __rand__ = __and__


class _PredicateMarkerOps:
    """Shared &-composition for InSubquery / ExistsSubquery markers."""

    def __and__(self, other):
        return AndPredicates([self, other])

    def __rand__(self, other):
        return AndPredicates([other, self])

    def __or__(self, other):
        raise TypeError(
            "subquery predicates cannot be OR-composed (no join lowering); "
            "restructure with union or a boolean column"
        )

    __ror__ = __or__


class ExistsSubquery(_PredicateMarkerOps):
    """Correlated EXISTS predicate (reference subqueries.py:28), lowered by
    Table.filter to a distributed left-semi (or left-anti when negated)
    join — never a per-row subquery."""

    __slots__ = ("table", "predicate", "negated")

    def __init__(self, table, predicate, negated=False):
        self.table = table
        self.predicate = predicate
        self.negated = negated

    def __invert__(self):
        return ExistsSubquery(self.table, self.predicate, not self.negated)


def exists(table, predicate) -> ExistsSubquery:
    """``t.filter(exists(other, lambda t, other: cond))`` — EXISTS sugar."""
    return ExistsSubquery(table, predicate)


class InSubquery(_PredicateMarkerOps):
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
