"""Window / analytic functions
(reference: ibis/expr/operations/analytic.py:33-88).

ibis ranking functions are 0-indexed — the reference compiler subtracts 1
(backends/sql/rewrites.py:490-498). Spark requires ``.over(spec)`` to be
applied to the raw window function before any arithmetic, so the -1 is
carried as a ``post`` hook on the Column and applied by
:meth:`Column.over` after the spec binds (see expr/core.py wrap()).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import wrap


def _sub1(c):
    return c - 1


class AnalyticOps:
    __slots__ = ()

    def lag(self, offset=1, default=None):
        """Lag (analytic.py:33)."""
        return wrap(F.lag(self.spark(), int(offset), default), needs_window=True)

    def lead(self, offset=1, default=None):
        """Lead (analytic.py:38)."""
        return wrap(F.lead(self.spark(), int(offset), default), needs_window=True)

    def rank(self):
        """MinRank, 0-indexed (analytic.py:50; rewrites.py:490-498).

        ibis ``col.rank()`` implies ordering by the column itself when the
        window spec carries no order_by (Table.mutate injects it).
        """
        return wrap(F.rank(), post=_sub1, needs_window=True, order_hint=self)

    def dense_rank(self):
        return wrap(F.dense_rank(), post=_sub1, needs_window=True, order_hint=self)

    def percent_rank(self):
        return wrap(F.percent_rank(), needs_window=True, order_hint=self)

    def cume_dist(self):
        return wrap(F.cume_dist(), needs_window=True, order_hint=self)

    def ntile(self, buckets):
        """NTile, 0-indexed (analytic.py:79; rewrites.py:480-483)."""
        return wrap(F.ntile(int(buckets)), post=_sub1, needs_window=True, order_hint=self)

    def nth_value(self, n):
        """NthValue — ibis n is 0-indexed (rewrites.py:501-507)."""
        return wrap(F.nth_value(self.spark(), int(n) + 1), needs_window=True)

    nth = nth_value

    # boolean cumulative sugar (expr/types/logical.py:460,:506): running
    # OR / AND — max/min over the unbounded-preceding frame, no extra state
    def cumany(self):
        return wrap(F.max(self.spark()), needs_window=True, cumulative=True)

    def cumall(self):
        return wrap(F.min(self.spark()), needs_window=True, cumulative=True)

    def first_value(self):
        """FirstValue (sql/rewrites.py:72)."""
        return wrap(F.first(self.spark(), ignorenulls=False), needs_window=True)

    def last_value(self):
        """LastValue (sql/rewrites.py:83)."""
        return wrap(F.last(self.spark(), ignorenulls=False), needs_window=True)

    # cumulative sugar: reduction over an unbounded-preceding→current frame
    def cumsum(self):
        return wrap(F.sum(self.spark()), needs_window=True, cumulative=True)

    def cummean(self):
        return wrap(F.avg(self.spark()), needs_window=True, cumulative=True)

    def cummin(self):
        return wrap(F.min(self.spark()), needs_window=True, cumulative=True)

    def cummax(self):
        return wrap(F.max(self.spark()), needs_window=True, cumulative=True)


# -- free functions (ibis.row_number() etc., re-exported) --------------------

def row_number():
    """RowNumber, 0-indexed (analytic.py:60)."""
    return wrap(F.row_number(), post=_sub1, needs_window=True)


def rank():
    return wrap(F.rank(), post=_sub1, needs_window=True)


def dense_rank():
    return wrap(F.dense_rank(), post=_sub1, needs_window=True)


def percent_rank():
    return wrap(F.percent_rank(), needs_window=True)


def cume_dist():
    return wrap(F.cume_dist(), needs_window=True)


def ntile(buckets):
    return wrap(F.ntile(int(buckets)), post=_sub1, needs_window=True)
