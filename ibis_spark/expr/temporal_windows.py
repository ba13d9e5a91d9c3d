"""Tumble / hop window aggregation (reference:
ibis/expr/types/temporal_windows.py:20-89 WindowedTable,
ibis/expr/operations/temporal_windows.py:18 WindowAggregate; PySpark
lowering recipe ibis/backends/sql/compilers/pyspark.py:589-649).

``Table.window_by(time_col)`` → :class:`WindowedTable` →
``.tumble(size)`` / ``.hop(size, slide)`` → ``.aggregate(...)``.

Lowered to ``groupBy(F.window(time_col, size, slide), *keys)`` — the one
construct that works identically for batch DataFrames and Structured
Streaming (with a watermark upstream, state is evicted automatically; no
custom stateful operator needed). Output carries ``window_start`` /
``window_end`` columns.
"""

from __future__ import annotations

import datetime
from typing import Optional

import pyspark.sql.functions as F


def _duration(value) -> str:
    """Coerce a size/slide spec to a Spark duration string."""
    if isinstance(value, str):
        return value
    if isinstance(value, datetime.timedelta):
        total = value.total_seconds()
        if total == int(total):
            return f"{int(total)} seconds"
        return f"{int(total * 1e6)} microseconds"
    raise TypeError(
        f"expected a duration string ('15 minutes') or timedelta, got {value!r}"
    )


class WindowedTable:
    """A table with a designated event-time column
    (temporal_windows.py:20)."""

    __slots__ = ("_table", "_time_col", "_size", "_slide", "_offset")

    def __init__(self, table, time_col, size=None, slide=None, offset=None):
        self._table = table
        self._time_col = time_col
        self._size = size
        self._slide = slide
        self._offset = offset

    def tumble(self, size) -> "WindowedTable":
        """Fixed, non-overlapping windows (temporal_windows.py:39)."""
        return WindowedTable(self._table, self._time_col, _duration(size))

    def hop(self, size, slide) -> "WindowedTable":
        """Sliding windows of `size` every `slide` (temporal_windows.py:62)."""
        return WindowedTable(
            self._table, self._time_col, _duration(size), _duration(slide)
        )

    def session(self, gap) -> "WindowedTable":
        """Session windows closed after ``gap`` of inactivity — absent
        from the reference (its Flink backend stops at tumble/hop);
        Spark-native via ``F.session_window``."""
        w = WindowedTable(self._table, self._time_col, _duration(gap))
        w._slide = "__session__"
        return w

    def aggregate(self, *metrics, by=(), **named):
        """WindowAggregate (operations/temporal_windows.py:18):
        groupBy(window(time, size, slide), *by) → agg; window bounds are
        exposed as window_start / window_end."""
        from ibis_spark.expr.table import Table, _tuplize

        if self._size is None:
            raise ValueError("call .tumble(size), .hop(size, slide) or .session(gap) first")
        t = self._table
        time_sc, _ = t._resolve(self._time_col)
        if self._slide == "__session__":
            win = F.session_window(time_sc, self._size)
        elif self._slide:
            win = F.window(time_sc, self._size, self._slide)
        else:
            win = F.window(time_sc, self._size)

        keys = []
        for k in _tuplize(by):
            sc, kname = t._resolve(k)
            keys.append(sc.alias(kname))

        mets = []
        for i, m in enumerate(metrics):
            sc, mname = t._resolve(m)
            mets.append(sc.alias(mname or f"metric_{i}"))
        for n, m in named.items():
            sc, _n = t._resolve(m, name=n)
            mets.append(sc.alias(n))

        gdf = t._df.groupBy(win.alias("__window__"), *keys)
        out = gdf.agg(*mets)
        key_names = [k for k in out.columns if k not in ("__window__",)]
        return Table(
            out.select(
                F.col("__window__.start").alias("window_start"),
                F.col("__window__.end").alias("window_end"),
                *[F.col(c) for c in key_names],
            )
        )

    agg = aggregate
