"""Window specifications (reference: ibis/expr/operations/window.py:29-106,
ibis/expr/builders.py:127-230, ibis/expr/api.py window/trailing_window/
cumulative_window).

A :class:`Window` is an immutable spec of partition keys, order keys and a
rows/range frame. ``Column.over(window)`` lowers it to a
:class:`pyspark.sql.Window` spec — Catalyst handles the physical exchange,
so a window over ``group_by`` keys shares the shuffle with any other
operator partitioned the same way.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from pyspark.sql import Window as SparkWindow
from pyspark.sql.window import WindowSpec


def _bound_to_spark(value, *, default):
    """Map an ibis boundary (None=unbounded, int offset, timedelta) to
    Spark's. Interval boundaries (window.py:80-106 validates these for
    range frames) become exact epoch MICROSECONDS — the order key is
    converted with unix_micros to match, so sub-second bounds (e.g.
    timedelta(milliseconds=500)) are preserved instead of truncating to
    whole seconds."""
    if value is None:
        return default
    if isinstance(value, datetime.timedelta):
        # integer arithmetic: exact for any timedelta, incl. negatives
        return (value.days * 86400 + value.seconds) * 1_000_000 + value.microseconds
    return int(value)


def _is_interval(value) -> bool:
    return isinstance(value, datetime.timedelta)


class Window:
    """Immutable window spec; ``how`` is 'rows' or 'range'
    (window.py:67 WindowFunction.how)."""

    __slots__ = ("group_by", "order_by", "how", "start", "end", "framed")

    def __init__(self, group_by=(), order_by=(), how="rows", start=None, end=None, framed=False):
        # _tuplize, not tuple(): a bare Column must become a 1-tuple —
        # tuple(column) would loop forever via Column.__getitem__'s
        # sequence protocol (array indexing never raises IndexError)
        self.group_by = _tuplize(group_by)
        self.order_by = _tuplize(order_by)
        self.how = how
        self.start = start
        self.end = end
        self.framed = framed

    def _replace(self, **kwargs):
        cur = {
            "group_by": self.group_by,
            "order_by": self.order_by,
            "how": self.how,
            "start": self.start,
            "end": self.end,
            "framed": self.framed,
        }
        cur.update(kwargs)
        return Window(**cur)

    def rows(self, start=None, end=None):
        return self._replace(how="rows", start=start, end=end, framed=True)

    def range(self, start=None, end=None):
        return self._replace(how="range", start=start, end=end, framed=True)

    between = rows

    def to_spark(self, resolve=None) -> WindowSpec:
        """Build the pyspark WindowSpec.

        ``resolve`` maps our sort-key / column objects to pyspark Columns
        (supplied by Table when lowering inside a mutate).
        """
        from ibis_spark.expr.core import SortKey, unwrap

        interval_frame = self.how == "range" and (
            _is_interval(self.start) or _is_interval(self.end)
        )

        def conv(x, *, order=False):
            if resolve is not None:
                x = resolve(x)
            if order and interval_frame:
                # interval range frame: order key → epoch microseconds so
                # the numeric rangeBetween bounds mean microseconds
                # NTZ/date order keys need an intermediate timestamp cast
                # (TIMESTAMP_NTZ -> BIGINT is not a valid direct cast)
                if isinstance(x, SortKey):
                    child = F.unix_micros(x.child.cast("timestamp"))
                    return child if x.ascending else child.desc()
                c = F.col(x) if isinstance(x, str) else unwrap(x)
                return F.unix_micros(c.cast("timestamp"))
            if isinstance(x, str):
                return F.col(x)
            return unwrap(x)

        spec = SparkWindow.partitionBy(*[conv(g) for g in self.group_by])
        if self.order_by:
            spec = spec.orderBy(*[conv(o, order=True) for o in self.order_by])
        has_frame = self.framed or self.start is not None or self.end is not None
        if self.how == "range":
            if has_frame:
                spec = spec.rangeBetween(
                    _bound_to_spark(self.start, default=SparkWindow.unboundedPreceding),
                    _bound_to_spark(self.end, default=SparkWindow.unboundedFollowing),
                )
        else:
            if has_frame:
                spec = spec.rowsBetween(
                    _bound_to_spark(self.start, default=SparkWindow.unboundedPreceding),
                    _bound_to_spark(self.end, default=SparkWindow.unboundedFollowing),
                )
        return spec


def window(group_by=(), order_by=(), *, rows=None, range=None, preceding=None, following=None):
    """ibis.window equivalent (expr/api.py)."""
    w = Window(group_by=_tuplize(group_by), order_by=_tuplize(order_by))
    if rows is not None:
        w = w.rows(*rows)
    elif range is not None:
        w = w.range(*range)
    elif preceding is not None or following is not None:
        start = -preceding if preceding is not None else None
        end = following if following is not None else 0
        w = w.rows(start, end)
    return w


def trailing_window(preceding, group_by=(), order_by=()):
    """Trailing row frame [-preceding, 0] (expr/api.py trailing_window)."""
    return Window(_tuplize(group_by), _tuplize(order_by), "rows", -int(preceding), 0)


def preceding(value):
    """ibis.preceding (expr/api.py:721): a frame boundary `value` rows (or
    a timedelta, for range frames) BEFORE the current row. Our boundary
    convention is signed offsets, so this is negation."""
    return None if value is None else -value


def following(value):
    """ibis.following (expr/api.py:725)."""
    return value


def _legacy_frame(w, preceding_v, following_v, how):
    """Reference LegacyWindowBuilder.preceding_following (builders.py:243):
    a one-sided spec leaves the OTHER side unbounded; a tuple on one side
    gives an off-center frame entirely on that side."""
    if isinstance(preceding_v, tuple):
        if following_v is not None:
            raise ValueError(
                "Can only specify one window side when you want an "
                "off-center window"
            )
        s, e = preceding_v
        if e is None:
            raise ValueError("preceding end point cannot be None")
        start = None if s is None else -_abs_bound(s)
        end = -_abs_bound(e)
    elif isinstance(following_v, tuple):
        if preceding_v is not None:
            raise ValueError(
                "Can only specify one window side when you want an "
                "off-center window"
            )
        s, e = following_v
        if s is None:
            raise ValueError("following start point cannot be None")
        start = _abs_bound(s)
        end = None if e is None else _abs_bound(e)
    else:
        start = None if preceding_v is None else -_abs_bound(preceding_v)
        end = None if following_v is None else _abs_bound(following_v)
    return (w.rows if how == "rows" else w.range)(start, end)


def _abs_bound(v):
    # accept plain magnitudes AND already-signed ibis.preceding() values
    if isinstance(v, datetime.timedelta):
        return abs(v)
    return abs(int(v)) if not isinstance(v, float) else abs(v)


def rows_window(preceding=None, following=None, group_by=(), order_by=()):
    """ibis.rows_window (expr/api.py:1902): ROWS frame from magnitudes."""
    return _legacy_frame(
        Window(_tuplize(group_by), _tuplize(order_by)), preceding, following, "rows"
    )


def range_window(preceding=None, following=None, group_by=(), order_by=()):
    """ibis.range_window (expr/api.py:1935): RANGE frame over the order
    key's values (int or timedelta magnitudes)."""
    return _legacy_frame(
        Window(_tuplize(group_by), _tuplize(order_by)), preceding, following, "range"
    )


def trailing_range_window(preceding, group_by=(), order_by=()):
    """ibis.trailing_range_window (expr/api.py): RANGE [-preceding, 0]."""
    return range_window(preceding, 0, group_by, order_by)


def cumulative_window(group_by=(), order_by=()):
    """Unbounded-preceding → current row (expr/api.py cumulative_window)."""
    return Window(_tuplize(group_by), _tuplize(order_by), "rows", None, 0)


def _tuplize(x):
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)
