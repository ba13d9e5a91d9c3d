"""The Column expression type.

Reference: ibis/expr/types/generic.py (Value/Column user API) +
ibis/expr/operations/core.py:43 (Value[dtype, shape]). Ours wraps a lazy
:class:`pyspark.sql.Column` — Spark's expression tree IS the IR, Catalyst
does all optimization (SURVEY.md §4). Operator families are mixins from
``ibis_spark.functions.*``; everything lowers to JVM-side
``pyspark.sql.functions`` expressions (whole-stage-codegen friendly — no
Python row UDFs anywhere on this path).
"""

from __future__ import annotations

from typing import Any, Optional

import pyspark.sql.functions as F
from pyspark.sql import Column as SparkColumn

from ibis_spark.expr.core import Expr, unwrap
from ibis_spark.functions.analytic import AnalyticOps
from ibis_spark.functions.collections import ArrayOps, JsonOps, MapOps, StructOps
from ibis_spark.functions.generic import GenericOps
from ibis_spark.functions.numeric import NumericOps
from ibis_spark.functions.reductions import ReductionOps
from ibis_spark.functions.strings import StringOps
from ibis_spark.functions.temporal import TemporalOps


class Column(
    GenericOps,
    NumericOps,
    StringOps,
    TemporalOps,
    ReductionOps,
    AnalyticOps,
    ArrayOps,
    MapOps,
    StructOps,
    JsonOps,
    Expr,
):
    """A typed, named, lazy column expression."""

    __slots__ = (
        "_sc",
        "_name",
        "_post",
        "_lit",
        "_needs_window",
        "_order_hint",
        "_cumulative",
        "_source_df",
        "_is_reduction",
    )

    def __init__(
        self,
        sc: SparkColumn,
        post=None,
        name: Optional[str] = None,
        lit: Any = None,
        needs_window: bool = False,
        order_hint=None,
        cumulative: bool = False,
        source_df=None,
        is_reduction: bool = False,
    ):
        object.__setattr__(self, "_sc", sc)
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_post", post)
        object.__setattr__(self, "_lit", lit)
        object.__setattr__(self, "_needs_window", needs_window)
        object.__setattr__(self, "_order_hint", order_hint)
        object.__setattr__(self, "_cumulative", cumulative)
        object.__setattr__(self, "_source_df", source_df)
        object.__setattr__(self, "_is_reduction", is_reduction)

    # -- plumbing ------------------------------------------------------------
    def spark(self) -> SparkColumn:
        if self._post is not None:
            # a window function used without .over(): let the post hook
            # apply directly (Spark will raise a clear analysis error if a
            # window spec was genuinely required)
            return self._post(self._sc)
        return self._sc

    def op(self):
        """Expr.op (reference core.py): the underlying node. Our IR is
        Spark's expression tree, so this is the pyspark Column."""
        return self._sc

    def get_name(self) -> Optional[str]:
        if self._name:
            return self._name
        # best effort: pull the name Spark would assign
        try:
            jc = self._sc._jc  # noqa: SLF001 — py4j name probe only
            name = jc.toString()
            if name.isidentifier():
                return name
        except Exception:
            pass
        return None

    def alias(self, name: str) -> "Column":
        return Column(
            self.spark().alias(name),
            name=name,
            lit=self._lit,
            needs_window=self._needs_window,
            order_hint=self._order_hint,
            cumulative=self._cumulative,
            is_reduction=self._is_reduction,
        )

    name = alias

    def __repr__(self):
        static = f"Column<{self._sc}>"
        from ibis_spark.config import options

        if not options.interactive or self._source_df is None:
            return static
        try:
            n = options.repr.interactive.max_rows
            return repr(self.preview(n))
        except Exception:
            return static

    # -- comparisons (logical.py:76-106); must live here to override object --
    __hash__ = object.__hash__

    def _as_auto_scalar(self, other):
        """ibis auto-rewrites bare reductions compared against columns into
        scalar subqueries (expr/rewrites.py:289-304). When `other` is a
        table-bound reduction (t.x.mean()), lift it to a ScalarValue so the
        comparison lowers as a broadcast 1-row cross join in filter()."""
        from ibis_spark.expr.core import ScalarValue

        if (
            isinstance(other, Column)
            and other._is_reduction
            and other._source_df is not None
            and not self._is_reduction
        ):
            return ScalarValue(other._source_df, other._sc)
        return None

    def __eq__(self, other):  # type: ignore[override]
        from ibis_spark.expr.core import is_scalar_subquery, wrap
        
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return self == sv

        return wrap(self.spark() == unwrap(other))

    def __ne__(self, other):  # type: ignore[override]
        from ibis_spark.expr.core import is_scalar_subquery, wrap
        
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return self != sv

        return wrap(self.spark() != unwrap(other))

    def __lt__(self, other):
        from ibis_spark.expr.core import is_scalar_subquery, wrap
        
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return self < sv

        return wrap(self.spark() < unwrap(other))

    def __le__(self, other):
        from ibis_spark.expr.core import is_scalar_subquery, wrap
        
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return self <= sv

        return wrap(self.spark() <= unwrap(other))

    def __gt__(self, other):
        from ibis_spark.expr.core import is_scalar_subquery, wrap
        
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return self > sv

        return wrap(self.spark() > unwrap(other))

    def __ge__(self, other):
        from ibis_spark.expr.core import is_scalar_subquery, wrap
        
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return self >= sv

        return wrap(self.spark() >= unwrap(other))

    # -- boolean algebra (logical.py:26-45) -----------------------------------
    def __and__(self, other):
        from ibis_spark.expr.core import (
            AndPredicates,
            ExistsSubquery,
            InSubquery,
            wrap,
        )

        if isinstance(other, (InSubquery, ExistsSubquery, AndPredicates)):
            return NotImplemented
        return wrap(self.spark() & unwrap(other))

    def __rand__(self, other):
        from ibis_spark.expr.core import wrap

        return wrap(unwrap(other) & self.spark())

    def __or__(self, other):
        from ibis_spark.expr.core import (
            AndPredicates,
            ExistsSubquery,
            InSubquery,
            wrap,
        )

        if isinstance(other, (InSubquery, ExistsSubquery, AndPredicates)):
            return NotImplemented  # marker's __ror__ raises with guidance
        return wrap(self.spark() | unwrap(other))

    def __ror__(self, other):
        from ibis_spark.expr.core import wrap

        return wrap(unwrap(other) | self.spark())

    def __xor__(self, other):
        from ibis_spark.expr.core import wrap

        o = unwrap(other)
        return wrap((self.spark() | o) & ~(self.spark() & o))

    def __invert__(self):
        from ibis_spark.expr.core import wrap

        return wrap(~self.spark())

    def __bool__(self):
        raise TypeError(
            "Column expressions are lazy and cannot be coerced to bool; "
            "use & | ~ for boolean algebra"
        )

    # -- item access: struct field / map key / array index --------------------
    def __getitem__(self, key):
        from ibis_spark.expr.core import wrap

        if isinstance(key, slice):
            return self.array_slice(
                key.start if key.start is not None else 0, key.stop
            )
        if isinstance(key, str):
            return wrap(self.spark().getItem(key), name=key)
        if isinstance(key, int) or hasattr(key, "spark"):
            # 0-based array index with NULL OOB (ArrayIndex arrays.py:55) —
            # also covers map key lookup for non-int keys via getItem
            return self.array_index(key)
        return wrap(self.spark().getItem(unwrap(key)))

    # -- sort keys (sortkeys.py:16) -------------------------------------------
    def asc(self, nulls_first: bool = False):
        from ibis_spark.expr.core import SortKey

        c = self.spark()
        return SortKey(
            c.asc_nulls_first() if nulls_first else c.asc_nulls_last(),
            child=c,
            ascending=True,
        )

    def desc(self, nulls_first: bool = False):
        from ibis_spark.expr.core import SortKey

        c = self.spark()
        return SortKey(
            c.desc_nulls_first() if nulls_first else c.desc_nulls_last(),
            child=c,
            ascending=False,
        )

    # -- windowing (window.py:67) ----------------------------------------------
    def over(self, win) -> "Column":
        """Bind a window spec (WindowFunction window.py:67)."""
        from ibis_spark.expr.core import wrap
        from ibis_spark.expr.window import Window

        if not isinstance(win, Window):
            raise TypeError(f"expected a Window, got {type(win).__name__}")
        if self._cumulative and win.start is None and win.end is None and win.how == "rows":
            win = win.rows(None, 0)
        if self._needs_window and not win.order_by and self._order_hint is not None:
            win = win._replace(order_by=(self._order_hint,))
        spec = win.to_spark()
        out = self._sc.over(spec)
        if self._post is not None:
            out = self._post(out)
        return wrap(out)

    # -- scalar formatting sugar ------------------------------------------------
    def format(self, fmt: str) -> "Column":
        from ibis_spark.expr.core import wrap

        return wrap(F.format_string(fmt, self.spark()))

    # -- expression conveniences (reference expr/types/core.py, generic.py) ------
    def pipe(self, f, *args, **kwargs):
        """Expr.pipe (core.py:232): apply ``f(self, *args)``; a ``(f,
        "kwarg")`` tuple passes self by keyword."""
        if isinstance(f, tuple):
            fn, kw = f
            if kw in kwargs:
                raise ValueError(f"{kw} is both the pipe target and a keyword")
            kwargs[kw] = self
            return fn(*args, **kwargs)
        return f(self, *args, **kwargs)

    def equals(self, other) -> bool:
        """Expr.equals (core.py:109): structural equality of the two
        expression trees INCLUDING their source relation (not an
        element-wise comparison — that is ==)."""
        if not isinstance(other, Column):
            return False
        if str(self._sc) != str(other._sc):
            return False
        a, b = self._source_df, other._source_df
        if a is None and b is None:
            return True
        if a is None or b is None:
            return False
        if a is b:
            return True
        try:
            return a.sameSemantics(b)
        except Exception:
            return False

    def as_scalar(self):
        """Column.as_scalar (generic.py): treat this expression as a scalar
        subquery. A reduction becomes its 1-row aggregate; a plain column
        asserts single-row-ness at execution (raise_error otherwise), both
        lowered as a broadcast cross join — no per-row re-execution."""
        from ibis_spark.expr.core import ScalarValue

        df = self._source_df
        if df is None:
            raise TypeError(
                "as_scalar() requires a table-bound expression (t.col...)"
            )
        if self._is_reduction:
            return ScalarValue(df, self._sc)
        agg = F.when(F.count(F.lit(1)) <= 1, F.first(self._sc)).otherwise(
            F.raise_error(F.lit("as_scalar: relation has more than one row"))
        )
        return ScalarValue(df, agg)

    def type(self):
        """The dtype of this expression (reference Value.type()), derived
        statically from the plan schema — no execution."""
        from ibis_spark.datatypes import from_spark

        return from_spark(self._plan_dtype())

    def to_list(self, limit: Optional[int] = None) -> list:
        """Column.to_list (generic.py:2964): execute → python list. A
        ``limit`` is pushed into the plan (bounded fetch), never applied
        driver-side after a full collect."""
        if (
            limit is not None
            and self._source_df is not None
            and not self._is_reduction
        ):
            return self.preview(limit).tolist()
        out = self.execute()
        if hasattr(out, "tolist"):
            out = out.tolist()
        if limit is not None and isinstance(out, list):
            out = out[:limit]
        return out

    def preview(self, max_rows: int = 10):
        """Column.preview: the first ``max_rows`` values as a pandas
        Series (the reference renders a rich grid; the data contract —
        a bounded fetch, never a full collect — is the same)."""
        df = self._source_df
        if df is None:
            raise TypeError("preview() requires a table-bound expression")
        name = self.get_name() or "value"
        return df.select(self.spark().alias(name)).limit(max_rows).toPandas()[name]

    # -- execution sugar (reference Column.execute → pandas Series) --------------
    def execute(self):
        """Execute against the defining table: a reduction yields the
        scalar value, a plain column a pandas Series (reference
        Expr.execute, expr/types/core.py:369)."""
        df = self._source_df
        if df is None:
            raise TypeError(
                "execute() requires a table-bound expression (t.col...); "
                "free expressions have no relation to run against"
            )
        name = self.get_name() or "value"
        if self._is_reduction:
            return df.agg(self.spark().alias(name)).collect()[0][0]
        return df.select(self.spark().alias(name)).toPandas()[name]

    to_pandas = execute

    # -- DummyTable: literal-only relation (relations.py:459) --------------------
    def as_table(self):
        """SELECT-without-FROM: lift a scalar expression into a 1-row
        table (DummyTable relations.py:459) via ``spark.range(1)``."""
        from pyspark.sql import SparkSession

        from ibis_spark.expr.table import Table

        session = SparkSession.getActiveSession()
        if session is None:
            raise RuntimeError("as_table() requires an active SparkSession")
        return Table(
            session.range(1).select(self.spark().alias(self.get_name() or "value"))
        )

    # -- topk (reference Table.topk relations.py:5320 / Column.topk) -------------
    def topk(self, k: int, by=None, name: Optional[str] = None):
        """Top-k most frequent values of this column (or top-k by the
        ``by`` metric): groupBy → agg → orderBy desc → limit, which
        Catalyst executes as partial-agg + TakeOrderedAndProject."""
        from ibis_spark.expr.deferred import Deferred
        from ibis_spark.expr.table import Table

        df = self._source_df
        if df is None:
            raise TypeError("topk requires a table-bound column (use t.col.topk(k))")
        keyname = self.get_name() or "key"
        out_name = name or f"{keyname}_count"
        if by is None:
            metric = F.count(F.lit(1))
        else:
            if isinstance(by, Deferred):
                by = by.resolve(Table(df))
            metric = unwrap(by)
        agg = df.groupBy(self._sc.alias(keyname)).agg(metric.alias(out_name))
        return Table(agg.orderBy(F.col(out_name).desc()).limit(int(k)))


def _propagate_source():
    """Re-bind every operator method/property on Column so results keep the
    defining column's ``_source_df``. This is what makes a derived
    expression still table-bound: ``(t.x > 4).notany().execute()`` needs
    the relation, and a bare reduction compared against a column
    auto-lifts to a scalar subquery only when its source is known
    (reference auto-rewrite, expr/rewrites.py:289-304). Binary ops check
    the other operand as a fallback (``lit(5) + t.x``)."""
    import functools

    exempt = {
        "__init__",
        "__new__",
        "__bool__",
        "__hash__",
        "__repr__",
        "spark",
        "get_name",
        "execute",
        "to_pandas",
        "to_list",
        "preview",
        "equals",
        "pipe",
        "as_scalar",
        "type",
    }

    def bless(out, self, args, dunder=False):
        if not isinstance(out, Column):
            return out
        if out._source_df is None:
            src = getattr(self, "_source_df", None)
            if src is None:
                for a in args:
                    src = getattr(a, "_source_df", None)
                    if src is not None:
                        break
            if src is not None:
                object.__setattr__(out, "_source_df", src)
        # shape algebra (reference Value shape, operations/core.py): a
        # dunder combination of ONLY scalar-shaped reductions stays
        # scalar-shaped (100 * t.x.sum() / t.y.sum() must not auto-lift to
        # a scalar subquery mid-aggregate). Windowed results are columnar.
        if dunder and not out._is_reduction and not out._needs_window:
            cols = [c for c in (self, *args) if isinstance(c, Column)]
            if cols and all(c._is_reduction for c in cols):
                object.__setattr__(out, "_is_reduction", True)
        return out

    def make(fn, dunder=False):
        @functools.wraps(fn)
        def inner(self, *a, **k):
            return bless(fn(self, *a, **k), self, a, dunder)

        return inner

    mixins = (
        GenericOps,
        NumericOps,
        StringOps,
        TemporalOps,
        ReductionOps,
        AnalyticOps,
        ArrayOps,
        MapOps,
        StructOps,
        JsonOps,
        Column,
    )
    done = set()
    for cls in mixins:
        for nm, fn in list(vars(cls).items()):
            if nm in exempt or nm in done:
                continue
            if isinstance(fn, property):
                if fn.fget is None:
                    continue
                if getattr(Column, nm, None) is not fn:
                    # MRO resolves this name elsewhere — don't steal it
                    continue
                orig = fn.fget

                def pget(self, _orig=orig):
                    return bless(_orig(self), self, ())

                setattr(Column, nm, property(functools.wraps(orig)(pget)))
                done.add(nm)
                continue
            if not callable(fn) or isinstance(fn, (staticmethod, classmethod)):
                continue
            if nm.startswith("_") and not nm.startswith("__"):
                continue
            resolved = getattr(Column, nm, None)
            if resolved is not fn:
                # the MRO resolves this name to another mixin's method
                # (e.g. TemporalOps.bucket shadows ReductionOps.bucket) —
                # setting it on Column would steal the resolution
                continue
            setattr(Column, nm, make(fn, dunder=nm.startswith("__")))
            done.add(nm)


class _MapAccessor(Column):
    """Returned by ``Column.map``: behaves as the JSON ``.map`` unwrap
    (a map<string,string> Column) when used as a value, and as
    ``ArrayValue.map(fn)`` when called — ibis dispatches those two by
    dtype; our untyped Column dispatches by usage."""

    __slots__ = ("_map_parent",)

    def __call__(self, fn):
        return self._map_parent.array_map(fn)


_propagate_source()


def literal(value, type=None) -> Column:
    """ibis.literal (generic.py:137 Literal)."""
    c = F.lit(value)
    if type is not None:
        from ibis_spark.functions.generic import _spark_type

        c = c.cast(_spark_type(type))
    return Column(c, lit=value)


def null(type=None) -> Column:
    c = F.lit(None)
    if type is not None:
        from ibis_spark.functions.generic import _spark_type

        c = c.cast(_spark_type(type))
    return Column(c, lit=None)


import contextvars as _contextvars

#: execution-time Param → value bindings (set by ParamTable.bind_params)
_PARAM_BINDINGS: _contextvars.ContextVar = _contextvars.ContextVar(
    "ibis_spark_param_bindings", default=None
)


class UnboundParamError(TypeError):
    """An expression referenced a Param with no value bound."""


class Param:
    """ScalarParameter (reference generic.py:161): a typed placeholder.

    Two binding styles, mirroring the reference's compile-time
    substitution (BC:624-626) within an eager-plan engine:

    - eager: ``p = param("int64"); t.filter(t.x > p(5))`` — calling the
      Param yields a typed literal at build time (zero overhead, the
      plan embeds a constant Catalyst folds/pushes down);
    - deferred: use the Param *unbound* inside a deferred expression —
      ``expr = t.filter(_.x > p)`` — which returns a pending
      ``ParamTable``; ``expr.execute(params={p: 5})`` then substitutes
      and runs, and the SAME expression re-executes with new values
      (``expr.execute(params={p: 9})``) without a rebuild. Each
      execution plants a plain literal, so pushdown/folding still apply.
    """

    __slots__ = ("type",)

    def __init__(self, type=None):
        self.type = type

    def __call__(self, value) -> Column:
        return literal(value, self.type)

    def _bound(self) -> Column:
        bindings = _PARAM_BINDINGS.get()
        if bindings is not None and self in bindings:
            return literal(bindings[self], self.type)
        raise UnboundParamError(
            "unbound parameter: bind eagerly (t.filter(t.x > p(5))) or "
            "execute the pending expression with params={p: value}"
        )

    def spark(self):
        return self._bound().spark()


def param(type=None) -> Param:
    return Param(type)
