"""Numeric / math operations (reference: ibis/expr/operations/numeric.py).

Reference semantics preserved (ibis/expr/operations/numeric.py:62-72):
``/`` always yields float64 and ``//`` yields int64, unlike Spark's
type-preserving division.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import is_scalar_subquery, unwrap, wrap


class NumericOps:
    __slots__ = ()

    # -- arithmetic (numeric.py:28-82) --------------------------------------
    def _plus_is_concat(self, other) -> bool:
        """ibis defines ``+`` on strings as concatenation
        (StringValue.__add__ → StringConcat). Dispatch from a str literal
        operand or a plain string FIELD reference (schema lookup on the
        source DataFrame — no plan analysis); derived string expressions
        should use .concat()."""
        if isinstance(other, str):
            return True
        from pyspark.sql.types import StringType

        for side in (self, other):
            df = getattr(side, "_source_df", None)
            nm = getattr(side, "_name", None)
            if (
                df is not None
                and nm
                and nm in getattr(df, "columns", ())
                and isinstance(df.schema[nm].dataType, StringType)
            ):
                return True
        return False

    def __add__(self, other):
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return sv.__radd__(self)
        if self._plus_is_concat(other):
            return wrap(F.concat(self.spark(), unwrap(other)))
        return wrap(self.spark() + unwrap(other))

    def __radd__(self, other):
        if self._plus_is_concat(other):
            return wrap(F.concat(unwrap(other), self.spark()))
        return wrap(unwrap(other) + self.spark())

    def __sub__(self, other):
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return sv.__rsub__(self)
        return wrap(self.spark() - unwrap(other))

    def __rsub__(self, other):
        return wrap(unwrap(other) - self.spark())

    def _is_string_field(self) -> bool:
        """Plain string FIELD reference check (schema lookup, no plan
        analysis) — shared by the + concat and * repeat dispatches."""
        from pyspark.sql.types import StringType

        df = getattr(self, "_source_df", None)
        nm = getattr(self, "_name", None)
        return (
            df is not None
            and bool(nm)
            and nm in getattr(df, "columns", ())
            and isinstance(df.schema[nm].dataType, StringType)
        )

    def __mul__(self, other):
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return sv.__rmul__(self)
        if self._is_string_field():
            # ibis StringValue.__mul__ (strings.py:1719) is repetition
            return self.repeat(other)
        return wrap(self.spark() * unwrap(other))

    def __rmul__(self, other):
        if self._is_string_field():
            return self.repeat(other)
        return wrap(unwrap(other) * self.spark())

    def __truediv__(self, other):
        # Divide always yields float64 (numeric.py:62-72)
        if is_scalar_subquery(other):
            return NotImplemented
        sv = self._as_auto_scalar(other)
        if sv is not None:
            return sv.__rtruediv__(self)
        return wrap(self.spark().cast("double") / unwrap(other).cast("double"))

    def __rtruediv__(self, other):
        return wrap(unwrap(other).cast("double") / self.spark().cast("double"))

    def __floordiv__(self, other):
        # FloorDivide yields int64 (numeric.py:73-77)
        return wrap(
            F.floor(self.spark().cast("double") / unwrap(other).cast("double")).cast(
                "long"
            )
        )

    def __rfloordiv__(self, other):
        return wrap(
            F.floor(unwrap(other).cast("double") / self.spark().cast("double")).cast(
                "long"
            )
        )

    def __mod__(self, other):
        return wrap(self.spark() % unwrap(other))

    def __rmod__(self, other):
        return wrap(unwrap(other) % self.spark())

    def __pow__(self, other):
        return wrap(F.pow(self.spark(), unwrap(other)))

    def __rpow__(self, other):
        return wrap(F.pow(unwrap(other), self.spark()))

    def __neg__(self):
        return wrap(-self.spark())

    def negate(self):
        return -self

    # -- unary math (numeric.py:83-341) --------------------------------------
    def abs(self):
        return wrap(F.abs(self.spark()))

    def ceil(self):
        return wrap(F.ceil(self.spark()))

    def floor(self):
        return wrap(F.floor(self.spark()))

    def round(self, digits: int = 0):
        return wrap(F.round(self.spark(), digits))

    def clip(self, lower=None, upper=None):
        # nested bounds preserving nulls (base compiler BC:873-881)
        c = self.spark()
        out = c
        if lower is not None:
            out = F.greatest(out, unwrap(lower))
        if upper is not None:
            out = F.least(out, unwrap(upper))
        return wrap(F.when(c.isNotNull(), out))

    def sign(self):
        return wrap(F.signum(self.spark()))

    def histogram(self, *, nbins=None, binwidth=None, base=None, eps=1e-13):
        """NumericColumn.histogram (expr/types/numeric.py): fixed-width bin
        index ``floor((x - base)/binwidth)`` clipped to [-1, nbins-1].

        The data-derived ``base``/``binwidth`` need the column's global
        min/max: computed as ONE 1-row aggregate (a single struct of both
        bounds) broadcast-cross-joined by the projection lowering — one
        extra tiny stage, no single-partition window, scan count unchanged
        at any scale."""
        from ibis_spark.expr.core import ScalarExpr, ScalarValue

        if nbins is not None and binwidth is not None:
            raise ValueError(
                f"Cannot pass both `nbins` (got {nbins}) and `binwidth` (got {binwidth})"
            )
        if binwidth is None and nbins is None:
            raise ValueError("`nbins` is required if `binwidth` is not provided")
        df = getattr(self, "_source_df", None)
        if df is None:
            raise TypeError("histogram() requires a table-bound column")
        sc = self._sc
        needs_stats = base is None or binwidth is None or nbins is None
        scalars = []
        if needs_stats:
            cd = sc.cast("double")
            finite = F.when(~F.isnan(cd), cd)  # NaN would poison max()
            sv = ScalarValue(
                df,
                F.struct(
                    F.min(finite).alias("mn"), F.max(finite).alias("mx")
                ),
            )
            scalars.append(sv)

        def build():
            if scalars:
                stats = F.col(scalars[0].ph)
                mn, mx = stats.getField("mn"), stats.getField("mx")
            base_c = (mn - F.lit(eps)) if base is None else F.lit(float(base))
            if binwidth is None:
                bw_c = (mx - base_c) / F.lit(int(nbins))
            else:
                bw_c = F.lit(float(binwidth))
            if nbins is None:
                nb_c = F.ceil((mx - base_c) / bw_c).cast("long")
            else:
                nb_c = F.lit(int(nbins)).cast("long")
            h = F.floor((sc.cast("double") - base_c) / bw_c).cast("long")
            clipped = F.least(F.greatest(h, F.lit(-1).cast("long")), nb_c - 1)
            return F.when(sc.isNotNull(), clipped)

        return ScalarExpr(build, scalars)

    def sqrt(self):
        return wrap(F.sqrt(self.spark()))

    def exp(self):
        return wrap(F.exp(self.spark()))

    def ln(self):
        return wrap(F.log(self.spark()))

    def log(self, base=None):
        if base is None:
            return self.ln()
        return wrap(F.log(float(base), self.spark()))

    def log2(self):
        return wrap(F.log2(self.spark()))

    def log10(self):
        return wrap(F.log10(self.spark()))

    def degrees(self):
        return wrap(F.degrees(self.spark()))

    def radians(self):
        return wrap(F.radians(self.spark()))

    # -- trig (numeric.py:297-341) -------------------------------------------
    def acos(self):
        return wrap(F.acos(self.spark()))

    def asin(self):
        return wrap(F.asin(self.spark()))

    def atan(self):
        return wrap(F.atan(self.spark()))

    def atan2(self, other):
        return wrap(F.atan2(self.spark(), unwrap(other)))

    def cos(self):
        return wrap(F.cos(self.spark()))

    def cot(self):
        return wrap(F.cot(self.spark()))

    def sin(self):
        return wrap(F.sin(self.spark()))

    def tan(self):
        return wrap(F.tan(self.spark()))

    def acosh(self):
        return wrap(F.acosh(self.spark()))

    def asinh(self):
        return wrap(F.asinh(self.spark()))

    def atanh(self):
        return wrap(F.atanh(self.spark()))

    def cosh(self):
        return wrap(F.cosh(self.spark()))

    def sinh(self):
        return wrap(F.sinh(self.spark()))

    def tanh(self):
        return wrap(F.tanh(self.spark()))

    # -- predicates (numeric.py:92-109) ---------------------------------------
    def isnan(self):
        return wrap(F.isnan(self.spark()))

    def isinf(self):
        c = self.spark()
        return wrap((c == float("inf")) | (c == float("-inf")))

    # -- base conversion / bitwise (numeric.py:191, :342-395) -----------------
    def convert_base(self, from_base: int, to_base: int):
        return wrap(F.conv(self.spark(), from_base, to_base))

    def bitwise_and(self, other):
        return wrap(self.spark().bitwiseAND(unwrap(other)))

    def bitwise_or(self, other):
        return wrap(self.spark().bitwiseOR(unwrap(other)))

    def bitwise_xor(self, other):
        return wrap(self.spark().bitwiseXOR(unwrap(other)))

    def bitwise_not(self):
        return wrap(F.bitwise_not(self.spark()))

    def bitwise_left_shift(self, n):
        return wrap(F.shiftleft(self.spark(), n))

    def bitwise_right_shift(self, n):
        return wrap(F.shiftright(self.spark(), n))
