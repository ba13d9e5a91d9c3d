"""Generic / comparison / conditional ops
(reference: ibis/expr/operations/generic.py, logical.py).

All lower to JVM-side ``pyspark.sql.functions`` expressions; the
comparison dunders live directly on :class:`Column` (column.py) because
they must override object identity. Here: casts, null handling, case
expressions, hashing, plus the module-level constructors re-exported from
``ibis_spark.functions``.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibis_spark.expr.core import unwrap, wrap


def _spark_type(dtype):
    """Accept an ibis_spark DataType, a dtype string in ibis grammar, or a
    pyspark DataType."""
    from pyspark.sql import types as st

    from ibis_spark import datatypes as dt

    if isinstance(dtype, st.DataType):
        return dtype
    if isinstance(dtype, str):
        dtype = dt.dtype(dtype)
    if isinstance(dtype, dt.DataType):
        return dtype.to_spark()
    raise TypeError(f"cannot interpret {dtype!r} as a data type")


class GenericOps:
    __slots__ = ()

    # -- casts (generic.py:40,58) -------------------------------------------
    def cast(self, dtype):
        return wrap(self.spark().cast(_spark_type(dtype)))

    def try_cast(self, dtype):
        return wrap(F.try_cast(self.spark(), _spark_type(dtype)))

    # -- null handling (generic.py:79-104) -----------------------------------
    def isnull(self):
        return wrap(self.spark().isNull())

    def notnull(self):
        return wrap(self.spark().isNotNull())

    def nullif(self, value):
        return wrap(F.nullif(self.spark(), unwrap(value)))

    def fillna(self, value):
        """Deprecated reference spelling of fill_null (generic.py)."""
        return self.fill_null(value)

    def fill_null(self, value):
        return wrap(F.coalesce(self.spark(), unwrap(value)))

    fillna = fill_null

    def coalesce(self, *values):
        return wrap(F.coalesce(self.spark(), *(unwrap(v) for v in values)))

    # -- membership / ranges (logical.py:111-136) ------------------------------
    def between(self, lower, upper):
        return wrap(self.spark().between(unwrap(lower), unwrap(upper)))

    def isin(self, values):
        # empty IN list → literal False (sql/rewrites.py:486-487)
        if isinstance(values, (list, tuple, set, frozenset)):
            values = list(values)
            if not values:
                return wrap(F.lit(False))
            return wrap(self.spark().isin(*[unwrap(v) for v in values]))
        # InSubquery (subqueries.py:65): membership in another relation's
        # column → deferred marker; Table.filter lowers it to a left-semi
        # join (distributed — never a driver-side collect).
        from ibis_spark.expr.core import InSubquery

        return InSubquery(self, values, negated=False)

    def notin(self, values):
        if isinstance(values, (list, tuple, set, frozenset)):
            values = list(values)
            if not values:
                return wrap(F.lit(True))
            return wrap(~self.spark().isin(*[unwrap(v) for v in values]))
        from ibis_spark.expr.core import InSubquery

        return InSubquery(self, values, negated=True)

    # -- conditionals (generic.py:290-341, logical.py:151) ---------------------
    def ifelse(self, true_expr, false_expr):
        """self is a boolean column (IfElse logical.py:151)."""
        return wrap(
            F.when(self.spark(), unwrap(true_expr)).otherwise(unwrap(false_expr))
        )

    def case(self):
        """SimpleCase builder (generic.py:290)."""
        return SimpleCaseBuilder(self)

    def cases(self, *branches, else_=None):
        """ibis 10.x Value.cases((cond_or_value, result), ..., else_=...)."""
        base = self.spark()
        out = None
        for value, result in branches:
            cond = unwrap(value)
            # simple-case semantics: compare base to the branch value unless
            # the branch value is already boolean-typed comparison
            pred = base == cond
            out = F.when(pred, unwrap(result)) if out is None else out.when(pred, unwrap(result))
        if out is None:
            return wrap(F.lit(None) if else_ is None else unwrap(else_))
        if else_ is not None:
            out = out.otherwise(unwrap(else_))
        return wrap(out)

    def substitute(self, mapping, else_=None):
        """Value.substitute: dict-based SimpleCase (generic.py:290)."""
        out = None
        for k, v in mapping.items():
            pred = self.spark() == unwrap(k)
            out = F.when(pred, unwrap(v)) if out is None else out.when(pred, unwrap(v))
        out = out.otherwise(unwrap(else_) if else_ is not None else self.spark())
        return wrap(out)

    # -- identity / typing (generic.py:72,238-271, logical.py:106) ---------------
    def identical_to(self, other):
        """Null-safe equality (IdenticalTo logical.py:106)."""
        return wrap(self.spark().eqNullSafe(unwrap(other)))

    def type_of(self):
        return wrap(F.typeof(self.spark()))

    typeof = type_of  # reference spelling (generic.py TypeOf)

    def hash(self):
        """64-bit integer hash (Hash generic.py:238)."""
        return wrap(F.xxhash64(self.spark()))

    def hashbytes(self, how="sha256"):
        c = self.spark()
        how = how.lower()
        if how == "md5":
            return wrap(F.unhex(F.md5(c.cast("binary"))))
        if how == "sha1":
            return wrap(F.unhex(F.sha1(c.cast("binary"))))
        if how in ("sha256", "sha512"):
            return wrap(F.unhex(F.sha2(c.cast("binary"), int(how[3:]))))
        raise ValueError(f"unsupported hash algorithm {how}")

    def hexdigest(self, how="sha256"):
        c = self.spark()
        how = how.lower()
        if how == "md5":
            return wrap(F.md5(c.cast("binary")))
        if how == "sha1":
            return wrap(F.sha1(c.cast("binary")))
        if how in ("sha256", "sha512"):
            return wrap(F.sha2(c.cast("binary"), int(how[3:])))
        raise ValueError(f"unsupported hash algorithm {how}")

    # -- comparison helpers -----------------------------------------------------
    def greatest(self, *others):
        return wrap(F.greatest(self.spark(), *(unwrap(o) for o in others)))

    def least(self, *others):
        return wrap(F.least(self.spark(), *(unwrap(o) for o in others)))


class SimpleCaseBuilder:
    """col.case().when(a, b).when(c, d).else_(e).end()
    (reference: ibis/expr/builders.py SimpleCaseBuilder)."""

    def __init__(self, base, branches=(), default=None):
        self._base = base
        self._branches = tuple(branches)
        self._default = default

    def when(self, value, result):
        return SimpleCaseBuilder(
            self._base, self._branches + ((value, result),), self._default
        )

    def else_(self, result):
        return SimpleCaseBuilder(self._base, self._branches, result)

    def end(self):
        base = unwrap(self._base)
        out = None
        for value, result in self._branches:
            pred = base == unwrap(value)
            out = F.when(pred, unwrap(result)) if out is None else out.when(pred, unwrap(result))
        if out is None:
            raise ValueError("case() requires at least one when()")
        if self._default is not None:
            out = out.otherwise(unwrap(self._default))
        return wrap(out)


class SearchedCaseBuilder:
    """ibis.case().when(cond, result)...  (SearchedCase generic.py:320)."""

    def __init__(self, branches=(), default=None):
        self._branches = tuple(branches)
        self._default = default

    def when(self, cond, result):
        return SearchedCaseBuilder(self._branches + ((cond, result),), self._default)

    def else_(self, result):
        return SearchedCaseBuilder(self._branches, result)

    def end(self):
        out = None
        for cond, result in self._branches:
            c = unwrap(cond)
            out = F.when(c, unwrap(result)) if out is None else out.when(c, unwrap(result))
        if out is None:
            raise ValueError("case() requires at least one when()")
        if self._default is not None:
            out = out.otherwise(unwrap(self._default))
        return wrap(out)


# -- module-level constructors (re-exported in functions/__init__) -----------

def case():
    """ibis.case() searched-case builder."""
    return SearchedCaseBuilder()


def cases(*branches, else_=None):
    """ibis.cases((cond, value), ..., else_=...) — searched case."""
    b = SearchedCaseBuilder(branches, else_)
    return b.end()


def coalesce(*values):
    return wrap(F.coalesce(*(unwrap(v) for v in values)))


def greatest(*values):
    return wrap(F.greatest(*(unwrap(v) for v in values)))


def least(*values):
    return wrap(F.least(*(unwrap(v) for v in values)))


def ifelse(cond, true_expr, false_expr):
    return wrap(F.when(unwrap(cond), unwrap(true_expr)).otherwise(unwrap(false_expr)))


def now():
    """TimestampNow (generic.py:192)."""
    return wrap(F.now())


def today():
    """DateNow (generic.py:200)."""
    return wrap(F.current_date())


def random():
    """RandomScalar (generic.py:208)."""
    return wrap(F.rand())


def uuid():
    """RandomUUID (generic.py:216) — F.uuid() exists in Spark 4 (PC:71)."""
    return wrap(F.expr("uuid()"))


def e():
    """Constant e (generic.py:224)."""
    return wrap(F.lit(2.718281828459045))


def pi():
    """Constant pi (generic.py:231)."""
    return wrap(F.lit(3.141592653589793))
